"""Differential suite for the VW/SlidingWindow/BottomUp/ABC C kernels and
their vectorized decoders: byte/array identity with the pure-Python
reference paths (fast paths must never be semantic forks)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import tersets_spark.codecs.abc_linear as A
import tersets_spark.codecs.line_simplification as L

pytestmark = pytest.mark.skipif(
    L._NATIVE is None, reason="no C compiler: python path is the only path"
)

RNG = np.random.default_rng(41)

SHAPES = [
    np.array([3.0, 1.0]),
    np.array([5.0, 5.0, 5.0]),
    np.full(60, 7.0),
    np.round(RNG.uniform(0, 4000, 700)),
    RNG.standard_normal(500) * 1e6,
    np.floor((0.4 * np.arange(600) + 500) / 50.0) * 50.0,
    2.0 * np.arange(400) + 500 + RNG.uniform(-20, 20, 400),
]

COMPRESSORS = [
    (L, L.compress_vw),
    (L, L.compress_sliding_window),
    (L, L.compress_bottom_up),
    (A, A.compress),
]


def _python_path(mod, fn, values, eb):
    save = mod._NATIVE
    mod._NATIVE = None
    try:
        return fn(values, eb)
    finally:
        mod._NATIVE = save


@pytest.mark.parametrize("eb", [0.0, 0.5, 25.0, 1e6])
@pytest.mark.parametrize("idx", range(len(SHAPES)))
def test_native_matches_python(eb, idx):
    v = SHAPES[idx]
    for mod, fn in COMPRESSORS:
        assert fn(v, eb) == _python_path(mod, fn, v, eb), fn.__name__


@pytest.mark.parametrize("eb", [0.0, 0.5, 25.0])
@pytest.mark.parametrize("idx", range(len(SHAPES)))
def test_vectorized_decoders_match_scalar(eb, idx):
    v = SHAPES[idx]
    b = L.compress_vw(v, eb)
    w = np.frombuffer(b, dtype="<f8")
    assert np.array_equal(L.decompress_vw(b), L._decompress_vw_scalar(w, w.view("<u8")))
    for fn in (L.compress_sliding_window, L.compress_bottom_up):
        b = fn(v, eb)
        w = np.frombuffer(b, dtype="<f8")
        assert np.array_equal(
            L._decompress_keogh(b), L._decompress_keogh_scalar(w, w.view("<u8"))
        )
    b = A.compress(v, eb)
    w = np.frombuffer(b, dtype="<f8")
    assert np.array_equal(A.decompress(b), A._decompress_scalar(w, w.view("<u8")))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=250,
    ),
    st.sampled_from([0.0, 0.25, 8.0]),
)
def test_native_linesimp_hypothesis(values, eb):
    v = np.asarray(values, dtype=np.float64)
    for mod, fn in COMPRESSORS:
        blob = fn(v, eb)
        assert blob == _python_path(mod, fn, v, eb), fn.__name__

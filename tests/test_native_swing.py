"""Differential suite for the Swing/Slide C kernel and the vectorized
decoders: byte/array identity with the pure-Python reference paths on every
input (fast paths must never be semantic forks)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import tersets_spark.codecs.swing_slide as S

pytestmark = pytest.mark.skipif(
    S._NATIVE is None, reason="no C compiler: python path is the only path"
)

RNG = np.random.default_rng(23)


def _python_path(fn, values, eb):
    save = S._NATIVE
    S._NATIVE = None
    try:
        return fn(values, eb)
    finally:
        S._NATIVE = save


def _dec_swing_scalar(blob: bytes) -> np.ndarray:
    words = np.frombuffer(blob, dtype="<f8")
    return S._decompress_swing_scalar(words, words.view("<u8"))


def _dec_slide_scalar(blob: bytes) -> np.ndarray:
    words = np.frombuffer(blob, dtype="<f8")
    ends = words.view("<u8")
    out: list[float] = []
    first_t, index = 0, 0
    while index < len(words):
        start_v = float(words[index])
        seg_end_t = int(ends[index + 2]) - 1
        seg_end_v = float(words[index + 1])
        if first_t != seg_end_t:
            slope, intercept = S._swing_line(first_t, start_v, seg_end_t, seg_end_v, 0.0)
            out.append(start_v)
            for t in range(first_t + 1, seg_end_t):
                out.append(S._eval(slope, intercept, t))
            out.append(seg_end_v)
            first_t = seg_end_t + 1
        else:
            out.append(start_v)
            first_t += 1
        index += 3
    return np.asarray(out, dtype=np.float64)


SHAPES = [
    np.array([3.0, 1.0]),
    np.full(50, 7.0),
    np.round(RNG.uniform(0, 4000, 800)),
    RNG.standard_normal(600) * 1e6,
    np.floor((0.4 * np.arange(700) + 500) / 50.0) * 50.0,
    2.0 * np.arange(500) + 500 + RNG.uniform(-20, 20, 500),
]


@pytest.mark.parametrize("eb", [0.0, 0.5, 8.0])
@pytest.mark.parametrize("idx", range(len(SHAPES)))
def test_native_swing_matches_python(eb, idx):
    v = SHAPES[idx]
    for fn in (S.compress_swing, S.compress_swing_disconnected, S.compress_slide):
        assert fn(v, eb) == _python_path(fn, v, eb)


@pytest.mark.parametrize("eb", [0.0, 0.5, 8.0])
@pytest.mark.parametrize("idx", range(len(SHAPES)))
def test_vectorized_decoders_match_scalar(eb, idx):
    v = SHAPES[idx]
    b = S.compress_swing(v, eb)
    assert np.array_equal(S.decompress_swing(b), _dec_swing_scalar(b))
    for fn in (S.compress_swing_disconnected, S.compress_slide):
        b = fn(v, eb)
        assert np.array_equal(S.decompress_slide(b), _dec_slide_scalar(b))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=300,
    ),
    st.sampled_from([0.0, 0.25, 4.0]),
)
def test_native_swing_hypothesis(values, eb):
    v = np.asarray(values, dtype=np.float64)
    for fn, dec, dec_ref in (
        (S.compress_swing, S.decompress_swing, _dec_swing_scalar),
        (S.compress_swing_disconnected, S.decompress_slide, _dec_slide_scalar),
        (S.compress_slide, S.decompress_slide, _dec_slide_scalar),
    ):
        blob = fn(v, eb)
        assert blob == _python_path(fn, v, eb)
        assert np.array_equal(dec(blob), dec_ref(blob))


def test_native_swing_nonfinite_raises():
    from tersets_spark.errors import UnsupportedInputError

    vals = np.array([1.0, 2.0, np.inf, 3.0])
    for fn in (S.compress_swing, S.compress_swing_disconnected, S.compress_slide):
        with pytest.raises(UnsupportedInputError):
            fn(vals, 0.5)

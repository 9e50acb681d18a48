"""Differential suite for the Sim/Mix-Piece C kernels and the vectorized
segment decoder: byte/array identity with the pure-Python reference paths.
The kernels replicate Python-dict grouping semantics (insertion order,
value equality, first-seen key bits), so byte equality here pins exactly
that."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import tersets_spark.codecs.mix_piece as MP
import tersets_spark.codecs.sim_piece as SP

pytestmark = pytest.mark.skipif(
    SP._NATIVE is None, reason="no C compiler: python path is the only path"
)

RNG = np.random.default_rng(53)

SHAPES = [
    np.array([1.0]),
    np.array([7.0, 7.0]),
    np.full(80, 3.0),
    np.round(RNG.uniform(0, 4000, 900)),
    RNG.standard_normal(700) * 1e6,
    np.floor((0.4 * np.arange(800) + 500) / 50.0) * 50.0,
    2.0 * np.arange(600) + 500 + RNG.uniform(-20, 20, 600),
    RNG.uniform(-1e14, 1e14, 300),
]


def _python_path(fn, values, eb):
    save = SP._NATIVE
    SP._NATIVE = None
    try:
        return fn(values, eb)
    finally:
        SP._NATIVE = save


@pytest.mark.parametrize("eb", [1e-3, 0.5, 1.0, 25.0])
@pytest.mark.parametrize("idx", range(len(SHAPES)))
def test_native_piece_matches_python(eb, idx):
    v = SHAPES[idx]
    assert SP.compress(v, eb) == _python_path(SP.compress, v, eb)
    assert MP.compress(v, eb) == _python_path(MP.compress, v, eb)


@pytest.mark.parametrize("eb", [0.5, 25.0])
@pytest.mark.parametrize("idx", range(len(SHAPES)))
def test_vectorized_segment_decoder_matches_scalar(eb, idx):
    v = SHAPES[idx]
    for mod in (SP, MP):
        blob = mod.compress(v, eb)
        got = mod.decompress(blob)
        # scalar reference: same parse, sorted walk
        save = SP.decompress_segments_to_values
        SP.decompress_segments_to_values = (
            lambda segs, last: SP._decompress_segments_scalar(sorted(segs), last)
        )
        try:
            # mix bound the original name at import; patch both modules
            save_mp = MP.decompress_segments_to_values
            MP.decompress_segments_to_values = SP.decompress_segments_to_values
            try:
                exp = mod.decompress(blob)
            finally:
                MP.decompress_segments_to_values = save_mp
        finally:
            SP.decompress_segments_to_values = save
        assert np.array_equal(got, exp)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e14, max_value=1e14, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from([1e-3, 0.5, 4.0]),
)
def test_native_piece_hypothesis(values, eb):
    v = np.asarray(values, dtype=np.float64)
    assert SP.compress(v, eb) == _python_path(SP.compress, v, eb)
    assert MP.compress(v, eb) == _python_path(MP.compress, v, eb)


def test_native_piece_rejects_bad_input():
    from tersets_spark.errors import UnsupportedInputError

    for vals in (np.array([1.0, np.nan]), np.array([1.0, 2e15])):
        with pytest.raises(UnsupportedInputError):
            SP.compress(vals, 1.0)
        with pytest.raises(UnsupportedInputError):
            MP.compress(vals, 1.0)

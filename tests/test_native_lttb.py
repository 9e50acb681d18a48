"""Differential suite for the batched LTTB C kernel: bitwise identity with
the pure-NumPy reference path on integer-valued inputs (the engine's token
domain), where every bucket mean is exact under any summation order."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import tersets_spark.downsample as D

pytestmark = pytest.mark.skipif(
    D._NATIVE is None, reason="no C compiler: python path is the only path"
)

RNG = np.random.default_rng(47)

SHAPES = [
    np.empty(0),
    np.array([5.0]),
    np.array([3.0, 1.0]),
    np.array([5.0, 5.0, 5.0]),
    np.full(100, 7.0),  # plateau: every area ties at 0 -> first-argmax
    np.round(RNG.uniform(0, 50000, 1000)),
    np.round(RNG.uniform(0, 3, 500)),  # heavy ties
    np.arange(700, dtype=np.float64),  # monotone ramp
    np.repeat(np.round(RNG.uniform(0, 9, 40)), 16),  # lattice plateaus
    np.round(RNG.standard_normal(333) * 1e6),
    np.round(np.sin(np.arange(1024) / 7.0) * 1000),
]

THRESHOLDS = [2, 3, 4, 5, 17, 63, 64, 65, 256, 999, 1000, 1001, 5000]


@pytest.mark.parametrize("k", THRESHOLDS)
def test_batch_matches_python(k):
    out = D.lttb_batch(SHAPES, k)
    assert out is not None
    assert len(out) == len(SHAPES)
    for v, got in zip(SHAPES, out):
        ref = D.lttb(v, k)
        assert got.tolist() == ref.tolist(), (len(v), k)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=0, max_size=400),
    st.integers(min_value=2, max_value=80),
)
def test_hypothesis_tokens(tokens, k):
    v = np.asarray(tokens, dtype=np.float64)
    (got,) = D.lttb_batch([v], k)
    assert got.tolist() == D.lttb(v, k).tolist()


def test_empty_batch():
    assert D.lttb_batch([], 64) == []


def test_structural_invariants_native():
    v = np.round(RNG.uniform(0, 4000, 500))
    (got,) = D.lttb_batch([v], 64)
    assert len(got) == 64
    assert got[0] == v[0] and got[-1] == v[-1]
    # selected values appear in time order as a subsequence of v
    i = 0
    for x in got:
        while i < len(v) and v[i] != x:
            i += 1
        assert i < len(v)
        i += 1

"""Differential suite: the C Min-Merge kernel (codecs/_histogram_native.c)
must be BYTE-IDENTICAL to the pure-Python reference path for PWCH and PWLH
on every input — the native kernel is a fast path, never a semantic fork.

Skips (never fails) when no C compiler is available: the Python path is
then the only path and is already covered by the codec suites.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import tersets_spark.codecs.histogram as H

pytestmark = pytest.mark.skipif(
    H._NATIVE is None, reason="no C compiler: python path is the only path"
)


def _python_path(fn, values, eb):
    save = H._NATIVE
    H._NATIVE = None
    try:
        return fn(values, eb)
    finally:
        H._NATIVE = save


RNG = np.random.default_rng(17)

SHAPES = [
    np.array([1.0]),
    np.array([1.0, 2.0]),
    np.array([5.0, 5.0, 5.0, 5.0]),
    np.arange(100, dtype=np.float64),
    np.floor((0.4 * np.arange(500) + 500) / 50.0) * 50.0,  # plateaus
    2.0 * np.arange(300) + 500 + RNG.uniform(-20, 20, 300),  # noisy line
    RNG.standard_normal(1000) * 1e6,
    np.clip(np.round(RNG.uniform(0, 4000, 700)), 0, 50256).astype(float),
    np.concatenate([np.full(50, 3.0), np.arange(50, dtype=float) * -7.5]),
]


@pytest.mark.parametrize("eb", [2.0, 16.0, 64.0])
@pytest.mark.parametrize("idx", range(len(SHAPES)))
def test_native_matches_python_fixed_shapes(eb, idx):
    values = SHAPES[idx]
    for fn in (H.compress_pwch, H.compress_pwlh):
        assert fn(values, eb) == _python_path(fn, values, eb)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=2, max_value=40),
)
def test_native_matches_python_hypothesis(values, max_buckets):
    arr = np.asarray(values, dtype=np.float64)
    eb = float(max_buckets)
    assert H.compress_pwch(arr, eb) == _python_path(H.compress_pwch, arr, eb)
    assert H.compress_pwlh(arr, eb) == _python_path(H.compress_pwlh, arr, eb)


def test_native_nonfinite_raises_like_python():
    from tersets_spark.errors import UnsupportedInputError

    vals = np.array([1.0, np.nan, 2.0])
    with pytest.raises(UnsupportedInputError):
        H.compress_pwlh(vals, 4.0)
    with pytest.raises(UnsupportedInputError):
        _python_path(H.compress_pwlh, vals, 4.0)


# Adversarial shapes for the candidate-pruned MABR fast path: big smooth
# hulls (every point a hull vertex), exact lattice staircases (runs of
# bitwise-identical edge directions -> exactly tied areas), the trend
# shape that dominated the real-corpus profile, and near-circular data.
_T = np.arange(3000, dtype=np.float64)
ADVERSARIAL = [
    np.sin(_T / 500.0) * 1000.0,                          # smooth convex arcs
    np.round(0.5 * _T + 700.0),                           # exact staircase
    np.round(0.5 * _T + 700.0 + RNG.uniform(-1, 1, 3000)),  # worst real doc
    1e6 * np.sin(_T * 2 * np.pi / 3000) + _T,             # near-circle
    np.floor(_T / 97.0) * 97.0 + np.round(np.sin(_T / 7.0) * 3.0),  # mixed
    # thin-rectangle MABR: one huge outlier collapses the short rectangle
    # side, where the trig area deviates from the dot/cross area by an
    # amount UNBOUNDED relative to the area — the hypothesis-found input
    # that pruned the true winner before the ang_err interval widening
    np.array([0.0, 0.0, 1.0, 0.0, 999999990.0, 1.0, 0.0]),
    np.array([0.0, 0.0, 1.0, 0.0, -999999990.0, 1.0, 0.0]),  # mirrored
    np.concatenate([np.zeros(40), [1e12], np.ones(40), [5.0, -3.0]]),
]


@pytest.mark.parametrize("eb", [4.0, 64.0])
@pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
def test_native_matches_python_adversarial(eb, idx):
    values = ADVERSARIAL[idx]
    for fn in (H.compress_pwch, H.compress_pwlh):
        assert fn(values, eb) == _python_path(fn, values, eb)


def test_fast_mabr_matches_forced_exact_scan():
    """Pin the candidate-pruned MABR against the O(p^2) full scan inside the
    same C binary (tersets_histogram_set_mabr_exact hook): byte-identical
    blobs on every adversarial shape and a random sweep."""
    from tersets_spark.codecs._native import load_histogram_mabr_setter

    setter = load_histogram_mabr_setter()
    assert setter is not None
    cases = list(ADVERSARIAL) + [
        RNG.uniform(-1e8, 1e8, 2500),
        np.repeat(RNG.uniform(0, 100, 50), 60),  # long exact plateaus
    ]
    try:
        for values in cases:
            for eb in (3.0, 32.0, 200.0):
                setter(0)
                fast = H.compress_pwlh(values, eb)
                setter(1)
                exact = H.compress_pwlh(values, eb)
                assert fast == exact
    finally:
        setter(0)


def test_pwlh_throughput_floor():
    """Perf regression gate: the native path must stay >= 100k tokens/s/core
    on trend-shaped data (measured ~1.4M post-candidate-pruning; generous
    margin for a noisy multi-tenant host)."""
    import time

    n = 4000
    vals = 2.0 * np.arange(n) + 500 + RNG.uniform(-20, 20, n)
    H.compress_pwlh(vals, 16.0)  # warm the kernel
    t0 = time.monotonic()
    H.compress_pwlh(vals, 16.0)
    rate = n / (time.monotonic() - t0)
    assert rate > 100_000, f"PWLH native path at {rate:,.0f} tokens/s"

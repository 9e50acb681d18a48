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


def test_pwlh_throughput_floor():
    """Perf regression gate: the native path must stay >= 20k tokens/s/core
    on trend-shaped data (measured ~55k on real series; generous margin for
    a noisy multi-tenant host)."""
    import time

    n = 4000
    vals = 2.0 * np.arange(n) + 500 + RNG.uniform(-20, 20, n)
    H.compress_pwlh(vals, 16.0)  # warm the kernel
    t0 = time.monotonic()
    H.compress_pwlh(vals, 16.0)
    rate = n / (time.monotonic() - t0)
    assert rate > 20_000, f"PWLH native path at {rate:,.0f} tokens/s"

"""Property-based round-trip tests (hypothesis) — the analogue of the
reference's shrinking harness (``/root/reference/src/tester.zig:38-113``,
which bisects a failing random sequence to a minimal counterexample;
hypothesis shrinks for us).

Invariants, per SURVEY.md §5:
* every codec: decompressed length == input length;
* L-inf codecs: ``is_within_error_bound`` at the compression bound (bounds
  kept < 1 so the f32 margin survives — see the margin-absorption note in
  test_codecs_extended);
* lossless-at-zero codecs: exact equality at eb=0;
* delta-of-delta / Gorilla: exact equality always (integral inputs).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tersets_spark import Method, compress, decompress, is_within_error_bound

finite_f64 = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False, width=64
)
series = st.lists(finite_f64, min_size=2, max_size=120).map(
    lambda xs: np.asarray(xs, dtype=np.float64)
)
small_bounds = st.sampled_from([0.0, 0.01, 0.25, 0.9])
positive_bounds = st.sampled_from([0.01, 0.25, 0.9])

LOSSLESS_AT_ZERO = [
    Method.PoorMansCompressionMidrange,
    Method.PoorMansCompressionMean,
    Method.SwingFilter,
    Method.SwingFilterDisconnected,
    Method.SlideFilter,
    Method.ABCLinearApproximation,
    Method.VisvalingamWhyatt,
    Method.SlidingWindow,
    Method.BottomUp,
]

LINF = [
    Method.PoorMansCompressionMidrange,
    Method.PoorMansCompressionMean,
    Method.SwingFilter,
    Method.SwingFilterDisconnected,
    Method.SlideFilter,
    Method.ABCLinearApproximation,
]


@settings(max_examples=40, deadline=None)
@given(values=series, eb=positive_bounds, method=st.sampled_from(LINF))
def test_linf_within_bound_property(values, eb, method):
    # eb=0 exactness is covered by test_lossless_at_zero_property on integral
    # inputs; arbitrary floats at eb=0 hit the absorption edge described there.
    out = decompress(compress(values, method, eb))
    assert is_within_error_bound(values, out, eb)


token_series = st.lists(
    st.integers(min_value=0, max_value=50256), min_size=2, max_size=150
).map(lambda xs: np.asarray(xs, dtype=np.float64))


@settings(max_examples=30, deadline=None)
@given(values=token_series, method=st.sampled_from(LOSSLESS_AT_ZERO))
def test_lossless_at_zero_property(values, method):
    """Exact equality at eb=0 over integral token values (input_hint).

    Integral inputs make every interpolated line evaluation exact in f64, so
    losslessness is unconditional. For arbitrary floats the reference shares
    a measure-zero edge: a 3+-point segment whose interior point differs
    from the fp-interpolated line only by an absorbed tiny term (e.g. a
    subnormal between two ~1e-38 endpoints) reconstructs to the line value,
    not the original — ``(v1-v0)+v0 != v1`` under absorption. Found by
    hypothesis; inherent to the reference's swing/slide recording at eb=0.
    """
    out = decompress(compress(values, method, 0.0))
    np.testing.assert_array_equal(out, values)


@settings(max_examples=30, deadline=None)
@given(values=series, eb=positive_bounds, method=st.sampled_from([Method.SimPiece, Method.MixPiece]))
def test_sim_mix_piece_property(values, eb, method):
    # Sim/Mix-Piece additionally reject |x| > 1e15; our strategy stays below.
    out = decompress(compress(values, method, eb))
    assert is_within_error_bound(values, out, eb)


@settings(max_examples=30, deadline=None)
@given(
    values=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=200
    ).map(lambda xs: np.asarray(xs, dtype=np.float64)),
    method=st.sampled_from([Method.DeltaOfDelta, Method.GorillaXOR]),
)
def test_integral_codecs_exact_property(values, method):
    out = decompress(compress(values, method, 0.0))
    np.testing.assert_array_equal(out, values)


@settings(max_examples=25, deadline=None)
@given(values=series, max_buckets=st.sampled_from([2, 5, 64]))
def test_histogram_length_property(values, max_buckets):
    for method in (Method.PiecewiseConstantHistogram, Method.PiecewiseLinearHistogram):
        out = decompress(compress(values, method, float(max_buckets)))
        assert len(out) == len(values)


@settings(max_examples=25, deadline=None)
@given(values=series, eb=small_bounds)
def test_line_simplification_length_property(values, eb):
    for method in (Method.VisvalingamWhyatt, Method.SlidingWindow, Method.BottomUp):
        out = decompress(compress(values, method, eb))
        assert len(out) == len(values)

"""Tests for the piecewise-linear / histogram / line-simplification codecs.

Mirrors the reference's test strategy (SURVEY.md §5): seeded property-style
round-trips asserting the L-inf invariant (analogue of
/root/reference/src/tester.zig:38-113), plus the reference's own fixed
known-answer vectors (citations inline).
"""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark import Method, compress, decompress, is_within_error_bound
from tersets_spark.codecs._geometry import ConvexHull
from tersets_spark.errors import (
    UnsupportedErrorBoundError,
    UnsupportedInputError,
)

RNG = np.random.default_rng(20240817)

#: Methods whose error_bound is a true L-inf bound (unlike PWCH/PWLH).
LINF_METHODS = [
    Method.SwingFilter,
    Method.SwingFilterDisconnected,
    Method.SlideFilter,
    Method.ABCLinearApproximation,
]

#: Lossless-at-zero methods newly added (the reference's own lossless list,
#: bindings/python/tests/__init__.py:52-57, minus the PMC pair covered in
#: test_codecs_core, plus the three line-simplification methods whose eb=0
#: behavior degenerates to exact storage).
LOSSLESS_NEW = [
    Method.SwingFilter,
    Method.SwingFilterDisconnected,
    Method.SlideFilter,
    Method.ABCLinearApproximation,
    Method.VisvalingamWhyatt,
    Method.SlidingWindow,
    Method.BottomUp,
]


def _series_cases() -> dict[str, np.ndarray]:
    t = np.arange(200, dtype=np.float64)
    return {
        "bounded_random": RNG.uniform(0.0, 1.0, 100),
        "bounded_random_odd": RNG.uniform(0.0, 1.0, 101),
        "random_lines": np.concatenate(
            [
                RNG.uniform(-5, 5) * np.arange(40) + RNG.uniform(-20, 20)
                + RNG.normal(0, 0.3, 40)
                for _ in range(6)
            ]
        ),
        "constant": np.full(64, 7.25),
        "steps": np.repeat(RNG.integers(0, 50, 12).astype(np.float64), 9),
        "sine_trend": np.sin(t / 7.0) * 10 + t * 0.25,
        "tiny_pair": np.array([3.0, -1.5]),
        "three": np.array([1.0, 5.0, 2.0]),
    }


@pytest.mark.parametrize("method", LINF_METHODS)
@pytest.mark.parametrize("eb", [0.0, 0.1, 1.0])
def test_linf_methods_round_trip_within_bound(method, eb):
    for name, series in _series_cases().items():
        blob = compress(series, method, eb)
        out = decompress(blob)
        assert is_within_error_bound(series, out, eb), (method, name, eb)


@pytest.mark.parametrize("method", LINF_METHODS)
def test_linf_methods_large_bound_margin_absorption(method):
    # For eb >= ~1.7 the reference's f32 margin subtraction
    # ``eb - 1e-7`` rounds back to eb (1e-7 < ulp(eb)/2), so the safety
    # margin vanishes and decompress-side re-interpolation may exceed the
    # bound by f64 rounding noise (~1e-13). Reproduced faithfully; assert
    # the bound holds up to that noise.
    eb = 3.7
    for name, series in _series_cases().items():
        out = decompress(compress(series, method, eb))
        assert len(out) == len(series)
        excess = float(np.max(np.abs(series - out))) - float(np.float32(eb))
        assert excess <= 1e-9, (method, name, excess)


@pytest.mark.parametrize("method", [Method.SimPiece, Method.MixPiece])
@pytest.mark.parametrize("eb", [0.01, 0.3, 1.0, 2.5])
def test_sim_mix_piece_round_trip_within_bound(method, eb):
    for name, series in _series_cases().items():
        blob = compress(series, method, eb)
        out = decompress(blob)
        assert is_within_error_bound(series, out, eb), (method, name, eb)


@pytest.mark.parametrize("method", [Method.VisvalingamWhyatt])
@pytest.mark.parametrize("eb", [0.0, 0.5, 2.5])
def test_vw_round_trip_preserves_length(method, eb):
    # VW's bound is an AREA threshold (visvalingam_whyatt.zig:46-51): the
    # round-trip preserves length; kept points are exact.
    for name, series in _series_cases().items():
        out = decompress(compress(series, method, eb))
        assert len(out) == len(series), (name, eb)


@pytest.mark.parametrize("method", [Method.SlidingWindow, Method.BottomUp])
@pytest.mark.parametrize("eb", [0.0, 0.2, 1.0])
def test_keogh_methods_round_trip_preserves_length(method, eb):
    # RMSE-bounded methods do not satisfy an L-inf guarantee; the decompressed
    # series must still align 1:1 with the input.
    for name, series in _series_cases().items():
        out = decompress(compress(series, method, eb))
        assert len(out) == len(series), (method, name, eb)


@pytest.mark.parametrize("method", LOSSLESS_NEW)
def test_lossless_at_zero_error_bound(method):
    for name, series in _series_cases().items():
        out = decompress(compress(series, method, 0.0))
        np.testing.assert_array_equal(
            out, series, err_msg=f"{method.name} not lossless on {name}"
        )


@pytest.mark.parametrize("method", [Method.PiecewiseConstantHistogram, Method.PiecewiseLinearHistogram])
@pytest.mark.parametrize("max_buckets", [2, 3, 10, 100])
def test_histogram_round_trip_length_and_buckets(method, max_buckets):
    for name, series in _series_cases().items():
        blob = compress(series, method, float(max_buckets))
        body = blob[:-1]
        stride = 16 if method == Method.PiecewiseConstantHistogram else 24
        assert len(body) % stride == 0
        assert len(body) // stride <= max_buckets
        out = decompress(blob)
        assert len(out) == len(series), (method, name, max_buckets)


# ---------------------------------------------------------------------------
# reference known-answer vectors
# ---------------------------------------------------------------------------

_HULL_SERIES = [3, 2, 3.5, 5, 3, 4, 4, 3, 4.5, 3.5, 2.5, 2.5, 3.5, 2.5, 2.5, 2.5, 3, 3, 3, 3, 2.8]


def test_convex_hull_known_result():
    """convex_hull.zig:525-568."""
    hull = ConvexHull()
    for i, v in enumerate(_HULL_SERIES):
        hull.add((i, float(v)))
    assert [p[0] for p in hull.upper] == [0, 3, 8, 19, 20]
    assert [p[0] for p in hull.lower] == [0, 1, 15, 20]


def test_convex_hull_mabr_known_lines():
    """convex_hull.zig:584-637."""
    hull = ConvexHull()
    for i, v in enumerate([0.0, 3.0, 2.0, 5.0, 4.0]):
        hull.add((i, v))
    slope, intercept = hull.compute_mabr_linear_function()
    assert abs(slope - 1.0) <= 1e-4
    assert abs(intercept - 1.0) <= 1e-4

    hull2 = ConvexHull()
    for i, v in enumerate([0.0, -2.0, 3.0, -1.0, 2.0]):
        hull2.add((i, v))
    slope2, intercept2 = hull2.compute_mabr_linear_function()
    assert abs(slope2 - 1.5) <= 1e-4
    assert abs(intercept2 + 2.75) <= 1e-4


def test_convex_hull_merge_known_result():
    """convex_hull.zig:657-712."""
    hull_one = ConvexHull()
    for i, v in enumerate(_HULL_SERIES):
        hull_one.add((i, float(v)))
    hull_two = ConvexHull()
    for i, v in enumerate([1, 2.5, 6, 2, 6, 9, 3, 4.5, 10, 1.5]):
        hull_two.add((21 + i, float(v)))
    hull_one.merge(hull_two, None)
    assert [p[0] for p in hull_one.upper] == [0, 3, 29, 30]
    assert [p[0] for p in hull_one.lower] == [0, 1, 21, 30]


def test_convex_hull_max_error_matches_manual():
    """convex_hull.zig:852-885."""
    hull = ConvexHull()
    values = [1, 3, 5, 7.1, 9, 11]
    for i, v in enumerate(values):
        hull.add((i, float(v)))
    expected = max(abs(2.0 * i + 1.0 - v) for i, v in enumerate(values))
    assert abs(hull.compute_max_error(2.0, 1.0) - expected) <= 1e-10


def test_pwch_known_cluster_buckets():
    """histogram_compression.zig:590-629 — 3 clusters -> 3 buckets.

    The emitted value per bucket is the reference's half-spread
    ``(max-min)/2`` (zig :260-262), replicated faithfully.
    """
    data = [0.9, 1.1, 0.7, 1.0, 0.8, 4.8, 5.2, 4.6, 5.0, 4.7, 9.8, 10.2, 9.9, 9.7, 10.0, 10.1]
    blob = compress(np.array(data), Method.PiecewiseConstantHistogram, 3.0)
    pairs = np.frombuffer(blob[:-1], dtype="<f8").reshape(-1, 2)
    ends = pairs.view("<u8")[:, 1]
    assert list(ends) == [5, 10, 16]
    np.testing.assert_allclose(pairs[:, 0], [0.2, 0.3, 0.25], atol=1e-12)


def test_abc_known_single_segment():
    """abc_linear_compression.zig:301-350 — one segment, known line."""
    blob = compress(np.array(_HULL_SERIES, dtype=np.float64), Method.ABCLinearApproximation, 5.0)
    words = np.frombuffer(blob[:-1], dtype="<f8")
    assert len(words) == 3
    assert abs(float(words[1]) - 0.036) <= 0.1
    assert abs(float(words[2]) - 3.43) <= 0.1


def test_vw_known_result_length():
    """visvalingam_whyatt.zig:359-384."""
    series = np.array([1.0, 1.5, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0])
    out = decompress(compress(series, Method.VisvalingamWhyatt, 2.5))
    assert len(out) == len(series)
    # Endpoints always survive simplification exactly.
    assert out[0] == series[0] and out[-1] == series[-1]


def test_mix_piece_cross_intercept_series():
    """mix_piece.zig:1214-1245 — same-slope different-intercept grouping."""
    series = np.concatenate(
        [
            2.0 * np.arange(0, 10) + 1.0,
            2.0 * np.arange(10, 20) + 5.0,
            2.1 * np.arange(20, 30) + 10.0,
        ]
    )
    eb = 0.01
    out = decompress(compress(series, Method.MixPiece, eb))
    assert is_within_error_bound(series, out, eb)


def test_mix_piece_quantization_boundaries():
    """mix_piece.zig:1277-1299."""
    series = np.array([1.49, 1.51, 1.99, 2.01, 2.49, 2.51])
    out = decompress(compress(series, Method.MixPiece, 0.01))
    assert is_within_error_bound(series, out, 0.01)


def test_sim_piece_many_merged_segments():
    """sim_piece.zig:595-616 analogue with a fixed seed."""
    series = np.concatenate([RNG.uniform(0, 10, 100) for _ in range(5)])
    for eb in (0.5, 1.5, 3.0):
        out = decompress(compress(series, Method.SimPiece, eb))
        assert is_within_error_bound(series, out, eb)


# ---------------------------------------------------------------------------
# error semantics
# ---------------------------------------------------------------------------


def test_sim_mix_piece_reject_nonpositive_bound():
    series = np.arange(10, dtype=np.float64)
    for method in (Method.SimPiece, Method.MixPiece):
        with pytest.raises(UnsupportedErrorBoundError):
            compress(series, method, 0.0)


def test_sim_mix_piece_reject_out_of_range():
    series = np.array([1.0, 2e15, 3.0])
    for method in (Method.SimPiece, Method.MixPiece):
        with pytest.raises(UnsupportedInputError):
            compress(series, method, 0.5)


def test_histogram_rejects_low_bucket_count():
    series = np.arange(10, dtype=np.float64)
    for method in (Method.PiecewiseConstantHistogram, Method.PiecewiseLinearHistogram):
        with pytest.raises(UnsupportedErrorBoundError):
            compress(series, method, 1.0)


def test_swing_slide_reject_nonfinite():
    series = np.array([1.0, 2.0, np.nan, 4.0, 5.0])
    for method in (Method.SwingFilter, Method.SwingFilterDisconnected, Method.SlideFilter):
        with pytest.raises(UnsupportedInputError):
            compress(series, method, 0.0)


def test_blob_is_self_describing():
    series = RNG.uniform(0, 100, 64)
    for method in LINF_METHODS + [Method.SimPiece, Method.MixPiece]:
        eb = 0.5 if method in (Method.SimPiece, Method.MixPiece) else 0.0
        blob = compress(series, method, eb)
        assert blob[-1] == int(method)
        decompress(blob)  # dispatches off the trailing byte

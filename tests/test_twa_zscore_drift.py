"""Session-5 analytics operators: time_weighted_avg, rolling_zscore,
token_distribution_drift.

Each test pins the SEMANTIC edge the oracle hash-match exercises only in
aggregate: LOCF weighting / last-point-zero-weight / single-point drop for
the time-weighted average, trailing-frame exclusion and the zero-variance
fallback for the z-score, and the integer TV formulation (disjoint -> 1,
identical mix -> 0, one-sided tokens) for drift.
"""

from __future__ import annotations

import math

import pytest

from tersets_spark.rollup import rolling_zscore, time_weighted_avg
from tersets_spark.seqops import token_distribution_drift


def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, bucket_ts long, last long"
    )


def test_twa_locf_weighting(spark):
    # 10 holds [0,60) -> 600, 20 holds [60,180) -> 2400; 40 is the right
    # boundary and carries NO weight. twa = 3000/180
    rows = [("d", "s", t, v) for t, v in [(0, 10), (60, 20), (180, 40)]]
    (r,) = time_weighted_avg(_tier(spark, rows)).collect()
    assert (r.points, r.t_first, r.t_last) == (3, 0, 180)
    assert (r.weighted_sum, r.total_elapsed) == (3000, 180)
    assert r.twa == 3000 / 180


def test_twa_single_point_series_dropped(spark):
    rows = [("a", "s", 0, 5), ("b", "s", 0, 1), ("b", "s", 60, 3)]
    out = time_weighted_avg(_tier(spark, rows)).collect()
    assert [r.doc_id for r in out] == ["b"]
    assert out[0].twa == 1.0  # only the first point carries weight


def test_twa_sparse_vs_plain_avg(spark):
    # dense 100s then one long-held 0: plain AVG = 75, TWA is gap-dominated
    rows = [("d", "s", t, v) for t, v in [(0, 100), (60, 100), (120, 100), (180, 0)]]
    # add the closing observation so the 0 actually holds
    rows.append(("d", "s", 1800, 0))
    (r,) = time_weighted_avg(_tier(spark, rows)).collect()
    assert r.weighted_sum == 100 * 60 * 3  # zeros contribute nothing
    assert r.twa == 18000 / 1800  # = 10, nowhere near the plain AVG of 60


def _series(spark, pts):
    return spark.createDataFrame(
        [("s", t, v) for t, v in pts], "source string, ts long, v long"
    )


def test_zscore_matches_population_formula(spark):
    # baseline [1,2,3] (mean 2, pop var 2/3), judged point 5
    pts = [(0, 1), (1, 2), (2, 3), (3, 5)]
    out = rolling_zscore(_series(spark, pts), ("source",), "ts", "v", window=3)
    (r,) = out.collect()
    assert (r.ts, r.v, r.frame_sum, r.frame_sumsq) == (3, 5, 6, 14)
    expected = (3 * 5 - 6) / math.sqrt(3 * 14 - 36)
    assert r.z == expected
    assert r.is_anomaly == (abs(expected) > 3.0)


def test_zscore_partial_frames_dropped(spark):
    pts = [(t, t) for t in range(5)]
    out = rolling_zscore(_series(spark, pts), ("source",), "ts", "v", window=3)
    assert sorted(r.ts for r in out.collect()) == [3, 4]


def test_zscore_flat_baseline_fallback(spark):
    # constant baseline: z undefined (NULL); any change flags, repeat doesn't
    pts = [(0, 7), (1, 7), (2, 7), (3, 7), (4, 99)]
    out = rolling_zscore(_series(spark, pts), ("source",), "ts", "v", window=3)
    got = {r.ts: (r.z, r.is_anomaly) for r in out.collect()}
    assert got[3] == (None, False)  # 7 after flat 7s: no anomaly
    assert got[4] == (None, True)  # 99 after flat 7s: anomaly, z still NULL


def test_zscore_trailing_frame_excludes_self(spark):
    # the judged spike must not inflate its own baseline: with window=2 the
    # frame for ts=2 is [10, 10], not [10, 1000]
    pts = [(0, 10), (1, 10), (2, 1000), (3, 10)]
    out = rolling_zscore(_series(spark, pts), ("source",), "ts", "v", window=2)
    got = {r.ts: r.frame_sum for r in out.collect()}
    assert got[2] == 20 and got[3] == 1010


def test_zscore_rejects_degenerate_window(spark):
    with pytest.raises(ValueError):
        rolling_zscore(_series(spark, [(0, 1)]), ("source",), "ts", "v", window=1)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(d, s, t0, toks, len(toks)) for d, s, t0, toks in rows],
        "doc_id string, source string, ts0 long, tokens array<int>, n_tok int",
    )


DAY = 86400


def test_drift_identical_mix_is_zero(spark):
    seq = _docs(spark, [("a", "s", 0, [1, 1, 2]), ("b", "s", DAY, [2, 1, 1])])
    (r,) = token_distribution_drift(seq).collect()
    assert (r.prev_ts, r.bucket_ts, r.n_prev, r.n_cur) == (0, DAY, 3, 3)
    assert (r.tv_num, r.tv) == (0, 0.0)


def test_drift_disjoint_vocab_is_one(spark):
    seq = _docs(spark, [("a", "s", 0, [1, 2]), ("b", "s", DAY, [3, 4, 5])])
    (r,) = token_distribution_drift(seq).collect()
    # one-sided tokens: each contributes |c*n_other|; sum = 2*n1*n2
    assert r.tv_num == 2 * 2 * 3
    assert r.tv == 1.0


def test_drift_hand_computed_mixture(spark):
    # day0: {1:2, 2:1} n=3; day1: {1:1, 2:2, 3:1} n=4
    # terms: |2*4-1*3|=5, |1*4-2*3|=2, |0*4-1*3|=3 -> tv_num=10, tv=10/24
    seq = _docs(spark, [("a", "s", 0, [1, 1, 2]), ("b", "s", DAY, [1, 2, 2, 3])])
    (r,) = token_distribution_drift(seq).collect()
    assert (r.tv_num, r.tv) == (10, 10 / 24)


def test_drift_sparse_windows_compare_adjacent(spark):
    # source skips day 1: the pair is (day0, day2), like counter_rate's gap
    seq = _docs(spark, [("a", "s", 0, [1]), ("b", "s", 2 * DAY, [1])])
    (r,) = token_distribution_drift(seq).collect()
    assert (r.prev_ts, r.bucket_ts, r.tv) == (0, 2 * DAY, 0.0)


def test_drift_sources_independent(spark):
    seq = _docs(
        spark,
        [
            ("a", "s1", 0, [1]),
            ("b", "s1", DAY, [2]),
            ("c", "s2", 0, [5]),
            ("d", "s2", DAY, [5]),
        ],
    )
    got = {r.source: r.tv for r in token_distribution_drift(seq).collect()}
    assert got == {"s1": 1.0, "s2": 0.0}

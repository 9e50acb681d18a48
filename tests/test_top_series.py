"""Top-K series per (source, window) by total tokens (rollup.top_series):
ranking, tie-breaks, window bucketing, and cross-window independence."""

from __future__ import annotations

import pytest

from tersets_spark.rollup import top_series


def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, bucket_ts long, sum long"
    )


def test_ranking_and_k(spark):
    rows = [("d1", "A", 0, 10), ("d1", "A", 60, 5),
            ("d2", "A", 0, 30), ("d3", "A", 0, 1)]
    out = top_series(_tier(spark, rows), k=2, window_seconds=600).collect()
    got = [(r["rank"], r["doc_id"], r["total"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, "d2", 30), (2, "d1", 15)]


def test_tie_breaks_on_doc_id(spark):
    rows = [("b", "A", 0, 7), ("a", "A", 0, 7), ("c", "A", 0, 7)]
    out = top_series(_tier(spark, rows), k=3, window_seconds=600).collect()
    got = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert got == ["a", "b", "c"]


def test_windows_rank_independently(spark):
    rows = [("d1", "A", 0, 1), ("d2", "A", 0, 2),
            ("d1", "A", 600, 9), ("d2", "A", 600, 3)]
    out = {(r["window_ts"], r["rank"]): r["doc_id"]
           for r in top_series(_tier(spark, rows), k=1,
                               window_seconds=600).collect()}
    assert out == {(0, 1): "d2", (600, 1): "d1"}


def test_sources_rank_independently(spark):
    rows = [("d1", "A", 0, 1), ("d1", "B", 0, 50), ("d2", "A", 0, 2)]
    out = {(r["source"], r["rank"]): r["doc_id"]
           for r in top_series(_tier(spark, rows), k=1,
                               window_seconds=600).collect()}
    assert out == {("A", 1): "d2", ("B", 1): "d1"}


def test_k_validation(spark):
    with pytest.raises(ValueError):
        top_series(_tier(spark, [("d", "A", 0, 1)]), k=0)


def _tier_sum(spark, rows):
    return spark.createDataFrame(
        rows, "source string, bucket_ts long, sum long"
    )


def test_top_movers_basic(spark):
    from tersets_spark.rollup import top_movers

    rows = [("A", 0, 10), ("A", 600, 40),    # delta +30
            ("B", 0, 100), ("B", 600, 95),   # delta -5
            ("C", 0, 7)]                     # first window only -> excluded
    out = top_movers(_tier_sum(spark, rows), k=2, window_seconds=600).collect()
    got = [(r["rank"], r["source"], r["delta"], r["prev_total"])
           for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, "A", 30, 10), (2, "B", -5, 100)]
    assert all(r["window_ts"] == 600 for r in out)


def test_top_movers_sparse_compares_last_seen(spark):
    from tersets_spark.rollup import top_movers

    # A misses window 600: window 1200 compares against window 0
    rows = [("A", 0, 10), ("A", 1200, 25), ("B", 0, 1), ("B", 600, 2),
            ("B", 1200, 3)]
    out = {(r["window_ts"], r["source"]): (r["delta"], r["prev_total"])
           for r in top_movers(_tier_sum(spark, rows), k=5,
                               window_seconds=600).collect()}
    assert out[(1200, "A")] == (15, 10)
    assert out[(600, "B")] == (1, 1) and out[(1200, "B")] == (1, 2)


def test_top_movers_tie_and_abs_rank(spark):
    from tersets_spark.rollup import top_movers

    rows = [("A", 0, 10), ("A", 600, 2),    # delta -8
            ("B", 0, 10), ("B", 600, 18),   # delta +8 (tie on |delta|)
            ("C", 0, 10), ("C", 600, 11)]   # delta +1
    out = top_movers(_tier_sum(spark, rows), k=3, window_seconds=600).collect()
    got = [r["source"] for r in sorted(out, key=lambda r: r["rank"])]
    assert got == ["A", "B", "C"]  # |8| ties break on source asc
    with pytest.raises(ValueError):
        top_movers(_tier_sum(spark, rows), k=0)


def test_seasonal_profile(spark):
    from tersets_spark.rollup import seasonal_profile

    # two days of a 2-phase period (1200 s period, 600 s tier)
    rows = [("A", 0, 10), ("A", 600, 1), ("A", 1200, 30), ("A", 1800, 3),
            ("B", 0, 5)]
    out = {(r["source"], r["phase"]): r
           for r in seasonal_profile(_tier_sum(spark, rows),
                                     1200, 600).collect()}
    a0 = out[("A", 0)]
    assert (a0["n_buckets"], a0["total"], a0["tmin"], a0["tmax"]) == (2, 40, 10, 30)
    assert a0["mean"] == pytest.approx(20.0)
    a1 = out[("A", 600)]
    assert (a1["n_buckets"], a1["total"]) == (2, 4)
    assert out[("B", 0)]["total"] == 5 and ("B", 600) not in out
    with pytest.raises(ValueError):
        seasonal_profile(_tier_sum(spark, rows), 1000, 600)


def test_seasonal_profile_multi_doc_folds(spark):
    from tersets_spark.rollup import seasonal_profile

    # per-doc tier rows in the same bucket fold into one bucket total
    df = spark.createDataFrame(
        [("d1", "A", 0, 3), ("d2", "A", 0, 4)],
        "doc_id string, source string, bucket_ts long, sum long")
    r = seasonal_profile(df, 1200, 600).collect()[0]
    assert (r["n_buckets"], r["total"], r["tmin"]) == (1, 7, 7)

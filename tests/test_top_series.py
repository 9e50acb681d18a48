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

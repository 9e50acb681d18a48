"""Data-completeness audit (rollup.coverage_by_window): hand-built gap
scenarios — full coverage, intra-window gaps, lead-in/tail gaps, silent
windows inside the span, span clamping, and multi-doc dedup."""

from __future__ import annotations

import pytest

from tersets_spark.rollup import coverage_by_window

W = 600  # window: 10 minutes of 1m buckets -> expected 10 when unclamped


def _tier(spark, rows):
    return spark.createDataFrame(
        [(d, s, b) for d, s, b in rows],
        "doc_id string, source string, bucket_ts long",
    )


def _run(spark, rows):
    out = coverage_by_window(_tier(spark, rows), 60, W).collect()
    return {(r["source"], r["window_ts"]): r for r in out}


def test_full_coverage(spark):
    rows = [("d", "A", i * 60) for i in range(10)]
    got = _run(spark, rows)
    r = got[("A", 0)]
    assert r["expected"] == 10 and r["present"] == 10
    assert r["coverage"] == 1.0 and r["longest_gap"] == 0
    assert len(got) == 1


def test_intra_window_gap(spark):
    # buckets 0,60 then 360,420..540: missing 120..300 (4 buckets = 240 s)
    rows = [("d", "A", b) for b in (0, 60, 360, 420, 480, 540)]
    r = _run(spark, rows)[("A", 0)]
    assert r["expected"] == 10 and r["present"] == 6
    assert r["longest_gap"] == 240
    assert r["coverage"] == pytest.approx(0.6)


def test_lead_in_and_tail_gaps(spark):
    # span [0, 1200): window 0 misses its tail, window 600 its lead-in
    rows = [("d", "A", b) for b in (0, 60, 120, 1080, 1140)]
    got = _run(spark, rows)
    r0, r1 = got[("A", 0)], got[("A", 600)]
    assert r0["expected"] == 10 and r0["present"] == 3
    assert r0["longest_gap"] == 600 - 180  # 180..600 missing
    assert r1["expected"] == 10 and r1["present"] == 2
    assert r1["longest_gap"] == 1080 - 600  # 600..1080 missing
    assert len(got) == 2


def test_silent_window_surfaces_as_zero(spark):
    # active span covers three windows; the middle one is fully silent
    rows = [("d", "A", 0), ("d", "A", 1740)]
    got = _run(spark, rows)
    r = got[("A", 600)]
    assert r["expected"] == 10 and r["present"] == 0
    assert r["coverage"] == 0.0 and r["longest_gap"] == W
    assert got[("A", 0)]["longest_gap"] == 540  # 60..600 silent
    assert got[("A", 1200)]["longest_gap"] == 540  # 1200..1740 silent


def test_span_clamping(spark):
    # source active only [300, 480): expected clamped to 3, not 10
    rows = [("d", "A", b) for b in (300, 360, 420)]
    r = _run(spark, rows)[("A", 0)]
    assert r["expected"] == 3 and r["present"] == 3
    assert r["coverage"] == 1.0 and r["longest_gap"] == 0


def test_multi_doc_dedup_and_sources(spark):
    # two docs sharing a bucket count once; sources audited independently
    rows = [("d1", "A", 0), ("d2", "A", 0), ("d1", "A", 60),
            ("d1", "B", 0)]
    got = _run(spark, rows)
    assert got[("A", 0)]["present"] == 2
    assert got[("B", 0)]["expected"] == 1 and got[("B", 0)]["coverage"] == 1.0


def test_window_must_align(spark):
    with pytest.raises(ValueError):
        coverage_by_window(_tier(spark, [("d", "A", 0)]), 60, 90)

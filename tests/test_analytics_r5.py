"""Round-5 session analytics reads: label-grouped aggregation
(group_aggregate), trailing-window grid (moving_window), series binary
op (series_ratio), stale-feed detection (absent_series), and CUSUM
changepoints (cusum_changepoints) — hand-built semantic pins, a Python
recursion replica for CUSUM, catalog-twin equality, and plan shape.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import (
    absent_from_catalog,
    cusum_from_catalog,
    group_from_catalog,
    moving_from_catalog,
    ratio_from_catalog,
    run_cascade,
)
from tersets_spark.rollup import (
    TIERS,
    absent_series,
    cusum_changepoints,
    group_aggregate,
    moving_window,
    series_ratio,
)
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r5s_seq") / "seq.parquet")
    pq.write_table(generate_sequences(240, seed=51), path)
    return path


@pytest.fixture(scope="module")
def catalog_dir(spark, seq_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r5s_cat") / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False)
    return out


def _tier(spark, rows):
    # minimal tier shape shared by the analytics reads
    return spark.createDataFrame(
        [("d", s, b, c, v, lo, hi) for s, b, c, v, lo, hi in rows],
        "doc_id string, source string, bucket_ts long, cnt long, "
        "sum long, vmin long, vmax long",
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# group_aggregate
# ---------------------------------------------------------------------------


def test_group_agg_known_answer(spark):
    rows = [
        ("A", 0, 2, 10, 1, 9),
        ("B", 0, 3, 20, 0, 15),
        ("C", 0, 5, 70, 7, 30),
        ("A", 60, 1, 5, 5, 5),
    ]
    mapping = spark.createDataFrame(
        [("A", "x"), ("B", "x"), ("C", "y")], "source string, grp string"
    )
    out = {
        (r["grp"], r["bucket_ts"]): r
        for r in group_aggregate(_tier(spark, rows), mapping).collect()
    }
    gx = out[("x", 0)]
    assert (gx["n_series"], gx["cnt"], gx["sum"]) == (2, 5, 30)
    assert (gx["vmin"], gx["vmax"]) == (0, 15)
    assert gx["mean"] == 30 / 5
    assert out[("y", 0)]["sum"] == 70
    assert out[("x", 60)]["cnt"] == 1


def test_group_agg_unmapped_falls_to_default(spark):
    rows = [("A", 0, 1, 10, 10, 10), ("Z", 0, 1, 4, 4, 4)]
    mapping = spark.createDataFrame([("A", "x")], "source string, grp string")
    out = {r["grp"]: r for r in
           group_aggregate(_tier(spark, rows), mapping).collect()}
    assert out["other"]["sum"] == 4  # Z kept, not dropped
    assert out["x"]["sum"] == 10


def test_group_agg_broadcast_plan(spark):
    rows = [("A", 0, 1, 1, 1, 1)]
    mapping = spark.createDataFrame([("A", "x")], "source string, grp string")
    plan = group_aggregate(
        _tier(spark, rows), mapping
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_group_twin_matches_direct(spark, catalog_dir):
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    mapping = (
        h1.select("source").distinct()
        .withColumn("grp", F.substring("source", 6, 1))
    )
    want = group_aggregate(h1, mapping)
    got = group_from_catalog(spark, catalog_dir, mapping, tier="1h")
    assert _rows(got) == _rows(want) and got.count() > 0


# ---------------------------------------------------------------------------
# moving_window
# ---------------------------------------------------------------------------


def test_moving_window_gap_shrinks_frame(spark):
    # buckets 0,60,120, then a gap, then 300: the trailing 3-bucket
    # (180 s) frame at 300 must NOT reach across the gap to 120
    rows = [("A", 0, 1, 1, 1, 1), ("A", 60, 1, 2, 2, 2),
            ("A", 120, 1, 4, 4, 4), ("A", 300, 1, 8, 8, 8)]
    out = {r["bucket_ts"]: r for r in
           moving_window(_tier(spark, rows), 180, 60).collect()}
    assert (out[120]["w_cnt"], out[120]["w_sum"]) == (3, 7)
    assert (out[300]["w_cnt"], out[300]["w_sum"]) == (1, 8)
    assert out[120]["w_min"] == 1 and out[120]["w_max"] == 4
    assert out[60]["w_avg"] == 3 / 2


def test_moving_window_sums_docs_first(spark):
    # two docs in one bucket collapse before the frame sees them
    rows = [("A", 0, 1, 3, 3, 3), ("A", 0, 1, 5, 5, 5)]
    r = moving_window(_tier(spark, rows), 120, 60).collect()
    assert len(r) == 1 and r[0]["x"] == 8 and r[0]["w_sum"] == 8


def test_moving_window_rejects_bad_window(spark):
    with pytest.raises(ValueError):
        moving_window(_tier(spark, []), 90, 60)


def test_moving_twin_lookback_contract(spark, catalog_dir):
    # the twin scans [start-w, end) then cuts: a cell at `start` sees its
    # full trailing context, matching a direct run over the wider slice
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    lo = int(h1.agg(F.min("bucket_ts")).head()[0])
    hi = int(h1.agg(F.max("bucket_ts")).head()[0]) + 3600
    start = lo + 2 * 3600
    w = 21600
    want = moving_window(
        h1.where((F.col("bucket_ts") >= start - w) & (F.col("bucket_ts") < hi)),
        w, TIERS["1h"],
    ).where(F.col("bucket_ts") >= start)
    got = moving_from_catalog(
        spark, catalog_dir, tier="1h", window_seconds=w, start=start, end=hi
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_moving_window_two_bounded_exchanges(spark, catalog_dir):
    # exchange 1: the (source, bucket_ts) partial-agg collapse over the
    # tier; exchange 2: re-key the COLLAPSED |sources| x buckets rows to
    # the window's source-only partitioning — data-sized shuffle happens
    # once, the frame pass moves only serving-bounded rows
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    plan = moving_window(
        h1, 21600, 3600
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "Window" in plan and plan.count("Sort") == 1


# ---------------------------------------------------------------------------
# series_ratio
# ---------------------------------------------------------------------------


def test_series_ratio_inner_matching_and_div_guard(spark):
    rows = [
        ("N", 0, 1, 10, 10, 10), ("D", 0, 1, 4, 4, 4),
        ("N", 60, 1, 7, 7, 7),                      # D absent -> dropped
        ("D", 120, 1, 5, 5, 5),                     # N absent -> dropped
        ("N", 180, 1, 9, 9, 9), ("D", 180, 1, 0, 0, 0),  # den=0 -> NULL ratio
        ("X", 0, 1, 99, 99, 99),                    # other sources ignored
    ]
    out = {r["bucket_ts"]: r for r in
           series_ratio(_tier(spark, rows), "N", "D").collect()}
    assert set(out) == {0, 180}
    assert (out[0]["num"], out[0]["den"], out[0]["diff"]) == (10, 4, 6)
    assert out[0]["ratio"] == 2.5
    assert out[180]["ratio"] is None


def test_series_ratio_rejects_same_source(spark):
    with pytest.raises(ValueError):
        series_ratio(_tier(spark, []), "A", "A")


def test_ratio_twin_matches_direct(spark, catalog_dir):
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    pair = sorted(
        r[0] for r in h1.select("source").distinct().limit(2).collect()
    )
    want = series_ratio(h1, pair[0], pair[1])
    got = ratio_from_catalog(spark, catalog_dir, pair[0], pair[1], tier="1h")
    assert _rows(got) == _rows(want) and got.count() > 0


# ---------------------------------------------------------------------------
# absent_series
# ---------------------------------------------------------------------------


def test_absent_known_answer(spark):
    # A present in cells 0 and 120 (via bucket 60), silent in 240
    # B present only in cell 0, then silent for two cells
    rows = [("A", 0, 1, 1, 1, 1), ("A", 60, 1, 1, 1, 1),
            ("A", 130, 1, 1, 1, 1),
            ("B", 10, 1, 1, 1, 1)]
    tier = spark.createDataFrame(
        [("d", s, b, c, v, lo, hi) for s, b, c, v, lo, hi in rows],
        "doc_id string, source string, bucket_ts long, cnt long, "
        "sum long, vmin long, vmax long",
    )
    out = {(r["source"], r["window_ts"]): r for r in
           absent_series(tier, 0, 360, 120).collect()}
    # A absent only in [240, 360): last_seen is bucket 130
    assert set(out) == {("A", 240), ("B", 120), ("B", 240)}
    assert out[("A", 240)]["last_seen"] == 130
    assert out[("A", 240)]["silent_for"] == 240 + 120 - 130
    assert out[("B", 120)]["last_seen"] == 10
    assert out[("B", 240)]["last_seen"] == 10
    assert out[("B", 240)]["silent_for"] == 350


def test_absent_explicit_watchlist_and_never_seen(spark):
    rows = [("A", 0, 1, 1, 1, 1)]
    out = {(r["source"], r["window_ts"]): r for r in
           absent_series(_tier(spark, rows), 0, 240, 120,
                         expected=["A", "C"]).collect()}
    # C never reported: absent in every cell with NULL last_seen,
    # silent_for measured from `start`
    assert out[("C", 0)]["last_seen"] is None
    assert out[("C", 0)]["silent_for"] == 120
    assert out[("C", 120)]["silent_for"] == 240
    assert ("A", 0) not in out and ("A", 120) in out


def test_absent_rejects_misaligned_range(spark):
    with pytest.raises(ValueError):
        absent_series(_tier(spark, []), 0, 100, 60)


def test_absent_twin_matches_direct(spark, catalog_dir):
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    lo = int(h1.agg(F.min("bucket_ts")).head()[0])
    hi = lo + 26 * 3600
    want = absent_series(
        h1.where((F.col("bucket_ts") >= lo) & (F.col("bucket_ts") < hi)),
        lo, hi, 3600,
    )
    got = absent_from_catalog(spark, catalog_dir, lo, hi, tier="1h")
    assert _rows(got) == _rows(want)


# ---------------------------------------------------------------------------
# cusum_changepoints
# ---------------------------------------------------------------------------


def _cusum_python(xs, slack, ratio):
    """Explicit Page recursion the closed form must reproduce."""
    target = sum(xs) // len(xs)
    h = target * ratio
    su = sd = 0
    out = []
    for i, x in enumerate(xs):
        su = max(0, su + (x - target - slack))
        sd = max(0, sd + (target - x - slack))
        if su > h or sd > h:
            out.append((i, su, sd, "up" if su > h else "down"))
    return target, out


@pytest.mark.parametrize("slack,ratio", [(0, 1), (2, 1), (0, 3)])
def test_cusum_matches_python_recursion(spark, slack, ratio):
    xs = [5, 5, 30, 30, 30, 1, 0, 0, 0, 5, 40, 40]
    rows = [("A", i * 60, 1, x, x, x) for i, x in enumerate(xs)]
    target, want = _cusum_python(xs, slack, ratio)
    got = sorted(
        (r["bucket_ts"] // 60, r["cusum_up"], r["cusum_dn"], r["direction"])
        for r in cusum_changepoints(
            _tier(spark, rows), slack=slack, threshold_ratio=ratio
        ).collect()
    )
    assert got == want
    if got:
        r0 = cusum_changepoints(
            _tier(spark, rows), slack=slack, threshold_ratio=ratio
        ).collect()[0]
        assert r0["target"] == target


def test_cusum_constant_series_never_alarms(spark):
    rows = [("A", i * 60, 1, 7, 7, 7) for i in range(10)]
    assert cusum_changepoints(_tier(spark, rows), 0, 1).count() == 0


def test_cusum_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        cusum_changepoints(_tier(spark, []), slack=-1)
    with pytest.raises(ValueError):
        cusum_changepoints(_tier(spark, []), threshold_ratio=0)


def test_cusum_single_exchange(spark, catalog_dir):
    # groupBy(source, bucket_ts) + both window chains re-use ONE
    # source-keyed exchange (the windows only narrow the partitioning)
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    plan = cusum_changepoints(
        h1, 0, 2
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2


def test_cusum_twin_matches_direct(spark, catalog_dir):
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    want = cusum_changepoints(h1, 0, 1)
    got = cusum_from_catalog(spark, catalog_dir, tier="1h", threshold_ratio=1)
    assert _rows(got) == _rows(want) and got.count() > 0

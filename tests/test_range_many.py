"""Batch multi-range serving (rollup.range_aggregate_many): per-range
equality with the single-range path, overlapping panels, one-scan-per-tier
plan shape, and the catalog twin."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import range_aggregate_many_from_catalog, run_cascade
from tersets_spark.rollup import (
    cascade,
    range_aggregate,
    range_aggregate_many,
)
from tersets_spark.tables import ensure_sequences, generate_sequences

RANGES = [
    (1_700_000_100, 1_700_080_000 // 60 * 60),   # 1m edges + 1h/1d interior
    (1_700_003_600 // 60 * 60, 1_700_050_000 // 60 * 60),
    (1_700_000_100, 1_700_000_400),               # short, 1m-only
    (1_700_010_000 // 60 * 60, 1_700_070_000 // 60 * 60),  # overlaps #0/#1
]


@pytest.fixture(scope="module")
def tiers(spark):
    seq = spark.read.parquet(ensure_sequences("sf0.001"))
    t = cascade(seq)
    return {k: v.localCheckpoint() for k, v in t.items()}


def _key(rows):
    return sorted(map(tuple, rows))


def test_matches_single_range_path(spark, tiers):
    many = range_aggregate_many(tiers, RANGES).collect()
    by_rid = {}
    for r in many:
        by_rid.setdefault(r["range_id"], []).append(
            (r["source"], r["cnt"], r["sum"], r["vmin"], r["vmax"], r["mean"])
        )
    for rid, (s, e) in enumerate(RANGES):
        single = range_aggregate(tiers, s, e).collect()
        want = [(r["source"], r["cnt"], r["sum"], r["vmin"], r["vmax"],
                 r["mean"]) for r in single]
        assert _key(by_rid[rid]) == _key(want), rid
        got_bounds = {(r["start"], r["end"]) for r in many
                      if r["range_id"] == rid}
        assert got_bounds == {(s, e)}


def test_one_scan_per_tier(spark, tiers):
    plan = range_aggregate_many(tiers, RANGES)._jdf.queryExecution().executedPlan().toString()
    # each tier contributes exactly one branch regardless of range count:
    # unions of 3 tier branches -> at most 3 explode generators
    assert plan.count("Generate explode") <= 3


def test_duplicate_and_empty_validation(spark, tiers):
    with pytest.raises(ValueError):
        range_aggregate_many(tiers, [])
    with pytest.raises(ValueError):
        range_aggregate_many(tiers, [(100, 100)])


def test_catalog_twin(spark, tmp_path):
    path = str(tmp_path / "seq.parquet")
    pq.write_table(generate_sequences(200, seed=53), path)
    out = str(tmp_path / "tiers")
    os.makedirs(out)
    run_cascade(spark, path, out, with_blocks=False)
    seq = spark.read.parquet(path)
    row = seq.agg(F.min("ts0"), F.max(F.col("ts0") + F.col("n_tok"))).collect()[0]
    lo = (int(row[0]) // 60 + 1) * 60
    hi = int(row[1]) // 60 * 60
    mid = ((lo + hi) // 2) // 60 * 60
    ranges = [(lo, hi), (mid, mid + 600), (lo + 60, hi - 60)]
    got = range_aggregate_many_from_catalog(spark, out, ranges).collect()
    cat = TierCatalog(out)
    tiers = {t: cat.read_tier(spark, t) for t in ("1m", "1h", "1d")}
    want = range_aggregate_many(tiers, ranges).collect()
    assert _key(map(tuple, got)) == _key(map(tuple, want))
    assert {r["range_id"] for r in got} == {0, 1, 2}


def test_gapfill_many_matches_single(spark, tiers):
    from tersets_spark.rollup import range_gapfill, range_gapfill_many

    b = 1_699_999_200  # hour-aligned floor of the sf0.001 span start
    ranges = [(b + 3_600, b + 14 * 3_600), (b + 6 * 3_600, b + 22 * 3_600),
              (b + 8 * 3_600, b + 10 * 3_600)]
    for strategy in ("locf", "linear", "null"):
        many = range_gapfill_many(tiers, ranges, 3600, strategy).collect()
        by_rid = {}
        for r in many:
            by_rid.setdefault(r["range_id"], []).append(
                (r["source"], r["bucket_ts"], r["cnt"], r["mean"],
                 r["gap_filled"]))
        for rid, (s, e) in enumerate(ranges):
            single = range_gapfill(tiers, s, e, 3600, strategy).collect()
            want = [(r["source"], r["bucket_ts"], r["cnt"], r["mean"],
                     r["gap_filled"]) for r in single]
            assert _key(by_rid.get(rid, [])) == _key(want), (strategy, rid)


def test_gapfill_many_validation_and_plan(spark, tiers):
    from tersets_spark.rollup import range_gapfill_many

    with pytest.raises(ValueError):
        range_gapfill_many(tiers, [], 3600)
    with pytest.raises(ValueError):
        range_gapfill_many(tiers, [(1_700_000_100, 1_700_003_600)], 3600)
    with pytest.raises(ValueError):
        range_gapfill_many(tiers, [(1_700_003_600, 1_700_003_600)], 3600)
    b = 1_699_999_200
    df = range_gapfill_many(
        tiers, [(b + 3_600, b + 7_200), (b + 3_600, b + 14_400)], 3600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") <= 2  # rid tagging + grid


def test_gapfill_many_catalog_twin(spark, tmp_path):
    from tersets_spark.jobs import range_gapfill_many_from_catalog
    from tersets_spark.rollup import range_gapfill_many

    path = str(tmp_path / "seq.parquet")
    pq.write_table(generate_sequences(200, seed=59), path)
    out = str(tmp_path / "tiers")
    os.makedirs(out)
    run_cascade(spark, path, out, with_blocks=False)
    seq = spark.read.parquet(path)
    row = seq.agg(F.min("ts0"), F.max(F.col("ts0") + F.col("n_tok"))).collect()[0]
    lo = (int(row[0]) // 3600 + 1) * 3600
    hi = int(row[1]) // 3600 * 3600
    ranges = [(lo, hi), (lo + 3600, hi - 3600)]
    got = range_gapfill_many_from_catalog(spark, out, ranges, 3600)
    cat = TierCatalog(out)
    want = range_gapfill_many(
        {"1h": cat.read_tier(spark, "1h")}, ranges, 3600)
    assert _key(map(tuple, got.collect())) == _key(map(tuple, want.collect()))
    assert got.count() > 0


def test_percentiles_many_matches_single(spark, tmp_path):
    from tersets_spark.jobs import (
        percentiles_in_range,
        percentiles_in_range_many,
    )

    path = str(tmp_path / "seq.parquet")
    pq.write_table(generate_sequences(150, seed=61), path)
    out = str(tmp_path / "tiers")
    os.makedirs(out)
    run_cascade(spark, path, out, with_blocks=False, with_sketches=True)
    seq = spark.read.parquet(path)
    row = seq.agg(F.min("ts0"), F.max(F.col("ts0") + F.col("n_tok"))).collect()[0]
    lo = (int(row[0]) // 60 + 1) * 60
    hi = int(row[1]) // 60 * 60
    mid = ((lo + hi) // 2) // 60 * 60
    ranges = [(lo, hi), (mid, mid + 1800), (lo + 60, mid)]
    many = percentiles_in_range_many(spark, out, ranges).collect()
    by_rid = {}
    for r in many:
        by_rid.setdefault(r["range_id"], []).append(
            (r["source"], r["pct"], r["estimate"]))
    for rid, (s, e) in enumerate(ranges):
        single = percentiles_in_range(spark, out, s, e).collect()
        want = [(r["source"], r["pct"], r["estimate"]) for r in single]
        assert _key(by_rid.get(rid, [])) == _key(want), rid
    with pytest.raises(ValueError):
        percentiles_in_range_many(spark, out, [])


def test_distinct_many_matches_single(spark, tmp_path):
    from tersets_spark.jobs import distinct_in_range, distinct_in_range_many

    path = str(tmp_path / "seq.parquet")
    pq.write_table(generate_sequences(150, seed=67), path)
    out = str(tmp_path / "tiers")
    os.makedirs(out)
    run_cascade(spark, path, out, with_blocks=False, with_sketches=True)
    seq = spark.read.parquet(path)
    row = seq.agg(F.min("ts0"), F.max(F.col("ts0") + F.col("n_tok"))).collect()[0]
    lo = (int(row[0]) // 60 + 1) * 60
    hi = int(row[1]) // 60 * 60
    mid = ((lo + hi) // 2) // 60 * 60
    ranges = [(lo, hi), (mid, mid + 1800), (lo + 60, mid)]
    many = distinct_in_range_many(spark, out, ranges)
    cols = [c for c in many.columns if c != "range_id"]
    by_rid = {}
    for r in many.collect():
        by_rid.setdefault(r["range_id"], []).append(
            tuple(r[c] for c in cols))
    for rid, (s, e) in enumerate(ranges):
        single = distinct_in_range(spark, out, s, e)
        assert list(single.columns) == cols, (single.columns, cols)
        want = [tuple(r[c] for c in cols) for r in single.collect()]
        assert _key(by_rid.get(rid, [])) == _key(want), rid
    with pytest.raises(ValueError):
        distinct_in_range_many(spark, out, [])

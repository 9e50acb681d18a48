"""Gridded percentile serving (jobs.percentile_grid_rows /
percentile_grid_many_rows + catalog twins): grid cells equal one-shot
sketches over the cell's raw points, batch == single per panel, the
catalog twin scans ONLY the coarsest dividing psk level, and misaligned
requests fail fast."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tersets_spark.jobs import (
    _sketch_points,
    merge_to_bucket,
    percentile_grid_from_catalog,
    percentile_grid_many_from_catalog,
    percentile_grid_many_rows,
    percentile_grid_rows,
    run_cascade,
)
from tersets_spark.sketch import merge_sketch, percentiles, sketch
from tersets_spark.tables import ensure_sequences

STEP = 7200
S, E = 1_699_999_200, 1_700_100_000
PANELS = [(S, E), (1_700_013_600, 1_700_064_000), (1_700_056_800, 1_700_085_600)]


@pytest.fixture(scope="module")
def tiers(spark):
    pts = _sketch_points(spark.read.parquet(ensure_sequences("sf0.001")))
    t1m = sketch(pts, ["source", "bucket_ts"], "v")
    t1h = merge_to_bucket(t1m, 3600, merge_sketch)
    t1d = merge_to_bucket(t1h, 86400, merge_sketch)
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def _oneshot_cells(spark, s, e, step):
    """Per-cell one-shot sketch percentiles straight from raw points."""
    pts = _sketch_points(spark.read.parquet(ensure_sequences("sf0.001")))
    cells = pts.where(
        (F.col("bucket_ts") >= s) & (F.col("bucket_ts") < e)
    ).withColumn("bucket_ts", (F.floor(F.col("bucket_ts") / step) * step).cast("long"))
    sk = sketch(cells, ["source", "bucket_ts"], "v")
    return percentiles(sk, ["source", "bucket_ts"], [50, 90, 99])


def test_grid_equals_oneshot_cells(spark, tiers):
    got = sorted(map(tuple, percentile_grid_rows(tiers, S, E, STEP).collect()))
    want = sorted(map(tuple, _oneshot_cells(spark, S, E, STEP).collect()))
    assert got == want and got


def test_grid_uses_coarsest_dividing_level(tiers):
    # step 7200 -> 1h level; a grid asked without that level must fail,
    # proving the plan never falls back to a finer (bigger) scan
    with pytest.raises(KeyError, match="1h"):
        percentile_grid_rows({"1m": tiers["1m"]}, S, E, STEP)
    # step 86400 -> 1d level
    day = percentile_grid_rows({"1d": tiers["1d"]}, 1_699_920_000,
                               1_700_179_200, 86400)
    assert day.count() > 0


def test_grid_many_matches_single(spark, tiers):
    many = percentile_grid_many_rows(tiers, PANELS, STEP)
    for rid, (s, e) in enumerate(PANELS):
        got = sorted(map(tuple,
                         many.where(F.col("range_id") == rid)
                         .drop("range_id").collect()))
        want = sorted(map(tuple,
                          percentile_grid_rows(tiers, s, e, STEP).collect()))
        assert got == want and got, rid


def test_grid_alignment_and_empty_errors(tiers):
    with pytest.raises(ValueError, match="aligned"):
        percentile_grid_rows(tiers, S + 60, E, STEP)
    with pytest.raises(ValueError, match="empty"):
        percentile_grid_rows(tiers, S, S, STEP)
    with pytest.raises(ValueError, match="non-empty"):
        percentile_grid_many_rows(tiers, [], STEP)


def test_catalog_twin_scans_only_serving_level(spark, tiers, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, ensure_sequences("sf0.001"), out,
                with_blocks=False, with_sketches=True)
    got = percentile_grid_from_catalog(spark, out, S, E, STEP)
    want = percentile_grid_rows(tiers, S, E, STEP)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the pruned plan reads psk_1h run files ONLY — not 1m (60x rows) or raw
    files = got.inputFiles()
    assert files and all("/psk_1h/" in f for f in files)

    many = percentile_grid_many_from_catalog(spark, out, PANELS, STEP)
    want_many = percentile_grid_many_rows(tiers, PANELS, STEP)
    assert sorted(map(tuple, many.collect())) == sorted(
        map(tuple, want_many.collect())
    )
    assert all("/psk_1h/" in f for f in many.inputFiles())

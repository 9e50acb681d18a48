"""Sketch CDF and histogram reads (sketch.cdf / sketch.histogram):
exact bucket-granularity semantics against a NumPy replay, boundary
exactness, the Python bucket_id twin vs the Spark expression, and the
range-serving catalog twins (jobs.cdf_in_range / histogram_in_range).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import (
    _sketch_points,
    cdf_in_range,
    histogram_in_range,
    run_cascade,
)
from tersets_spark.sketch import (
    SUB_BITS,
    bucket_id_of,
    cdf,
    hdr_bucket,
    histogram,
    merge_sketch,
    sketch,
)
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cdfseq") / "seq.parquet")
    pq.write_table(generate_sequences(260, seed=31), path)
    return path


@pytest.fixture(scope="module")
def catalog_dir(spark, seq_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cdfcat") / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_sketches=True)
    return out


def _vals_df(spark, vals):
    return spark.createDataFrame([("k", int(v)) for v in vals], "key string, v long")


def _np_bucket(v: int) -> int:
    bitlen = max(int(v).bit_length(), 1)
    return bitlen * (1 << SUB_BITS) + (int(v) >> max(bitlen - SUB_BITS, 0))


def test_bucket_id_twin_matches_spark_expression(spark):
    vals = [0, 1, 2, 31, 32, 33, 63, 64, 1000, 50256, (1 << 40) + 7]
    df = _vals_df(spark, vals).select("v", hdr_bucket(F.col("v")).alias("b"))
    got = {r["v"]: r["b"] for r in df.collect()}
    for v in vals:
        assert got[v] == bucket_id_of(v) == _np_bucket(v)


def test_cdf_matches_numpy_replay(spark):
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50257, 500)
    sk = sketch(_vals_df(spark, vals), ["key"], "v")
    splits = [0, 10, 500, 4096, 50256]
    out = {r["split"]: r for r in cdf(sk, ["key"], splits).collect()}
    buckets = np.array([_np_bucket(v) for v in vals])
    for s in splits:
        n_le = int((buckets <= _np_bucket(s)).sum())
        assert out[s]["n_le"] == n_le
        assert out[s]["total"] == 500
        assert out[s]["cdf"] == n_le / 500


def test_cdf_exact_on_bucket_boundary_and_monotone(spark):
    # 2^k values sit on bucket lower bounds: P(v <= 2^k) is EXACT
    vals = [1, 2, 4, 8, 16, 32, 64, 128]
    sk = sketch(_vals_df(spark, vals), ["key"], "v")
    out = {r["split"]: r["cdf"] for r in
           cdf(sk, ["key"], [1, 2, 8, 128, 1 << 20]).collect()}
    assert out[1] == 1 / 8 and out[2] == 2 / 8 and out[8] == 4 / 8
    assert out[128] == 1.0 and out[1 << 20] == 1.0
    assert list(out[k] for k in sorted(out)) == sorted(out.values())


def test_cdf_rejects_empty_splits(spark):
    with pytest.raises(ValueError):
        cdf(_vals_df(spark, [1]), ["key"], [])
    with pytest.raises(ValueError):
        bucket_id_of(-1)


def test_histogram_bounds_partition_value_domain(spark):
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 1 << 20, 400)
    sk = sketch(_vals_df(spark, vals), ["key"], "v")
    rows = sorted(histogram(sk, ["key"]).collect(), key=lambda r: r["bucket_id"])
    assert sum(r["cnt"] for r in rows) == 400
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r["lo"] <= r["hi"]
        # every absorbed value in this bucket lies inside [lo, hi]
        in_b = [v for v in vals if _np_bucket(v) == r["bucket_id"]]
        assert in_b and all(r["lo"] <= v <= r["hi"] for v in in_b)
        assert len(in_b) == r["cnt"]
    # buckets are disjoint and ordered: next lo follows previous hi
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] < b["lo"]


def test_cdf_twin_matches_oneshot_sketch(spark, seq_path, catalog_dir):
    # _sketch_points is already minute-bucketed, so a minute-aligned
    # [s, e) cut on bucket_ts equals the point-level ts cut
    seq = spark.read.parquet(seq_path)
    pts = _sketch_points(seq)
    lo = int(pts.agg(F.min("bucket_ts")).head()[0])
    s = lo + 60
    e = s + 6 * 3600
    splits = [100, 5000, 50256]
    direct = cdf(
        merge_sketch(
            sketch(
                pts.where((F.col("bucket_ts") >= s) & (F.col("bucket_ts") < e)),
                ["source", "bucket_ts"], "v",
            ),
            ["source"],
        ),
        ["source"], splits,
    )
    served = cdf_in_range(spark, catalog_dir, s, e, splits)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(served) == key(direct) and served.count() > 0


def test_histogram_twin_matches_oneshot_sketch(spark, seq_path, catalog_dir):
    seq = spark.read.parquet(seq_path)
    pts = _sketch_points(seq)
    lo = int(pts.agg(F.min("bucket_ts")).head()[0])
    s = lo + 60
    e = s + 6 * 3600
    direct = histogram(
        merge_sketch(
            sketch(
                pts.where((F.col("bucket_ts") >= s) & (F.col("bucket_ts") < e)),
                ["source", "bucket_ts"], "v",
            ),
            ["source"],
        ),
        ["source"],
    )
    served = histogram_in_range(spark, catalog_dir, s, e)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(served) == key(direct) and served.count() > 0


def test_cdf_many_matches_single_per_range(spark, seq_path, catalog_dir):
    """Batch CDF panels == per-range single reads, including an
    overlapping pair (shared sketch rows re-merge per range_id)."""
    from tersets_spark.jobs import cdf_in_range_many

    pts = _sketch_points(spark.read.parquet(seq_path))
    lo = int(pts.agg(F.min("bucket_ts")).head()[0])
    ranges = [
        (lo, lo + 6 * 3600),
        (lo + 3 * 3600, lo + 9 * 3600),   # overlaps the first
        (lo + 60, lo + 120),              # sub-hour edge
    ]
    splits = [100, 5000, 50256]
    got = cdf_in_range_many(spark, catalog_dir, ranges, splits)
    key = lambda df: sorted(map(tuple, df.collect()))
    for i, (s, e) in enumerate(ranges):
        single = cdf_in_range(spark, catalog_dir, s, e, splits)
        batch_i = got.where(F.col("range_id") == i).drop("range_id")
        assert key(batch_i) == key(single)
    assert got.count() > 0

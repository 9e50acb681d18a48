"""HDR percentile sketch (tersets_spark.sketch): bucket math, re-aggregation
exactness, and estimate error bounds."""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tersets_spark.sketch import (
    SUB_BITS,
    bucket_lower,
    hdr_bucket,
    merge_sketch,
    percentiles,
    sketch,
)


def _bucket_py(v: int, sub_bits: int = SUB_BITS) -> int:
    bitlen = len(bin(v)[2:]) if v else 1
    shift = max(bitlen - sub_bits, 0)
    return bitlen * (1 << sub_bits) + (v >> shift)


def _lower_py(bucket_id: int, sub_bits: int = SUB_BITS) -> int:
    bitlen = bucket_id >> sub_bits
    sub = bucket_id & ((1 << sub_bits) - 1)
    return sub << max(bitlen - sub_bits, 0)


@pytest.fixture(scope="module")
def sweep():
    rng = random.Random(7)
    vals = list(range(0, 130)) + [(1 << k) + d for k in range(7, 31) for d in (-1, 0, 1)]
    vals += [rng.randrange(0, 1 << 30) for _ in range(500)]
    return sorted(set(vals))


def test_bucket_matches_python_model(spark, sweep):
    df = spark.createDataFrame([(v,) for v in sweep], "v long")
    rows = (
        df.select("v", hdr_bucket(F.col("v")).alias("b"))
        .withColumn("lo", bucket_lower(F.col("b")))
        .collect()
    )
    for r in rows:
        assert r.b == _bucket_py(r.v), r.v
        assert r.lo == _lower_py(r.b), r.v


def test_bucket_monotone_and_bounded(sweep):
    prev_b = -1
    prev_v = -1
    for v in sweep:
        b = _bucket_py(v)
        lo = _lower_py(b)
        assert b >= prev_b  # monotone in value
        if b == prev_b:
            assert _lower_py(prev_b) == lo
        prev_b, prev_v = b, v
        assert lo <= v
        # relative span bound: span/lower <= 2^(1-SUB_BITS)
        if v >= (1 << SUB_BITS):
            assert (v - lo) <= lo * 2 ** (1 - SUB_BITS)
        else:
            assert lo == v  # small values are exact singletons


def test_merge_equals_direct(spark):
    """Sketch built per fine key then merged == sketch built at coarse key.

    This is the continuous-aggregate contract: per-1m-tier sketches cascade
    to 1h/1d by groupBy-sum with NO accuracy loss (exact integer counts)."""
    rng = random.Random(13)
    rows = [
        (f"src_{i % 3}", i % 50, rng.randrange(0, 21000)) for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "source string, bucket long, v int")
    fine = sketch(df, ["source", "bucket"], "v")
    merged = merge_sketch(fine, ["source"]).orderBy("source", "bucket_id")
    direct = sketch(df, ["source"], "v").orderBy("source", "bucket_id")
    assert [tuple(r) for r in merged.collect()] == [tuple(r) for r in direct.collect()]


def test_percentile_estimates_within_bound(spark):
    rng = random.Random(3)
    data = [(rng.randrange(1, 21000), "k") for _ in range(8000)]
    df = spark.createDataFrame(data, "v int, k string")
    sk = sketch(df, ["k"], "v")
    est = {r.pct: r.estimate for r in percentiles(sk, ["k"], [10, 50, 90, 99]).collect()}
    arr = np.array([v for v, _ in data])
    for p, e in est.items():
        exact = float(np.percentile(arr, p, method="inverted_cdf"))
        # estimate is the bucket lower bound containing the exact percentile
        assert e <= exact
        assert exact - e <= max(e * 2 ** (1 - SUB_BITS), 1.0), (p, e, exact)


def test_sketch_is_bounded(spark):
    """Sketch size is bounded by the bucket universe, not the data volume."""
    df = spark.range(0, 200000).select((F.col("id") % 65536).cast("int").alias("v"))
    n = sketch(df.withColumn("k", F.lit("x")), ["k"], "v").count()
    assert n <= 17 * (1 << SUB_BITS)  # bitlen <= 17 for v < 2^17


def test_negative_values_fail_fast(spark):
    df = spark.createDataFrame([(-3, "k")], "v int, k string")
    with pytest.raises(Exception, match="negative or NULL"):
        sketch(df, ["k"], "v").collect()


def test_null_values_ignored(spark):
    df = spark.createDataFrame([(5, "k"), (None, "k"), (5, "k")], "v int, k string")
    rows = sketch(df, ["k"], "v").collect()
    assert len(rows) == 1 and rows[0].cnt == 2

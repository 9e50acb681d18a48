"""Deterministic HLL distinct sketch (tersets_spark.hll): register parity
with a pure-Python md5 model, re-aggregation exactness, estimate error."""

from __future__ import annotations

import hashlib
import os
import random
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tersets_spark.hll import (
    M,
    RHO_HEX,
    RHO_SCALE,
    hll_registers,
    hll_summary,
    merge_registers,
)


def _model_registers(vals) -> dict[int, int]:
    regs: dict[int, int] = {}
    for v in set(vals):
        h = hashlib.md5(str(v).encode()).hexdigest()
        bucket = int(h[:2], 16)
        bits = bin(int(h[2 : 2 + RHO_HEX], 16))[2:].zfill(4 * RHO_HEX)
        rho = (len(bits) - len(bits.lstrip("0"))) + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_registers_match_python_model(spark):
    rng = random.Random(5)
    vals = [rng.randrange(0, 21000) for _ in range(30000)] + [0, 1, 2]
    df = spark.createDataFrame([(v, "k") for v in vals], "v int, k string")
    got = {r.bucket: r.rho for r in hll_registers(df, ["k"], "v").collect()}
    assert got == _model_registers(vals)


def test_merge_equals_direct(spark):
    """Registers built per fine key then max-merged == built at coarse key —
    the tier-cascade combine contract (1m registers -> 1h -> 1d, no loss)."""
    rng = random.Random(11)
    rows = [(f"s{i % 2}", i % 40, rng.randrange(0, 50000)) for i in range(25000)]
    df = spark.createDataFrame(rows, "source string, bucket_ts long, v int")
    fine = hll_registers(df, ["source", "bucket_ts"], "v")
    merged = merge_registers(fine, ["source"]).orderBy("source", "bucket")
    direct = hll_registers(df, ["source"], "v").orderBy("source", "bucket")
    assert [tuple(r) for r in merged.collect()] == [tuple(r) for r in direct.collect()]


def test_estimate_within_three_sigma(spark):
    rng = random.Random(3)
    vals = [rng.randrange(0, 1 << 30) for _ in range(40000)]
    df = spark.createDataFrame([(v, "k") for v in vals], "v long, k string")
    s = hll_summary(hll_registers(df, ["k"], "v"), ["k"]).collect()[0]
    exact = len(set(vals))
    rel = abs(s.estimate - exact) / exact
    assert rel < 3 * 1.04 / (M**0.5), (s.estimate, exact, rel)
    # harmonic invariant: empty buckets contribute exactly 2^49 each
    assert s.harmonic_scaled >= s.empty_buckets * RHO_SCALE
    assert s.harmonic_scaled <= M * RHO_SCALE


def test_summary_deterministic_under_partitioning(spark):
    """Same input at different parallelism -> identical summary (max/sum are
    order-insensitive; the float estimate derives from exact integers)."""
    vals = list(range(5000))
    a = spark.createDataFrame([(v, "k") for v in vals], "v int, k string").repartition(1)
    b = spark.createDataFrame([(v, "k") for v in vals], "v int, k string").repartition(13)
    ra = hll_summary(hll_registers(a, ["k"], "v"), ["k"]).collect()[0]
    rb = hll_summary(hll_registers(b, ["k"], "v"), ["k"]).collect()[0]
    assert tuple(ra) == tuple(rb)


def test_dict_hash_path_is_identical(spark):
    """Bounded-domain fast path (distinct-value dictionary + broadcast join)
    must produce the exact register table of the per-point md5 path."""
    rng = random.Random(17)
    rows = [(f"s{i % 3}", i % 20, rng.randrange(0, 21000)) for i in range(15000)]
    df = spark.createDataFrame(rows, "source string, bucket_ts long, v int")
    keys = ["source", "bucket_ts"]
    slow = hll_registers(df, keys, "v").orderBy(*keys, "bucket")
    fast = hll_registers(df, keys, "v", dict_hash=True).orderBy(*keys, "bucket")
    assert [tuple(r) for r in fast.collect()] == [tuple(r) for r in slow.collect()]


def test_null_values_ignored_on_both_paths(spark):
    """NULL v is skipped like SQL COUNT(DISTINCT): no NULL register row,
    both hash paths identical, empty_buckets unaffected."""
    rows = [(1, "k"), (2, "k"), (None, "k"), (2, "k")]
    df = spark.createDataFrame(rows, "v int, k string")
    clean = spark.createDataFrame([(1, "k"), (2, "k")], "v int, k string")
    for dh in (False, True):
        got = hll_registers(df, ["k"], "v", dict_hash=dh).orderBy("bucket")
        exp = hll_registers(clean, ["k"], "v").orderBy("bucket")
        assert [tuple(r) for r in got.collect()] == [tuple(r) for r in exp.collect()], dh
    s = hll_summary(hll_registers(df, ["k"], "v"), ["k"]).collect()[0]
    assert s.empty_buckets == M - 2

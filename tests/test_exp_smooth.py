"""Exponential smoothing (rollup.exp_smooth): EWMA + Holt level/trend
folds pinned bit-for-bit to an explicit Python recursion, seed and
single-bucket edge cases, unsorted input, and parameter variants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tersets_spark.rollup import exp_smooth


def _py_ref(vals, alpha=0.3, beta=0.1):
    e = vals[0]
    for x in vals[1:]:
        e = alpha * x + (1 - alpha) * e
    s, b = vals[0], 0.0
    for x in vals[1:]:
        s2 = alpha * x + (1 - alpha) * (s + b)
        b = beta * (s2 - s) + (1 - beta) * b
        s = s2
    return e, s, b


def _mk(spark, series):
    rows = [
        (doc, src, ts, v)
        for (doc, src), pts in series.items()
        for ts, v in pts
    ]
    return spark.createDataFrame(
        rows, "doc_id string, source string, bucket_ts long, last long"
    )


def test_folds_match_python_reference_bitwise(spark):
    vals = [10, 20, 30, 25, 40, 12, 55]
    tier = _mk(spark, {("d1", "a"): [(60 * i, v) for i, v in enumerate(vals)]})
    (r,) = exp_smooth(tier).collect()
    e, s, b = _py_ref([float(v) for v in vals])
    assert r.n_buckets == len(vals) and r.v_last == vals[-1]
    assert r.ewma == e            # bit-exact: same fold, same IEEE doubles
    assert r.holt_level == s
    assert r.holt_trend == b
    assert r.holt_forecast == s + b


def test_input_order_does_not_matter(spark):
    pts = [(180, 30), (60, 20), (0, 10), (120, 99)]
    tier = _mk(spark, {("d1", "a"): pts})
    (r,) = exp_smooth(tier).collect()
    e, s, b = _py_ref([10.0, 20.0, 99.0, 30.0])
    assert (r.ewma, r.holt_level, r.holt_trend) == (e, s, b)


def test_single_bucket_series(spark):
    tier = _mk(spark, {("d1", "a"): [(0, 42)]})
    (r,) = exp_smooth(tier).collect()
    assert (r.n_buckets, r.v_last) == (1, 42)
    assert r.ewma == 42.0 and r.holt_level == 42.0
    assert r.holt_trend == 0.0 and r.holt_forecast == 42.0


def test_alpha_beta_variants(spark):
    vals = [5, 9, 1, 14]
    tier = _mk(spark, {("d1", "a"): [(60 * i, v) for i, v in enumerate(vals)]})
    (r,) = exp_smooth(tier, alpha=0.5, beta=0.25).collect()
    e, s, b = _py_ref([float(v) for v in vals], alpha=0.5, beta=0.25)
    assert (r.ewma, r.holt_level, r.holt_trend) == (e, s, b)


def test_multiple_series_independent(spark):
    tier = _mk(
        spark,
        {
            ("d1", "a"): [(0, 10), (60, 20)],
            ("d2", "b"): [(0, 100), (60, 50), (120, 75)],
        },
    )
    got = {(r.doc_id, r.source): r for r in exp_smooth(tier).collect()}
    ea, sa, ba = _py_ref([10.0, 20.0])
    eb, sb, bb = _py_ref([100.0, 50.0, 75.0])
    assert got[("d1", "a")].ewma == ea and got[("d1", "a")].holt_level == sa
    assert got[("d2", "b")].ewma == eb and got[("d2", "b")].holt_trend == bb


def test_catalog_twin_matches_direct(spark, tmp_path):
    import os

    import pyarrow.parquet as pq

    from tersets_spark.catalog import TierCatalog
    from tersets_spark.jobs import run_cascade, smooth_from_catalog
    from tersets_spark.tables import generate_sequences

    seq_path = str(tmp_path / "seq.parquet")
    pq.write_table(generate_sequences(200, seed=61), seq_path)
    out = str(tmp_path / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False)
    h1 = TierCatalog(out).read_tier(spark, "1h")
    lo, hi = h1.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    lo, hi = int(lo), int(hi) + 3600
    want = sorted(map(tuple, exp_smooth(
        h1.where((F.col("bucket_ts") >= lo) & (F.col("bucket_ts") < hi))
    ).collect()))
    got = sorted(map(tuple, smooth_from_catalog(spark, out, lo, hi).collect()))
    assert got == want and len(got) > 0
    # a narrower range folds fewer buckets per series
    mid = (lo + hi) // 2
    full = {(t[0], t[1]): t[2] for t in got}  # (doc_id, source) -> n_buckets
    for r in smooth_from_catalog(spark, out, lo, mid).collect():
        assert r.n_buckets <= full[(r.doc_id, r.source)]


def test_custom_keys_and_value_col(spark):
    df = spark.createDataFrame(
        [("a", 0, 3), ("a", 60, 6), ("b", 0, 9)],
        "source string, bucket_ts long, v long",
    )
    got = {
        r.source: r
        for r in exp_smooth(df, keys=("source",), value_col="v").collect()
    }
    e, s, b = _py_ref([3.0, 6.0])
    assert got["a"].ewma == e and got["a"].holt_forecast == s + b
    assert got["b"].n_buckets == 1 and got["b"].ewma == 9.0

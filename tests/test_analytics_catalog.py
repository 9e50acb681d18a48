"""Catalog twins of the analytics reads (coverage/top-K/correlation):
equality vs direct computation on one snapshot, bucket-range pushdown
semantics, and the retention-horizon guard."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import (
    apply_retention,
    corr_from_catalog,
    coverage_from_catalog,
    run_cascade,
    top_from_catalog,
)
from tersets_spark.rollup import (
    TIERS,
    coverage_by_window,
    source_correlation,
    top_series,
)
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("anl_seq") / "seq.parquet")
    pq.write_table(generate_sequences(240, seed=47), path)
    return path


@pytest.fixture(scope="module")
def catalog_dir(spark, seq_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("anl_cat") / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False)
    return out


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_coverage_twin_matches_direct(spark, catalog_dir):
    m1 = TierCatalog(catalog_dir).read_tier(spark, "1m")
    want = coverage_by_window(m1, TIERS["1m"], 3600)
    got = coverage_from_catalog(spark, catalog_dir)
    assert _rows(got) == _rows(want) and got.count() > 0


def test_top_twin_matches_direct_and_range(spark, catalog_dir):
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    want = top_series(h1, 3, 86400)
    got = top_from_catalog(spark, catalog_dir, k=3)
    assert _rows(got) == _rows(want)
    # a bucket range restricts totals AND the rank itself
    lo = int(h1.agg(F.min("bucket_ts")).head()[0]) + 3600
    hi = int(h1.agg(F.max("bucket_ts")).head()[0])
    want_r = top_series(
        h1.where((F.col("bucket_ts") >= lo) & (F.col("bucket_ts") < hi)),
        3, 86400,
    )
    got_r = top_from_catalog(spark, catalog_dir, k=3, start=lo, end=hi)
    assert _rows(got_r) == _rows(want_r)


def test_corr_twin_matches_direct(spark, catalog_dir):
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    assert _rows(corr_from_catalog(spark, catalog_dir)) == _rows(
        source_correlation(h1)
    )


def test_retention_guard_on_analytics(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False)
    row = (
        spark.read.parquet(seq_path)
        .agg(F.min("ts0"), F.max(F.col("ts0") + F.col("n_tok")))
        .collect()[0]
    )
    lo, hi = int(row[0]), int(row[1])
    keep = (hi - lo) // 2
    apply_retention(spark, out, hi, {"1m": keep, "1h": keep})
    horizon = hi - keep
    for fn in (coverage_from_catalog,
               lambda s, o, **kw: top_from_catalog(s, o, **kw),
               lambda s, o, **kw: corr_from_catalog(s, o, **kw)):
        with pytest.raises(ValueError, match="retention horizon"):
            fn(spark, out)  # unbounded -> guarded at 0
        with pytest.raises(ValueError, match="retention horizon"):
            fn(spark, out, start=lo, end=hi)
    # above-horizon start serves
    assert coverage_from_catalog(spark, out, start=horizon + 60).count() > 0

"""Spark-SQL surface (tersets_spark.sql.register_views): per-tier temp
views on one manifest snapshot — equality with read_tier, cross-tier
consistency, snapshot isolation from later commits, pushdown-compatible
predicates, and name sanitization."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import run_cascade
from tersets_spark.sql import register_views
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sqlv_seq") / "seq.parquet")
    pq.write_table(generate_sequences(200, seed=67), path)
    return path


@pytest.fixture(scope="module")
def catalog_dir(spark, seq_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sqlv_cat") / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False, with_sketches=True)
    return out


def test_views_cover_committed_tiers_and_match_read_tier(spark, catalog_dir):
    views = register_views(spark, catalog_dir)
    assert {"raw", "1m", "1h", "1d"} <= set(views)
    assert any(t.startswith("psk_") for t in views)
    for tier, view in views.items():
        got = spark.sql(f"SELECT count(*) AS n FROM {view}").first().n
        want = TierCatalog(catalog_dir).read_tier(spark, tier).count()
        assert got == want, tier
    # tier names with digits sanitize into valid SQL identifiers
    assert views["1m"] == "tersets_1m"


def test_sql_aggregate_matches_dataframe_twin(spark, catalog_dir):
    register_views(spark, catalog_dir)
    got = sorted(
        map(tuple, spark.sql(
            "SELECT source, CAST(SUM(sum) AS BIGINT) AS tokens "
            "FROM tersets_1h GROUP BY source"
        ).collect())
    )
    want = sorted(
        map(tuple, TierCatalog(catalog_dir).read_tier(spark, "1h")
            .groupBy("source").agg(F.sum("sum").cast("long").alias("tokens"))
            .collect())
    )
    assert got == want and got


def test_snapshot_isolation_from_later_commits(spark, tmp_path):
    cat = TierCatalog(str(tmp_path / "t"), auto_vacuum=False)
    cat.write_partition(
        spark.range(10).withColumnRenamed("id", "v"), "1m", "src_a"
    )
    register_views(spark, str(tmp_path / "t"))
    assert spark.sql("SELECT count(*) AS n FROM tersets_1m").first().n == 10
    # a later REPLACE commit must not leak into the registered view
    cat.write_partition(
        spark.range(100, 103).withColumnRenamed("id", "v"), "1m", "src_a"
    )
    assert spark.sql("SELECT count(*) AS n FROM tersets_1m").first().n == 10
    # re-registering moves to the new snapshot
    register_views(spark, str(tmp_path / "t"))
    assert spark.sql("SELECT count(*) AS n FROM tersets_1m").first().n == 3


def test_as_of_and_prefix(spark, catalog_dir):
    snap = TierCatalog(catalog_dir).snapshot()
    views = register_views(spark, catalog_dir, as_of=snap, prefix="tt")
    assert views["1m"] == "tt_1m"
    assert spark.sql("SELECT count(*) FROM tt_1m").first()[0] > 0


def test_predicate_pushdown_through_view(spark, catalog_dir):
    register_views(spark, catalog_dir)
    df = spark.sql(
        "SELECT * FROM tersets_1m WHERE bucket_ts >= 0 AND source = 'src_00'"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "src_00" in plan

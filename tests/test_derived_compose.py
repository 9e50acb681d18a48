"""Derived recording rules composed with the rest of the engine:
serve(derived_rule=...) routing, drv_* Spark-SQL views, and incremental
refresh riding the STREAMED watermark finalize (append commits from a
structured-streaming pipeline refresh exactly like batch ingest).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.derived import (
    DERIVED_COLUMNS,
    derived_rows,
    materialize_derived,
    read_derived,
    refresh_derived,
)
from tersets_spark.jobs import run_cascade, serve
from tersets_spark.sql import register_views
from tersets_spark.streaming import finalize_streamed_tier_incremental
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def catalog_dir(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("drvc")
    seq = str(work / "seq.parquet")
    pq.write_table(generate_sequences(240, seed=71), seq)
    out = str(work / "cat")
    os.makedirs(out)
    run_cascade(spark, seq, out, with_blocks=False)
    materialize_derived(spark, out, "rate_1h")
    return out


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_serve_routes_derived_rule(spark, catalog_dir):
    full = read_derived(spark, catalog_dir, "rate_1h")
    lo = int(full.agg(F.min("bucket_ts")).head()[0]) + 3600
    hi = int(full.agg(F.max("bucket_ts")).head()[0])
    got = serve(spark, catalog_dir, lo, hi, derived_rule="rate_1h")
    want = full.where((F.col("bucket_ts") >= lo) & (F.col("bucket_ts") < hi))
    assert _rows(got) == _rows(want) and got.count() > 0
    with pytest.raises(ValueError):  # selectors stay mutually exclusive
        serve(spark, catalog_dir, lo, hi, derived_rule="rate_1h", k=5)


def test_register_views_exposes_derived_canonical_columns(spark, catalog_dir):
    views = register_views(spark, catalog_dir, prefix="drvtest")
    assert views.get("drv_rate_1h") == "drvtest_drv_rate_1h"
    df = spark.sql("SELECT * FROM drvtest_drv_rate_1h")
    assert df.columns == DERIVED_COLUMNS["rate_1h"]
    sql_total = spark.sql(
        "SELECT CAST(SUM(increase) AS BIGINT) FROM drvtest_drv_rate_1h"
    ).head()[0]
    api_total = (
        read_derived(spark, catalog_dir, "rate_1h")
        .agg(F.sum("increase")).head()[0]
    )
    assert sql_total == api_total


def test_streamed_finalize_refreshes_incrementally(spark, tmp_path):
    """Stream partials -> watermark finalize (APPEND commits) -> the
    derived refresh takes the incremental path and lands bitwise on the
    from-scratch recompute over the finalized tier."""
    from tersets_spark.streaming import stream_cascade_to_tiers

    src = str(tmp_path / "seq.parquet")
    table = generate_sequences(200, seed=73)
    pq.write_table(table, src)
    stage = str(tmp_path / "in")
    os.makedirs(stage)
    n = table.num_rows
    for i in range(2):
        pq.write_table(
            table.slice(i * n // 2, n // 2),
            os.path.join(stage, f"p{i}.parquet"),
        )
    out = str(tmp_path / "partials")
    q = stream_cascade_to_tiers(
        spark, stage, out, str(tmp_path / "ckpt"),
        with_blocks=False, max_files_per_trigger=1,
    )
    q.awaitTermination()

    cat_dir = str(tmp_path / "cat")
    os.makedirs(cat_dir)
    catalog = TierCatalog(cat_dir)
    wm_mid = 1_700_046_000
    finalize_streamed_tier_incremental(spark, out, catalog, "1h", wm_mid)
    materialize_derived(spark, cat_dir, "rate_1h")

    # the second watermark closes the rest: APPEND commits only
    finalize_streamed_tier_incremental(spark, out, catalog, "1h", 1_700_200_000)
    r = refresh_derived(spark, cat_dir, "rate_1h")
    assert r["mode"] == "incremental" and not r["conflicted"]

    h1 = catalog.read_tier(spark, "1h")
    assert _rows(read_derived(spark, cat_dir, "rate_1h")) == _rows(
        derived_rows(h1, "rate_1h")
    )


def test_maintain_refreshes_derived_after_retention(spark, tmp_path):
    """maintain(now_ts=...) with a retention policy: the derived tier
    follows the content change in the same pass, and a second maintain
    sees only compact commits -> the refresh no-ops."""
    from tersets_spark.jobs import maintain

    seq = str(tmp_path / "seq.parquet")
    pq.write_table(generate_sequences(240, seed=79), seq)
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, seq, out, with_blocks=False)
    materialize_derived(spark, out, "rate_1h")
    cat = TierCatalog(out)
    h1 = cat.read_tier(spark, "1h")
    lo = int(h1.agg(F.min("bucket_ts")).head()[0])
    hi = int(h1.agg(F.max("bucket_ts")).head()[0])
    now = hi + 3600
    res = maintain(spark, out, now_ts=now,
                   retention_policy={"1h": now - (lo + 4 * 3600)})
    assert res["derived_refreshed"].get("rate_1h") == "rebuild"
    assert res["derived_skipped"] == []
    h1b = cat.read_tier(spark, "1h")
    assert _rows(read_derived(spark, out, "rate_1h")) == _rows(
        derived_rows(h1b, "rate_1h")
    )
    res2 = maintain(spark, out)
    assert res2["derived_refreshed"].get("rate_1h") == "noop"

"""Materialized recording rules (derived.py): materialize equality,
churn-bounded incremental refresh after late-data ingest, rebuild after
non-append commits, stale-partition deletion, conflict abandonment, and
freshness-watermark semantics.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.derived import (
    DERIVED_COLUMNS,
    _commit_partitions,
    derived_rows,
    materialize_derived,
    read_derived,
    refresh_derived,
)
from tersets_spark.jobs import delete_documents, ingest_append, run_cascade
from tersets_spark.tables import generate_sequences


def _mapping(spark):
    return (
        spark.createDataFrame(
            [(f"src_{i:02d}",) for i in range(12)], "source string"
        )
        .withColumn(
            "grp",
            F.concat(
                F.lit("g"),
                (F.substring("source", 5, 2).cast("int") % 3).cast("string"),
            ),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def split_corpus(tmp_path):
    t = generate_sequences(300, seed=61)
    base = str(tmp_path / "base.parquet")
    late = str(tmp_path / "late.parquet")
    pq.write_table(t.slice(0, 240), base)
    pq.write_table(t.slice(240, 60), late)
    return base, late


@pytest.fixture()
def catalog_dir(spark, split_corpus, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, split_corpus[0], out, with_blocks=False)
    return out


def test_materialize_matches_direct(spark, catalog_dir):
    mapping = _mapping(spark)
    materialize_derived(spark, catalog_dir, "rate_1h")
    materialize_derived(spark, catalog_dir, "group_1h", mapping=mapping)
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    for rule, m in (("rate_1h", None), ("group_1h", mapping)):
        got = read_derived(spark, catalog_dir, rule)
        assert got.columns == DERIVED_COLUMNS[rule]
        assert _rows(got) == _rows(derived_rows(h1, rule, mapping=m))
        assert got.count() > 0


def test_incremental_refresh_after_ingest(spark, catalog_dir, split_corpus):
    mapping = _mapping(spark)
    materialize_derived(spark, catalog_dir, "rate_1h")
    materialize_derived(spark, catalog_dir, "group_1h", mapping=mapping)
    ingest_append(spark, split_corpus[1], catalog_dir, batch_id="late-1")
    r1 = refresh_derived(spark, catalog_dir, "rate_1h")
    r2 = refresh_derived(spark, catalog_dir, "group_1h", mapping=mapping)
    assert r1["mode"] == "incremental" and r2["mode"] == "incremental"
    assert r1["touched_buckets"] > 0 and not r1["conflicted"]
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    for rule, m in (("rate_1h", None), ("group_1h", mapping)):
        assert _rows(read_derived(spark, catalog_dir, rule)) == _rows(
            derived_rows(h1, rule, mapping=m)
        )


def test_incremental_refresh_leaves_untouched_partitions_alone(
    spark, catalog_dir, split_corpus
):
    materialize_derived(spark, catalog_dir, "rate_1h")
    cat = TierCatalog(catalog_dir)
    before = cat.current_runs("drv_rate_1h")
    # restrict the late batch to ONE source: only that source's partition
    # may move
    late = spark.read.parquet(split_corpus[1])
    one = late.select("source").distinct().limit(1).collect()[0][0]
    only = late.where(F.col("source") == one)
    ingest_append(spark, only, catalog_dir, batch_id="late-one")
    r = refresh_derived(spark, catalog_dir, "rate_1h")
    assert r["mode"] == "incremental" and r["refreshed"] == [one]
    after = cat.current_runs("drv_rate_1h")
    for part, rel in before.items():
        if part != one:
            assert after[part] == rel  # untouched partitions did not move
    assert after[one] != before[one]


def test_rebuild_after_delete_and_stale_partition_removal(
    spark, catalog_dir
):
    materialize_derived(spark, catalog_dir, "rate_1h")
    cat = TierCatalog(catalog_dir)
    h1 = cat.read_tier(spark, "1h")
    # delete EVERY document of one source: its derived partition must not
    # outlive its data. The victim must HAVE a derived partition (a
    # single-bucket source never gets rate rows), so pick the smallest
    # source among those present in the derived tier.
    drv = read_derived(spark, catalog_dir, "rate_1h")
    victim = (
        drv.groupBy("source").count().orderBy("count", "source")
        .limit(1).collect()[0][0]
    )
    assert cat.current_runs("drv_rate_1h").get(victim) is not None
    doc_ids = [
        r[0]
        for r in h1.where(F.col("source") == victim)
        .select("doc_id").distinct().collect()
    ]
    delete_documents(spark, catalog_dir, doc_ids)
    r = refresh_derived(spark, catalog_dir, "rate_1h")
    assert r["mode"] == "rebuild" and victim in r["refreshed"]
    h1b = cat.read_tier(spark, "1h")
    got = read_derived(spark, catalog_dir, "rate_1h")
    assert _rows(got) == _rows(derived_rows(h1b, "rate_1h"))
    assert got.where(F.col("source") == victim).count() == 0
    assert cat.current_runs("drv_rate_1h").get(victim) is None


def test_noop_refresh_and_unmaterialized_raises(spark, catalog_dir):
    materialize_derived(spark, catalog_dir, "rate_1h")
    r = refresh_derived(spark, catalog_dir, "rate_1h")
    assert r["mode"] == "noop" and r["refreshed"] == []
    with pytest.raises(ValueError):
        refresh_derived(spark, catalog_dir, "group_1h", mapping=_mapping(spark))
    with pytest.raises(ValueError):
        materialize_derived(spark, catalog_dir, "nope_1h")
    with pytest.raises(ValueError):
        materialize_derived(spark, catalog_dir, "group_1h")  # needs mapping


def test_conflicting_commit_is_abandoned(spark, catalog_dir):
    materialize_derived(spark, catalog_dir, "rate_1h")
    cat = TierCatalog(catalog_dir)
    h1 = cat.read_tier(spark, "1h")
    rows = derived_rows(h1, "rate_1h")
    parts = sorted(r[0] for r in rows.select("source").distinct().collect())
    # stale guard: claim every partition's expected run is a bogus rel —
    # the conditional commit must refuse and leave the live runs alone
    before = cat.current_runs("drv_rate_1h")
    committed, conflicted = _commit_partitions(
        cat, rows, "rate_1h",
        expected={p: "run=deadbeef" for p in parts},
        upstream_snapshot=cat.snapshot(),
    )
    assert committed == [] and sorted(conflicted) == parts
    assert cat.current_runs("drv_rate_1h") == before


def test_watermark_advances_and_rides_manifest_only(spark, catalog_dir):
    materialize_derived(spark, catalog_dir, "rate_1h")
    cat = TierCatalog(catalog_dir)
    marks = [
        r for r in cat.metrics()
        if r["tier"] == "drv_rate_1h" and r.get("status") == "derived_refresh"
    ]
    assert len(marks) == 1 and "path" not in marks[0]
    snap0 = marks[0]["upstream_snapshot"]
    refresh_derived(spark, catalog_dir, "rate_1h")  # noop still advances
    marks = [
        r for r in cat.metrics()
        if r["tier"] == "drv_rate_1h" and r.get("status") == "derived_refresh"
    ]
    assert len(marks) == 2 and marks[1]["upstream_snapshot"] >= snap0
    # path-less watermark records are invisible to readers
    assert "_watermark" not in cat.current_runs("drv_rate_1h")


def _alert_params(spark, catalog_dir):
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    per = h1.groupBy("source", "bucket_ts").agg(F.sum("sum").alias("x"))
    tot = per.agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("c")).first()
    return {"threshold": int(tot.s) // int(tot.c), "min_duration": 7200}


def test_alert_rule_lifecycle_and_param_pinning(
    spark, catalog_dir, split_corpus
):
    P = _alert_params(spark, catalog_dir)
    m = materialize_derived(spark, catalog_dir, "alert_1h", params=P)
    assert m["params"] == P and m["partitions"]
    ingest_append(spark, split_corpus[1], catalog_dir, batch_id="late-a")
    # refresh reuses the PINNED condition (no params arg needed)
    r = refresh_derived(spark, catalog_dir, "alert_1h")
    assert r["mode"] == "incremental" and not r["conflicted"]
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    assert _rows(read_derived(spark, catalog_dir, "alert_1h")) == _rows(
        derived_rows(h1, "alert_1h", params=P)
    )
    # matching explicit params are accepted; a drifted condition is not
    assert refresh_derived(spark, catalog_dir, "alert_1h", params=P)[
        "mode"
    ] == "noop"
    with pytest.raises(ValueError, match="pinned rule condition"):
        refresh_derived(
            spark, catalog_dir, "alert_1h",
            params={"threshold": P["threshold"] + 1, "min_duration": 7200},
        )


def test_alert_rule_requires_params(spark, catalog_dir):
    with pytest.raises(ValueError, match="needs params"):
        materialize_derived(spark, catalog_dir, "alert_1h")
    with pytest.raises(ValueError, match="takes no params"):
        materialize_derived(
            spark, catalog_dir, "rate_1h", params={"threshold": 1}
        )


def test_refresh_noop_after_compaction(spark, catalog_dir, split_corpus):
    """Compaction commits are content-identical (status='compact'): a
    refresh that sees only them must no-op, not rebuild."""
    materialize_derived(spark, catalog_dir, "rate_1h")
    ingest_append(spark, split_corpus[1], catalog_dir, batch_id="c1")
    assert refresh_derived(spark, catalog_dir, "rate_1h")["mode"] == "incremental"
    cat = TierCatalog(catalog_dir)
    assert cat.compact(spark, "1h") > 0  # folds the append runs
    r = refresh_derived(spark, catalog_dir, "rate_1h")
    assert r["mode"] == "noop"
    h1 = cat.read_tier(spark, "1h")
    assert _rows(read_derived(spark, catalog_dir, "rate_1h")) == _rows(
        derived_rows(h1, "rate_1h")
    )


def test_refresh_falls_back_when_delta_runs_vacuumed(
    spark, catalog_dir, split_corpus
):
    """Appends superseded by a compaction (their run dirs vacuumed)
    BEFORE the refresh ran: the incremental path must not undercount
    from the surviving dirs — it falls back to the per-partition
    rebuild and still lands on the exact answer."""
    materialize_derived(spark, catalog_dir, "rate_1h")
    ingest_append(spark, split_corpus[1], catalog_dir, batch_id="v1")
    cat = TierCatalog(catalog_dir)
    assert cat.compact(spark, "1h") > 0  # supersedes + vacuums the appends
    r = refresh_derived(spark, catalog_dir, "rate_1h")
    assert r["mode"] == "rebuild" and not r["conflicted"]
    h1 = cat.read_tier(spark, "1h")
    assert _rows(read_derived(spark, catalog_dir, "rate_1h")) == _rows(
        derived_rows(h1, "rate_1h")
    )

"""Per-document deletion across the core tiers (jobs.delete_documents):
exactness vs a cascade over the filtered corpus, idempotence, whole-source
deletion, and the sketch-tier skip report."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import delete_documents, run_cascade
from tersets_spark.rollup import rollup_raw, rollup_up
from tersets_spark.tables import ensure_sequences

COLS = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]


@pytest.fixture(scope="module")
def seq(spark):
    return spark.read.parquet(ensure_sequences("sf0.001"))


def test_delete_documents_exact_and_idempotent(seq, spark, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, ensure_sequences("sf0.001"), out,
                with_blocks=False, with_sketches=True)

    gate = F.substring(F.md5(F.concat(F.lit("t-del:"), F.col("doc_id"))), 1, 1) < "2"
    del_ids = seq.where(gate).select("doc_id")
    n_del = del_ids.count()
    assert n_del > 0

    report = delete_documents(spark, out, del_ids, rebuild_sketches=False)
    assert report["raw"] == n_del
    assert report["1m"] > 0 and report["1h"] > 0 and report["1d"] > 0
    assert report["sketch_tiers_skipped"] == 6  # psk_* + hll_* untouched

    cat = TierCatalog(out)
    kept = seq.where(~gate)
    # raw tier: exactly the kept doc set
    raw_docs = sorted(r[0] for r in cat.read_tier(spark, "raw")
                      .select("doc_id").collect())
    want_docs = sorted(r[0] for r in kept.select("doc_id").collect())
    assert raw_docs == want_docs
    # 1h tier: bitwise the cascade over the filtered corpus
    got = sorted(map(tuple, cat.read_tier(spark, "1h").select(*COLS).collect()))
    want = sorted(map(tuple, rollup_up(rollup_raw(kept, 60), 3600)
                      .select(*COLS).collect()))
    assert got == want and got
    # sketch tiers still readable (left untouched)
    assert cat.read_tier(spark, "psk_1h").count() > 0

    # idempotent: deleting the same ids again touches nothing
    again = delete_documents(spark, out, del_ids, rebuild_sketches=False)
    assert all(v == 0 for k, v in again.items() if k != "sketch_tiers_skipped")

    # lineage: delete commits carry per-source deleted-row counts
    recs = [r for r in cat.metrics() if r.get("status") == "delete"]
    assert sum(r.get("deleted_rows", 0) for r in recs if r["tier"] == "raw") == n_del


def test_delete_whole_source(seq, spark, tmp_path):
    """Deleting every document of a source commits a partition deletion
    (path=None) instead of an empty rewrite."""
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, ensure_sequences("sf0.001"), out, with_blocks=False)

    victim = "src_11"
    del_ids = seq.where(F.col("source") == victim).select("doc_id")
    delete_documents(spark, out, del_ids)

    cat = TierCatalog(out)
    for tier in ("raw", "1m", "1h", "1d"):
        assert cat.current_run_lists(tier)[victim] == []
        srcs = {r[0] for r in cat.read_tier(spark, tier).select("source")
                .distinct().collect()}
        assert victim not in srcs and srcs

"""Retention expiry + physical-plan-shape regression tests."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import apply_retention, run_cascade
from tersets_spark.tables import EPOCH, ensure_sequences


@pytest.fixture(scope="module")
def tiers(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tiers"))
    run_cascade(spark, ensure_sequences("sf0.001"), out, with_blocks=False, resume=False)
    return out


def test_retention_drops_only_expired_rows(spark, tiers):
    m1 = spark.read.option("basePath", os.path.join(tiers, "1m")).parquet(
        os.path.join(tiers, "1m", "source=*")
    )
    lo, hi = m1.agg(F.min("bucket_ts"), F.max("bucket_ts")).collect()[0]
    cut = (lo + hi) // 2
    now = EPOCH + 10 * 86400
    keep = now - cut  # horizon lands mid-range
    before = m1.count()
    expected_dropped = m1.filter(F.col("bucket_ts") < cut).count()
    assert 0 < expected_dropped < before

    # grace=0: this test reads the tier via a RAW directory glob below, which
    # is only manifest-consistent once superseded runs are vacuumed (the
    # default grace keeps them for concurrent readers)
    dropped = apply_retention(
        spark, tiers, now,
        policy={"1m": keep, "raw": None, "1h": None, "1d": None},
        superseded_grace_sec=0.0,
    )
    assert dropped["1m"] == expected_dropped

    after = spark.read.option("basePath", os.path.join(tiers, "1m")).parquet(
        os.path.join(tiers, "1m", "source=*")
    )
    assert after.count() == before - expected_dropped
    assert after.agg(F.min("bucket_ts")).collect()[0][0] >= cut

    # lineage: manifest carries retention records with dropped counts
    recs = [
        json.loads(line)
        for line in open(os.path.join(tiers, "_manifest.jsonl"))
        if '"retention"' in line
    ]
    assert sum(r["dropped_rows"] for r in recs) == expected_dropped
    assert all(r["tier"] == "1m" for r in recs)


def test_retention_is_two_jobs_per_tier(spark, tmp_path_factory):
    """Scale-shape regression: expiry must run as ONE count job + ONE
    partitioned rewrite job per tier — never a driver loop of per-partition
    jobs (round-1 VERDICT item 6)."""
    out = str(tmp_path_factory.mktemp("tiers_jobs"))
    run_cascade(spark, ensure_sequences("sf0.001"), out, with_blocks=False, resume=False)
    m1 = spark.read.option("basePath", os.path.join(out, "1m")).parquet(
        os.path.join(out, "1m", "source=*")
    )
    lo, hi = m1.agg(F.min("bucket_ts"), F.max("bucket_ts")).collect()[0]
    now = EPOCH + 10 * 86400
    keep = now - (lo + hi) // 2
    n_sources = m1.select("source").distinct().count()
    assert n_sources > 2  # the per-partition loop would need > 2 jobs

    sc = spark.sparkContext
    sc.setJobGroup("retention-job-count", "retention batching regression")
    try:
        dropped = apply_retention(
            spark, out, now, policy={"1m": keep, "raw": None, "1h": None, "1d": None}
        )
    finally:
        sc.setJobGroup(None, None)
    assert dropped["1m"] > 0
    job_ids = sc.statusTracker().getJobIdsForGroup("retention-job-count")
    # Two logical jobs (count agg + partitioned rewrite); AQE may surface a
    # couple extra stage-jobs, but the count must NOT scale with partition
    # count (the old driver loop ran >= 2 jobs per source).
    assert 0 < len(job_ids) <= 5, (
        f"expected O(1) Spark jobs for 1-tier retention, got {len(job_ids)}"
    )
    assert len(job_ids) < n_sources


def test_retention_default_grace_spares_superseded_run_for_readers(
    spark, tmp_path_factory
):
    """With the default reader grace, a retention rewrite leaves the
    superseded run dir on disk (a concurrent reader mid-scan keeps its
    files), while the manifest-resolved read sees only the trimmed run."""
    out = str(tmp_path_factory.mktemp("tiers_grace"))
    run_cascade(spark, ensure_sequences("sf0.001"), out, with_blocks=False, resume=False)
    cat = TierCatalog(out)
    old_runs = {
        p: os.path.join(out, "1m", rel)
        for p, rel in cat.current_runs("1m").items()
        if rel is not None
    }
    m1 = cat.read_tier(spark, "1m")
    lo, hi = m1.agg(F.min("bucket_ts"), F.max("bucket_ts")).collect()[0]
    now = EPOCH + 10 * 86400
    keep = now - (lo + hi) // 2
    before = m1.count()

    dropped = apply_retention(
        spark, out, now, policy={"1m": keep, "raw": None, "1h": None, "1d": None}
    )
    assert dropped["1m"] > 0
    # manifest read: trimmed; superseded run dirs: still present (grace)
    assert TierCatalog(out).read_tier(spark, "1m").count() == before - dropped["1m"]
    rewritten = [
        p for p, rel in TierCatalog(out).current_runs("1m").items()
        if rel is not None and os.path.join(out, "1m", rel) != old_runs.get(p)
    ]
    assert rewritten, "retention rewrote nothing?"
    spared = [p for p in rewritten if os.path.isdir(old_runs[p])]
    assert spared == rewritten, "superseded runs vacuumed despite reader grace"


def test_retention_keep_forever_is_noop(spark, tiers):
    raw_dir = os.path.join(tiers, "raw")
    before = spark.read.option("basePath", raw_dir).parquet(
        os.path.join(raw_dir, "source=*")
    ).count()
    dropped = apply_retention(
        spark, tiers, EPOCH + 10**9,
        policy={"raw": None, "1m": None, "1h": None, "1d": None},
    )
    assert dropped == {}
    after = spark.read.option("basePath", raw_dir).parquet(
        os.path.join(raw_dir, "source=*")
    ).count()
    assert after == before


# ---------------------------------------------------------------------------
# plan-shape regressions (PLANS.md invariants)
# ---------------------------------------------------------------------------


def test_rollup_plan_pushes_source_filter_and_prunes_columns(spark):
    import __spark_entry__ as entry

    df = entry.queries()["rollup_1m"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(source" in plan, "source filter not pushed to scan"
    assert "n_tok" not in plan.split("ReadSchema")[1][:300], "n_tok not pruned"


def test_knn_plan_broadcasts_probes(spark):
    import __spark_entry__ as entry

    df = entry.queries()["knn_bruteforce"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, "probe side not broadcast"


def test_multimodal_resize_and_frames_through_spark(spark):
    from tersets_spark.multimodal import frame_sample, resize_media, synthesize_media_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    media = synthesize_media_from_documents(docs)
    resized = resize_media(media, 16, 16).collect()
    assert len(resized) == 20
    assert all(len(r.payload) == 256 for r in resized)
    frames = frame_sample(media, n_frames=3)
    assert frames.count() == 60
    assert frames.groupBy("media_id").count().filter("count != 3").count() == 0


def test_salted_repartition_balances_zipf_source_key(spark):
    from tersets_spark.rollup import salted_repartition, salted_source_stats
    from tersets_spark.tables import ensure_sequences

    seq = spark.read.parquet(ensure_sequences("sf0.001"))

    # Unsalted repartition by the zipf source key: the hottest partition
    # carries ~40% of all rows (12 keys, a=1.5).
    def partition_counts(df):
        return [
            r[1] for r in df.select(F.spark_partition_id().alias("p"))
            .groupBy("p").count().collect()
        ]

    unsalted = partition_counts(seq.repartition(16, F.col("source")))
    salted = partition_counts(salted_repartition(seq, 16, "source"))
    total = seq.count()
    assert max(unsalted) > 0.3 * total, "fixture no longer skewed; update test"
    assert max(salted) < 0.15 * total, f"salting failed to spread: {sorted(salted)}"

    # And the salted two-phase aggregation is exact vs a naive groupBy.
    from tersets_spark.rollup import TIERS, rollup_raw

    m1 = rollup_raw(seq, TIERS["1m"]).cache()
    naive = {
        r.source: (r[1], r[2])
        for r in m1.groupBy("source").agg(F.count(F.lit(1)), F.sum("sum")).collect()
    }
    salted_stats = {r.source: (r.buckets, r["sum"]) for r in salted_source_stats(m1).collect()}
    assert naive == salted_stats

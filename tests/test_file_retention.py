"""Churn-bounded (file-level) retention: apply_retention(file_level=True).

The contract: bit-identical served tiers vs the full-rewrite twin, with
work proportional to data churn — wholly-expired files are dropped without
being read, wholly-kept files are hard-linked (re-referenced, the Iceberg
manifest move), and only horizon-straddling files are rewritten. On a
range-compacted partition (time-disjoint files) that is at most one
rewrite per source per pass.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import apply_retention, ingest_append, run_cascade
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fret_seq") / "seq.parquet")
    pq.write_table(generate_sequences(320, seed=23), path)
    return path


def _mid_horizon_policy(spark, seq_path, keep_frac=0.5):
    """now_ts + policy putting the horizon mid-range on every tier."""
    row = (
        spark.read.parquet(seq_path)
        .agg(F.min("ts0"), F.max(F.col("ts0") + F.col("n_tok")))
        .collect()[0]
    )
    lo, hi = int(row[0]), int(row[1])
    now = hi
    keep = int((hi - lo) * keep_frac)
    return now, {"raw": keep, "1m": keep, "1h": keep, "1d": None}


def test_file_level_matches_full_rewrite_twin(spark, seq_path, tmp_path):
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (out_a, out_b):
        os.makedirs(out)
        run_cascade(spark, seq_path, out, with_blocks=False)
    now, policy = _mid_horizon_policy(spark, seq_path)
    d_a = apply_retention(spark, out_a, now, policy, file_level=True)
    d_b = apply_retention(spark, out_b, now, policy, file_level=False)
    assert d_a == d_b and d_a["raw"] > 0
    for tier in ("raw", "1m", "1h", "1d"):
        a = TierCatalog(out_a).read_tier(spark, tier)
        b = TierCatalog(out_b).read_tier(spark, tier)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, tier
    # lineage carries the churn evidence
    recs = [r for r in TierCatalog(out_a).metrics()
            if r.get("status") == "retention" and r.get("path")]
    assert recs and all("files_rewritten" in r and "files_linked" in r for r in recs)


def test_range_compacted_partition_drops_and_links_whole_files(spark, seq_path, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False)
    cat = TierCatalog(out, superseded_grace_sec=0.0)
    # lay the 1m tier out as 8 time-disjoint files per source
    assert cat.compact(spark, "1m", max_files_per_partition=8,
                       range_partition=True) > 0
    # files within each partition must now be time-disjoint
    inodes_before = {}
    for src, runs in cat.current_run_lists("1m").items():
        files = sorted(
            os.path.join(out, "1m", runs[-1], f)
            for f in os.listdir(os.path.join(out, "1m", runs[-1]))
            if f.endswith(".parquet")
        )
        assert len(files) > 1, "range compaction must produce several files"
        ranges = []
        for f in files:
            md = pq.read_metadata(f)
            stats = [
                md.row_group(g).column(c).statistics
                for g in range(md.num_row_groups)
                for c in range(md.num_columns)
                if md.row_group(g).column(c).path_in_schema == "bucket_ts"
            ]
            ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
            for f2 in files:
                inodes_before[f2] = os.stat(f2).st_ino
        ranges.sort()
        assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1)), (
            src, ranges)

    now, policy = _mid_horizon_policy(spark, seq_path)
    before = {
        src: TierCatalog(out).read_tier(spark, "1m")
        .where(F.col("bucket_ts") >= now - policy["1m"]).count()
        for src in [None]
    }[None]
    apply_retention(spark, out, now, {"1m": policy["1m"]}, file_level=True)

    recs = [r for r in cat.metrics()
            if r["tier"] == "1m" and r.get("status") == "retention" and r.get("path")]
    assert recs
    for r in recs:
        # time-disjoint layout: at most ONE straddler rewritten per source,
        # at least one whole file dropped or linked
        assert r["files_rewritten"] <= 1, r
        assert r["files_dropped"] + r["files_linked"] >= 1, r
    # linked files are the SAME inodes — no data movement happened
    linked_inodes = set()
    for src, runs in cat.current_run_lists("1m").items():
        rd = os.path.join(out, "1m", runs[-1])
        for f in os.listdir(rd):
            if f.startswith("keep-"):
                linked_inodes.add(os.stat(os.path.join(rd, f)).st_ino)
    assert linked_inodes and linked_inodes <= set(inodes_before.values())
    # served rows: exactly the unexpired ones
    assert TierCatalog(out).read_tier(spark, "1m").count() == before
    assert TierCatalog(out).read_tier(spark, "1m").where(
        F.col("bucket_ts") < now - policy["1m"]).count() == 0


def test_file_level_folds_appended_runs_and_full_expiry_deletes(spark, seq_path, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    table = pq.read_table(seq_path)
    base, late = str(tmp_path / "base.parquet"), str(tmp_path / "late.parquet")
    pq.write_table(table.slice(0, 240), base)
    pq.write_table(table.slice(240, 80), late)
    run_cascade(spark, base, out, with_blocks=False)
    ingest_append(spark, late, out, batch_id="fr1")
    cat = TierCatalog(out)
    assert any(len(r) > 1 for r in cat.current_run_lists("raw").values())

    # horizon ABOVE all data on 1m -> every source's 1m partition deletes;
    # mid-range horizon on raw folds appended runs into one retention run
    row = spark.read.parquet(seq_path).agg(
        F.min("ts0"), F.max(F.col("ts0") + F.col("n_tok"))).collect()[0]
    lo, hi = int(row[0]), int(row[1])
    now, mid = hi + 10_000_000, (lo + hi) // 2
    dropped = apply_retention(
        spark, out, now, {"raw": now - mid, "1m": 1}, file_level=True,
    )
    assert dropped["1m"] > 0 and dropped["raw"] > 0
    with pytest.raises(FileNotFoundError):
        cat.read_tier(spark, "1m")
    # raw: appended runs folded into ONE retention run per surviving source
    lists = cat.current_run_lists("raw")
    survivors = {s: r for s, r in lists.items() if r}
    assert survivors, "mid-range horizon must leave surviving sources"
    assert all(len(r) == 1 for r in survivors.values()), survivors
    served = cat.read_tier(spark, "raw")
    expect = spark.read.parquet(seq_path).where(F.col("ts0") >= mid)
    assert served.count() == expect.count()
    assert served.select("doc_id").exceptAll(expect.select("doc_id")).count() == 0

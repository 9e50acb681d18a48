"""Watermarked incremental finalize + tombstone-committed compaction of
streamed partials — the bounded-state contract for long-lived streams:
closed buckets move into the batch catalog exactly once (across crash
windows), partials shrink to the open window, readers see identical data
throughout."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.rollup import TIERS, rollup_raw, rollup_up
from tersets_spark.streaming import (
    _COMPACT_TOMBSTONE,
    compact_streamed_partials,
    finalize_streamed_tier_incremental,
    read_streamed_tier,
    stream_cascade_to_tiers,
)
from tersets_spark.tables import ensure_sequences

# mid-span hour boundary: splits the sf0.001 1h buckets roughly in half
WM1 = 1_700_046_000
WM2 = 1_700_200_000  # beyond all data: closes every bucket


@pytest.fixture()
def streamed(spark, tmp_path):
    """Run the streamed cascade over sf0.001 split into 4 files."""
    src = ensure_sequences("sf0.001")
    stage = str(tmp_path / "in")
    os.makedirs(stage)
    table = pq.read_table(src)
    n = table.num_rows
    bounds = [i * n // 4 for i in range(5)]
    for i in range(4):
        pq.write_table(table.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       os.path.join(stage, f"part-{i}.parquet"))
    out = str(tmp_path / "tiers")
    ckpt = str(tmp_path / "ckpt")
    q = stream_cascade_to_tiers(
        spark, stage, out, ckpt, with_blocks=False, max_files_per_trigger=2,
        with_sketches=True,
    )
    q.awaitTermination()
    return out


def _batch_1h(spark):
    seq = spark.read.parquet(ensure_sequences("sf0.001"))
    return rollup_up(rollup_raw(seq, TIERS["1m"], with_blocks=False), TIERS["1h"])


COLS = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]


def test_incremental_finalize_equals_batch(spark, streamed, tmp_path):
    cat_dir = str(tmp_path / "cat")
    os.makedirs(cat_dir)
    catalog = TierCatalog(cat_dir)

    s1 = finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM1)
    assert s1["window"] == (0, WM1) and s1["rows_committed"] > 0
    assert s1["late_rows"] == 0
    # partials shrank: compact remainder holds only OPEN buckets (a bucket
    # is closed when its END is at or below the watermark)
    rem = read_streamed_tier(spark, streamed, "1h", finalize=True)
    assert rem.where(F.col("bucket_ts") <= WM1 - 3600).count() == 0
    assert rem.count() > 0

    s2 = finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM2)
    assert s2["window"] == (WM1, WM2) and s2["rows_committed"] > 0
    assert s2["late_rows"] == 0

    got = sorted(map(tuple, catalog.read_tier(spark, "1h").select(*COLS).collect()))
    want = sorted(map(tuple, _batch_1h(spark).select(*COLS).collect()))
    assert got == want and got


def test_crash_window_between_commit_and_compact(spark, streamed, tmp_path):
    """Crash after the catalog commit but before compaction (compact=False
    simulates it): the committed rows remain in the partials as leftovers —
    the next watermark window must NOT re-commit them."""
    cat_dir = str(tmp_path / "cat")
    os.makedirs(cat_dir)
    catalog = TierCatalog(cat_dir)

    finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM1,
                                       compact=False)
    # leftovers in buckets closed at WM1 are still in the partials...
    assert read_streamed_tier(spark, streamed, "1h", finalize=True).where(
        F.col("bucket_ts") <= WM1 - 3600
    ).count() > 0
    # ...and are reported as 'late' (indistinguishable from true late data
    # after a failed compaction) but never re-committed
    s2 = finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM2)
    assert s2["late_rows"] > 0

    got = sorted(map(tuple, catalog.read_tier(spark, "1h").select(*COLS).collect()))
    want = sorted(map(tuple, _batch_1h(spark).select(*COLS).collect()))
    assert got == want


def test_watermark_must_advance(spark, streamed, tmp_path):
    cat_dir = str(tmp_path / "cat")
    os.makedirs(cat_dir)
    catalog = TierCatalog(cat_dir)
    finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM1)
    with pytest.raises(ValueError, match="watermark must advance"):
        finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM1)


def test_compaction_preserves_reads_and_shrinks_state(spark, streamed):
    base = os.path.join(streamed, "1h")
    before = sorted(
        map(tuple, read_streamed_tier(spark, streamed, "1h", finalize=True)
            .select(*COLS).collect())
    )
    n_dirs_before = len([e for e in os.listdir(base) if e.startswith("batch=")])
    assert n_dirs_before >= 2

    stats = compact_streamed_partials(spark, streamed, "1h")
    assert stats["consumed_batch_dirs"] == n_dirs_before
    tomb = json.load(open(os.path.join(base, _COMPACT_TOMBSTONE)))
    assert len(tomb["compacts"]) == 1

    after = sorted(
        map(tuple, read_streamed_tier(spark, streamed, "1h", finalize=True)
            .select(*COLS).collect())
    )
    assert after == before

    # a replayed (rewritten) consumed batch dir stays invisible
    replay = os.path.join(base, tomb["consumed"][0])
    os.makedirs(replay, exist_ok=True)
    again = sorted(
        map(tuple, read_streamed_tier(spark, streamed, "1h", finalize=True)
            .select(*COLS).collect())
    )
    assert again == before

    # compacting a compaction is stable (idempotent state shape)
    stats2 = compact_streamed_partials(spark, streamed, "1h")
    assert stats2["consumed_compact_dirs"] == 1
    final = sorted(
        map(tuple, read_streamed_tier(spark, streamed, "1h", finalize=True)
            .select(*COLS).collect())
    )
    assert final == before


def test_incremental_finalize_sketch_family(spark, streamed, tmp_path):
    """The psk family follows the same watermark contract: incremental
    commits across two watermarks equal the one-shot finalize."""
    cat_dir = str(tmp_path / "cat")
    os.makedirs(cat_dir)
    catalog = TierCatalog(cat_dir)
    want = sorted(
        map(tuple, read_streamed_tier(spark, streamed, "psk_1h", finalize=True)
            .collect())
    )
    finalize_streamed_tier_incremental(spark, streamed, catalog, "psk_1h", WM1)
    finalize_streamed_tier_incremental(spark, streamed, catalog, "psk_1h", WM2)
    got = sorted(map(tuple, catalog.read_tier(spark, "psk_1h").collect()))
    assert got == want and got


# ---------------------------------------------------------------------------
# catalog append commits (the primitive under incremental finalize)
# ---------------------------------------------------------------------------


def _mk(spark, vals):
    return spark.createDataFrame(
        [(v, "src_a") for v in vals], "bucket_ts long, source string"
    )


def test_catalog_append_union_vacuum_and_compact(spark, tmp_path):
    cat = TierCatalog(str(tmp_path / "c"))
    cat.write_partition(_mk(spark, [1, 2]), "t", "src_a")
    cat.append_partition(_mk(spark, [3]), "t", "src_a", watermark_ts=10)
    cat.append_partition(_mk(spark, [4]), "t", "src_a", watermark_ts=20)

    # read unions base + both appends; vacuum (auto, ran per commit) kept all
    assert sorted(
        r["bucket_ts"] for r in cat.read_tier(spark, "t").collect()
    ) == [1, 2, 3, 4]
    assert len(cat.current_run_lists("t")["src_a"]) == 3

    # time travel: the prefix before the second append
    snap = cat.snapshot()
    cat.append_partition(_mk(spark, [5]), "t", "src_a")
    assert sorted(
        r["bucket_ts"] for r in cat.read_tier(spark, "t", as_of=snap).collect()
    ) == [1, 2, 3, 4]

    # compact folds the accumulated appends into ONE replace run
    assert cat.compact(spark, "t") == 1
    assert len(cat.current_run_lists("t")["src_a"]) == 1
    assert sorted(
        r["bucket_ts"] for r in cat.read_tier(spark, "t").collect()
    ) == [1, 2, 3, 4, 5]

    # a replace commit supersedes every appended run
    cat.append_partition(_mk(spark, [6]), "t", "src_a")
    cat.write_partition(_mk(spark, [9]), "t", "src_a")
    assert [r["bucket_ts"] for r in cat.read_tier(spark, "t").collect()] == [9]


def test_catalog_append_compact_race_rejected(spark, tmp_path):
    """A concurrent append landing between a compactor's read and its
    conditional commit changes the guard run — the stale rewrite must be
    rejected, preserving the new append."""
    cat = TierCatalog(str(tmp_path / "c"))
    cat.write_partition(_mk(spark, [1]), "t", "src_a")
    cat.append_partition(_mk(spark, [2]), "t", "src_a")
    stale_guard = cat.current_runs("t")["src_a"]
    cat.append_partition(_mk(spark, [3]), "t", "src_a")  # racing append
    ok = cat.record_if_current("t", "src_a", stale_guard,
                               path="source=src_a/run=deadbeef")
    assert not ok
    assert sorted(
        r["bucket_ts"] for r in cat.read_tier(spark, "t").collect()
    ) == [1, 2, 3]


def test_retention_over_appended_partitions(spark, streamed, tmp_path):
    """apply_retention on a catalog populated by watermark APPENDS: the
    row-level expiry reads the union of appended runs and its rewrite
    (a replace commit) supersedes all of them — reads afterwards equal
    the batch tier filtered at the horizon."""
    from tersets_spark.jobs import apply_retention

    cat_dir = str(tmp_path / "cat")
    os.makedirs(cat_dir)
    catalog = TierCatalog(cat_dir)
    finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM1)
    finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM2)

    now_ts = 1_700_090_000
    keep = 12 * 3600
    dropped = apply_retention(spark, cat_dir, now_ts, policy={"1h": keep})
    assert dropped["1h"] > 0
    horizon = now_ts - keep

    got = sorted(map(tuple, catalog.read_tier(spark, "1h").select(*COLS).collect()))
    want = sorted(map(tuple, _batch_1h(spark)
                      .where(F.col("bucket_ts") >= horizon)
                      .select(*COLS).collect()))
    assert got == want and got
    # the rewrite collapsed each source's appended runs into one
    for src, runs in catalog.current_run_lists("1h").items():
        assert len(runs) == 1, (src, runs)


def test_compaction_crash_before_tombstone_is_invisible(spark, streamed):
    """A compact dir written WITHOUT its tombstone commit (crash mid-
    compaction) must be invisible: reads see the old state unchanged, and
    the next successful compaction sweeps the orphan."""
    import shutil

    base = os.path.join(streamed, "1h")
    before = sorted(
        map(tuple, read_streamed_tier(spark, streamed, "1h", finalize=True)
            .select(*COLS).collect())
    )
    # simulate the crash: a half-written compact dir, no tombstone update
    orphan = os.path.join(base, "_compact_deadbeef0000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"not parquet")
    again = sorted(
        map(tuple, read_streamed_tier(spark, streamed, "1h", finalize=True)
            .select(*COLS).collect())
    )
    assert again == before

    stats = compact_streamed_partials(spark, streamed, "1h")
    assert not os.path.isdir(orphan)  # orphan swept after the real commit
    final = sorted(
        map(tuple, read_streamed_tier(spark, streamed, "1h", finalize=True)
            .select(*COLS).collect())
    )
    assert final == before


def test_streamed_tail_realtime_serving(spark, streamed, tmp_path):
    """read_tier_realtime_streamed: committed ∪ open partials must bitwise
    match the batch cascade at EVERY watermark stage — before any finalize
    (all-open), mid-stream (cross-batch bucket splits on both sides of the
    boundary), across the crash window (committed leftovers still in the
    partials), and after full finalize (all-committed)."""
    from tersets_spark.streaming import read_tier_realtime_streamed

    cat_dir = str(tmp_path / "cat")
    os.makedirs(cat_dir)
    catalog = TierCatalog(cat_dir)
    want = sorted(map(tuple, _batch_1h(spark).select(*COLS).collect()))

    def served():
        df = read_tier_realtime_streamed(spark, streamed, catalog, "1h")
        return sorted(map(tuple, df.select(*COLS).collect()))

    assert served() == want  # nothing finalized: all-open answer

    # crash window: commit WM1 but skip compaction — leftovers of the
    # committed buckets remain in the partials and must not double-count
    finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM1,
                                       compact=False)
    assert served() == want

    # compaction catches up; mid-stream serving still exact
    compact_streamed_partials(spark, streamed, "1h",
                              drop_below_ts=WM1 - 3600 + 1)
    assert served() == want

    # full finalize: open set empty, plain catalog read
    finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM2)
    assert served() == want


def test_alert_intervals_over_live_tail_match_batch(spark, streamed, tmp_path):
    """Alert-rule `for:` evaluation composed over the LIVE streamed tail
    (committed tier ∪ open partials at a mid-stream watermark) fires the
    exact intervals the batch cascade produces — alerting consumers never
    see a boundary artifact between finalized and open buckets."""
    from tersets_spark.rollup import alert_intervals
    from tersets_spark.streaming import read_tier_realtime_streamed

    cat_dir = str(tmp_path / "cat")
    os.makedirs(cat_dir)
    catalog = TierCatalog(cat_dir)
    finalize_streamed_tier_incremental(spark, streamed, catalog, "1h", WM1)

    batch = _batch_1h(spark)
    thr = int(batch.agg(F.expr("CAST(avg(sum) AS LONG)")).first()[0])
    want = sorted(
        map(
            tuple,
            alert_intervals(batch, thr, TIERS["1h"], 2 * 3600,
                            keys=("doc_id", "source")).collect(),
        )
    )
    live = read_tier_realtime_streamed(spark, streamed, catalog, "1h")
    got = sorted(
        map(
            tuple,
            alert_intervals(live, thr, TIERS["1h"], 2 * 3600,
                            keys=("doc_id", "source")).collect(),
        )
    )
    assert got == want and len(got) > 0

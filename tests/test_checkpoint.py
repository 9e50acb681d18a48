"""Resumable cascade: kill mid-job, resume, verify no dup/missing partitions."""

from __future__ import annotations

import time

import pyarrow.parquet as pq
import pytest

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import run_cascade
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seq") / "seq.parquet")
    pq.write_table(generate_sequences(300, seed=7), path)
    return path


def test_cascade_kill_and_resume(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")

    # first run dies after the 1m tier
    with pytest.raises(RuntimeError, match="injected failure"):
        run_cascade(spark, seq_path, out, fail_after_tier="1m")

    cat = TierCatalog(out)
    assert cat.completed("raw") and cat.completed("1m")
    assert not cat.completed("1h") and not cat.completed("1d")
    manifest_before = {(m["tier"], m["partition"]) for m in cat.metrics()}

    # resume completes only the missing tiers, reusing finished partitions
    dirs = run_cascade(spark, seq_path, out)
    manifest_after = cat.metrics()
    # no partition recorded twice
    keys = [(m["tier"], m["partition"]) for m in manifest_after]
    assert len(keys) == len(set(keys))
    assert manifest_before.issubset(set(keys))
    # per-partition lineage metrics present on every COMMIT (the fused
    # corpus-scan stage record carries wall_ms but no run dir)
    assert all(
        {"rows", "bytes_out", "wall_ms"} <= set(m)
        for m in manifest_after if m["status"] == "done"
    )
    assert any(
        m["tier"] == "raw+1m" and m["status"] == "stage" and "wall_ms" in m
        for m in manifest_after
    ), "fused corpus scan must be recorded in the lineage"

    # tier invariants: total cnt equals total tokens at every tier
    total_tokens = pq.read_table(seq_path, columns=["n_tok"])["n_tok"].to_pandas().sum()
    for tier in ("1m", "1h", "1d"):
        df = cat.read_tier(spark, tier)
        assert df.groupBy().sum("cnt").collect()[0][0] == total_tokens
    # raw tier has one blob per series
    raw = cat.read_tier(spark, "raw")
    assert raw.count() == pq.read_metadata(seq_path).num_rows

    # idempotency: fresh rerun with resume=False produces identical tier data
    out2 = str(tmp_path / "tiers2")
    run_cascade(spark, seq_path, out2)
    for tier in ("1m", "1h", "1d"):
        a = cat.read_tier(spark, tier)
        b = TierCatalog(out2).read_tier(spark, tier)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert dirs["1d"].endswith("1d")


def test_crash_inside_commit_window_resumes_clean(spark, seq_path, tmp_path):
    """Object-store-safe commits (round-1 VERDICT item 7): kill the job
    AFTER a partition's data directory is in place but BEFORE its manifest
    record lands. The orphan run dir must stay invisible to readers, and
    the resume must re-commit the partition with no duplicate or missing
    rows."""
    import pyarrow.parquet as pq

    from tersets_spark.catalog import TierCatalog

    out = str(tmp_path / "tiers")
    real_record = TierCatalog.record
    calls = {"n": 0}

    def crashing_record(self, tier, partition, status="done", **metrics):
        calls["n"] += 1
        if calls["n"] == 3:  # third commit: data moved, manifest append "lost"
            raise RuntimeError("injected crash between data move and manifest append")
        return real_record(self, tier, partition, status=status, **metrics)

    TierCatalog.record = crashing_record
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            run_cascade(spark, seq_path, out, with_blocks=False, resume=False)
    finally:
        TierCatalog.record = real_record

    cat = TierCatalog(out)
    # the orphan run dir exists on disk but is NOT visible to readers
    raw_runs = cat.current_runs("raw")
    committed = {p for p, rel in raw_runs.items() if rel is not None}
    import os

    on_disk = {
        d.split("=", 1)[1]
        for d in os.listdir(os.path.join(out, "raw"))
        if d.startswith("source=")
    }
    assert committed < on_disk, "expected an uncommitted orphan partition dir"
    assert len(cat.read_tier(spark, "raw").select("source").distinct().collect()) == len(
        committed
    )

    # resume: completes everything, exactly one current run per partition
    run_cascade(spark, seq_path, out)
    total_tokens = pq.read_table(seq_path, columns=["n_tok"])["n_tok"].to_pandas().sum()
    for tier in ("1m", "1h", "1d"):
        assert cat.read_tier(spark, tier).groupBy().sum("cnt").collect()[0][0] == total_tokens
    assert cat.read_tier(spark, "raw").count() == pq.read_metadata(seq_path).num_rows
    # vacuum invariant: no orphan/superseded run dirs survive the resume
    for tier in ("raw", "1m", "1h", "1d"):
        assert cat.vacuum(tier) == 0


def test_torn_copy_is_invisible_and_vacuumed(spark, seq_path, tmp_path):
    """A half-copied (torn) run directory — what a non-atomic object-store
    rename leaves behind — is ignored by manifest-resolved reads and
    removed by vacuum."""
    import os

    from tersets_spark.catalog import TierCatalog

    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out, with_blocks=False, resume=False)
    cat = TierCatalog(out)
    before = cat.read_tier(spark, "1m").count()

    # simulate a torn copy: stray run dir with a partial file, never committed
    some_src = sorted(cat.current_runs("1m"))[0]
    torn = os.path.join(out, "1m", f"source={some_src}", "run=deadbeef")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00" * 128)  # not even valid parquet
    # age it past the orphan grace window (a FRESH unreferenced dir is
    # treated as a possibly in-flight concurrent commit and kept)
    old = time.time() - cat.orphan_grace_sec - 60
    os.utime(torn, (old, old))

    assert cat.read_tier(spark, "1m").count() == before  # reader never sees it
    assert cat.vacuum("1m") == 1
    assert not os.path.exists(torn)
    assert cat.read_tier(spark, "1m").count() == before


def test_time_travel_reads_with_vacuum_disabled(spark, tmp_path):
    """Snapshot semantics: with auto_vacuum off, every manifest prefix is a
    readable table state; vacuum() then expires history (Iceberg's
    expire_snapshots trade)."""
    from tersets_spark.catalog import TierCatalog

    cat = TierCatalog(str(tmp_path / "t"), auto_vacuum=False)
    df1 = spark.range(10).withColumnRenamed("id", "v")
    df2 = spark.range(100, 103).withColumnRenamed("id", "v")
    cat.write_partition(df1, "1m", "src_a")
    snap1 = cat.snapshot()
    cat.write_partition(df2, "1m", "src_a")  # supersedes df1

    assert cat.read_tier(spark, "1m").count() == 3
    assert cat.read_tier(spark, "1m", as_of=snap1).count() == 10  # time travel
    assert cat.vacuum("1m") == 1  # expire the superseded run
    assert cat.read_tier(spark, "1m").count() == 3


def test_vacuum_spares_concurrent_inflight_commit(tmp_path):
    """Round-2 ADVICE / VERDICT item 7: writer B has moved its run dir into
    place but not yet appended the manifest record when writer A runs a
    global vacuum. B's in-flight dir must survive (orphan grace), B's commit
    must then become visible, and a SUPERSEDED run must still be vacuumed
    immediately. Pure catalog-level interleaving — deterministic, no race."""
    import os

    base = str(tmp_path / "t")
    a = TierCatalog(base, auto_vacuum=False)
    b = TierCatalog(base, auto_vacuum=False)

    def stage(cat, tier, part, marker):
        d = str(tmp_path / f"stage_{marker}")
        os.makedirs(d)
        with open(os.path.join(d, "data.parquet"), "wb") as f:
            f.write(marker.encode())
        return d

    # A commits partition p1 fully
    a.commit_moved_partition("1m", "p1", stage(a, "1m", "p1", "a1"))

    # B: data move done for p2, manifest append NOT yet done (in-flight)
    rel_b, dest_b = b._new_run_dir("1m", "p2")
    os.makedirs(os.path.dirname(dest_b), exist_ok=True)
    os.rename(stage(b, "1m", "p2", "b1"), dest_b)

    # A's global vacuum runs NOW — must not delete B's fresh in-flight dir
    assert a.vacuum("1m") == 0
    assert os.path.exists(dest_b), "vacuum deleted a concurrent in-flight commit"

    # B finishes its commit; a reader resolves both partitions
    b.record("1m", "p2", path=rel_b, bytes_out=0)
    runs = b.current_runs("1m")
    assert set(runs) == {"p1", "p2"}
    assert all(os.path.exists(os.path.join(base, "1m", rel)) for rel in runs.values())

    # a SUPERSEDED (manifest-referenced) run is vacuumed immediately, fresh
    # or not — only never-referenced dirs get the grace window
    a.commit_moved_partition("1m", "p1", stage(a, "1m", "p1", "a2"))
    assert a.vacuum("1m") == 1  # the first p1 run
    assert os.path.exists(dest_b)


def test_record_if_current_rejects_stale_rewrite(tmp_path):
    """Compaction's optimistic-concurrency commit: a maintenance rewrite
    derived from run R must NOT supersede a run a concurrent writer
    committed after R was read. record_if_current checks-and-appends under
    the manifest lock and reports the conflict instead."""
    base = str(tmp_path / "t")
    cat = TierCatalog(base, auto_vacuum=False)
    cat.record("1m", "p1", path="source=p1/run=aaaa", bytes_out=0)

    # concurrent writer supersedes while the "compactor" holds rel=run=aaaa
    cat.record("1m", "p1", path="source=p1/run=bbbb", bytes_out=0)

    before = cat.snapshot()
    ok = cat.record_if_current(
        "1m", "p1", "source=p1/run=aaaa", path="source=p1/run=cccc", bytes_out=0
    )
    assert not ok, "stale rewrite must be rejected"
    assert cat.snapshot() == before, "rejected commit must append nothing"
    assert cat.current_runs("1m")["p1"] == "source=p1/run=bbbb"

    # and a NON-stale conditional commit goes through
    ok = cat.record_if_current(
        "1m", "p1", "source=p1/run=bbbb", path="source=p1/run=dddd", bytes_out=0
    )
    assert ok
    assert cat.current_runs("1m")["p1"] == "source=p1/run=dddd"


def test_m1_source_modes_bit_identical(spark, seq_path, tmp_path):
    """fused (default), raw-decode, and input-rescan 1m builds must commit
    bit-identical tiers (incl. the per-bucket block blobs)."""
    outs = {}
    for mode in ("fused", "raw", "input"):
        out = str(tmp_path / mode)
        run_cascade(spark, seq_path, out, m1_source=mode)
        outs[mode] = TierCatalog(out)
    for tier in ("raw", "1m", "1h", "1d"):
        ref = outs["input"].read_tier(spark, tier)
        cols = sorted(ref.columns)
        for mode in ("fused", "raw"):
            got = outs[mode].read_tier(spark, tier)
            assert sorted(got.columns) == cols, (mode, tier)
            assert got.count() == ref.count(), (mode, tier)
            assert got.select(cols).exceptAll(ref.select(cols)).count() == 0, (mode, tier)


def test_m1_source_typo_rejected(spark, seq_path, tmp_path):
    """An unrecognized m1_source must raise, not silently fall through to
    the two-scan input-rescan shape."""
    with pytest.raises(ValueError, match="m1_source"):
        run_cascade(spark, seq_path, str(tmp_path / "t"), m1_source="Fused")


def test_fused_cascade_resume_after_raw_uses_blob_fallback(spark, seq_path, tmp_path):
    """Kill the fused cascade right after the raw commit: the resume finds
    raw committed and 1m pending, takes the decode-from-raw fallback (no
    input rescan), and completes with no duplicate/missing partitions and
    no staging leftovers."""
    import os

    out = str(tmp_path / "t")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_cascade(spark, seq_path, out, fail_after_tier="raw")
    cat = TierCatalog(out)
    assert cat.completed("raw") and not cat.completed("1m")

    run_cascade(spark, seq_path, out)
    keys = [(m["tier"], m["partition"]) for m in cat.metrics()]
    assert len(keys) == len(set(keys))
    assert not [d for d in os.listdir(out) if d.startswith("_tmp_")]

    ref_out = str(tmp_path / "ref")
    run_cascade(spark, seq_path, ref_out, m1_source="input")
    for tier in ("1m", "1h", "1d"):
        a = cat.read_tier(spark, tier)
        b = TierCatalog(ref_out).read_tier(spark, tier)
        cols = sorted(a.columns)
        assert a.select(cols).exceptAll(b.select(cols)).count() == 0, tier
        assert b.select(cols).exceptAll(a.select(cols)).count() == 0, tier


def test_pin_gives_cross_tier_snapshot_consistency(spark, tmp_path):
    """A consumer joining two tiers under a concurrently-committing cascade
    must see ONE manifest prefix. Interleave a full-cascade commit between
    the consumer's 1m read and its 1h read: latest-read semantics serve
    mixed versions (the documented gap), pinned reads stay consistent."""
    base = str(tmp_path / "t")
    cat = TierCatalog(base, auto_vacuum=False)

    def commit_version(v: int):
        for tier in ("1m", "1h"):
            cat.write_partition(
                spark.createDataFrame([(v,)], "version long"), tier, "p0"
            )

    commit_version(1)

    # --- latest-read consumer: cascade commits BETWEEN its two tier reads
    v_1m = cat.read_tier(spark, "1m").head().version
    commit_version(2)  # concurrent cascade
    v_1h = cat.read_tier(spark, "1h").head().version
    assert (v_1m, v_1h) == (1, 2), "latest reads should expose the race"

    # --- pinned consumer: same interleaving, one manifest prefix
    snap = cat.pin()
    v_1m = cat.read_tier(spark, "1m").head().version
    commit_version(3)  # concurrent cascade
    v_1h = cat.read_tier(spark, "1h").head().version
    assert v_1m == v_1h == 2, f"pinned reads diverged: {v_1m} vs {v_1h}"

    # explicit as_of on another handle resolves the same snapshot
    other = TierCatalog(base, auto_vacuum=False)
    assert other.read_tier(spark, "1h", as_of=snap).head().version == 2

    # unpin restores latest-read semantics
    cat.unpin()
    assert cat.read_tier(spark, "1h").head().version == 3


def test_plain_record_serializes_with_conditional_commits(tmp_path):
    """Every manifest append — including plain record() commits — must go
    through the same sidecar flock record_if_current uses, or a concurrent
    writer's commit can interleave between a compactor's currency check and
    its append (the exact clobber the guard documents). Pin it by holding
    the lock and verifying record() blocks until release."""
    import threading
    import time as _time

    base = str(tmp_path / "t")
    cat = TierCatalog(base, auto_vacuum=False)
    cat.record("1m", "p1", path="source=p1/run=aaaa", bytes_out=0)

    appended = threading.Event()

    def writer():
        cat.record("1m", "p1", path="source=p1/run=bbbb", bytes_out=0)
        appended.set()

    with cat._manifest_lock():
        t = threading.Thread(target=writer)
        t.start()
        # the plain commit must NOT land while the lock is held
        assert not appended.wait(timeout=0.5), "record() bypassed the manifest lock"
        assert cat.current_runs("1m")["p1"] == "source=p1/run=aaaa"
    t.join(timeout=10)
    assert appended.is_set(), "record() never completed after lock release"
    assert cat.current_runs("1m")["p1"] == "source=p1/run=bbbb"


def test_two_concurrent_cascades_converge(spark, seq_path, tmp_path):
    """Two cascades racing on the SAME catalog (threads sharing the session,
    both resume=False so every partition is committed twice): every reader
    snapshot along the way must resolve to existing run dirs, and the final
    table must be exact."""
    import threading

    out = str(tmp_path / "tiers")
    errors = []

    def worker():
        try:
            run_cascade(spark, seq_path, out, with_blocks=False, resume=False)
        except Exception as e:  # surface thread failures in the main thread
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    cat = TierCatalog(out)
    total_tokens = pq.read_table(seq_path, columns=["n_tok"])["n_tok"].to_pandas().sum()
    for tier in ("1m", "1h", "1d"):
        # consistent snapshot: every current run dir exists on disk
        import os

        for rel in cat.current_runs(tier).values():
            assert rel is None or os.path.exists(os.path.join(out, tier, rel))
        assert cat.read_tier(spark, tier).groupBy().sum("cnt").collect()[0][0] == total_tokens
    assert cat.read_tier(spark, "raw").count() == pq.read_metadata(seq_path).num_rows


def test_compaction_rewrites_small_files_preserving_data(spark, tmp_path):
    """Iceberg-style rewrite_data_files: many small files -> one file per
    partition via an ordinary superseding manifest commit; rows identical,
    superseded run vacuumed (default grace 0), metrics recorded."""
    import os

    cat = TierCatalog(str(tmp_path / "t"))
    df = spark.range(1000).withColumnRenamed("id", "v").repartition(8)
    cat.write_partition(df, "1m", "src_a")
    run0 = os.path.join(cat.base_dir, "1m", cat.current_runs("1m")["src_a"])
    n_before = sum(1 for f in os.listdir(run0) if f.endswith(".parquet"))
    assert n_before > 1
    before = {r["v"] for r in cat.read_tier(spark, "1m").collect()}

    assert cat.compact(spark, "1m") == 1
    run1 = os.path.join(cat.base_dir, "1m", cat.current_runs("1m")["src_a"])
    assert run1 != run0 and not os.path.exists(run0)  # superseded + vacuumed
    n_after = sum(1 for f in os.listdir(run1) if f.endswith(".parquet"))
    assert n_after == 1
    assert {r["v"] for r in cat.read_tier(spark, "1m").collect()} == before
    rec = [m for m in cat.metrics() if m.get("compacted_from")]
    assert rec and rec[-1]["compacted_from"] == n_before
    # second pass: already compact, nothing to do
    assert cat.compact(spark, "1m") == 0

"""Iceberg-style tier catalog: immutable run directories + a manifest log
whose append is the COMMIT POINT.

No Iceberg runtime jar ships with the sandbox's pyspark (verified in
SURVEY.md §7), so this module implements the same commit contract over
plain parquet:

* every partition write lands in a fresh, never-renamed run directory
  ``<tier>/source=<p>/run=<hex>/`` — data files are immutable once written
  (object-store-safe: no rename is ever relied on for atomicity);
* a write becomes visible ONLY when its manifest record (carrying the run
  path, lineage and throughput metrics) is appended — readers resolve the
  current run per partition from the manifest, so a crash before the
  append leaves an invisible orphan directory, never a torn table;
* superseded / orphaned run directories are removed by :meth:`vacuum`
  (called by committers here; an object-store deployment would delay it
  past reader grace, exactly like Iceberg's ``expire_snapshots``).

The layout keeps ``source``/``run`` as Hive-style key=value segments, so a
plain ``spark.read.parquet`` over a vacuumed table sees the same rows as
:meth:`read_tier` — the manifest is authoritative, the directory tree is
merely consistent with it after vacuum.

Resumability (north_rule): a job enumerates its partitions, anti-joins the
manifest's completed set, and processes only the remainder; re-processing
a partition commits a new run that supersedes the old one, so a killed job
resumes with no duplicate or missing partitions (tests/test_checkpoint.py,
including a crash injected inside the commit window).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TierCatalog:
    def __init__(
        self, base_dir: str, auto_vacuum: bool = True,
        orphan_grace_sec: float = 600.0,
        superseded_grace_sec: float = 0.0,
    ):
        """``auto_vacuum=False`` keeps superseded run dirs on disk, which
        makes every manifest prefix a readable SNAPSHOT (time travel via
        ``read_tier(..., as_of=n)``) until an explicit :meth:`vacuum` —
        the same trade Iceberg's ``expire_snapshots`` makes.

        ``orphan_grace_sec``: a run dir the manifest has NEVER referenced is
        indistinguishable from another writer's in-flight commit (between
        its dir move and its manifest append), so vacuum only deletes such
        orphans once they are older than this grace window. Runs that ARE
        in the manifest but superseded are deleted immediately — they were
        committed, so no writer is still mid-commit on them. This is what
        makes two cascades racing on one catalog safe (Iceberg's
        remove_orphan_files makes the identical time-based trade).

        ``superseded_grace_sec``: how long a REPLACED run stays on disk
        after a newer commit supersedes it. 0 (default) = expire
        immediately — right for explicit vacuums and single-writer jobs.
        Concurrent WRITER+READER deployments set this > 0 (jobs.run_cascade
        uses 600 s) so a reader that resolved the old run from the manifest
        can still finish scanning it — Iceberg's snapshot-retention trade;
        aged leftovers are collected by any later vacuum."""
        self.base_dir = base_dir
        self.auto_vacuum = auto_vacuum
        self.orphan_grace_sec = orphan_grace_sec
        self.superseded_grace_sec = superseded_grace_sec
        os.makedirs(base_dir, exist_ok=True)
        self.manifest_path = os.path.join(base_dir, "_manifest.jsonl")
        self._pinned: int | None = None

    # -- manifest ----------------------------------------------------------
    def completed(self, tier: str) -> set[str]:
        done: set[str] = set()
        for rec in self.metrics():
            if rec["tier"] == tier and rec["status"] == "done":
                done.add(rec["partition"])
        return done

    def _manifest_lock(self):
        """Exclusive sidecar flock serializing ALL manifest appends (readers
        never lock). Returned as a context manager; flock is per open file
        description, so each acquisition opens its own fd — holders must
        not nest (internal appends under the lock go through
        :meth:`_append_record`, which does not lock)."""
        import contextlib
        import fcntl

        @contextlib.contextmanager
        def _held():
            with open(self.manifest_path + ".lock", "a") as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lockf, fcntl.LOCK_UN)

        return _held()

    def _append_record(self, rec: dict) -> None:
        """Unsynchronized manifest append — call ONLY under _manifest_lock."""
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def record(self, tier: str, partition: str, status: str = "done", **metrics) -> None:
        """Append one manifest record — THE commit point for a run dir.

        Every append takes the manifest sidecar flock, so a conditional
        committer's check-then-append (:meth:`record_if_current`) is atomic
        against ALL writers, not just other lock holders — a plain commit
        can never interleave between a compactor's currency check and its
        append. (POSIX single-line appends are atomic on their own, but
        atomicity of the *check+append pair* needs every appender to share
        the lock.) An object-store port would put one immutable manifest
        object per commit instead."""
        rec = {
            "tier": tier,
            "partition": partition,
            "status": status,
            "wall_clock_unix": time.time(),
            **metrics,
        }
        with self._manifest_lock():
            self._append_record(rec)

    def record_if_current(
        self, tier: str, partition: str, expected_rel: str | None,
        status: str = "done", **metrics,
    ) -> bool:
        """Conditional commit: append ONLY if ``partition``'s current run is
        still ``expected_rel`` — the optimistic-concurrency check an
        Iceberg ``rewrite_data_files`` does at commit time. A maintenance
        rewrite (compaction) derived from run R must not supersede a run a
        concurrent WRITER committed after R was read: check + append are
        atomic under the same exclusive manifest lock every :meth:`record`
        takes. Returns False (nothing appended) on conflict; the caller
        abandons its rewrite."""
        with self._manifest_lock():
            if self.current_runs(tier).get(partition) != expected_rel:
                return False
            self._append_record({
                "tier": tier,
                "partition": partition,
                "status": status,
                "wall_clock_unix": time.time(),
                **metrics,
            })
            return True

    def metrics(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f]

    def snapshot(self) -> int:
        """Current snapshot id == number of manifest records; pass to
        ``read_tier(as_of=...)`` for a consistent historical read (valid
        while superseded run dirs exist, i.e. before vacuum)."""
        return len(self.metrics())

    def pin(self) -> int:
        """Pin every subsequent :meth:`read_tier` in this catalog handle to
        the CURRENT manifest snapshot — the cross-tier consistency Iceberg
        gets from a single table snapshot. Without a pin, a consumer
        joining 1m+1h while a cascade is committing can read the 1m tier
        one commit ahead of the 1h tier (each read_tier resolves 'latest'
        independently); pinned, both reads resolve against one manifest
        prefix. Returns the snapshot id (also accepted by
        ``read_tier(as_of=...)`` on other handles).

        A pinned read needs the superseded run dirs to still exist:
        run with ``auto_vacuum=False`` or a ``superseded_grace_sec``
        longer than the consumer session — the same retention trade
        Iceberg's ``expire_snapshots`` makes. :meth:`unpin` restores
        latest-read semantics."""
        self._pinned = self.snapshot()
        return self._pinned

    def unpin(self) -> None:
        self._pinned = None

    def current_run_lists(
        self, tier: str, as_of: int | None = None
    ) -> dict[str, list[str]]:
        """partition -> ALL live run paths (relative to the tier dir) —
        snapshot-log semantics with two commit kinds: a REPLACE commit
        (status 'done'/'retention'/... ) supersedes every prior run of the
        partition; an APPEND commit (status 'append', Iceberg-append
        analog) adds a run alongside the live ones — how watermarked
        incremental finalize grows a partition without rewriting history.
        A deletion (path None) clears the list. ``as_of`` caps the log
        prefix considered (time travel applies to appends too)."""
        current: dict[str, list[str]] = {}
        for i, rec in enumerate(self.metrics()):
            if as_of is not None and i >= as_of:
                break
            if rec["tier"] == tier and "path" in rec:
                p, path = rec["partition"], rec["path"]
                if rec.get("status") == "append":
                    if path is not None:
                        current.setdefault(p, []).append(path)
                else:
                    current[p] = [path] if path is not None else []
        return current

    def current_runs(self, tier: str, as_of: int | None = None) -> dict[str, str | None]:
        """partition -> LATEST current run path (relative to the tier dir),
        or None when the partition's latest commit deleted it. The
        single-run view of :meth:`current_run_lists` — identical for
        replace-only partitions; for appended partitions the last appended
        run, which is exactly the conditional-commit guard a compactor
        needs (any concurrent append or replace changes it)."""
        return {
            p: (runs[-1] if runs else None)
            for p, runs in self.current_run_lists(tier, as_of=as_of).items()
        }

    # -- immutable run commits ---------------------------------------------
    def partition_dir(self, tier: str, partition: str) -> str:
        """Partition ROOT (holds run=<hex> children)."""
        return os.path.join(self.base_dir, tier, f"source={partition}")

    def _new_run_dir(self, tier: str, partition: str) -> tuple[str, str]:
        rel = os.path.join(f"source={partition}", f"run={uuid.uuid4().hex[:8]}")
        return rel, os.path.join(self.base_dir, tier, rel)

    def commit_moved_partition(
        self, tier: str, partition: str, tmp_part_dir: str,
        status: str = "done", **metrics,
    ) -> str:
        """Move an already-written partition directory into a fresh run dir
        and commit it. The move needs NO atomicity: until the manifest
        append lands, the run dir is invisible to readers."""
        rel, dest = self._new_run_dir(tier, partition)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(tmp_part_dir, dest)
        bytes_out = _dir_bytes(dest)
        self.record(tier, partition, status=status, path=rel,
                    bytes_out=bytes_out, **metrics)
        if self.auto_vacuum:
            self.vacuum(tier, partitions=[partition])
        return dest

    def delete_partition(self, tier: str, partition: str, status: str = "done",
                         **metrics) -> None:
        """Commit a partition deletion (path=None supersedes prior runs)."""
        self.record(tier, partition, status=status, path=None, **metrics)
        if self.auto_vacuum:
            self.vacuum(tier, partitions=[partition])

    def write_partition(self, df: DataFrame, tier: str, partition: str, **metrics) -> None:
        """Write one partition straight into its immutable run dir, then
        commit. The object-store-native shape: data files are written once
        to their final location; visibility comes from the manifest."""
        rel, dest = self._new_run_dir(tier, partition)
        t0 = time.monotonic()
        tier_writer(df).mode("overwrite").parquet(dest)
        self.record(
            tier, partition, path=rel,
            wall_ms=round((time.monotonic() - t0) * 1000, 1),
            bytes_out=_dir_bytes(dest),
            **metrics,
        )
        if self.auto_vacuum:
            self.vacuum(tier, partitions=[partition])

    def append_partition(self, df: DataFrame, tier: str, partition: str, **metrics) -> None:
        """Write one run dir and commit it as an APPEND: the partition's
        prior live runs stay live (read_tier unions them) — the Iceberg
        append. Replace commits (write_partition / commit_moved_partition /
        delete_partition) still supersede the whole accumulated set, which
        is what retention rewrites and compaction want."""
        rel, dest = self._new_run_dir(tier, partition)
        t0 = time.monotonic()
        tier_writer(df).mode("overwrite").parquet(dest)
        self.record(
            tier, partition, status="append", path=rel,
            wall_ms=round((time.monotonic() - t0) * 1000, 1),
            bytes_out=_dir_bytes(dest),
            **metrics,
        )
        if self.auto_vacuum:
            self.vacuum(tier, partitions=[partition])

    def vacuum(self, tier: str, partitions: list[str] | None = None) -> int:
        """Delete run dirs not CURRENT in the manifest. Two classes:

        * superseded runs (referenced by some manifest record, replaced by
          a later one) — deleted immediately; their commit finished.
        * never-referenced dirs — possibly a concurrent writer's commit in
          flight (dir moved, manifest append pending), so deleted only when
          older than ``orphan_grace_sec`` (true crash orphans age out).

        Returns the number removed. On POSIX this runs right after each
        commit; an object store would delay it past reader grace."""
        current = self.current_run_lists(tier)
        ever_referenced = {
            rec["path"]
            for rec in self.metrics()
            if rec["tier"] == tier and rec.get("path") is not None
        }
        tier_dir = os.path.join(self.base_dir, tier)
        if not os.path.isdir(tier_dir):
            return 0
        removed = 0
        now = time.time()
        for entry in sorted(os.listdir(tier_dir)):
            if not entry.startswith("source="):
                continue
            part = entry.split("=", 1)[1]
            if partitions is not None and part not in partitions:
                continue
            part_root = os.path.join(tier_dir, entry)
            keep_abs = {
                os.path.join(tier_dir, rel) for rel in current.get(part, [])
            }
            for run in sorted(os.listdir(part_root)):
                run_dir = os.path.join(part_root, run)
                if run_dir in keep_abs:
                    continue
                grace = (
                    self.superseded_grace_sec
                    if os.path.join(entry, run) in ever_referenced
                    else self.orphan_grace_sec
                )
                if grace > 0:
                    try:
                        age = now - os.path.getmtime(run_dir)
                    except OSError:
                        continue  # concurrently committed/removed: leave it
                    if age < grace:
                        # orphan: possibly another writer's in-flight commit;
                        # superseded: possibly still being scanned by a reader
                        continue
                shutil.rmtree(run_dir, ignore_errors=True)
                removed += 1
            if not os.listdir(part_root):
                try:
                    os.rmdir(part_root)
                except OSError:
                    pass  # a concurrent writer just created a run in it
        return removed

    def compact(
        self,
        spark: SparkSession,
        tier: str,
        partitions: list[str] | None = None,
        max_files_per_partition: int = 1,
        range_partition: bool = False,
    ) -> int:
        """Small-file compaction (Iceberg ``rewrite_data_files``): rewrite
        each partition's CURRENT run into ``max_files_per_partition`` files
        and commit the rewrite through the ordinary manifest append — the
        old run is superseded, never mutated, so readers stay consistent
        throughout (and keep working under the superseded-grace window).
        Partitions already at or under the target file count are skipped.
        Returns the number of partitions rewritten.

        Scale note: streamed/incremental ingestion accretes small files;
        at 10^12 sequences an uncompacted tier turns every scan into a
        metadata storm. Compaction is per-partition and embarrassingly
        parallel across partitions."""
        current = self.current_run_lists(tier)
        # layout flag of each partition's latest replace/append commit: a
        # run committed by a range_partition compaction records
        # range_partitioned=True, so a later maintain(compact_range=True)
        # pass can SKIP partitions already in the requested layout instead
        # of rewriting the whole catalog every pass (O(churn), not
        # O(catalog)); any subsequent commit (append/ingest/retention)
        # clears the flag and re-qualifies the partition
        layout: dict[str, bool] = {}
        for rec in self.metrics():
            if rec["tier"] == tier and "path" in rec:
                layout[rec["partition"]] = bool(rec.get("range_partitioned"))
        rewritten = 0
        for part in sorted(current):
            if partitions is not None and part not in partitions:
                continue
            rels = current[part]
            if not rels:
                continue
            rel = rels[-1]  # conditional-commit guard: last live run
            run_dirs = [os.path.join(self.base_dir, tier, r) for r in rels]
            try:
                n_files = sum(
                    1
                    for d in run_dirs
                    for f in os.listdir(d)
                    if f.endswith(".parquet") and not f.startswith("_")
                )
            except FileNotFoundError:
                # A concurrent committer superseded this run and its vacuum
                # already removed the dir — the partition was just rewritten,
                # so there is nothing left for this pass to compact.
                continue
            # appended partitions compact once they hold multiple runs OR
            # too many files — the rewrite folds every live run into ONE
            # replace commit (Iceberg rewrite_data_files over appends)
            if (n_files <= max_files_per_partition and len(run_dirs) == 1
                    and (not range_partition or layout.get(part, False))):
                continue
            df = spark.read.parquet(*run_dirs)
            key = "ts0" if "ts0" in df.columns else (
                "bucket_ts" if "bucket_ts" in df.columns else None
            )
            if range_partition and max_files_per_partition > 1 and key:
                # time-DISJOINT files (Iceberg sort-ordered rewrite): each
                # output file covers its own time range, so a later
                # file-level retention pass (apply_retention) drops whole
                # expired files and rewrites at most the one straddler —
                # DELETE WHERE ts < h becomes churn-bounded
                df = df.repartitionByRange(max_files_per_partition, F.col(key))
            else:
                df = df.coalesce(max_files_per_partition)
            t0 = time.monotonic()
            rel_new, dest = self._new_run_dir(tier, part)
            # compaction re-establishes the time clustering that interleaved
            # APPEND runs (watermark finalize) destroy — Iceberg's sorted
            # rewrite_data_files
            tier_writer(df).mode("overwrite").parquet(dest)
            # Conditional commit: if a concurrent writer superseded `rel`
            # while we rewrote it, our compaction of the OLD run must not
            # clobber the NEW data — abandon the rewrite instead.
            # status="compact": a compaction is content-IDENTICAL by
            # contract, and downstream consumers (derived-tier refresh)
            # classify commits by status to skip re-deriving after one
            committed = self.record_if_current(
                tier, part, rel, status="compact", path=rel_new,
                wall_ms=round((time.monotonic() - t0) * 1000, 1),
                bytes_out=_dir_bytes(dest),
                compacted_from=n_files, compacted_to=max_files_per_partition,
                range_partitioned=bool(
                    range_partition and max_files_per_partition > 1 and key
                ),
            )
            if not committed:
                shutil.rmtree(dest, ignore_errors=True)
                continue
            if self.auto_vacuum:
                self.vacuum(tier, partitions=[part])
            rewritten += 1
        return rewritten

    # -- reads -------------------------------------------------------------
    def read_tier(
        self, spark: SparkSession, tier: str, as_of: int | None = None
    ) -> DataFrame:
        """Manifest-resolved read: the union of each partition's CURRENT
        run dir — immune to uncommitted/superseded directories. ``as_of``
        (a :meth:`snapshot` id) reads the table as of that manifest prefix
        — valid while superseded runs exist (``auto_vacuum=False`` or
        before an explicit vacuum).

        Optimistic under concurrent committers (Iceberg-reader style): if a
        resolved run dir is vacuumed between our manifest read and the scan
        setup (a concurrent commit superseded it), re-resolve from the
        now-newer manifest and retry — the replacement commit is complete
        by the time its vacuum could have removed what we resolved.

        When the catalog handle is pinned (:meth:`pin`) and no explicit
        ``as_of`` is given, reads resolve against the pinned snapshot."""
        if as_of is None:
            as_of = getattr(self, "_pinned", None)
        base = os.path.join(self.base_dir, tier)
        last_err: Exception | None = None
        for _attempt in range(3):
            dirs = [
                os.path.join(base, rel)
                for runs in self.current_run_lists(tier, as_of=as_of).values()
                for rel in runs
            ]
            if not dirs:
                raise FileNotFoundError(f"tier {tier!r} has no committed runs")
            try:
                return spark.read.option("basePath", base).parquet(*dirs).drop("run")
            except Exception as e:  # PATH_NOT_FOUND from a concurrent vacuum
                if as_of is not None or "PATH_NOT_FOUND" not in str(e):
                    raise
                last_err = e
        raise last_err


def tier_writer(df: DataFrame, *prefix: str):
    """The ONE tier-write configuration: time-clustered rows
    (:func:`cluster_for_scan`) plus a parquet BLOOM FILTER on ``doc_id``
    when present — point reads push ``doc_id IN (...)`` and ids are
    scattered across time-sorted row groups, so min/max stats never prune
    them; the bloom filter gives exact row-group membership (Iceberg
    writes the same thing). Returns a DataFrameWriter."""
    w = cluster_for_scan(df, *prefix).write
    if "doc_id" in df.columns and "blob" in df.columns:
        # raw (blob-carrying) tier only: point reads push doc_id IN (...)
        # into THIS tier's scan, and ids are scattered across time-sorted
        # row groups so min/max stats never prune them. The rollup tiers
        # carry doc_id too but are only ever filtered by bucket_ts, so
        # they skip the filter (bloom build cost scales with rows).
        # Adaptive sizing: parquet-mr sizes the filter from the row
        # group's ACTUAL distinct count, not the 1 MB default-NDV filter.
        w = (w.option("parquet.bloom.filter.enabled#doc_id", "true")
              .option("parquet.bloom.filter.adaptive.enabled", "true"))
    return w


def cluster_for_scan(df: DataFrame, *prefix: str) -> DataFrame:
    """Sort a tier DataFrame within partitions by its time column (``ts0``
    for the raw tier, ``bucket_ts`` for every rollup/sketch tier) so each
    written parquet file holds non-overlapping time-ordered row groups.
    Range serving pushes ``bucket_ts``/``ts0`` min/max predicates to the
    scan; row-group statistics only prune when rows are clustered — this is
    the Iceberg table sort-order applied at write. Local sort only (no
    shuffle): ``prefix`` carries the writer's partitionBy columns so the
    FileFormatWriter's required ordering is satisfied by the same sort
    instead of adding its own. DataFrames with neither column pass through
    unchanged."""
    key = "ts0" if "ts0" in df.columns else (
        "bucket_ts" if "bucket_ts" in df.columns else None
    )
    if key is None:
        return df
    return df.sortWithinPartitions(*prefix, key)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            total += os.path.getsize(os.path.join(root, name))
    return total

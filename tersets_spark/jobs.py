"""End-to-end retention-cascade job: raw -> 1m -> 1h -> 1d.

One invocation = one resumable job (north_rule): each tier is written per
source partition through TierCatalog's atomic directory replace, the manifest
records lineage + throughput metrics per partition, and a rerun anti-joins
the completed set so a killed job picks up exactly where it stopped.

Plan shape per tier (PLANS.md has the explain evidence):
  raw+1m: ONE scan of sequences -> fused mapInArrow (compress + rollup from
          the same flat buffer) -> tagged-union staging -> two cheap
          filtered commits (m1_source="fused", the default; "input"/"raw"
          variants documented on run_cascade)
  1h/1d:  scan tier below -> JVM hash aggregate (exact integer combine) -> write
Filters on pending sources are pushed to the parquet scan (partition/row-group
pruning); only raw/1m cross the Python boundary, in Arrow batches.
``apply_retention`` expires tier rows past their policy horizon.
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow.dataset as pa_ds
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TierCatalog, cluster_for_scan, tier_writer
from .catalog import _dir_bytes as _catalog_dir_bytes
from .methods import Method
from .rollup import (
    TIERS,
    rollup_raw,
    rollup_raw_from_blobs,
    rollup_up,
    salted_repartition,
)
from .shipping import ensure_shipped


def _writer_alive(staging_entry: str) -> bool:
    """Staging dirs are named ``_tmp_<tier>_<pid>_<nonce>`` (nonce makes
    same-process concurrent cascades collision-free); a dir belongs to a
    live concurrent writer iff that PID still exists. Our OWN pid counts as
    alive too: another thread of this process may be mid-write (we can't
    tell a dead leftover from a sibling thread, so we leave same-pid dirs
    to the grace of a later run from a fresh process). Unparsable names are
    treated as dead (old-format leftovers get swept)."""
    try:
        pid = int(staging_entry.rsplit("_", 2)[1])
    except (ValueError, IndexError):
        return False
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else


def _move_partitions_and_record(
    catalog: TierCatalog, tier: str, tmp_dir: str, sources: list[str], t0: float
) -> None:
    """Commit each written source partition as an immutable run dir; the
    manifest append inside ``commit_moved_partition`` is the commit point
    (object-store-safe: no rename atomicity relied on — see catalog.py)."""
    import shutil

    wall_ms = round((time.monotonic() - t0) * 1000, 1)
    for src in sources:
        tmp_part = os.path.join(tmp_dir, f"source={src}")
        if not os.path.exists(tmp_part):
            continue
        rows = pa_ds.dataset(tmp_part, format="parquet").count_rows()
        catalog.commit_moved_partition(tier, src, tmp_part, rows=rows, wall_ms=wall_ms)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def _write_tier(
    catalog: TierCatalog, df: DataFrame, tier: str, pending: list[str]
) -> None:
    if not pending:
        return
    tmp_dir = os.path.join(
        catalog.base_dir, f"_tmp_{tier}_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    )
    t0 = time.monotonic()
    (
        # cluster_for_scan: local sort (source, ts0|bucket_ts) — satisfies
        # the partitionBy writer's required ordering AND leaves each file's
        # row groups time-clustered so range serving's pushed min/max
        # predicates actually prune (catalog.cluster_for_scan docstring)
        tier_writer(df.filter(F.col("source").isin(pending)), "source")
        .mode("overwrite")
        .partitionBy("source")
        .parquet(tmp_dir)
    )
    _move_partitions_and_record(catalog, tier, tmp_dir, pending, t0)


#: sketch tier cascade: (tier name, tier below, bucket seconds). ``psk`` is
#: the HDR percentile sketch (sketch.py), ``hll`` the distinct sketch
#: (hll.py); both re-aggregate exactly (sum / max), like the core tiers.
SKETCH_CASCADE = {
    "psk": (("psk_1h", "psk_1m", 3600), ("psk_1d", "psk_1h", 86400)),
    "hll": (("hll_1h", "hll_1m", 3600), ("hll_1d", "hll_1h", 86400)),
    "blm": (("blm_1h", "blm_1m", 3600), ("blm_1d", "blm_1h", 86400)),
    "cms": (("cms_1h", "cms_1m", 3600), ("cms_1d", "cms_1h", 86400)),
}
SKETCH_TIER_NAMES = ("psk_1m", "psk_1h", "psk_1d", "hll_1m", "hll_1h", "hll_1d")
BLOOM_TIER_NAMES = ("blm_1m", "blm_1h", "blm_1d")
CMS_TIER_NAMES = ("cms_1m", "cms_1h", "cms_1d")


def merge_to_bucket(sketch_df: DataFrame, secs: int, merge_fn) -> DataFrame:
    """Coarsen a sketch tier's ``bucket_ts`` to ``secs`` and merge with the
    family's combine (merge_sketch / merge_registers). The ONE definition of
    upper-sketch-tier derivation — builder (run_cascade), streamed sink, and
    auditor (validate_tiers) all call it, so they cannot desynchronize."""
    coarse = (F.floor(F.col("bucket_ts") / secs) * secs).cast("long")
    return merge_fn(
        sketch_df.withColumn("bucket_ts", coarse), ["source", "bucket_ts"]
    )


def _sketch_points(seq: DataFrame) -> DataFrame:
    """(source, 1m bucket_ts, v) points for the sketch tiers — one JVM
    posexplode pass, no Python; scan pruned to (source, ts0, tokens)."""
    return seq.select(
        "source", "ts0", F.posexplode("tokens").alias("pos", "v")
    ).select(
        "source",
        (F.floor((F.col("ts0") + F.col("pos")) / 60) * 60).cast("long").alias("bucket_ts"),
        "v",
    )


def run_cascade(
    spark: SparkSession,
    sequences_path: str,
    out_dir: str,
    compress_method: Method = Method.DeltaOfDelta,
    with_blocks: bool = True,
    resume: bool = True,
    num_partitions: int | None = None,
    salt: bool = False,
    with_sketches: bool = False,
    sketch_kernel: bool | None = None,
    with_blooms: bool = False,
    with_cms: bool = False,
    m1_source: str = "fused",
    fail_after_tier: str | None = None,  # test hook for kill/resume
) -> dict[str, str]:
    """Run the full cascade; returns tier -> output dir. Resumable.

    ``salt=True`` inserts an explicit salted repartition before the raw/1m
    kernels. Default off: those stages are map-only (per-row kernels), so a
    pre-shuffle only re-moves the token payload without fixing any key skew —
    scan splits are already byte-balanced. Salting belongs where a skewed KEY
    is shuffled (see rollup.salted_source_stats for the per-source case);
    enable it here only when the input files themselves are pathologically
    skewed per split.

    ``with_sketches=True`` additionally materializes two continuous-aggregate
    sketch tier families keyed (source, bucket_ts): ``psk_1m/1h/1d`` (HDR
    percentile sketch, merge = sum) and ``hll_1m/1h/1d`` (deterministic HLL
    distinct registers, merge = max). Same catalog commits, same per-source
    resume, same retention machinery (they carry ``bucket_ts``); upper tiers
    derive from the committed tier below, so the whole family audits with
    ``validate_tiers``. ``sketch_kernel=True`` builds both 1m levels from
    ONE fused zero-copy Arrow pass over the token payload
    (kernels.sketch_partials_map_in_arrow) — partials staged once, combined
    by two tiny JVM aggregations. ``sketch_kernel=False`` keeps the pure
    expression path (one posexplode aggregation pass PER family; the explode
    is the floor, ~4 s of each ~5-6 s build at sf0.1/local[32]) — bit-
    identical output, pinned by tests/test_sketch_kernel.py, and the path
    the DuckDB-oracled contract queries use, so kernel and expression check
    each other. The 1h/1d levels merge the bounded committed tier below and
    are near-free either way.

    ``with_blooms=True`` additionally materializes the ``blm_1m/1h/1d``
    Bloom membership tier family (bloom.py): per-(source, bucket) word
    tables over the token values, merge = bit_or, serving
    decontamination/audit ROUTING ("which windows might contain value v",
    no false negatives) from O(windows) state via
    :func:`windows_maybe_containing`. Same catalog commits, per-source
    resume, retention and ``validate_tiers`` upper-merge audit as the
    sketch families; streamed twin in streaming.stream_cascade_to_tiers.

    ``with_cms=True`` additionally materializes the ``cms_1m/1h/1d``
    Count-Min frequency tier family (cms.py): per-(source, bucket) D x
    WIDTH counter grids over the token values, merge = cell-wise sum
    (count-min is closed under addition), serving per-window frequency
    ESTIMATES ("about how often does value v appear in window W",
    estimate >= truth always) from O(windows) state via
    :func:`frequency_estimates_from_catalog`. Bloom routes (could it be
    there), count-min weighs (roughly how much) — same commits, resume,
    retention, validation and streamed twin as the other families.

    ``m1_source`` — how the 1m tier is built. ``"fused"`` (default): one
    tagged-union Arrow pass emits raw blobs AND 1m rollup rows from the
    same in-memory flat buffer (staged once, each tier commits from the
    staging) — the original corpus is scanned exactly ONCE per cascade; at
    10^12 sequences the second full input scan is the largest avoidable
    cost, and the rollup itself adds only reduceat work to the compress
    pass. ``"raw"``: 1m decodes the COMMITTED raw tier's blobs (no input
    rescan either, but pays a per-blob decode — the shape a later backfill
    of 1m from an existing raw tier uses; also the fused path's resume
    fallback when raw is already committed). ``"input"``: rescans the
    sequences table (the pre-round-4 two-scan shape). All three produce
    bit-identical tiers for the (lossless-at-eb-0) cascade codecs — pinned
    by tests and by the rollup_from_blobs contract query.

    ``sketch_kernel=None`` (default) AUTO-SELECTS: the kernel's HLL stage
    memoizes an md5 LUT per batch-UNIQUE value — a big win on vocab-sized
    token domains, but on an unbounded/high-cardinality domain every batch
    pays a Python md5 loop over ~every value, so there the pure-JVM
    expression path wins. The chooser probes a bounded token sample
    (:func:`_auto_sketch_kernel`, documented thresholds) and the decision
    is reported in the returned dict under ``"_sketch_path"``. Both paths
    are bit-identical, so the choice is performance-only.
    """
    if m1_source not in ("fused", "raw", "input"):
        # a typo must not silently fall through to the two-scan "input" shape
        raise ValueError(
            f"m1_source must be 'fused', 'raw' or 'input', got {m1_source!r}"
        )
    ensure_shipped(spark)
    # superseded_grace: a CONCURRENT cascade's reader may still be scanning
    # a run this writer supersedes — keep replaced runs briefly (reader
    # grace, Iceberg-style); aged leftovers are collected by later vacuums.
    catalog = TierCatalog(out_dir, superseded_grace_sec=600.0)
    # Sweep staging dirs a KILLED run left behind (committed data lives in
    # manifest-referenced run dirs; staging is garbage once its writer is
    # gone). Staging names are PID-scoped; only sweep dirs whose writer
    # process no longer exists, so two cascades sharing an out_dir can't
    # delete each other's live staging.
    import shutil

    for entry in os.listdir(out_dir):
        if entry.startswith(("_tmp_", "_retention_")) and not _writer_alive(entry):
            shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
    seq = spark.read.parquet(sequences_path)
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    sources = sorted(r[0] for r in seq.select("source").distinct().collect())

    def pending_for(tier: str) -> list[str]:
        done = catalog.completed(tier) if resume else set()
        return [s for s in sources if s not in done]

    # --- raw + 1m tiers ---
    pend_raw = pending_for("raw")
    pend_m1 = pending_for("1m")
    staged_union = None
    stage_fused = None
    # try/finally: a failure anywhere between staging and the 1m commit
    # (incl. the injected-crash test hooks) must not strand the staging
    # dir — the in-process sweeper spares dirs of LIVE pids, so a same-
    # process resume would never reclaim it
    try:
        if m1_source == "fused" and pend_raw:
            # ONE zero-copy pass over the token payload emits both tiers as a
            # tagged union (same staging pattern as the fused sketch kernel);
            # each tier then commits from the staged rows — the corpus is
            # scanned exactly once and the 1m rollup reuses the in-memory flat
            # buffer of the compress step.
            from .kernels import RAW_M1_UNION_SCHEMA, compress_rollup_map_in_arrow

            need = sorted(set(pend_raw) | set(pend_m1))
            src = seq.select("doc_id", "source", "ts0", "n_tok", "tokens").filter(
                F.col("source").isin(need)
            )
            if salt:
                src = salted_repartition(src, num_partitions, "source")
            union = src.mapInArrow(
                compress_rollup_map_in_arrow(
                    compress_method, TIERS["1m"], with_blocks, compress_method
                ),
                RAW_M1_UNION_SCHEMA,
            )
            stage_fused = os.path.join(
                out_dir, f"_tmp_fused_{os.getpid()}_{uuid.uuid4().hex[:8]}"
            )
            t_stage = time.monotonic()
            union.write.mode("overwrite").parquet(stage_fused)
            # lineage: the fused pass is the cascade's single corpus scan — the
            # per-tier commit walls below only measure the cheap staged writes,
            # so record the scan itself (status!="done" keeps it out of
            # completed()/current_runs; bench.py surfaces it as its own row)
            catalog.record(
                "raw+1m", "_stage", status="stage",
                wall_ms=round((time.monotonic() - t_stage) * 1000, 1),
                sources=len(need),
            )
            staged_union = spark.read.parquet(stage_fused)
            raw_df = staged_union.filter(F.col("family") == "r").select(
                "doc_id", "source", "ts0", "n_tok", "blob"
            )
            _write_tier(catalog, raw_df, "raw", pend_raw)
        elif pend_raw:
            from pyspark.sql.types import BinaryType, StructField, StructType

            from .kernels import compress_map_in_arrow

            src = seq.select("doc_id", "source", "ts0", "n_tok", "tokens")
            if salt:
                src = salted_repartition(src, num_partitions, "source")
            raw_schema = StructType(
                [f for f in src.schema.fields if f.name != "tokens"]
                + [StructField("blob", BinaryType())]
            )
            raw = src.mapInArrow(compress_map_in_arrow(compress_method), raw_schema)
            _write_tier(catalog, raw, "raw", pend_raw)
        if fail_after_tier == "raw":
            raise RuntimeError("injected failure after raw tier")

        # --- 1m tier: vectorized bucket rollup (+ optional per-bucket blocks) ---
        if pend_m1:
            if staged_union is not None:
                m1_cols = [
                    "doc_id", "source", "bucket_ts", "cnt", "sum",
                    "vmin", "vmax", "first", "last",
                ] + (["block"] if with_blocks else [])
                m1 = staged_union.filter(F.col("family") == "m").select(*m1_cols)
            elif m1_source in ("fused", "raw"):
                # fused-resume (raw already committed) or explicit "raw":
                # decode the COMMITTED raw tier's blobs instead of rescanning
                # the input — bit-identical rows (lossless codecs; the
                # rollup_from_blobs contract query pins the equality).
                m1_in = catalog.read_tier(spark, "raw")
                if salt:
                    m1_in = salted_repartition(m1_in, num_partitions, "source")
                m1 = rollup_raw_from_blobs(
                    m1_in, TIERS["1m"], with_blocks=with_blocks,
                    block_method=compress_method,
                )
            else:
                m1_in = salted_repartition(seq, num_partitions, "source") if salt else seq
                m1 = rollup_raw(
                    m1_in,
                    TIERS["1m"],
                    with_blocks=with_blocks,
                    block_method=compress_method,
                )
            _write_tier(catalog, m1, "1m", pend_m1)
    finally:
        if stage_fused is not None:
            shutil.rmtree(stage_fused, ignore_errors=True)
    if fail_after_tier == "1m":
        raise RuntimeError("injected failure after 1m tier")

    # --- 1h / 1d tiers: exact integer re-aggregation of the tier below ---
    # (retention expiry for written tiers lives in apply_retention below)
    for tier, below in (("1h", "1m"), ("1d", "1h")):
        pend = pending_for(tier)
        if pend:
            below_df = catalog.read_tier(spark, below)
            if "block" in below_df.columns:
                below_df = below_df.drop("block")
            _write_tier(catalog, rollup_up(below_df, TIERS[tier]), tier, pend)
        if fail_after_tier == tier:
            raise RuntimeError(f"injected failure after {tier} tier")

    tiers_out = ["raw", "1m", "1h", "1d"]
    sketch_path = None
    if with_sketches or with_blooms or with_cms:
        # Sketch families share one machinery: psk (HDR percentile counts,
        # merge = sum), hll (distinct registers, merge = max) and blm
        # (Bloom membership words, merge = bit_or — decontamination/audit
        # ROUTING, see bloom.py). When the value domain is vocab-shaped the
        # fused Arrow kernel emits ALL requested families' partials in ONE
        # zero-copy pass over the token payload (staged once, one tiny JVM
        # aggregation per family); otherwise each family builds through its
        # pure-JVM expression path. Upper tiers always merge the committed
        # tier below through merge_to_bucket — same resume, retention and
        # validate machinery for all three.
        from .bloom import bloom_words, merge_words
        from .cms import WIDTH as CMS_WIDTH, cms_counters, merge_counters
        from .hll import hll_registers, merge_registers
        from .sketch import merge_sketch, sketch as hdr_sketch

        if sketch_kernel is None:
            sketch_kernel = _auto_sketch_kernel(seq)
        sketch_path = "kernel" if sketch_kernel else "expression"
        pend_psk = pending_for("psk_1m") if with_sketches else []
        pend_hll = pending_for("hll_1m") if with_sketches else []
        pend_blm = pending_for("blm_1m") if with_blooms else []
        pend_cms = pending_for("cms_1m") if with_cms else []
        fams = []
        if sketch_kernel:
            if pend_psk or pend_hll:
                fams += ["p", "h"]
            if pend_blm:
                fams.append("b")
            if pend_cms:
                fams.append("c")
        stage_dir = None
        psk_1m_df = hll_1m_df = blm_1m_df = cms_1m_df = None
        if fams:
            from .kernels import SKETCH_PARTIALS_SCHEMA, sketch_partials_map_in_arrow

            partials = seq.select("source", "ts0", "tokens").mapInArrow(
                sketch_partials_map_in_arrow(60, families=tuple(fams)),
                SKETCH_PARTIALS_SCHEMA,
            )
            stage_dir = os.path.join(
                out_dir, f"_tmp_skpart_{os.getpid()}_{uuid.uuid4().hex[:8]}"
            )
            t_stage = time.monotonic()
            partials.write.mode("overwrite").parquet(stage_dir)
            # lineage: the staged partials pass is the sketch families'
            # single corpus scan (the per-tier commits below only aggregate
            # the staged rows) — record it like the fused raw+1m stage so
            # bench/operators see where the wall actually goes
            catalog.record(
                "+".join(sorted(fams)) + "_partials", "_stage", status="stage",
                wall_ms=round((time.monotonic() - t_stage) * 1000, 1),
            )
            part_df = spark.read.parquet(stage_dir)
            psk_1m_df = (
                part_df.filter(F.col("family") == "p")
                .groupBy("source", "bucket_ts", F.col("bucket").alias("bucket_id"))
                .agg(F.sum("val").alias("cnt"))
            )
            hll_1m_df = (
                part_df.filter(F.col("family") == "h")
                .groupBy("source", "bucket_ts", "bucket")
                .agg(F.max("val").alias("rho"))
            )
            blm_1m_df = (
                part_df.filter(F.col("family") == "b")
                .groupBy("source", "bucket_ts", F.col("bucket").alias("widx"))
                .agg(F.bit_or("val").alias("word"))
            )
            # cms partials pack the cell as bucket = ridx*WIDTH + cidx
            cms_1m_df = (
                part_df.filter(F.col("family") == "c")
                .groupBy(
                    "source",
                    "bucket_ts",
                    (F.col("bucket") / CMS_WIDTH).cast("int").alias("ridx"),
                    (F.col("bucket") % CMS_WIDTH).cast("int").alias("cidx"),
                )
                .agg(F.sum("val").alias("cnt"))
            )
        if (pend_psk or pend_hll) and not sketch_kernel:
            pts = _sketch_points(seq)
            psk_1m_df = hdr_sketch(pts, ["source", "bucket_ts"], "v")
            hll_1m_df = hll_registers(pts, ["source", "bucket_ts"], "v", dict_hash=True)
        if pend_blm and not sketch_kernel:
            # expression path (also the contract oracle's shape): positions
            # once per DISTINCT value via the dict-hash broadcast
            blm_1m_df = bloom_words(
                _sketch_points(seq), ["source", "bucket_ts"], "v", dict_hash=True
            )
        if pend_cms and not sketch_kernel:
            cms_1m_df = cms_counters(
                _sketch_points(seq), ["source", "bucket_ts"], "v", dict_hash=True
            )
        # try/finally mirrors the fused raw+1m staging: a failure in any 1m
        # commit (or the injected-crash hooks) must not strand the full-size
        # partials dir — the startup sweep spares dirs of LIVE pids, so a
        # long-lived driver would otherwise accumulate one copy per attempt
        try:
            if pend_psk:
                _write_tier(catalog, psk_1m_df, "psk_1m", pend_psk)
            if fail_after_tier == "psk_1m":
                raise RuntimeError("injected failure after psk_1m tier")
            if pend_hll:
                _write_tier(catalog, hll_1m_df, "hll_1m", pend_hll)
            if fail_after_tier == "hll_1m":
                raise RuntimeError("injected failure after hll_1m tier")
            if pend_blm:
                _write_tier(catalog, blm_1m_df, "blm_1m", pend_blm)
            if fail_after_tier == "blm_1m":
                raise RuntimeError("injected failure after blm_1m tier")
            if pend_cms:
                _write_tier(catalog, cms_1m_df, "cms_1m", pend_cms)
            if fail_after_tier == "cms_1m":
                raise RuntimeError("injected failure after cms_1m tier")
        finally:
            if stage_dir is not None:
                shutil.rmtree(stage_dir, ignore_errors=True)
        families_up = []
        if with_sketches:
            families_up += [("psk", merge_sketch), ("hll", merge_registers)]
            tiers_out += list(SKETCH_TIER_NAMES)
        if with_blooms:
            families_up.append(("blm", merge_words))
            tiers_out += list(BLOOM_TIER_NAMES)
        if with_cms:
            families_up.append(("cms", merge_counters))
            tiers_out += list(CMS_TIER_NAMES)
        for family, merge in families_up:
            for tier, below, secs in SKETCH_CASCADE[family]:
                pend = pending_for(tier)
                if pend:
                    b = catalog.read_tier(spark, below)
                    _write_tier(catalog, merge_to_bucket(b, secs, merge), tier, pend)

    out = {t: os.path.join(out_dir, t) for t in tiers_out}
    if sketch_path is not None:
        out["_sketch_path"] = sketch_path
    return out


#: Auto-selection thresholds for the fused sketch kernel (see run_cascade):
#: probe this many tokens; pick the kernel only when the estimated distinct
#: count is BOTH under the worker LUT cap (kernels._HLL_VALUE_LUT, 1M) and
#: a small fraction of the probed tokens (memoization actually repays its
#: Python md5 cost only when values repeat).
SKETCH_KERNEL_PROBE_TOKENS = 200_000
SKETCH_KERNEL_MAX_DISTINCT = 1_000_000
SKETCH_KERNEL_MAX_DISTINCT_FRAC = 0.25


def _auto_sketch_kernel(seq: DataFrame) -> bool:
    """True -> fused Arrow kernel; False -> pure-JVM expression path.

    Probes a bounded token prefix (explode + limit: Catalyst stops the scan
    after SKETCH_KERNEL_PROBE_TOKENS values, so this reads a handful of
    row groups, not the corpus) and estimates the value-domain size with
    approx_count_distinct. Vocab-shaped domains (tokens: ~50k distinct)
    repeat heavily inside every batch -> the kernel's per-unique md5 memo
    amortizes to ~zero; unbounded domains (hashes, ids) would pay a Python
    md5 per value per batch -> expression path. Both paths produce
    bit-identical tiers, so a wrong guess costs time, never correctness."""
    probe = seq.select(F.explode("tokens").alias("v")).limit(SKETCH_KERNEL_PROBE_TOKENS)
    row = probe.agg(
        F.approx_count_distinct("v").alias("d"), F.count(F.lit(1)).alias("n")
    ).head()
    if not row.n:
        return True
    return (
        row.d < SKETCH_KERNEL_MAX_DISTINCT
        and row.d <= SKETCH_KERNEL_MAX_DISTINCT_FRAC * row.n
    )


def percentiles_from_catalog(
    spark: SparkSession,
    out_dir: str,
    tier: str = "psk_1d",
    keys: tuple[str, ...] = ("source",),
    pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Serve percentile estimates from a COMMITTED sketch tier — the consumer
    side of ``with_sketches=True``: no token scan, just a merge of the
    bounded sketch rows down to ``keys`` plus one window. Keys may include
    ``bucket_ts`` for per-bucket percentiles."""
    from .sketch import merge_sketch, percentiles

    df = TierCatalog(out_dir).read_tier(spark, tier)
    return percentiles(merge_sketch(df, list(keys)), list(keys), list(pcts))


def distinct_from_catalog(
    spark: SparkSession,
    out_dir: str,
    tier: str = "hll_1d",
    keys: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Serve distinct-count estimates from a COMMITTED HLL register tier
    (empty_buckets / exact-integer harmonic / bit-stable estimate columns,
    see hll.hll_summary). Same no-rescan property as
    :func:`percentiles_from_catalog`."""
    from .hll import hll_summary, merge_registers

    df = TierCatalog(out_dir).read_tier(spark, tier)
    return hll_summary(merge_registers(df, list(keys)), list(keys))


def windows_maybe_containing(
    spark: SparkSession,
    out_dir: str,
    values: list,
    tier: str = "blm_1m",
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Decontamination/audit routing from a COMMITTED Bloom tier: for each
    probe value, the (source, bucket_ts) windows that MIGHT contain it
    (``maybe`` false = definitely absent, no false negatives). The consumer
    rescans only the maybe-windows' raw partitions — O(windows) sketch
    reads instead of an O(corpus) scan. Coarser tiers (blm_1h/1d) answer
    with fewer rows but more false positives; route day -> hour -> 1m ->
    raw for the narrowest rescan set."""
    from .bloom import probe_membership

    words = TierCatalog(out_dir).read_tier(spark, tier)
    # optional time scoping: the bucket_ts bounds push into the tier scan,
    # so an audit over last-week probes only last week's filters
    if start is not None:
        words = words.where(F.col("bucket_ts") >= start)
    if end is not None:
        words = words.where(F.col("bucket_ts") < end)
    # filters are value-generic (positions hash the string form): integer
    # token ids and string keys (e.g. concat_ws gram keys) both probe
    ptype = "string" if any(isinstance(v, str) for v in values) else "long"
    probes = spark.createDataFrame([(v,) for v in values], f"probe {ptype}")
    res = probe_membership(words, ["source", "bucket_ts"], probes)
    return res.where(F.col("maybe"))


def frequency_estimates_from_catalog(
    spark: SparkSession,
    out_dir: str,
    values: list,
    tier: str = "cms_1m",
    min_est: int = 1,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Frequency auditing from a COMMITTED Count-Min tier: for each probe
    value, the (source, bucket_ts) windows where it is estimated to occur
    at least ``min_est`` times, with the estimate (``est >= true`` always;
    a window absent from the result with ``min_est=1`` definitely never
    saw the value — count-min shares Bloom's no-false-negative absence
    proof). O(windows) sketch reads instead of an O(corpus) scan; coarser
    tiers (cms_1h/1d) answer with fewer rows and looser estimates. The
    weighting complement of :func:`windows_maybe_containing`: bloom routes
    rescans, count-min sizes them (e.g. contamination weight per window)."""
    from .cms import estimate_counts

    counters = TierCatalog(out_dir).read_tier(spark, tier)
    if start is not None:
        counters = counters.where(F.col("bucket_ts") >= start)
    if end is not None:
        counters = counters.where(F.col("bucket_ts") < end)
    ptype = "string" if any(isinstance(v, str) for v in values) else "long"
    probes = spark.createDataFrame([(v,) for v in values], f"probe {ptype}")
    res = estimate_counts(counters, ["source", "bucket_ts"], probes)
    return res.where(F.col("est") >= min_est)


# ---------------------------------------------------------------------------
# retention expiry
# ---------------------------------------------------------------------------

#: Default policy: how long each tier's data is kept, in seconds of event
#: time (TimescaleDB-style retention: finer tiers expire first, coarser
#: aggregates are kept longer). None = keep forever.
DEFAULT_RETENTION = {"raw": 7 * 86400, "1m": 30 * 86400, "1h": 365 * 86400, "1d": None}


def _parquet_file_ts_range(path: str, col: str) -> tuple[int, int] | None:
    """(min, max) of ``col`` across a parquet file's row-group statistics,
    or None when any row group lacks them (the caller must then treat the
    file as straddling — conservative, never wrong)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    lo = hi = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        found = False
        for ci in range(g.num_columns):
            c = g.column(ci)
            if c.path_in_schema == col:
                st = c.statistics
                if st is None or not st.has_min_max:
                    return None
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
                found = True
                break
        if not found:
            return None
    return None if lo is None else (int(lo), int(hi))


def _link_or_copy(src: str, dest: str) -> None:
    import shutil

    try:
        os.link(src, dest)
    except OSError:  # cross-device / fs without hardlinks
        shutil.copy2(src, dest)


def apply_retention(
    spark: SparkSession,
    out_dir: str,
    now_ts: int,
    policy: dict[str, int | None] | None = None,
    superseded_grace_sec: float = 600.0,
    file_level: bool = True,
) -> dict[str, int]:
    """Expire tier data older than the policy's horizon, per tier.

    Row-level expiry on the bucket time axis (raw rows expire on ``ts0``).
    TWO Spark jobs per tier, regardless of partition count:

    1. one aggregation computes per-source expired-row counts (this is also
       the lineage: each affected source gets a ``status=retention``
       manifest record with its dropped count);
    2. one partitioned write rewrites the affected sources' rows that
       actually need rewriting; each new run directory is then committed
       through the manifest, and partitions whose data expired entirely
       are deleted.

    ``file_level=True`` (default) makes step 2 CHURN-BOUNDED, the
    plain-parquet analog of Iceberg's metadata ``DELETE WHERE ts < h``
    over a sort-ordered table: each affected source's current files are
    classified by their row-group time statistics — files wholly below
    the horizon are DROPPED (never read), files wholly at/above it are
    HARD-LINKED into the new run (no data movement; on an object store
    this is the manifest re-reference Iceberg does), and only files
    STRADDLING the horizon are rewritten, in one Spark job for all
    sources (source recovered from the run path). On a catalog compacted
    with ``range_partition=True`` (time-disjoint files) the rewrite
    touches exactly one file per source per pass — retention cost is
    proportional to data churn, not partition size. Files without usable
    statistics are conservatively treated as straddling, which degrades
    to the old full rewrite, never to wrong data. ``file_level=False``
    keeps the plain full-partition rewrite (the bit-identical twin the
    tests compare against).

    The previous design ran a count + rewrite job per partition from a
    driver loop — at thousands of (source x tier) partitions the driver
    serializes the cluster. On Iceberg proper this whole function is a
    metadata ``DELETE WHERE ts < horizon``; the shape here is the
    plain-parquet equivalent with the same per-partition lineage.

    Scale note: both jobs filter on the time axis — a pushed-down min/max
    row-group prune, so only row groups straddling the horizon are read.
    """
    import shutil

    from pyspark.sql import functions as F  # noqa: F811 (local for clarity)

    policy = DEFAULT_RETENTION if policy is None else policy
    # Same reader-grace as run_cascade: a concurrent reader mid-scan of the
    # superseded run keeps its files for the grace window after the swap.
    catalog = TierCatalog(out_dir, superseded_grace_sec=superseded_grace_sec)
    dropped: dict[str, int] = {}
    for tier, keep_seconds in policy.items():
        if keep_seconds is None:
            continue
        tier_dir = os.path.join(out_dir, tier)
        if not os.path.isdir(tier_dir):
            continue
        horizon = now_ts - keep_seconds
        ts_col = "ts0" if tier == "raw" else "bucket_ts"
        try:
            tier_df = catalog.read_tier(spark, tier)
        except FileNotFoundError:  # tier dir exists but nothing committed
            continue
        # job 1: per-source expired counts (drives lineage + the rewrite set)
        expired = {
            r["source"]: r["n"]
            for r in tier_df.filter(F.col(ts_col) < horizon)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if not expired:
            dropped[tier] = 0
            continue
        affected = sorted(expired)
        if file_level:
            # churn-bounded step 2: classify each affected source's current
            # files by row-group time stats — drop / hard-link / rewrite.
            # ONE manifest read supplies both the file lists AND each
            # source's conditional-commit guard (its last live run): a
            # concurrent APPEND landing after this snapshot changes the
            # guard, so our REPLACE commit below is abandoned instead of
            # silently superseding (and losing) the appended rows — the
            # same optimistic-concurrency idiom compact() and
            # _fold_sketch_tier use.
            run_lists = catalog.current_run_lists(tier)
            guards = {
                src: (run_lists[src][-1] if run_lists.get(src) else None)
                for src in affected
            }
            plans: dict[str, tuple[list[str], list[str], int]] = {}
            all_straddle: list[str] = []
            for src in affected:
                files: list[str] = []
                for rel in run_lists.get(src, []):
                    rd = os.path.join(out_dir, tier, rel)
                    files += [
                        os.path.join(rd, f) for f in sorted(os.listdir(rd))
                        if f.endswith(".parquet") and not f.startswith("_")
                    ]
                keep: list[str] = []
                straddle: list[str] = []
                drop_n = 0
                for f in files:
                    rng = _parquet_file_ts_range(f, ts_col)
                    if rng is not None and rng[1] < horizon:
                        drop_n += 1  # wholly expired: never read, never copied
                    elif rng is not None and rng[0] >= horizon:
                        keep.append(f)  # wholly kept: re-referenced, not rewritten
                    else:
                        straddle.append(f)  # straddles (or no stats): rewrite
                plans[src] = (keep, straddle, drop_n)
                all_straddle += straddle
            tmp_dir = os.path.join(
                out_dir, f"_retention_{tier}_{os.getpid()}_{uuid.uuid4().hex[:8]}"
            )
            if all_straddle:
                # ONE job for every source's straddlers; the owning source
                # is recovered from the run path (partitionBy-written files
                # do not carry the column)
                sdf = spark.read.parquet(*all_straddle).withColumn(
                    "source",
                    F.regexp_extract(F.input_file_name(), r"source=([^/]+)/", 1),
                ).filter(F.col(ts_col) >= horizon)
                (
                    tier_writer(sdf, "source").mode("overwrite")
                    .partitionBy("source").parquet(tmp_dir)
                )
            for src in affected:
                keep, straddle, drop_n = plans[src]
                rel_new, dest = catalog._new_run_dir(tier, src)
                os.makedirs(dest, exist_ok=True)
                n_out = 0
                tmp_part = os.path.join(tmp_dir, f"source={src}")
                if straddle and os.path.exists(tmp_part):
                    for f in sorted(os.listdir(tmp_part)):
                        if f.endswith(".parquet") and not f.startswith("_"):
                            os.rename(
                                os.path.join(tmp_part, f),
                                os.path.join(dest, f"rw-{n_out:05d}-{f}"),
                            )
                            n_out += 1
                for i, f in enumerate(keep):
                    _link_or_copy(
                        f, os.path.join(dest, f"keep-{i:05d}-{os.path.basename(f)}")
                    )
                    n_out += 1
                if n_out == 0:  # every row of this source expired
                    os.rmdir(dest)
                    committed = catalog.record_if_current(
                        tier, src, guards[src], status="retention",
                        path=None,
                        dropped_rows=expired[src], horizon_ts=horizon,
                    )
                    if committed and catalog.auto_vacuum:
                        catalog.vacuum(tier, partitions=[src])
                else:
                    committed = catalog.record_if_current(
                        tier, src, guards[src], status="retention",
                        path=rel_new,
                        bytes_out=_catalog_dir_bytes(dest),
                        dropped_rows=expired[src], horizon_ts=horizon,
                        files_linked=len(keep), files_rewritten=len(straddle),
                        files_dropped=drop_n,
                    )
                    if not committed:
                        # a concurrent commit (ingest append / stream
                        # finalize) superseded our guard run — abandon the
                        # rewrite; the next retention pass re-plans over
                        # the winner's files
                        shutil.rmtree(dest, ignore_errors=True)
                    elif catalog.auto_vacuum:
                        catalog.vacuum(tier, partitions=[src])
            shutil.rmtree(tmp_dir, ignore_errors=True)
            dropped[tier] = sum(expired.values())
            continue
        # job 2 (full-rewrite twin): one partitioned rewrite of the
        # affected sources, minus their expired rows
        tmp_dir = os.path.join(
            out_dir, f"_retention_{tier}_{os.getpid()}_{uuid.uuid4().hex[:8]}"
        )
        (
            tier_writer(
                tier_df.filter(
                    F.col("source").isin(affected) & (F.col(ts_col) >= horizon)
                ),
                "source",
            )
            .mode("overwrite")
            .partitionBy("source")
            .parquet(tmp_dir)
        )
        for src in affected:
            tmp_part = os.path.join(tmp_dir, f"source={src}")
            if os.path.exists(tmp_part):
                catalog.commit_moved_partition(
                    tier, src, tmp_part, status="retention",
                    dropped_rows=expired[src], horizon_ts=horizon,
                )
            else:
                # every row of this source expired -> commit the deletion
                catalog.delete_partition(
                    tier, src, status="retention",
                    dropped_rows=expired[src], horizon_ts=horizon,
                )
        shutil.rmtree(tmp_dir, ignore_errors=True)
        dropped[tier] = sum(expired.values())
    return dropped


# ---------------------------------------------------------------------------
# post-load tier integrity audit
# ---------------------------------------------------------------------------


_TIER_AGG_COLS = ("cnt", "sum", "vmin", "vmax", "first", "last")


def audit_keep(sample_frac: float, seed: int):
    """Deterministic audit-sample predicate on ``doc_id``: the seed is
    folded into the hash, so the same (seed, frac) always audits the same
    doc set (reruns and independent auditors agree) while a NEW seed audits
    a DIFFERENT slice — re-auditing with fresh seeds widens coverage."""
    buckets = 1_000_000
    return (
        F.pmod(F.xxhash64(F.lit(int(seed)), F.col("doc_id")), F.lit(buckets))
        < int(sample_frac * buckets)
    )


def _mismatch_counts(actual: DataFrame, expected: DataFrame) -> tuple[int, int]:
    """(rows compared, rows differing) via one full-outer join + one agg.
    A row is bad if it exists on only one side or any aggregate differs."""
    keys = ["doc_id", "source", "bucket_ts"]
    a = actual.select(*keys, *[F.col(c).alias(f"a_{c}") for c in _TIER_AGG_COLS])
    e = expected.select(*keys, *[F.col(c).alias(f"e_{c}") for c in _TIER_AGG_COLS])
    j = a.join(e, keys, "full_outer")
    bad = F.lit(False)
    for c in _TIER_AGG_COLS:
        bad = bad | ~F.col(f"a_{c}").eqNullSafe(F.col(f"e_{c}"))
    row = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("m"),
    ).collect()[0]
    return int(row["n"]), int(row["m"] or 0)


def validate_tiers(
    spark: SparkSession,
    sequences_path: str,
    out_dir: str,
    sample_frac: float = 0.05,
    seed: int = 42,
) -> dict[str, dict[str, int]]:
    """Sampled, distributed integrity audit of a COMMITTED cascade.

    Checks the north-star invariants against what is actually on disk, on a
    deterministic ``sample_frac`` of doc_ids (xxhash64-bucketed, so reruns
    audit the same docs and two auditors agree):

    * ``raw``  — decompress(blob) round-trips to the EXACT original token
      array (per-row token-array equality, the input_hint invariant);
      decode failures count as mismatches.
    * ``1m``   — committed rows match ``rollup_raw`` recomputed from the
      original sampled sequences, value-exact on every aggregate.
    * ``1h``/``1d`` — committed rows match an exact integer re-aggregation
      of the committed tier below (catches a torn/stale upper tier even
      when the tier below is good).

    Retention-aware: each comparison is restricted to the event-time range
    where BOTH sides are complete, using the ``horizon_ts`` lineage that
    ``apply_retention`` wrote to the manifest — expired raw docs are
    excluded from the round-trip join, and an upper tier is only compared
    against the tier below above the below-tier's horizon (rounded up to a
    whole upper bucket, so a partially-covered edge bucket never counts as
    a mismatch). An aged catalog therefore audits clean.

    Cost scales with ``sample_frac`` times the catalog size: every check is
    a sampled scan + one shuffle join, no driver-side payloads. Returns
    ``{tier: {"checked": n, "mismatches": m}}`` — all-zero mismatches means
    the audit passed; the caller decides whether to raise.
    """
    ensure_shipped(spark)
    catalog = TierCatalog(out_dir, superseded_grace_sec=600.0)
    keep = audit_keep(sample_frac, seed)
    seq = spark.read.parquet(sequences_path).where(keep)

    # retention lineage: strictest horizon each tier has ever been trimmed to
    horizon: dict[str, int] = {}
    for rec in catalog.metrics():
        if rec.get("status") == "retention" and rec.get("horizon_ts") is not None:
            h = int(rec["horizon_ts"])
            horizon[rec["tier"]] = max(horizon.get(rec["tier"], h), h)

    def _bucket_floor_above(tier: str, *tiers_constraining: str) -> int | None:
        """Smallest whole `tier` bucket start at/above every horizon."""
        hs = [horizon[x] for x in tiers_constraining if x in horizon]
        if not hs:
            return None
        sec = TIERS[tier]
        return -(-max(hs) // sec) * sec

    report: dict[str, dict[str, int]] = {}

    # raw: per-row token-array equality after decompress
    from .kernels import safe_decompress_tokens_udf

    raw = catalog.read_tier(spark, "raw").where(keep).select("doc_id", "blob")
    seq_for_raw = seq
    if "raw" in horizon:
        # expired raw docs (ts0 < horizon) are legitimately absent on disk
        seq_for_raw = seq.where(F.col("ts0") >= horizon["raw"])
    decoded = safe_decompress_tokens_udf(F.col("blob"))
    j = raw.join(seq_for_raw.select("doc_id", "tokens"), "doc_id", "full_outer")
    bad = (
        F.col("blob").isNull()
        | F.col("tokens").isNull()
        | ~decoded.eqNullSafe(F.col("tokens"))
    )
    row = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("m"),
    ).collect()[0]
    report["raw"] = {"checked": int(row["n"]), "mismatches": int(row["m"] or 0)}

    # 1m: recompute from the original sampled sequences
    m1 = catalog.read_tier(spark, "1m").where(keep)
    if "block" in m1.columns:
        m1 = m1.drop("block")
    expected_1m = rollup_raw(seq, TIERS["1m"])
    lb = _bucket_floor_above("1m", "1m")
    if lb is not None:
        m1 = m1.where(F.col("bucket_ts") >= lb)
        expected_1m = expected_1m.where(F.col("bucket_ts") >= lb)
    n, m = _mismatch_counts(m1, expected_1m)
    report["1m"] = {"checked": n, "mismatches": m}

    # 1h/1d: exact re-aggregation of the committed tier below
    for tier, below in (("1h", "1m"), ("1d", "1h")):
        below_df = catalog.read_tier(spark, below).where(keep)
        if "block" in below_df.columns:
            below_df = below_df.drop("block")
        actual = catalog.read_tier(spark, tier).where(keep)
        if "block" in actual.columns:
            actual = actual.drop("block")
        expected = rollup_up(below_df, TIERS[tier])
        lb = _bucket_floor_above(tier, tier, below)
        if lb is not None:
            actual = actual.where(F.col("bucket_ts") >= lb)
            expected = expected.where(F.col("bucket_ts") >= lb)
        n, m = _mismatch_counts(actual, expected)
        report[tier] = {"checked": n, "mismatches": m}

    # sketch tiers (when materialized): committed upper tier == exact merge
    # of the committed tier below — FULL comparison, not sampled (sketch
    # tables are bounded per (source, bucket), and the doc_id sample
    # predicate can't apply: sketches aggregate across docs). The 1m level
    # is pinned by the contract query + unit suites, and 1m DISK corruption
    # still surfaces here: a corrupted 1m makes its (pre-corruption) upper
    # tier mismatch merge(1m). The merge audit thus covers the whole family.
    from .bloom import merge_words
    from .cms import merge_counters
    from .hll import merge_registers
    from .sketch import merge_sketch

    for family, merge, id_cols, val_col in (
        ("psk", merge_sketch, ("bucket_id",), "cnt"),
        ("hll", merge_registers, ("bucket",), "rho"),
        ("blm", merge_words, ("widx",), "word"),
        ("cms", merge_counters, ("ridx", "cidx"), "cnt"),
    ):
        for tier, below, secs in SKETCH_CASCADE[family]:
            if not os.path.isdir(os.path.join(out_dir, tier)):
                continue
            try:
                below_df = catalog.read_tier(spark, below)
                actual = catalog.read_tier(spark, tier)
            except FileNotFoundError:
                continue
            expected = merge_to_bucket(below_df, secs, merge)
            # APPEND-committed delta rows (ingest_append / watermark
            # finalize) leave duplicate keys in BOTH tiers; serving always
            # merges them, so the audit compares the merged (serving) value
            # — identity when keys are already unique.
            actual = merge_to_bucket(actual, secs, merge)
            hs = [horizon[x] for x in (tier, below) if x in horizon]
            if hs:
                lb = -(-max(hs) // secs) * secs
                actual = actual.where(F.col("bucket_ts") >= lb)
                expected = expected.where(F.col("bucket_ts") >= lb)
            keys = ["source", "bucket_ts", *id_cols]
            a = actual.select(*keys, F.col(val_col).alias("_a"))
            e = expected.select(*keys, F.col(val_col).alias("_e"))
            j = a.join(e, keys, "full_outer")
            bad = ~F.col("_a").eqNullSafe(F.col("_e"))
            row = j.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(bad, 1).otherwise(0)).alias("m"),
            ).collect()[0]
            report[tier] = {"checked": int(row["n"]), "mismatches": int(row["m"] or 0)}

    return report


# ---------------------------------------------------------------------------
# tier-stitched range serving + real-time (materialized ∪ fresh) reads
# ---------------------------------------------------------------------------


def range_aggregate_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    as_of: int | None = None,
    max_doc_seconds: int | None = None,
) -> DataFrame:
    """Per-source exact aggregate over ``[start, end)`` served from the
    COMMITTED retention tiers (rollup.range_aggregate over catalog reads).

    All three tier reads resolve against ONE manifest snapshot
    (:meth:`TierCatalog.pin` semantics via an explicit ``as_of``): a
    concurrently-running cascade can otherwise serve e.g. a 1d tier one
    commit behind the 1m rows the edges read, silently double- or
    under-counting the stitched range. The ``bucket_ts`` range predicates
    reach the parquet row-group stats of each tier scan.

    Endpoints that don't align to minutes are served at SECOND resolution:
    the sub-minute remainders decode only the committed raw tier's
    overlapping documents (rollup._raw_edge_points).

    Retention guard: a segment whose tier has been retention-expired past
    the segment's start would silently UNDERCOUNT (the rows are gone, not
    zero) — each segment is checked against the tier's recorded
    ``horizon_ts`` (retention lineage) and the read fails fast instead.
    """
    from .rollup import STITCH_TIERS, range_aggregate, stitch_segments

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    horizons: dict[str, int] = {}
    for rec in catalog.metrics():
        if rec.get("status") == "retention" and rec.get("horizon_ts") is not None:
            h = int(rec["horizon_ts"])
            horizons[rec["tier"]] = max(horizons.get(rec["tier"], h), h)
    stitch = STITCH_TIERS + ([("raw", 1)] if (start % 60 or end % 60) else [])
    for name, s, _e in stitch_segments(start, end, stitch):
        h = horizons.get(name)
        if h is not None and s < h:
            raise ValueError(
                f"range_aggregate_from_catalog: segment [{s}, ...) needs "
                f"tier {name!r} below its retention horizon {h} — the rows "
                "were expired; narrow the range or serve from a coarser-"
                "aligned range"
            )
    tiers = {
        name: catalog.read_tier(spark, name, as_of=snap)
        for name in ("1m", "1h", "1d")
    }
    raw_df = None
    if start % 60 or end % 60:
        raw_df = catalog.read_tier(spark, "raw", as_of=snap)
    return range_aggregate(
        tiers, start, end, raw_df=raw_df, max_doc_seconds=max_doc_seconds
    )


def range_gapfill_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    step: int,
    strategy: str = "locf",
    as_of: int | None = None,
) -> DataFrame:
    """Gap-filled ``step``-resolution serving grid over ``[start, end)``
    from the COMMITTED tiers (rollup.range_gapfill over a catalog read).

    Reads ONE tier — the coarsest whose bucket divides ``step`` — at one
    manifest snapshot, with the ``bucket_ts`` range predicate pushed to
    the committed parquet (row-group pruning on the time-clustered files).
    Fails fast when the serving tier has been retention-expired past
    ``start`` (the rows are gone, not zero — a silent all-gaps answer
    would look like data)."""
    from .rollup import range_gapfill, serving_tier_for_step

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    name, _secs = serving_tier_for_step(step)
    _check_retention_horizon(catalog, name, start, "range_gapfill_from_catalog")
    tier = catalog.read_tier(spark, name, as_of=snap)
    return range_gapfill({name: tier}, start, end, step, strategy=strategy)


def _check_retention_horizon(
    catalog: TierCatalog, tier: str, start: int, caller: str
) -> None:
    """Serving below a tier's retention horizon would silently UNDERCOUNT
    (the rows are expired, not zero) — every catalog serving read fails
    fast instead. The horizon comes from retention lineage records."""
    for rec in catalog.metrics():
        if (
            rec.get("status") == "retention"
            and rec.get("tier") == tier
            and rec.get("horizon_ts") is not None
            and start < int(rec["horizon_ts"])
        ):
            raise ValueError(
                f"{caller}: [{start}, ...) needs tier {tier!r} below its "
                f"retention horizon {rec['horizon_ts']} — the rows were "
                "expired; narrow the range"
            )


def overview_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    k: int,
    as_of: int | None = None,
) -> DataFrame:
    """Dashboard overview serving: k-point LTTB per source over
    ``[start, end)`` from ONE committed tier — the coarsest with enough
    resolution (rollup.overview_tier_for_range) — at one manifest
    snapshot. A year-long overview reads the 1d tier, never raw points."""
    from .rollup import overview_points, overview_tier_for_range

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    name, _secs = overview_tier_for_range(start, end, k)
    _check_retention_horizon(catalog, name, start, "overview_from_catalog")
    tier = catalog.read_tier(spark, name, as_of=snap)
    return overview_points({name: tier}, start, end, k)


def m4_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    k: int,
    as_of: int | None = None,
) -> DataFrame:
    """M4 pixel-exact overview serving (downsample.m4_points over a
    catalog read): per-source first/last/min/max of each of ``k`` pixel
    buckets over ``[start, end)`` — error-free per pixel column, from ONE
    committed tier (the coarsest with enough resolution, same selector as
    the LTTB overview) at one manifest snapshot, ``bucket_ts`` range
    pushed to the time-clustered scan. Unlike the LTTB path this stays a
    plain JVM hash aggregation (no per-series Python), so it is the
    cheaper overview when pixel-exactness matters more than LTTB's
    perceptual point pick."""
    from .downsample import m4_points
    from .rollup import overview_tier_for_range

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    name, _secs = overview_tier_for_range(start, end, k)
    _check_retention_horizon(catalog, name, start, "m4_from_catalog")
    tier = catalog.read_tier(spark, name, as_of=snap)
    series = (
        tier.where((F.col("bucket_ts") >= start) & (F.col("bucket_ts") < end))
        .groupBy("source", "bucket_ts")
        .agg(F.sum("sum").cast("long").alias("v"))
    )
    return m4_points(series, ["source"], "bucket_ts", "v", start, end, k)


def rate_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    tier: str = "1h",
    as_of: int | None = None,
    value_col: str = "last",
) -> DataFrame:
    """Counter rate serving (rollup.counter_rate over a catalog read):
    PromQL ``rate()``/``increase()`` per (doc_id, source) series from the
    committed ``tier`` restricted to ``[start, end)`` — one snapshot, the
    ``bucket_ts`` range pushed to the time-clustered scan, reset
    correction and true elapsed seconds on sparse series. Like PromQL, a
    series needs >= 2 in-range buckets to produce a rate (each series'
    first in-range bucket seeds the lag and emits nothing)."""
    from .rollup import counter_rate

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    _check_retention_horizon(catalog, tier, start, "rate_from_catalog")
    t = catalog.read_tier(spark, tier, as_of=snap).where(
        (F.col("bucket_ts") >= start) & (F.col("bucket_ts") < end)
    )
    return counter_rate(t, value_col=value_col)


def smooth_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    tier: str = "1h",
    as_of: int | None = None,
    alpha: float = 0.3,
    beta: float = 0.1,
    value_col: str = "last",
) -> DataFrame:
    """Exponential-smoothing serving (rollup.exp_smooth over a catalog
    read): EWMA + Holt level/trend/forecast per (doc_id, source) series
    from the committed ``tier`` restricted to ``[start, end)`` — one
    snapshot, the bucket_ts range pushed to the time-clustered scan so
    the per-series fold array is bounded by range/step."""
    from .rollup import exp_smooth

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    _check_retention_horizon(catalog, tier, start, "smooth_from_catalog")
    t = catalog.read_tier(spark, tier, as_of=snap).where(
        (F.col("bucket_ts") >= start) & (F.col("bucket_ts") < end)
    )
    return exp_smooth(t, alpha=alpha, beta=beta, value_col=value_col)


def instant_from_catalog(
    spark: SparkSession,
    out_dir: str,
    at_ts: int,
    lookback: int,
    tier: str = "1m",
    as_of: int | None = None,
    value_col: str = "last",
) -> DataFrame:
    """Instant-vector serving (rollup.instant_read over a catalog read):
    each (doc_id, source) series' most recent committed ``tier`` bucket in
    the PromQL staleness window ``(at_ts - lookback, at_ts]`` plus
    irate/idelta from the final bucket pair — one snapshot, the bucket_ts
    range pushed into the time-clustered scan so the read is bounded by
    the lookback window, never by history."""
    from .rollup import instant_read

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    _check_retention_horizon(
        catalog, tier, at_ts - lookback, "instant_from_catalog"
    )
    t = catalog.read_tier(spark, tier, as_of=snap)
    return instant_read(t, at_ts, lookback, value_col=value_col)


def predict_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    horizon: int,
    tier: str = "1h",
    as_of: int | None = None,
    value_col: str = "sum",
) -> DataFrame:
    """Trend/extrapolation serving (rollup.linear_predict over a catalog
    read): per-(doc_id, source) least-squares slope of the committed
    ``tier`` series over ``[start, end)`` plus the predicted value
    ``horizon`` seconds past the window — one snapshot, the bucket_ts
    range pushed into the time-clustered scan so the read is bounded by
    the regression window, never by history."""
    from .rollup import linear_predict

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    _check_retention_horizon(catalog, tier, start, "predict_from_catalog")
    t = catalog.read_tier(spark, tier, as_of=snap)
    return linear_predict(t, start, end, horizon, value_col=value_col)


def alerts_from_catalog(
    spark: SparkSession,
    out_dir: str,
    threshold: int,
    min_duration: int,
    tier: str = "1m",
    start: int | None = None,
    end: int | None = None,
    as_of: int | None = None,
    value_col: str = "sum",
) -> DataFrame:
    """Alert-rule evaluation (rollup.alert_intervals over a catalog read):
    firing intervals where the committed ``tier`` series breached
    ``threshold`` for at least ``min_duration`` continuous seconds
    (PromQL ``for:``). Optional [start, end) bounds push into the
    time-clustered scan; the threshold predicate prunes before the
    shuffle either way, so cost tracks breaches, not history."""
    from .rollup import alert_intervals

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    if start is not None:
        _check_retention_horizon(catalog, tier, start, "alerts_from_catalog")
    t = catalog.read_tier(spark, tier, as_of=snap)
    if start is not None:
        t = t.where(F.col("bucket_ts") >= start)
    if end is not None:
        t = t.where(F.col("bucket_ts") < end)
    return alert_intervals(
        t, threshold, TIERS[tier], min_duration, value_col=value_col
    )


def rate_grid_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    step: int,
    tier: str = "1m",
    as_of: int | None = None,
    value_col: str = "last",
) -> DataFrame:
    """Gridded counter-rate serving (rollup.rate_grid over a catalog
    read): per-(doc_id, source) reset-corrected increase + per-second
    rate for every step cell of [start, end) from the committed ``tier``
    — one snapshot, the range pushed into the time-clustered scan."""
    from .rollup import rate_grid

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    _check_retention_horizon(catalog, tier, start, "rate_grid_from_catalog")
    t = catalog.read_tier(spark, tier, as_of=snap)
    return rate_grid(t, start, end, step, value_col=value_col)


def read_doc_range(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    doc_ids: list[str] | None = None,
    as_of: int | None = None,
    max_doc_seconds: int | None = None,
) -> DataFrame:
    """Point-read serving from the COMMITTED raw tier: (doc_id, source,
    ts, v) for the requested documents (or the whole window when
    ``doc_ids=None``) restricted to ``[start, end)`` — rollup.doc_points
    over a snapshot-pinned catalog read. Lossless blobs make the answer
    bitwise the original ingested tokens."""
    from .rollup import doc_points

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    _check_retention_horizon(catalog, "raw", start, "read_doc_range")
    raw = catalog.read_tier(spark, "raw", as_of=snap)
    return doc_points(raw, start, end, doc_ids, max_doc_seconds=max_doc_seconds)


def threshold_from_catalog(
    spark: SparkSession,
    out_dir: str,
    threshold: int,
    start: int | None = None,
    end: int | None = None,
    mode: str = ">=",
    as_of: int | None = None,
    max_doc_seconds: int | None = None,
) -> DataFrame:
    """VALUE-THRESHOLD serving from a committed catalog: every (doc_id,
    source, ts, v) point with ``v >= threshold`` (or ``<=``), optionally
    in ``[start, end)`` — rollup.threshold_points with the committed 1m
    tier's vmin/vmax zone maps indexing the committed raw blobs. Both
    tier reads resolve against ONE manifest snapshot (a cascade commit
    between them could otherwise pair a fresher index with staler blobs,
    or vice versa).

    Retention guard covers BOTH tiers: an expired 1m bucket is a hole in
    the INDEX (its raw points would be silently skipped, a false
    negative), so the guard is as strict as for a direct tier read. An
    unbounded scan (``start=None``) is guarded at 0 — it fails fast on
    any retained catalog, because full-history threshold answers below
    the horizon are unservable, not empty."""
    from .rollup import threshold_points

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    guard_ts = 0 if start is None else int(start)
    _check_retention_horizon(catalog, "raw", guard_ts, "threshold_from_catalog")
    _check_retention_horizon(catalog, "1m", guard_ts, "threshold_from_catalog")
    raw = catalog.read_tier(spark, "raw", as_of=snap)
    m1 = catalog.read_tier(spark, "1m", as_of=snap)
    return threshold_points(
        raw, m1, threshold, start, end, mode, max_doc_seconds=max_doc_seconds
    )


def _read_tier_range(
    spark: SparkSession,
    out_dir: str,
    tier: str,
    start: int | None,
    end: int | None,
    as_of: int | None,
    caller: str,
) -> DataFrame:
    """Shared shape of the analytics catalog twins: one pinned snapshot,
    a retention-horizon guard at ``start`` (0 when unbounded — a
    whole-history analytic below the horizon is unservable, not empty),
    and bucket_ts bounds pushed into the committed scan (time-clustered
    files prune on row-group stats)."""
    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    _check_retention_horizon(
        catalog, tier, 0 if start is None else int(start), caller
    )
    df = catalog.read_tier(spark, tier, as_of=snap)
    if start is not None:
        df = df.where(F.col("bucket_ts") >= int(start))
    if end is not None:
        df = df.where(F.col("bucket_ts") < int(end))
    return df


def coverage_from_catalog(
    spark: SparkSession,
    out_dir: str,
    tier: str = "1m",
    window_seconds: int = 3600,
    start: int | None = None,
    end: int | None = None,
    as_of: int | None = None,
) -> DataFrame:
    """Data-completeness/SLO audit over a COMMITTED tier
    (rollup.coverage_by_window as a serving read): per (source, window)
    expected-vs-present buckets + longest silent stretch. ``start``/
    ``end`` bound the audit (and the span clamp) to the window of
    interest and push into the clustered scan."""
    from .rollup import TIERS, coverage_by_window

    df = _read_tier_range(
        spark, out_dir, tier, start, end, as_of, "coverage_from_catalog"
    )
    return coverage_by_window(df, TIERS[tier], window_seconds)


def top_from_catalog(
    spark: SparkSession,
    out_dir: str,
    tier: str = "1h",
    k: int = 5,
    window_seconds: int = 86400,
    start: int | None = None,
    end: int | None = None,
    as_of: int | None = None,
) -> DataFrame:
    """Top-K series per (source, window) from a COMMITTED tier
    (rollup.top_series as a serving read)."""
    from .rollup import top_series

    df = _read_tier_range(
        spark, out_dir, tier, start, end, as_of, "top_from_catalog"
    )
    return top_series(df, k, window_seconds)


def corr_from_catalog(
    spark: SparkSession,
    out_dir: str,
    tier: str = "1h",
    start: int | None = None,
    end: int | None = None,
    as_of: int | None = None,
    sources: list[str] | None = None,
    max_sources: int = 1_000,
) -> DataFrame:
    """Cross-source Pearson correlation over a COMMITTED tier
    (rollup.source_correlation as a serving read). ``sources=`` names
    the cohort (pushed into the committed scan); otherwise the quadratic
    pair grid is guarded by ``max_sources``."""
    from .rollup import source_correlation

    df = _read_tier_range(
        spark, out_dir, tier, start, end, as_of, "corr_from_catalog"
    )
    return source_correlation(df, sources=sources, max_sources=max_sources)


def group_from_catalog(
    spark: SparkSession,
    out_dir: str,
    mapping: DataFrame,
    tier: str = "1h",
    start: int | None = None,
    end: int | None = None,
    as_of: int | None = None,
    default_group: str = "other",
) -> DataFrame:
    """Label-grouped fleet aggregation over a COMMITTED tier
    (rollup.group_aggregate as a serving read): the source→group dim is
    broadcast against the pinned, range-pruned tier scan."""
    from .rollup import group_aggregate

    df = _read_tier_range(
        spark, out_dir, tier, start, end, as_of, "group_from_catalog"
    )
    return group_aggregate(df, mapping, default_group)


def moving_from_catalog(
    spark: SparkSession,
    out_dir: str,
    tier: str = "1h",
    window_seconds: int = 21600,
    start: int | None = None,
    end: int | None = None,
    as_of: int | None = None,
) -> DataFrame:
    """Trailing-window grid over a COMMITTED tier (rollup.moving_window
    as a serving read). NOTE the PromQL lookback contract: a trailing
    frame at ``start`` needs ``window_seconds`` of history, so the
    pushed scan starts at ``start - window_seconds`` and the output is
    re-cut to [start, end) after the frame — cells near ``start`` see
    their full trailing context instead of a silently truncated one."""
    from .rollup import TIERS, moving_window

    w = int(window_seconds)
    scan_start = None if start is None else int(start) - w
    df = _read_tier_range(
        spark, out_dir, tier, scan_start, end, as_of, "moving_from_catalog"
    )
    out = moving_window(df, w, TIERS[tier])
    if start is not None:
        out = out.where(F.col("bucket_ts") >= int(start))
    return out


def ratio_from_catalog(
    spark: SparkSession,
    out_dir: str,
    num_source: str,
    den_source: str,
    tier: str = "1h",
    start: int | None = None,
    end: int | None = None,
    as_of: int | None = None,
) -> DataFrame:
    """Series binary op over a COMMITTED tier (rollup.series_ratio as a
    serving read); the two-source predicate is applied before the pivot
    so it pushes into the pinned scan."""
    from .rollup import series_ratio

    df = _read_tier_range(
        spark, out_dir, tier, start, end, as_of, "ratio_from_catalog"
    )
    return series_ratio(df, num_source, den_source)


def absent_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    tier: str = "1h",
    step_seconds: int = 3600,
    expected: list[str] | None = None,
    as_of: int | None = None,
) -> DataFrame:
    """Stale-feed detection over a COMMITTED tier (rollup.absent_series
    as a serving read): which watchlist sources went quiet in each step
    cell of the pinned, range-pruned scan."""
    from .rollup import absent_series

    df = _read_tier_range(
        spark, out_dir, tier, int(start), int(end), as_of,
        "absent_from_catalog",
    )
    return absent_series(df, int(start), int(end), step_seconds, expected)


def cusum_from_catalog(
    spark: SparkSession,
    out_dir: str,
    tier: str = "1h",
    slack: int = 0,
    threshold_ratio: int = 8,
    start: int | None = None,
    end: int | None = None,
    as_of: int | None = None,
) -> DataFrame:
    """CUSUM changepoint scan over a COMMITTED tier
    (rollup.cusum_changepoints as a serving read); ``target`` is the
    series mean over the served range, so [start, end) defines the
    baseline window as well as the scan bounds."""
    from .rollup import cusum_changepoints

    df = _read_tier_range(
        spark, out_dir, tier, start, end, as_of, "cusum_from_catalog"
    )
    return cusum_changepoints(df, slack, threshold_ratio)


def range_aggregate_many_from_catalog(
    spark: SparkSession,
    out_dir: str,
    ranges: list[tuple[int, int]],
    as_of: int | None = None,
) -> DataFrame:
    """BATCH range serving from a committed catalog
    (rollup.range_aggregate_many): N dashboard panels answered with ONE
    pinned scan per tier total — every tier read resolves against one
    manifest snapshot, and each tier actually used by some range's
    segments is retention-guarded at the earliest start that touches
    it."""
    from .rollup import range_aggregate_many, stitch_segments

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    earliest: dict[str, int] = {}
    for start, end in ranges:
        for name, s, _e in stitch_segments(int(start), int(end)):
            earliest[name] = min(earliest.get(name, s), s)
    tier_dfs = {}
    for name, s in earliest.items():
        _check_retention_horizon(
            catalog, name, s, "range_aggregate_many_from_catalog"
        )
        tier_dfs[name] = catalog.read_tier(spark, name, as_of=snap)
    return range_aggregate_many(tier_dfs, ranges)


def range_gapfill_many_from_catalog(
    spark: SparkSession,
    out_dir: str,
    ranges: list[tuple[int, int]],
    step: int,
    strategy: str = "locf",
    as_of: int | None = None,
) -> DataFrame:
    """BATCH gap-filled serving from a committed catalog
    (rollup.range_gapfill_many): N gridded panels sharing one ``step``,
    ONE pinned scan of the serving tier, retention-guarded at the
    earliest panel start."""
    from .rollup import range_gapfill_many, serving_tier_for_step

    if not ranges:
        raise ValueError("ranges must be non-empty")
    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    name, _secs = serving_tier_for_step(step)
    _check_retention_horizon(
        catalog, name, min(int(s) for s, _e in ranges),
        "range_gapfill_many_from_catalog",
    )
    tier = catalog.read_tier(spark, name, as_of=snap)
    return range_gapfill_many({name: tier}, ranges, step, strategy)


def read_tier_realtime(
    spark: SparkSession,
    out_dir: str,
    tier: str,
    sequences: DataFrame,
    as_of: int | None = None,
    mode: str = "hwm",
    order_key=None,
) -> DataFrame:
    """Real-time continuous aggregate (TimescaleDB-style): the committed
    tier UNION an on-the-fly rollup of the documents the cascade has not
    materialized yet — so a consumer between cascade runs sees EXACTLY
    what a full re-run would produce, without one. Both catalog reads
    resolve against one manifest snapshot. Output schema = the tier
    schema (no ``block`` column on 1m: fresh rows carry no committed
    blob).

    How "not materialized yet" is decided — ``mode``:

    * ``"hwm"`` (default, the scale path): documents are gated MAP-SIDE
      against per-source high-water marks of a monotone ingest key
      (``order_key``, default seqops.default_order_key — the same ingest
      contract context packing documents). The marks come from one
      narrow-column aggregate over the committed raw tier (doc_id +
      source only); no shuffle ever touches the token payload. Correct
      when each source's committed set is a PREFIX under the key —
      ingest appends monotone ids and the cascade materializes prefixes,
      which is exactly how appends reach a table. A source with nothing
      committed has no mark and is wholly fresh.
    * ``"antijoin"`` — the general fallback for non-prefix commit
      patterns: a left-anti join of ``sequences`` against the committed
      raw doc ids. Exact for ANY commit pattern, but the anti-join
      shuffles the probe side's full rows (token payload included) at
      cluster scale — prefer "hwm" whenever the ingest contract holds.
    """
    from .rollup import TIERS, rollup_raw, rollup_up
    from .seqops import default_order_key

    if tier not in ("1m", "1h", "1d"):
        raise ValueError(f"read_tier_realtime serves 1m/1h/1d, got {tier!r}")
    if mode not in ("hwm", "antijoin"):
        raise ValueError(f"mode must be 'hwm' or 'antijoin', got {mode!r}")
    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    cols = ["doc_id", "source", "bucket_ts", "cnt", "sum",
            "vmin", "vmax", "first", "last"]
    committed = catalog.read_tier(spark, tier, as_of=snap).select(*cols)
    raw = catalog.read_tier(spark, "raw", as_of=snap)
    if mode == "hwm":
        key = order_key if order_key is not None else default_order_key()
        marks = {
            r["source"]: int(r["hwm"])
            for r in raw.select("source", key.alias("_k"))
            .groupBy("source")
            .agg(F.max("_k").alias("hwm"))
            .collect()
        }
        gate = F.lit(True)
        for src in sorted(marks):
            gate = F.when(F.col("source") == src, key > marks[src]).otherwise(gate)
        fresh_seq = sequences.where(gate)
    else:
        raw_ids = raw.select("doc_id")
        fresh_seq = sequences.join(raw_ids, "doc_id", "left_anti")
    fresh = rollup_raw(fresh_seq, TIERS["1m"], with_blocks=False)
    for name in ("1h", "1d"):
        if TIERS[name] <= TIERS[tier]:
            fresh = rollup_up(fresh, TIERS[name])
    return committed.unionByName(fresh.select(*cols))


def percentiles_in_range(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    keys: tuple[str, ...] = ("source",),
    pcts: tuple[int, ...] = (50, 90, 99),
    as_of: int | None = None,
) -> DataFrame:
    """Range-scoped percentile serving: stitch the committed ``psk_*``
    sketch tiers over ``[start, end)`` (coarsest aligned segments, one
    pruned scan per level) and read percentiles off the exact sum-merge —
    bitwise what a one-shot sketch over the range's raw points yields,
    because the segments partition the range and the sketch combine is
    exact integer addition. No token rescan, minute-aligned endpoints."""
    from .rollup import stitched_rows
    from .sketch import merge_sketch, percentiles, sketch

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    tier_dfs = {
        name: catalog.read_tier(spark, f"psk_{name}", as_of=snap)
        for name in ("1m", "1h", "1d")
    }
    raw_df = None
    if start % 60 or end % 60:
        raw_df = catalog.read_tier(spark, "raw", as_of=snap)
    rows = stitched_rows(
        tier_dfs, start, end, raw_df=raw_df,
        edge_rows=lambda pts: sketch(pts, ["source", "bucket_ts"], "v"),
    )
    return percentiles(merge_sketch(rows, list(keys)), list(keys), list(pcts))


def cdf_in_range(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    splits: list[int],
    keys: tuple[str, ...] = ("source",),
    as_of: int | None = None,
) -> DataFrame:
    """Range-scoped CDF serving: stitch the committed ``psk_*`` sketch
    tiers over ``[start, end)`` (same segment plan as
    :func:`percentiles_in_range`) and read ``P(v <= split)`` per key off
    the exact sum-merge (sketch.cdf) — bitwise what a one-shot sketch
    over the range's raw points yields."""
    from .rollup import stitched_rows
    from .sketch import cdf, merge_sketch, sketch

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    tier_dfs = {
        name: catalog.read_tier(spark, f"psk_{name}", as_of=snap)
        for name in ("1m", "1h", "1d")
    }
    raw_df = None
    if start % 60 or end % 60:
        raw_df = catalog.read_tier(spark, "raw", as_of=snap)
    rows = stitched_rows(
        tier_dfs, start, end, raw_df=raw_df,
        edge_rows=lambda pts: sketch(pts, ["source", "bucket_ts"], "v"),
    )
    return cdf(merge_sketch(rows, list(keys)), list(keys), list(splits))


def histogram_in_range(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    keys: tuple[str, ...] = ("source",),
    as_of: int | None = None,
) -> DataFrame:
    """Range-scoped value-HISTOGRAM serving: the merged sketch's buckets
    with [lo, hi] bounds and per-key fractions (sketch.histogram) over
    ``[start, end)`` — the distribution-panel read, bounded rows per
    key, no raw rescan."""
    from .rollup import stitched_rows
    from .sketch import histogram, merge_sketch, sketch

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    tier_dfs = {
        name: catalog.read_tier(spark, f"psk_{name}", as_of=snap)
        for name in ("1m", "1h", "1d")
    }
    raw_df = None
    if start % 60 or end % 60:
        raw_df = catalog.read_tier(spark, "raw", as_of=snap)
    rows = stitched_rows(
        tier_dfs, start, end, raw_df=raw_df,
        edge_rows=lambda pts: sketch(pts, ["source", "bucket_ts"], "v"),
    )
    return histogram(merge_sketch(rows, list(keys)), list(keys))


def percentiles_in_range_many(
    spark: SparkSession,
    out_dir: str,
    ranges: list[tuple[int, int]],
    keys: tuple[str, ...] = ("source",),
    pcts: tuple[int, ...] = (50, 90, 99),
    as_of: int | None = None,
) -> DataFrame:
    """BATCH range-scoped percentile serving: one percentile set per
    (range, keys) for MANY minute-aligned ranges, with ONE pinned scan
    per committed ``psk_*`` sketch level (rollup.stitched_rows_many's
    range_id tagging; overlapping ranges re-merge only the shared
    bounded sketch rows). Per range bitwise :func:`percentiles_in_range`
    — the segment partition makes the sum-merge exact, so batching
    changes nothing. Output: (range_id, keys..., pct, estimate)."""
    from .rollup import stitched_rows_many
    from .sketch import merge_sketch, percentiles

    if not ranges:
        raise ValueError("ranges must be non-empty")
    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    tier_dfs = {
        name: catalog.read_tier(spark, f"psk_{name}", as_of=snap)
        for name in ("1m", "1h", "1d")
    }
    rows = stitched_rows_many(tier_dfs, ranges)
    ks = ["range_id", *keys]
    out = percentiles(merge_sketch(rows, ks), ks, list(pcts))
    return out.select(
        F.col("range_id").cast("long").alias("range_id"), *keys,
        "pct", "estimate",
    )


def cdf_in_range_many(
    spark: SparkSession,
    out_dir: str,
    ranges: list[tuple[int, int]],
    splits: list[int],
    keys: tuple[str, ...] = ("source",),
    as_of: int | None = None,
) -> DataFrame:
    """BATCH range-scoped CDF serving: one P(v <= split) set per
    (range, keys) for MANY minute-aligned ranges, ONE pinned scan per
    committed ``psk_*`` level (rollup.stitched_rows_many's range_id
    tagging). Per range bitwise :func:`cdf_in_range` — the segment
    partition makes the sum-merge exact, so batching changes nothing.
    Output: (range_id, keys..., split, n_le, total, cdf)."""
    from .rollup import stitched_rows_many
    from .sketch import cdf, merge_sketch

    if not ranges:
        raise ValueError("ranges must be non-empty")
    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    tier_dfs = {
        name: catalog.read_tier(spark, f"psk_{name}", as_of=snap)
        for name in ("1m", "1h", "1d")
    }
    rows = stitched_rows_many(tier_dfs, ranges)
    ks = ["range_id", *keys]
    out = cdf(merge_sketch(rows, ks), ks, list(splits))
    return out.select(
        F.col("range_id").cast("long").alias("range_id"), *keys,
        "split", "n_le", "total", "cdf",
    )


def percentile_grid_rows(
    tier_dfs: dict[str, DataFrame],
    start: int,
    end: int,
    step: int,
    keys: tuple[str, ...] = ("source",),
    pcts: tuple[int, ...] = (50, 90, 99),
    tiers: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Step-aligned percentile GRID over ``[start, end)``: p50/p90/p99
    per (keys..., step bucket) — the dashboard panel read ("p99 per hour
    over the last day") — served from ONE pruned scan of the COARSEST
    psk sketch level whose bucket divides ``step``
    (rollup.serving_tier_for_step: a 1d grid reads psk_1d, 1440x fewer
    rows than psk_1m). The bucket_ts range predicate pushes to the
    time-clustered committed scan; re-bucketing to the grid is the exact
    integer sum-merge, so every grid cell is bitwise a one-shot sketch
    over that cell's raw points. Buckets with no data emit no row (a
    dashboard gap, not a zero). Output: (keys..., bucket_ts, pct,
    estimate)."""
    from .rollup import serving_tier_for_step
    from .sketch import merge_sketch, percentiles

    if start % step or end % step:
        raise ValueError(f"range [{start},{end}) is not {step}s-aligned")
    if end <= start:
        raise ValueError("empty range")
    name, _secs = serving_tier_for_step(step, tiers)
    if name not in tier_dfs:
        raise KeyError(f"percentile_grid_rows: tier {name!r} not provided")
    tier = tier_dfs[name].where(
        (F.col("bucket_ts") >= int(start)) & (F.col("bucket_ts") < int(end))
    )
    rows = tier.withColumn(
        "bucket_ts", (F.floor(F.col("bucket_ts") / step) * step).cast("long")
    )
    ks = [*keys, "bucket_ts"]
    return percentiles(merge_sketch(rows, ks), ks, list(pcts))


def percentile_grid_many_rows(
    tier_dfs: dict[str, DataFrame],
    ranges: list[tuple[int, int]],
    step: int,
    keys: tuple[str, ...] = ("source",),
    pcts: tuple[int, ...] = (50, 90, 99),
    tiers: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """BATCH percentile grid: the :func:`percentile_grid_rows` panel for
    MANY step-aligned ``[start, end)`` ranges, ONE pruned scan of the
    serving psk level total (all panels' bucket ranges OR-combined into
    the pushed predicate — the range_gapfill_many shape over sketch
    rows). Panel attribution is a codegen when-array explode BEFORE the
    grid re-bucket (panels are step-aligned, so a tier bucket lies in a
    panel iff its grid bucket does); overlapping panels re-merge only
    the shared bounded sketch rows. Per panel bitwise the single-grid
    path. Output: (range_id, keys..., bucket_ts, pct, estimate)."""
    from .rollup import serving_tier_for_step
    from .sketch import merge_sketch, percentiles

    if not ranges:
        raise ValueError("ranges must be non-empty")
    for s, e in ranges:
        if s % step or e % step:
            raise ValueError(f"range [{s},{e}) is not {step}s-aligned")
        if e <= s:
            raise ValueError(f"empty range [{s},{e})")
    name, _secs = serving_tier_for_step(step, tiers)
    if name not in tier_dfs:
        raise KeyError(f"percentile_grid_many_rows: tier {name!r} not provided")
    scan_pred = None
    whens = []
    for rid, (s, e) in enumerate(ranges):
        p = (F.col("bucket_ts") >= int(s)) & (F.col("bucket_ts") < int(e))
        scan_pred = p if scan_pred is None else (scan_pred | p)
        whens.append(F.when(p, F.lit(rid)))
    rows = (
        tier_dfs[name].where(scan_pred)
        .withColumn("range_id", F.explode(F.array_compact(F.array(*whens))))
        .withColumn(
            "bucket_ts", (F.floor(F.col("bucket_ts") / step) * step).cast("long")
        )
    )
    ks = ["range_id", *keys, "bucket_ts"]
    out = percentiles(merge_sketch(rows, ks), ks, list(pcts))
    return out.withColumn("range_id", F.col("range_id").cast("long"))


def percentile_grid_from_catalog(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    step: int,
    keys: tuple[str, ...] = ("source",),
    pcts: tuple[int, ...] = (50, 90, 99),
    as_of: int | None = None,
) -> DataFrame:
    """Catalog twin of :func:`percentile_grid_rows`: one pinned read of
    the serving psk level, retention-guarded at ``start`` (an expired
    grid cell is missing data, not an empty panel — fail fast)."""
    from .rollup import serving_tier_for_step

    name, _secs = serving_tier_for_step(step)
    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    _check_retention_horizon(
        catalog, f"psk_{name}", int(start), "percentile_grid_from_catalog"
    )
    tier = catalog.read_tier(spark, f"psk_{name}", as_of=snap)
    return percentile_grid_rows({name: tier}, start, end, step, keys, pcts)


def percentile_grid_many_from_catalog(
    spark: SparkSession,
    out_dir: str,
    ranges: list[tuple[int, int]],
    step: int,
    keys: tuple[str, ...] = ("source",),
    pcts: tuple[int, ...] = (50, 90, 99),
    as_of: int | None = None,
) -> DataFrame:
    """Catalog twin of :func:`percentile_grid_many_rows` (N dashboard
    panels = ONE pruned scan of the serving psk level)."""
    from .rollup import serving_tier_for_step

    if not ranges:
        raise ValueError("ranges must be non-empty")
    name, _secs = serving_tier_for_step(step)
    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    _check_retention_horizon(
        catalog, f"psk_{name}", min(int(s) for s, _ in ranges),
        "percentile_grid_many_from_catalog",
    )
    tier = catalog.read_tier(spark, f"psk_{name}", as_of=snap)
    return percentile_grid_many_rows({name: tier}, ranges, step, keys, pcts)


def distinct_in_range(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    keys: tuple[str, ...] = ("source",),
    as_of: int | None = None,
) -> DataFrame:
    """Range-scoped distinct-count serving from the committed ``hll_*``
    register tiers: stitched segment rows max-merge into the range's
    registers (idempotent, so the estimate equals registers built over
    the range's raw points exactly — bit-stable estimate, see
    hll.hll_summary). No token rescan for aligned endpoints; second-
    resolution endpoints decode only the raw-tier edge documents and fold
    their values into the registers."""
    from .hll import hll_registers, hll_summary, merge_registers
    from .rollup import stitched_rows

    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    tier_dfs = {
        name: catalog.read_tier(spark, f"hll_{name}", as_of=snap)
        for name in ("1m", "1h", "1d")
    }
    raw_df = None
    if start % 60 or end % 60:
        raw_df = catalog.read_tier(spark, "raw", as_of=snap)
    rows = stitched_rows(
        tier_dfs, start, end, raw_df=raw_df,
        edge_rows=lambda pts: hll_registers(
            pts, ["source", "bucket_ts"], "v", dict_hash=True
        ),
    )
    return hll_summary(merge_registers(rows, list(keys)), list(keys))


def distinct_in_range_many(
    spark: SparkSession,
    out_dir: str,
    ranges: list[tuple[int, int]],
    keys: tuple[str, ...] = ("source",),
    as_of: int | None = None,
) -> DataFrame:
    """BATCH range-scoped distinct-count serving: one HLL summary per
    (range, keys) for MANY minute-aligned ranges, ONE pinned scan per
    committed ``hll_*`` register level (rollup.stitched_rows_many).
    Max-merge is IDEMPOTENT, so overlapping panels re-merging shared
    register rows is exact by construction — per range bitwise
    :func:`distinct_in_range`. Output: (range_id, keys..., estimate,
    ...hll_summary columns)."""
    from .hll import hll_summary, merge_registers
    from .rollup import stitched_rows_many

    if not ranges:
        raise ValueError("ranges must be non-empty")
    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    tier_dfs = {
        name: catalog.read_tier(spark, f"hll_{name}", as_of=snap)
        for name in ("1m", "1h", "1d")
    }
    rows = stitched_rows_many(tier_dfs, ranges)
    ks = ["range_id", *keys]
    out = hll_summary(merge_registers(rows, ks), ks)
    return out.withColumn("range_id", F.col("range_id").cast("long"))


def delete_documents(
    spark: SparkSession,
    out_dir: str,
    doc_ids: DataFrame | list,
    superseded_grace_sec: float = 600.0,
    rebuild_sketches: bool = True,
) -> dict[str, int]:
    """Per-document deletion across the core tiers (raw/1m/1h/1d) — the
    right-to-be-forgotten operation a training-data store needs: every
    tier row of the given doc_ids is removed, by rewriting ONLY the
    affected source partitions through the ordinary superseding commits
    (``status="delete"`` records carry per-source deleted-row lineage;
    readers stay consistent throughout, and the pre-delete manifest
    prefix remains a readable snapshot until vacuum).

    Exactness: every core tier is keyed per document, so deletion is a
    row filter — the post-delete catalog is bitwise the cascade over the
    input minus those documents. Sketch tiers (psk/hll/blm/cms) aggregate
    ACROSS documents and cannot be point-deleted; with
    ``rebuild_sketches=True`` (default) they are REPAIRED churn-bounded:
    only the (source, bucket) keys the deleted docs touched are rebuilt
    from the post-delete raw tier (1m from decoded candidate blobs, each
    coarser level re-merged from the just-repaired level below — the
    validate_ingest idiom), committed as superseding per-source runs
    with ``touched_buckets`` lineage. With ``rebuild_sketches=False``
    committed sketch tiers are left untouched and reported under
    ``"sketch_tiers_skipped"``.

    Plan: ``doc_ids`` (a one-column DataFrame or a list) is broadcast
    into an anti-join per affected partition — deletion requests are
    small; the rewrite reads and writes only the affected sources.
    Returns ``{tier: rows_deleted}``.

    Note: :func:`validate_tiers` audits the catalog AGAINST an input
    corpus — after a deletion, audit against the corpus minus the deleted
    documents (anti-join the same id set), or the deleted docs will be
    flagged as missing.
    """
    import shutil
    import uuid as _uuid

    if not isinstance(doc_ids, DataFrame):
        doc_ids = spark.createDataFrame([(d,) for d in doc_ids], "doc_id string")
    ids = F.broadcast(doc_ids.select("doc_id").distinct())
    catalog = TierCatalog(out_dir, superseded_grace_sec=superseded_grace_sec)
    deleted: dict[str, int] = {}
    skipped = []
    present = sorted(
        {rec["tier"] for rec in catalog.metrics() if rec.get("path")}
        - {"raw+1m"}
    )
    sketch_present = [
        t for t in present if t.split("_", 1)[0] in ("psk", "hll", "blm", "cms")
    ]
    span_rows: list = []
    if sketch_present and rebuild_sketches and "raw" in present:
        # The deleted docs' 1m coverage [lo, hi) must be captured BEFORE
        # the raw rewrite (their rows are gone after; the superseded run
        # dirs may be vacuumed out from under a lazy plan). Three narrow
        # columns per deleted doc — bounded by the deletion request.
        span_rows = (
            catalog.read_tier(spark, "raw")
            .join(ids, "doc_id", "left_semi")
            .select(
                "source",
                (F.floor(F.col("ts0") / 60) * 60).cast("long").alias("lo"),
                ((F.floor((F.col("ts0") + F.col("n_tok") - 1) / 60) + 1) * 60)
                .cast("long")
                .alias("hi"),
            )
            .collect()
        )
    for tier in present:
        if tier.split("_", 1)[0] in ("psk", "hll", "blm", "cms"):
            skipped.append(tier)
            continue
        if tier.startswith("drv_") or tier == "ingest":
            # derived recording-rule tiers carry no doc_id (they derive
            # from the 1h tier); refresh_derived repairs them from the
            # post-delete commits. "ingest" rows are batch lineage only.
            skipped.append(tier)
            continue
        try:
            tier_df = catalog.read_tier(spark, tier)
        except FileNotFoundError:
            continue
        hits = {
            r["source"]: r["n"]
            for r in tier_df.join(ids, "doc_id", "left_semi")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if not hits:
            deleted[tier] = 0
            continue
        affected = sorted(hits)
        tmp_dir = os.path.join(
            out_dir, f"_delete_{tier}_{os.getpid()}_{_uuid.uuid4().hex[:8]}"
        )
        (
            tier_df.filter(F.col("source").isin(affected))
            .join(ids, "doc_id", "left_anti")
            .write.mode("overwrite")
            .partitionBy("source")
            .parquet(tmp_dir)
        )
        for src in affected:
            tmp_part = os.path.join(tmp_dir, f"source={src}")
            if os.path.exists(tmp_part):
                catalog.commit_moved_partition(
                    tier, src, tmp_part, status="delete", deleted_rows=hits[src]
                )
            else:  # every row of this source belonged to deleted docs
                catalog.delete_partition(
                    tier, src, status="delete", deleted_rows=hits[src]
                )
        shutil.rmtree(tmp_dir, ignore_errors=True)
        deleted[tier] = sum(hits.values())
    if skipped and rebuild_sketches and span_rows:
        rebuilt = _rebuild_sketches_after_delete(
            spark, catalog, span_rows, skipped
        )
        deleted.update(rebuilt)
    elif skipped:
        deleted["sketch_tiers_skipped"] = len(skipped)
    return deleted


def _rebuild_sketches_after_delete(
    spark: SparkSession,
    catalog: TierCatalog,
    span_rows: list,
    sketch_tiers: list[str],
) -> dict[str, int]:
    """Churn-bounded sketch-tier repair after :func:`delete_documents`:
    rebuild ONLY the (source, bucket) keys the deleted docs touched, from
    the post-delete catalog, and commit superseding per-source runs.

    * Touched keys: each deleted doc covered 1m buckets
      ``[floor(ts0/60)*60, floor((ts0+n_tok-1)/60)*60]`` — exploded in
      Spark (bounded by deleted token-minutes), coarsened per level.
    * ``fam_1m`` rows rebuild from the post-delete RAW tier: candidate
      docs = raw docs overlapping any deleted span (broadcast overlap
      semi-join; ts0 scan bounds pushed), decoded ONCE, their points
      restricted to touched minutes, then the family's ordinary builder.
      Untouched minutes never contribute points from a deleted doc, so
      keeping their rows verbatim is exact.
    * ``fam_1h``/``fam_1d`` rows re-merge from the JUST-REPAIRED level
      below, restricted to the touched coarse windows (the
      validate_ingest idiom) — never from raw.

    Commits carry ``status="delete_rebuild"`` with ``touched_buckets``
    lineage; only sources with touched keys are rewritten. Cost ∝
    touched buckets, never tier size. Returns per-tier rewritten-row
    counts under ``"<tier>_rebuilt"`` keys.
    """
    import shutil
    import uuid as _uuid

    from .bloom import bloom_words, merge_words
    from .cms import cms_counters, merge_counters
    from .hll import hll_registers, merge_registers
    from .kernels import decompress_tokens_udf
    from .rollup import _resolve_max_doc_seconds
    from .sketch import merge_sketch, sketch as hdr_sketch

    out_dir = catalog.base_dir
    spans = spark.createDataFrame(
        [(r["source"], r["lo"], r["hi"]) for r in span_rows],
        "source string, lo long, hi long",
    )
    touched_1m = spans.select(
        "source",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi") - 60, F.lit(60))
        ).alias("bucket_ts"),
    ).distinct()

    raw = catalog.read_tier(spark, "raw")
    lo_min = min(r["lo"] for r in span_rows)
    hi_max = max(r["hi"] for r in span_rows)
    scan = raw.where(
        (F.col("ts0") < hi_max)
        & (F.col("ts0") > lo_min - _resolve_max_doc_seconds(raw, None))
    )
    s = spans.alias("s")
    cand = scan.alias("r").join(
        F.broadcast(s),
        (F.col("r.source") == F.col("s.source"))
        & (F.col("r.ts0") < F.col("s.hi"))
        & (F.col("r.ts0") + F.col("r.n_tok") > F.col("s.lo")),
        "left_semi",
    )
    pts = (
        cand.select(
            "source", "ts0", decompress_tokens_udf(F.col("blob")).alias("tokens")
        )
        .select("source", "ts0", F.posexplode("tokens").alias("pos", "v"))
        .select(
            "source",
            (F.floor((F.col("ts0") + F.col("pos")) / 60) * 60)
            .cast("long")
            .alias("bucket_ts"),
            "v",
        )
        .join(F.broadcast(touched_1m), ["source", "bucket_ts"], "left_semi")
    )

    builders = {
        "psk": lambda p: hdr_sketch(p, ["source", "bucket_ts"], "v"),
        "hll": lambda p: hll_registers(p, ["source", "bucket_ts"], "v", dict_hash=True),
        "blm": lambda p: bloom_words(p, ["source", "bucket_ts"], "v", dict_hash=True),
        "cms": lambda p: cms_counters(p, ["source", "bucket_ts"], "v", dict_hash=True),
    }
    merges = {"psk": merge_sketch, "hll": merge_registers,
              "blm": merge_words, "cms": merge_counters}
    by_family: dict[str, list[str]] = {}
    for t in sketch_tiers:
        fam, _, level = t.partition("_")
        by_family.setdefault(fam, []).append(level)
    level_order = {"1m": 0, "1h": 1, "1d": 2}
    out: dict[str, int] = {}
    for fam in sorted(by_family):
        levels = sorted(by_family[fam], key=level_order.get)
        if levels[0] != "1m":
            raise ValueError(
                f"sketch rebuild needs {fam}_1m committed to repair "
                f"{fam}_{levels[0]} (coarser levels re-merge from below)"
            )
        for level in levels:
            tier = f"{fam}_{level}"
            secs = _SKETCH_TIER_SECS[level]
            touched = (
                touched_1m
                if level == "1m"
                else touched_1m.select(
                    "source",
                    (F.floor(F.col("bucket_ts") / secs) * secs)
                    .cast("long")
                    .alias("bucket_ts"),
                ).distinct()
            )
            if level == "1m":
                rebuilt = builders[fam](pts)
            else:
                below_level = levels[levels.index(level) - 1]
                below = catalog.read_tier(spark, f"{fam}_{below_level}")
                t_alias = touched.alias("t")
                window_rows = below.alias("b").join(
                    F.broadcast(t_alias),
                    (F.col("b.source") == F.col("t.source"))
                    & (
                        (F.floor(F.col("b.bucket_ts") / secs) * secs).cast("long")
                        == F.col("t.bucket_ts")
                    ),
                    "left_semi",
                )
                rebuilt = merge_to_bucket(window_rows, secs, merges[fam])
            old = catalog.read_tier(spark, tier)
            touched_counts = {
                r["source"]: r["n"]
                for r in touched.groupBy("source")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            affected = sorted(touched_counts)
            new_rows = (
                old.filter(F.col("source").isin(affected))
                .join(F.broadcast(touched), ["source", "bucket_ts"], "left_anti")
                .unionByName(rebuilt.filter(F.col("source").isin(affected)))
            )
            tmp_dir = os.path.join(
                out_dir, f"_delrb_{tier}_{os.getpid()}_{_uuid.uuid4().hex[:8]}"
            )
            (
                tier_writer(new_rows, "source").mode("overwrite")
                .partitionBy("source").parquet(tmp_dir)
            )
            n_rows = 0
            for src in affected:
                tmp_part = os.path.join(tmp_dir, f"source={src}")
                if os.path.exists(tmp_part):
                    n_rows += pa_ds.dataset(tmp_part, format="parquet").count_rows()
                    catalog.commit_moved_partition(
                        tier, src, tmp_part, status="delete_rebuild",
                        touched_buckets=touched_counts[src],
                    )
                else:  # every row of this source sat in touched, now-empty keys
                    catalog.delete_partition(
                        tier, src, status="delete_rebuild",
                        touched_buckets=touched_counts[src],
                    )
            shutil.rmtree(tmp_dir, ignore_errors=True)
            out[f"{tier}_rebuilt"] = n_rows
    return out


# ---------------------------------------------------------------------------
# late-data batch ingest: APPEND-only absorption into a committed catalog
# ---------------------------------------------------------------------------


def _append_tier(
    catalog: TierCatalog,
    df: DataFrame,
    tier: str,
    pending: list[str],
    batch_id: str,
) -> int:
    """Commit ``df``'s rows as per-source APPEND runs (prior runs stay
    live; read_tier unions them). Mirrors ``_write_tier``'s one-job
    partitionBy write + per-source manifest commits, but with
    ``status="append"`` carrying ``batch_id`` — the replay-resume key of
    :func:`ingest_append`. Returns rows appended."""
    import shutil

    if not pending:
        return 0
    tmp_dir = os.path.join(
        catalog.base_dir, f"_tmp_{tier}_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    )
    t0 = time.monotonic()
    (
        tier_writer(df.filter(F.col("source").isin(pending)), "source")
        .mode("overwrite")
        .partitionBy("source")
        .parquet(tmp_dir)
    )
    wall_ms = round((time.monotonic() - t0) * 1000, 1)
    total = 0
    for src in pending:
        tmp_part = os.path.join(tmp_dir, f"source={src}")
        if not os.path.exists(tmp_part):
            continue  # no delta rows for this source/tier; nothing to commit
        rows = pa_ds.dataset(tmp_part, format="parquet").count_rows()
        catalog.commit_moved_partition(
            tier, src, tmp_part, status="append",
            batch_id=batch_id, rows=rows, wall_ms=wall_ms,
        )
        total += rows
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return total


def _retention_horizons(catalog: TierCatalog) -> dict[str, int]:
    """tier -> strictest event-time horizon ``apply_retention`` ever
    trimmed it to (from the manifest's retention lineage)."""
    horizon: dict[str, int] = {}
    for rec in catalog.metrics():
        if rec.get("status") == "retention" and rec.get("horizon_ts") is not None:
            h = int(rec["horizon_ts"])
            horizon[rec["tier"]] = max(horizon.get(rec["tier"], h), h)
    return horizon


def ingest_append(
    spark: SparkSession,
    late_docs,
    out_dir: str,
    batch_id: str,
    compress_method: Method = Method.DeltaOfDelta,
    with_blocks: bool | None = None,
    with_sketches: bool | None = None,
    with_blooms: bool | None = None,
    with_cms: bool | None = None,
    skip_existing: bool = True,
    sketch_kernel: bool | None = None,
    fail_after_tier: str | None = None,  # test hook, mirrors run_cascade
) -> dict:
    """Absorb a LATE batch of documents into a committed catalog with
    APPEND-only commits — the batch-backfill twin of the streamed
    watermark finalize, and the reason a 100 TB catalog never re-runs its
    cascade for yesterday's stragglers.

    Exactness needs no merge or rewrite, by construction of the tier
    schemas: every core tier row is keyed per ``doc_id`` (rollup_raw /
    rollup_up group by doc), so a new document's rows are purely ADDITIVE
    — the post-ingest catalog is bitwise ``run_cascade`` over base∪late.
    The sketch families absorb deltas exactly under their own merges
    (psk/cms sum, hll max, blm bit_or — all re-aggregable), which every
    serving read already applies; ``TierCatalog.compact`` later folds the
    accumulated append runs into one clustered run per partition.

    Cost is O(|late batch|): one fused Arrow pass (compress + 1m rollup
    from the same flat buffer, the run_cascade staging shape) over the
    late docs only, bounded upper-tier aggregations of the DELTA, and —
    when ``skip_existing`` — one column-pruned doc_id scan of the affected
    sources' committed raw runs. Nothing existing is read back otherwise,
    and nothing is rewritten.

    Exactly-once per ``batch_id``: every append commit carries the batch
    id in its manifest record; a replay (crash anywhere between commits)
    recomputes the delta from the late input and skips (tier, source)
    pairs already committed for this batch — the same manifest-is-the-
    commit-point contract as run_cascade's resume. A completed batch
    records ``tier="ingest"`` lineage and re-ingesting it is a no-op.
    ``skip_existing`` resolves against the raw runs NOT committed by this
    batch, so a replay never mistakes its own partial appends for
    pre-existing documents.

    Retention-aware: rows at/below a tier's already-applied horizon are
    EXCLUDED (counted per tier under ``"expired"``) — appending them
    would resurrect expired event time that the next retention pass wrote
    lineage against, and TimescaleDB makes the same call (late data below
    the retention horizon is dropped, never silently served).

    Family flags default to WHAT THE CATALOG ALREADY MATERIALIZES (a
    catalog built ``with_sketches=True`` gets sketch deltas; one without
    stays core-only), as does ``with_blocks`` (sniffed from the committed
    1m schema). Returns ``{"docs", "skipped_existing", "tiers": {tier:
    rows_appended}, "expired": {tier: rows}}``.
    """
    import shutil

    if not batch_id or not isinstance(batch_id, str):
        raise ValueError("ingest_append requires a non-empty string batch_id")
    ensure_shipped(spark)
    catalog = TierCatalog(out_dir, superseded_grace_sec=600.0)
    # sweep staging a KILLED ingest/cascade left behind (same PID-scoped
    # rule as run_cascade: only dirs whose writer process is gone)
    for entry in os.listdir(out_dir):
        if entry.startswith(("_tmp_", "_retention_")) and not _writer_alive(entry):
            import shutil as _sh

            _sh.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
    recs = catalog.metrics()
    if any(
        r["tier"] == "ingest" and r["partition"] == batch_id and r.get("status") == "ingest"
        for r in recs
    ):
        return {"docs": 0, "skipped_existing": 0, "tiers": {}, "expired": {},
                "resumed": "batch already ingested"}

    late = late_docs if isinstance(late_docs, DataFrame) else spark.read.parquet(late_docs)
    committed = {r["tier"] for r in recs if r.get("path")}
    if with_sketches is None:
        with_sketches = "psk_1m" in committed or "hll_1m" in committed
    if with_blooms is None:
        with_blooms = "blm_1m" in committed
    if with_cms is None:
        with_cms = "cms_1m" in committed
    if with_blocks is None:
        with_blocks = (
            "block" in catalog.read_tier(spark, "1m").columns
            if "1m" in committed else True
        )

    # (tier, source) pairs THIS batch already committed — the replay-resume set
    appended = {
        (r["tier"], r["partition"])
        for r in recs
        if r.get("status") == "append" and r.get("batch_id") == batch_id
    }
    batch_run_rels = {
        r["path"] for r in recs
        if r.get("batch_id") == batch_id and r.get("path")
    }

    skipped_existing = 0
    if skip_existing and "raw" in committed:
        # docs already in the committed raw tier are dropped (idempotent
        # re-delivery of an upstream batch) — resolved against runs NOT
        # committed by this batch_id, so a crash replay keeps its own docs
        raw_base = os.path.join(out_dir, "raw")
        existing_dirs = [
            os.path.join(raw_base, rel)
            for runs in catalog.current_run_lists("raw").values()
            for rel in runs
            if rel not in batch_run_rels
        ]
        if existing_dirs:
            n_before = late.count()
            # a re-DELIVERED doc is identical content, so it carries the
            # same ts0 — scope the dedup scan to the late batch's event
            # window (pushed min/max prune on the time-clustered raw runs;
            # at 100 TB this reads the overlapping days, not the corpus).
            # A doc_id arriving with a DIFFERENT ts0 is a mutation, which
            # this dedup deliberately does not mask.
            lo, hi = late.agg(F.min("ts0"), F.max("ts0")).collect()[0]
            existing_ids = (
                spark.read.option("basePath", raw_base).parquet(*existing_dirs)
                .where(F.col("ts0").between(lo, hi))
                .select("doc_id")
            )
            late = late.join(existing_ids, "doc_id", "left_anti")
            # the anti-join output feeds FOUR tier builds; pin it so the
            # dedup scan runs once, not per tier
            late = late.localCheckpoint(eager=True)
            n_docs = late.count()
            skipped_existing = n_before - n_docs
        else:
            n_docs = late.count()
    else:
        n_docs = late.count()

    horizon = _retention_horizons(catalog)
    expired: dict[str, int] = {}

    def _above_horizon(df: DataFrame, tier: str, col: str) -> DataFrame:
        h = horizon.get(tier)
        if h is None:
            return df
        kept = df.where(F.col(col) >= h)
        dropped = df.where(F.col(col) < h).count()
        if dropped:
            expired[tier] = dropped
        return kept

    sources = sorted(r[0] for r in late.select("source").distinct().collect())

    def pend(tier: str) -> list[str]:
        return [s for s in sources if (tier, s) not in appended]

    rows_out: dict[str, int] = {}
    stage_fused = None
    try:
        if n_docs:
            from .kernels import RAW_M1_UNION_SCHEMA, compress_rollup_map_in_arrow

            union = late.select("doc_id", "source", "ts0", "n_tok", "tokens").mapInArrow(
                compress_rollup_map_in_arrow(
                    compress_method, TIERS["1m"], with_blocks, compress_method
                ),
                RAW_M1_UNION_SCHEMA,
            )
            stage_fused = os.path.join(
                out_dir, f"_tmp_fused_{os.getpid()}_{uuid.uuid4().hex[:8]}"
            )
            union.write.mode("overwrite").parquet(stage_fused)
            staged = spark.read.parquet(stage_fused)
            raw_delta = staged.filter(F.col("family") == "r").select(
                "doc_id", "source", "ts0", "n_tok", "blob"
            )
            m1_cols = [
                "doc_id", "source", "bucket_ts", "cnt", "sum",
                "vmin", "vmax", "first", "last",
            ] + (["block"] if with_blocks else [])
            m1_delta = staged.filter(F.col("family") == "m").select(*m1_cols)

            rows_out["raw"] = _append_tier(
                catalog, _above_horizon(raw_delta, "raw", "ts0"), "raw",
                pend("raw"), batch_id,
            )
            if fail_after_tier == "raw":
                raise RuntimeError("injected failure after raw append")
            rows_out["1m"] = _append_tier(
                catalog, _above_horizon(m1_delta, "1m", "bucket_ts"), "1m",
                pend("1m"), batch_id,
            )
            if fail_after_tier == "1m":
                raise RuntimeError("injected failure after 1m append")

            # upper tiers derive from the DELTA 1m alone — per-doc keying
            # means a late doc's 1h/1d rows are functions of its own rows
            m1_for_up = m1_delta.drop("block") if with_blocks else m1_delta
            h1_delta = rollup_up(m1_for_up, TIERS["1h"])
            rows_out["1h"] = _append_tier(
                catalog, _above_horizon(h1_delta, "1h", "bucket_ts"), "1h",
                pend("1h"), batch_id,
            )
            if fail_after_tier == "1h":
                raise RuntimeError("injected failure after 1h append")
            rows_out["1d"] = _append_tier(
                catalog,
                _above_horizon(rollup_up(h1_delta, TIERS["1d"]), "1d", "bucket_ts"),
                "1d", pend("1d"), batch_id,
            )
    finally:
        if stage_fused is not None:
            shutil.rmtree(stage_fused, ignore_errors=True)

    if n_docs and (with_sketches or with_blooms or with_cms):
        from .bloom import bloom_words, merge_words
        from .cms import WIDTH as CMS_WIDTH, cms_counters, merge_counters
        from .hll import hll_registers, merge_registers
        from .sketch import merge_sketch, sketch as hdr_sketch

        if sketch_kernel is None:
            sketch_kernel = _auto_sketch_kernel(late)
        fams = []
        if sketch_kernel:
            if with_sketches:
                fams += ["p", "h"]
            if with_blooms:
                fams.append("b")
            if with_cms:
                fams.append("c")
        psk_d = hll_d = blm_d = cms_d = None
        stage_dir = None
        try:
            if fams:
                from .kernels import SKETCH_PARTIALS_SCHEMA, sketch_partials_map_in_arrow

                partials = late.select("source", "ts0", "tokens").mapInArrow(
                    sketch_partials_map_in_arrow(60, families=tuple(fams)),
                    SKETCH_PARTIALS_SCHEMA,
                )
                stage_dir = os.path.join(
                    out_dir, f"_tmp_skpart_{os.getpid()}_{uuid.uuid4().hex[:8]}"
                )
                partials.write.mode("overwrite").parquet(stage_dir)
                part_df = spark.read.parquet(stage_dir)
                psk_d = (
                    part_df.filter(F.col("family") == "p")
                    .groupBy("source", "bucket_ts", F.col("bucket").alias("bucket_id"))
                    .agg(F.sum("val").alias("cnt"))
                )
                hll_d = (
                    part_df.filter(F.col("family") == "h")
                    .groupBy("source", "bucket_ts", "bucket")
                    .agg(F.max("val").alias("rho"))
                )
                blm_d = (
                    part_df.filter(F.col("family") == "b")
                    .groupBy("source", "bucket_ts", F.col("bucket").alias("widx"))
                    .agg(F.bit_or("val").alias("word"))
                )
                cms_d = (
                    part_df.filter(F.col("family") == "c")
                    .groupBy(
                        "source",
                        "bucket_ts",
                        (F.col("bucket") / CMS_WIDTH).cast("int").alias("ridx"),
                        (F.col("bucket") % CMS_WIDTH).cast("int").alias("cidx"),
                    )
                    .agg(F.sum("val").alias("cnt"))
                )
            else:
                pts = _sketch_points(late)
                if with_sketches:
                    psk_d = hdr_sketch(pts, ["source", "bucket_ts"], "v")
                    hll_d = hll_registers(pts, ["source", "bucket_ts"], "v", dict_hash=True)
                if with_blooms:
                    blm_d = bloom_words(pts, ["source", "bucket_ts"], "v", dict_hash=True)
                if with_cms:
                    cms_d = cms_counters(pts, ["source", "bucket_ts"], "v", dict_hash=True)

            for family, base_df, merge in (
                ("psk", psk_d, merge_sketch),
                ("hll", hll_d, merge_registers),
                ("blm", blm_d, merge_words),
                ("cms", cms_d, merge_counters),
            ):
                if base_df is None:
                    continue
                # the whole family's deltas chain off the DELTA 1m level —
                # merging the committed tier in would double-count on read
                delta = base_df
                rows_out[f"{family}_1m"] = _append_tier(
                    catalog,
                    _above_horizon(delta, f"{family}_1m", "bucket_ts"),
                    f"{family}_1m", pend(f"{family}_1m"), batch_id,
                )
                if fail_after_tier == f"{family}_1m":
                    raise RuntimeError(f"injected failure after {family}_1m append")
                for tier, _below, secs in SKETCH_CASCADE[family]:
                    delta = merge_to_bucket(delta, secs, merge)
                    rows_out[tier] = _append_tier(
                        catalog, _above_horizon(delta, tier, "bucket_ts"),
                        tier, pend(tier), batch_id,
                    )
        finally:
            if stage_dir is not None:
                shutil.rmtree(stage_dir, ignore_errors=True)

    catalog.record(
        "ingest", batch_id, status="ingest",
        docs=n_docs, skipped_existing=skipped_existing,
        sources=len(sources), tiers=len(rows_out),
    )
    return {
        "docs": n_docs, "skipped_existing": skipped_existing,
        "tiers": rows_out, "expired": expired,
    }


def maintain(
    spark: SparkSession,
    out_dir: str,
    now_ts: int | None = None,
    retention_policy: dict[str, int | None] | None = None,
    compact_files: int = 1,
    compact_range: bool = False,
    fold_sketches: bool = True,
    refresh_derived_rules: bool = True,
    derived_mappings: dict | None = None,
    superseded_grace_sec: float = 600.0,
) -> dict:
    """One maintenance pass over a committed catalog — the scheduled job a
    long-lived deployment runs between cascades (TimescaleDB's
    retention + compression policies; Iceberg's ``expire_snapshots`` +
    ``rewrite_data_files``), in the order the pieces compose:

    1. **retention** (when ``now_ts`` is given): expire tier rows past the
       policy horizon (:func:`apply_retention` — affected sources only).
    2. **compaction**: fold every partition's accumulated APPEND runs
       (streamed watermark finalizes, :func:`ingest_append` batches) and
       small files into ``compact_files`` time-clustered files
       (``TierCatalog.compact`` — conditional commits, so a concurrent
       writer is never clobbered). Runs after retention so a partition is
       not rewritten twice in one pass.
    3. **vacuum**: physically remove superseded run dirs past the reader
       grace window.

    ``fold_sketches=True`` (default) additionally SEMANTICALLY compacts
    the sketch families before the file compaction: the duplicate
    (source, bucket, id) delta rows that APPEND commits accumulate (one
    per ingest batch / stream finalize) are merged back to one row per
    key with the family's own combine — bounding sketch tier size by the
    key universe again instead of growing with ingest count. Committed
    through the same conditional guard as compaction.

    ``refresh_derived_rules=True`` (default) brings every MATERIALIZED
    recording rule (:mod:`tersets_spark.derived`) up to date right after
    retention — a retention pass is a content change the derived tiers
    must follow, and running the refresh BEFORE compaction means the
    compaction commits land after the new freshness watermark (the next
    refresh sees only ``compact`` records and no-ops). Rules that need a
    dim frame (``group_1h``) take it from ``derived_mappings[rule]``;
    with none provided the rule is skipped and reported under
    ``"derived_skipped"`` rather than refreshed against a guessed
    mapping.

    ``compact_range=True`` (with ``compact_files > 1``) lays each
    partition out as time-DISJOINT files (``repartitionByRange`` on the
    tier's time column), which is what makes the NEXT retention pass
    churn-bounded: wholly-expired files drop, wholly-kept files re-link,
    only the straddler rewrites (see ``apply_retention(file_level=...)``).

    Every sub-step already writes its own per-partition lineage; this
    adds one ``tier="maintain"`` summary record so operators can see each
    pass and its totals in the manifest. All steps are idempotent and
    resumable by construction (re-running a crashed pass re-does only
    what is still pending). Returns
    ``{"expired": {tier: rows}, "compacted": {tier: partitions},
    "vacuumed": {tier: dirs}}``.
    """
    catalog = TierCatalog(out_dir, superseded_grace_sec=superseded_grace_sec)
    expired: dict[str, int] = {}
    if now_ts is not None:
        expired = apply_retention(
            spark, out_dir, now_ts, retention_policy,
            superseded_grace_sec=superseded_grace_sec,
        )
    derived_refreshed: dict[str, str] = {}
    derived_skipped: list[str] = []
    if refresh_derived_rules:
        from .derived import DERIVED_RULES, _last_watermark, refresh_derived

        recs = catalog.metrics()
        for rule in sorted(DERIVED_RULES):
            if _last_watermark(recs, rule) is None:
                continue  # never materialized in this catalog
            mapping = (derived_mappings or {}).get(rule)
            if rule == "group_1h" and mapping is None:
                derived_skipped.append(rule)
                continue
            r = refresh_derived(spark, out_dir, rule, mapping=mapping)
            derived_refreshed[rule] = r["mode"]
    tiers = sorted(
        {r["tier"] for r in catalog.metrics() if r.get("path")} - {"raw+1m"}
    )
    tiers = [t for t in tiers if not t.endswith("_partials")]
    sketch_tiers = [
        t for t in tiers if t.split("_", 1)[0] in ("psk", "hll", "blm", "cms")
    ]
    folded: dict[str, int] = {}
    if fold_sketches:
        # semantic compaction FIRST: merge the delta rows APPEND commits
        # accumulated, then the file compaction below skips the partitions
        # the fold already rewrote to one run/one file
        folded = {t: _fold_sketch_tier(spark, catalog, t) for t in sketch_tiers}
    compacted = {
        t: catalog.compact(
            spark, t, max_files_per_partition=compact_files,
            range_partition=compact_range,
        )
        for t in tiers
    }
    vacuumed = {t: catalog.vacuum(t) for t in tiers}
    catalog.record(
        "maintain", str(now_ts if now_ts is not None else "-"), status="maintain",
        expired_rows=sum(expired.values()),
        folded_partitions=sum(folded.values()),
        compacted_partitions=sum(compacted.values()),
        vacuumed_dirs=sum(vacuumed.values()),
    )
    return {"expired": expired, "folded": folded,
            "compacted": compacted, "vacuumed": vacuumed,
            "derived_refreshed": derived_refreshed,
            "derived_skipped": derived_skipped}


#: family prefix -> (merge fn import path is resolved lazily), tier seconds
_SKETCH_TIER_SECS = {"1m": 60, "1h": 3600, "1d": 86400}


def _fold_sketch_tier(spark: SparkSession, catalog: TierCatalog, tier: str) -> int:
    """Semantic compaction of one sketch tier: merge duplicate
    (source, bucket, id) rows that APPEND commits accumulate (one delta
    row per ingest batch / stream finalize) back into a single row per
    key — the same combine every serving read applies, materialized.
    Committed per source through the SAME conditional-commit guard as
    file compaction, so a concurrent writer is never clobbered. Returns
    partitions rewritten."""
    import shutil

    from .bloom import merge_words
    from .cms import merge_counters
    from .hll import merge_registers
    from .sketch import merge_sketch

    merges = {"psk": merge_sketch, "hll": merge_registers,
              "blm": merge_words, "cms": merge_counters}
    fam, _, level = tier.partition("_")
    merge = merges.get(fam)
    secs = _SKETCH_TIER_SECS.get(level)
    if merge is None or secs is None:
        raise ValueError(f"not a sketch tier: {tier!r}")
    guards = catalog.current_runs(tier)  # src -> last live rel (the guard)
    if not any(guards.values()):
        return 0
    folded = merge_to_bucket(catalog.read_tier(spark, tier), secs, merge)
    tmp_dir = os.path.join(
        catalog.base_dir, f"_tmp_fold_{tier}_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    )
    (
        tier_writer(folded, "source").mode("overwrite")
        .partitionBy("source").parquet(tmp_dir)
    )
    rewritten = 0
    for src, guard in sorted(guards.items()):
        if guard is None:
            continue
        tmp_part = os.path.join(tmp_dir, f"source={src}")
        if not os.path.exists(tmp_part):
            continue
        rel_new, dest = catalog._new_run_dir(tier, src)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(tmp_part, dest)
        rows = pa_ds.dataset(dest, format="parquet").count_rows()
        ok = catalog.record_if_current(
            tier, src, guard, path=rel_new, rows=rows,
            bytes_out=_catalog_dir_bytes(dest), folded=True,
        )
        if not ok:  # concurrent writer superseded the guard: abandon
            shutil.rmtree(dest, ignore_errors=True)
            continue
        if catalog.auto_vacuum:
            catalog.vacuum(tier, partitions=[src])
        rewritten += 1
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return rewritten


def serve(
    spark: SparkSession,
    out_dir: str,
    start: int,
    end: int,
    doc_ids: list[str] | None = None,
    step: int | None = None,
    strategy: str = "locf",
    k: int | None = None,
    style: str = "lttb",
    rate_tier: str | None = None,
    rate_step: int | None = None,
    threshold: int | None = None,
    threshold_mode: str = ">=",
    instant_tier: str | None = None,
    horizon: int | None = None,
    alert_for: int | None = None,
    alert_threshold: int | None = None,
    smooth: bool = False,
    derived_rule: str | None = None,
    as_of: int | None = None,
) -> DataFrame:
    """ONE serving entry point over a committed catalog — routes an
    event-time ``[start, end)`` read to the strategy its shape implies,
    so a consumer does not have to know the tier layout:

    * ``doc_ids`` given  -> :func:`read_doc_range` — exact per-document
      points of those series (blob decode+slice in-kernel; pushed
      ``doc_id IN`` + ``ts0`` bounds).
    * ``k`` given        -> a k-point dashboard overview from the coarsest
      tier with enough resolution: ``style='lttb'`` (default) is
      :func:`overview_from_catalog` (perceptual point pick),
      ``style='m4'`` is :func:`m4_from_catalog` (pixel-exact
      first/last/min/max per bucket, pure JVM).
    * ``step`` given     -> :func:`range_gapfill_from_catalog` — fixed
      step-aligned grid with ``strategy`` fill (locf/linear/null), served
      from the coarsest tier dividing ``step``.
    * ``rate_tier`` given -> :func:`rate_from_catalog` — PromQL-style
      per-series counter rate/increase over that committed tier; add
      ``rate_step`` for :func:`rate_grid_from_catalog` — gridded rate
      panels (one cell per step, per-cell resets()).
    * ``instant_tier`` given -> :func:`instant_from_catalog` — the
      instant-vector read at ``end`` with staleness lookback
      ``end - start`` (idelta/irate from the final bucket pair).
    * ``horizon`` given -> :func:`predict_from_catalog` — per-series
      least-squares trend over ``[start, end)`` extrapolated ``horizon``
      seconds past the window (deriv/predict_linear).
    * ``alert_for`` given (with ``alert_threshold``) ->
      :func:`alerts_from_catalog` — firing intervals where the series
      breached the threshold for at least ``alert_for`` continuous
      seconds (PromQL ``for:``).
    * ``smooth=True`` -> :func:`smooth_from_catalog` — EWMA + Holt
      level/trend/one-step forecast per series over ``[start, end)``.
    * ``derived_rule`` given -> the materialized recording rule's rows
      (:func:`tersets_spark.derived.read_derived`) cut to ``[start,
      end)`` — precomputed rate / grouped series as a plain pruned read.
    * ``threshold`` given -> :func:`threshold_from_catalog` — every point
      with ``v >= threshold`` (``threshold_mode="<="`` flips it), served
      via the 1m tier's vmin/vmax zone maps so only candidate documents'
      blobs are decoded.
    * otherwise          -> :func:`range_aggregate_from_catalog` — exact
      per-source aggregate, stitched from the coarsest aligned tier
      segments with raw-edge decode for sub-minute endpoints.

    The shape selectors are mutually exclusive (raises ``ValueError`` on
    ambiguity); ``as_of`` pins every variant to one manifest snapshot.
    Each underlying path enforces its own retention-horizon guard, so a
    request older than what the chosen tier retains fails fast instead
    of silently under-reporting.
    """
    chosen = [name for name, v in
              (("doc_ids", doc_ids), ("k", k), ("step", step),
               ("rate_tier", rate_tier or rate_step),
               ("threshold", threshold), ("instant_tier", instant_tier),
               ("horizon", horizon), ("alert_for", alert_for),
               ("smooth", smooth or None), ("derived_rule", derived_rule))
              if v is not None]
    if len(chosen) > 1:
        raise ValueError(
            f"serve: selectors are mutually exclusive, got {chosen}"
        )
    if alert_for is not None and alert_threshold is None:
        raise ValueError("serve: alert_for requires alert_threshold")
    if style not in ("lttb", "m4"):
        raise ValueError(f"serve: unknown overview style {style!r}")
    if doc_ids is not None:
        return read_doc_range(spark, out_dir, start, end, doc_ids, as_of=as_of)
    if k is not None:
        if style == "m4":
            return m4_from_catalog(spark, out_dir, start, end, k, as_of=as_of)
        return overview_from_catalog(spark, out_dir, start, end, k, as_of=as_of)
    if step is not None:
        return range_gapfill_from_catalog(
            spark, out_dir, start, end, step, strategy=strategy, as_of=as_of
        )
    if rate_step is not None:
        return rate_grid_from_catalog(
            spark, out_dir, start, end, rate_step,
            tier=rate_tier or "1m", as_of=as_of,
        )
    if rate_tier is not None:
        return rate_from_catalog(
            spark, out_dir, start, end, tier=rate_tier, as_of=as_of
        )
    if instant_tier is not None:
        return instant_from_catalog(
            spark, out_dir, end, end - start, tier=instant_tier, as_of=as_of
        )
    if horizon is not None:
        return predict_from_catalog(
            spark, out_dir, start, end, horizon, as_of=as_of
        )
    if alert_for is not None:
        return alerts_from_catalog(
            spark, out_dir, alert_threshold, alert_for,
            start=start, end=end, as_of=as_of,
        )
    if smooth:
        return smooth_from_catalog(spark, out_dir, start, end, as_of=as_of)
    if derived_rule is not None:
        from .derived import DERIVED_TIME_COLUMN, read_derived

        tcol = DERIVED_TIME_COLUMN[derived_rule]
        return read_derived(spark, out_dir, derived_rule, as_of=as_of).where(
            (F.col(tcol) >= int(start)) & (F.col(tcol) < int(end))
        )
    if threshold is not None:
        return threshold_from_catalog(
            spark, out_dir, threshold, start, end,
            mode=threshold_mode, as_of=as_of,
        )
    return range_aggregate_from_catalog(spark, out_dir, start, end, as_of=as_of)


def validate_ingest(
    spark: SparkSession,
    sequences_path: str,
    out_dir: str,
    since: int,
) -> dict[str, dict[str, int]]:
    """CHURN-BOUNDED audit: verify only what APPEND commits added after
    manifest snapshot ``since`` — the consumer-side companion of
    :func:`ingest_append` and the streamed watermark finalize. A 100 TB
    catalog cannot re-audit everything after every daily batch;
    ``validate_tiers`` bounds cost by ``sample_frac`` (a fraction of the
    whole catalog), this bounds it by the CHURN (all of the new data,
    none of the old).

    * **core tiers** — post-``since`` append runs are per-doc rows: each
      tier's new rows are recomputed from the original sequences of
      exactly those doc_ids (semi-join; the corpus scan prunes to the
      appended docs) and compared value-exact, the same invariants as
      ``validate_tiers``.
    * **sketch tiers** — the new delta rows' (source, bucket) keys are
      re-merged from the FULL tier and compared against an exact merge of
      the full tier below, restricted to those keys — both scans push the
      bucket predicates into time-clustered files, so cost is bounded by
      the touched buckets, not the tier.

    REPLACE commits (retention, compaction, delete) are deliberately out
    of scope — they rewrite history that this audit treats as already
    audited; run ``validate_tiers`` for whole-catalog assurance. Returns
    ``{tier: {"checked": n, "mismatches": m}}`` over the touched tiers.
    """
    from .kernels import safe_decompress_tokens_udf

    ensure_shipped(spark)
    catalog = TierCatalog(out_dir, superseded_grace_sec=600.0)
    recs = catalog.metrics()
    new_runs: dict[str, list[str]] = {}
    for rec in recs[since:]:
        if rec.get("status") == "append" and rec.get("path"):
            new_runs.setdefault(rec["tier"], []).append(rec["path"])
    # drop runs a later REPLACE/compaction superseded (their dirs may be
    # vacuumed); the rewrite that folded them is out of scope by contract
    live: dict[str, list[str]] = {}
    for tier, rels in new_runs.items():
        current = {
            r for runs in catalog.current_run_lists(tier).values() for r in runs
        }
        keep = [r for r in rels if r in current]
        if keep:
            live[tier] = keep
    report: dict[str, dict[str, int]] = {}
    if not live:
        return report
    seq = spark.read.parquet(sequences_path)

    def _read_runs(tier: str) -> DataFrame:
        base = os.path.join(out_dir, tier)
        dirs = [os.path.join(base, rel) for rel in live[tier]]
        return spark.read.option("basePath", base).parquet(*dirs).drop("run")

    # core tiers: per-doc recompute of exactly the appended docs
    if "raw" in live:
        raw = _read_runs("raw").select("doc_id", "blob")
        j = raw.join(seq.select("doc_id", "tokens"), "doc_id", "left")
        bad = (
            F.col("tokens").isNull()
            | ~safe_decompress_tokens_udf(F.col("blob")).eqNullSafe(F.col("tokens"))
        )
        row = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(bad, 1).otherwise(0)).alias("m"),
        ).collect()[0]
        report["raw"] = {"checked": int(row["n"]), "mismatches": int(row["m"] or 0)}
    core_pairs = []
    if "1m" in live:
        core_pairs.append(("1m", None))
    for tier, below in (("1h", "1m"), ("1d", "1h")):
        if tier in live:
            core_pairs.append((tier, below))
    horizon = _retention_horizons(catalog)
    for tier, below in core_pairs:
        actual = _read_runs(tier)
        if "block" in actual.columns:
            actual = actual.drop("block")
        docs = actual.select("doc_id").distinct()
        seq_docs = seq.join(docs, "doc_id", "left_semi")
        expected = rollup_raw(seq_docs, TIERS["1m"])
        if tier != "1m":
            expected = rollup_up(expected, TIERS["1h"])
        if tier == "1d":
            expected = rollup_up(expected, TIERS["1d"])
        # ingest_append excluded rows at/below an applied retention horizon
        # — the recompute must exclude them too, or they read as missing
        if tier in horizon:
            expected = expected.where(F.col("bucket_ts") >= horizon[tier])
        n, m = _mismatch_counts(actual, expected)
        report[tier] = {"checked": n, "mismatches": m}

    # sketch tiers: bucket-scoped merged comparison against the tier below
    from .bloom import merge_words
    from .cms import merge_counters
    from .hll import merge_registers
    from .sketch import merge_sketch

    fam_specs = {
        "psk": (merge_sketch, ("bucket_id",), "cnt"),
        "hll": (merge_registers, ("bucket",), "rho"),
        "blm": (merge_words, ("widx",), "word"),
        "cms": (merge_counters, ("ridx", "cidx"), "cnt"),
    }
    for tier in sorted(live):
        fam, _, level = tier.partition("_")
        if fam not in fam_specs:
            continue
        merge, id_cols, val_col = fam_specs[fam]
        secs = _SKETCH_TIER_SECS[level]
        keys_df = _read_runs(tier).select("source", "bucket_ts").distinct()
        if level == "1m":
            # finest sketch level: recompute the touched buckets from the
            # original sequences of their sources' points in-range
            lohi = keys_df.agg(F.min("bucket_ts"), F.max("bucket_ts")).collect()[0]
            pts = _sketch_points(seq).where(
                F.col("bucket_ts").between(int(lohi[0]), int(lohi[1]))
            )
            if fam == "psk":
                from .sketch import sketch as hdr_sketch

                expected = hdr_sketch(pts, ["source", "bucket_ts"], "v")
            elif fam == "hll":
                from .hll import hll_registers

                expected = hll_registers(pts, ["source", "bucket_ts"], "v",
                                         dict_hash=True)
            elif fam == "blm":
                from .bloom import bloom_words

                expected = bloom_words(pts, ["source", "bucket_ts"], "v",
                                       dict_hash=True)
            else:
                from .cms import cms_counters

                expected = cms_counters(pts, ["source", "bucket_ts"], "v",
                                        dict_hash=True)
        else:
            below = f"{fam}_" + {"1h": "1m", "1d": "1h"}[level]
            expected = merge_to_bucket(catalog.read_tier(spark, below), secs, merge)
        actual = merge_to_bucket(catalog.read_tier(spark, tier), secs, merge)
        keys = ["source", "bucket_ts", *id_cols]
        a = actual.join(keys_df, ["source", "bucket_ts"], "left_semi").select(
            *keys, F.col(val_col).alias("_a"))
        e = expected.join(keys_df, ["source", "bucket_ts"], "left_semi").select(
            *keys, F.col(val_col).alias("_e"))
        j = a.join(e, keys, "full_outer")
        row = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(~F.col("_a").eqNullSafe(F.col("_e")), 1).otherwise(0)).alias("m"),
        ).collect()[0]
        report[tier] = {"checked": int(row["n"]), "mismatches": int(row["m"] or 0)}
    return report

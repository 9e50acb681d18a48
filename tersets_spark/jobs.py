"""End-to-end retention-cascade job: raw -> 1m -> 1h -> 1d.

One invocation = one resumable job (north_rule): each tier is written per
source partition through TierCatalog's atomic directory replace, the manifest
records lineage + throughput metrics per partition, and a rerun anti-joins
the completed set so a killed job picks up exactly where it stopped.

Plan shape per tier (PLANS.md has the explain evidence):
  raw:   scan sequences -> mapInArrow compress -> write (map-only, no shuffle)
  1m:    scan sequences -> mapInArrow rollup kernel -> write (map-only)
  1h/1d: scan tier below -> JVM hash aggregate (exact integer combine) -> write
Filters on pending sources are pushed to the parquet scan (partition/row-group
pruning); only raw/1m cross the Python boundary, in Arrow batches.
``apply_retention`` expires tier rows past their policy horizon.
"""

from __future__ import annotations

import os
import time

import pyarrow.dataset as pa_ds
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TierCatalog
from .methods import Method
from .rollup import TIERS, rollup_raw, rollup_up, salted_repartition
from .shipping import ensure_shipped


def _move_partitions_and_record(
    catalog: TierCatalog, tier: str, tmp_dir: str, sources: list[str], t0: float
) -> None:
    import shutil

    wall_ms = round((time.monotonic() - t0) * 1000, 1)
    for src in sources:
        tmp_part = os.path.join(tmp_dir, f"source={src}")
        if not os.path.exists(tmp_part):
            continue
        final = catalog.partition_dir(tier, src)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.replace(tmp_part, final)
        ds = pa_ds.dataset(final, format="parquet")
        rows = ds.count_rows()
        bytes_out = sum(os.path.getsize(os.path.join(r, f))
                        for r, _d, fs in os.walk(final) for f in fs)
        catalog.record(tier, src, rows=rows, bytes_out=bytes_out, wall_ms=wall_ms)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def _write_tier(
    catalog: TierCatalog, df: DataFrame, tier: str, pending: list[str]
) -> None:
    if not pending:
        return
    tmp_dir = os.path.join(catalog.base_dir, f"_tmp_{tier}_{os.getpid()}")
    t0 = time.monotonic()
    (
        df.filter(F.col("source").isin(pending))
        .write.mode("overwrite")
        .partitionBy("source")
        .parquet(tmp_dir)
    )
    _move_partitions_and_record(catalog, tier, tmp_dir, pending, t0)


def run_cascade(
    spark: SparkSession,
    sequences_path: str,
    out_dir: str,
    compress_method: Method = Method.DeltaOfDelta,
    with_blocks: bool = True,
    resume: bool = True,
    num_partitions: int | None = None,
    salt: bool = False,
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
    """
    ensure_shipped(spark)
    catalog = TierCatalog(out_dir)
    seq = spark.read.parquet(sequences_path)
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    sources = sorted(r[0] for r in seq.select("source").distinct().collect())

    def pending_for(tier: str) -> list[str]:
        done = catalog.completed(tier) if resume else set()
        return [s for s in sources if s not in done]

    # --- raw tier: compressed per-series blobs ---
    pend = pending_for("raw")
    if pend:
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
        _write_tier(catalog, raw, "raw", pend)
    if fail_after_tier == "raw":
        raise RuntimeError("injected failure after raw tier")

    # --- 1m tier: vectorized bucket rollup (+ optional per-bucket blocks) ---
    pend = pending_for("1m")
    if pend:
        m1_in = salted_repartition(seq, num_partitions, "source") if salt else seq
        m1 = rollup_raw(
            m1_in,
            TIERS["1m"],
            with_blocks=with_blocks,
            block_method=compress_method,
        )
        _write_tier(catalog, m1, "1m", pend)
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

    return {t: os.path.join(out_dir, t) for t in ("raw", "1m", "1h", "1d")}


# ---------------------------------------------------------------------------
# retention expiry
# ---------------------------------------------------------------------------

#: Default policy: how long each tier's data is kept, in seconds of event
#: time (TimescaleDB-style retention: finer tiers expire first, coarser
#: aggregates are kept longer). None = keep forever.
DEFAULT_RETENTION = {"raw": 7 * 86400, "1m": 30 * 86400, "1h": 365 * 86400, "1d": None}


def apply_retention(
    spark: SparkSession,
    out_dir: str,
    now_ts: int,
    policy: dict[str, int | None] | None = None,
) -> dict[str, int]:
    """Expire tier data older than the policy's horizon, per tier.

    Row-level expiry on the bucket time axis: each kept source partition is
    rewritten atomically without the expired buckets (raw rows expire on
    ``ts0``); partitions whose data expires entirely are deleted. Every
    expiry is recorded in the manifest (`status=retention`) with the dropped
    row count, so lineage shows what was removed and when. Returns
    tier -> rows dropped.

    Scale note: the rewrite filter is bucket_ts >= horizon — a pushed-down
    min/max row-group prune on the time axis, so only row groups straddling
    the horizon are actually read.
    """
    import json

    from pyspark.sql import functions as F  # noqa: F811 (local for clarity)

    policy = DEFAULT_RETENTION if policy is None else policy
    catalog = TierCatalog(out_dir)
    dropped: dict[str, int] = {}
    for tier, keep_seconds in policy.items():
        if keep_seconds is None:
            continue
        tier_dir = os.path.join(out_dir, tier)
        if not os.path.isdir(tier_dir):
            continue
        horizon = now_ts - keep_seconds
        ts_col = "ts0" if tier == "raw" else "bucket_ts"
        tier_dropped = 0
        for entry in sorted(os.listdir(tier_dir)):
            if not entry.startswith("source="):
                continue
            part_dir = os.path.join(tier_dir, entry)
            part = spark.read.parquet(part_dir)
            n_expired = part.filter(F.col(ts_col) < horizon).count()
            if n_expired == 0:
                continue
            kept = part.filter(F.col(ts_col) >= horizon)
            tmp = part_dir + ".retention-tmp"
            kept.write.mode("overwrite").parquet(tmp)
            import shutil

            shutil.rmtree(part_dir)
            if spark.read.parquet(tmp).count() == 0:
                shutil.rmtree(tmp)
            else:
                os.replace(tmp, part_dir)
            tier_dropped += n_expired
            with open(catalog.manifest_path, "a") as f:
                f.write(
                    json.dumps(
                        {
                            "tier": tier,
                            "partition": entry.split("=", 1)[1],
                            "status": "retention",
                            "dropped_rows": n_expired,
                            "horizon_ts": horizon,
                            "wall_clock_unix": time.time(),
                        }
                    )
                    + "\n"
                )
        dropped[tier] = tier_dropped
    return dropped

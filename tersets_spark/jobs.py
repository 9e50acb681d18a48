"""End-to-end retention-cascade job: raw -> 1m -> 1h -> 1d.

One invocation = one resumable job (north_rule): each tier is written per
source partition through TierCatalog's atomic directory replace, the manifest
records lineage + throughput metrics per partition, and a rerun anti-joins
the completed set so a killed job picks up exactly where it stopped.

Plan shape per tier:
  raw:   scan sequences -> salted repartition -> pandas-UDF compress -> write
  1m:    scan sequences -> salted repartition -> vectorized rollup kernel -> write
  1h/1d: scan tier below -> JVM hash aggregate (exact integer combine) -> write
Filters on pending sources are pushed to the parquet scan (partition/row-group
pruning); only raw/1m cross the Python boundary, in Arrow batches.
"""

from __future__ import annotations

import os
import time

import pyarrow.dataset as pa_ds
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TierCatalog
from .kernels import compress_udf
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

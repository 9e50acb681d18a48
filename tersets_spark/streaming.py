"""Structured Streaming front-end for the retention engine.

Two entry points:

* :func:`stream_sequences_to_tier` — file-source ingest of sequence parquet
  into the 1m tier via ``foreachBatch``: each micro-batch runs the same
  Arrow rollup kernel as the batch cascade and appends to the TierCatalog
  with per-batch lineage metrics. ``foreachBatch`` + the stream checkpoint
  gives restart-safe, effectively-once tier appends (Spark replays an
  unacknowledged batch; appends are keyed by batch id so a replay
  overwrites its own output — the classic idempotent-sink pattern).
* :func:`windowed_event_rollup` — the declarative path: ``readStream`` →
  ``withWatermark`` → windowed aggregation, for append-mode sinks with
  bounded state. Late events beyond the watermark are dropped by Spark's
  state store; bucket math matches the batch ``events_rollup_1m`` query.

Scale notes: the ingest path is map-only per micro-batch (no shuffle before
the kernel, same as the batch cascade); the windowed path shuffles on
(window, event_type) with watermark-bounded state — both shapes carry to a
real cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TierCatalog
from .methods import Method
from .rollup import TIERS, rollup_raw


def stream_sequences_to_tier(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    tier_seconds: int = TIERS["1m"],
    with_blocks: bool = True,
    block_method: Method = Method.DeltaOfDelta,
    schema=None,
    max_files_per_trigger: int = 8,
):
    """Start a file-source stream: sequences parquet -> 1m tier appends.

    Returns the StreamingQuery; callers drive it with processAllAvailable()
    (tests) or awaitTermination() (jobs).
    """
    from .shipping import ensure_shipped

    ensure_shipped(spark)  # the rollup kernel runs in python workers
    if schema is None:
        schema = spark.read.parquet(input_dir).schema
    catalog = TierCatalog(out_dir)
    tier = f"{tier_seconds}s" if tier_seconds not in (60, 3600, 86400) else {
        60: "1m", 3600: "1h", 86400: "1d"
    }[tier_seconds]

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rolled = rollup_raw(batch_df, tier_seconds, with_blocks, block_method)
        # Idempotent per-batch append: a replayed batch overwrites its own
        # subdirectory, never another batch's.
        batch_dir = os.path.join(catalog.base_dir, tier, f"batch={batch_id}")
        rolled.write.mode("overwrite").parquet(batch_dir)
        # row count from parquet footers (driver-local metadata read) — no
        # second Spark job re-scanning the batch output
        import pyarrow.dataset as pa_ds

        rows = pa_ds.dataset(batch_dir, format="parquet").count_rows()
        catalog.record(tier, f"batch={batch_id}", rows=rows, bytes_out=0)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_streamed_tier(spark: SparkSession, out_dir: str, tier: str = "1m") -> DataFrame:
    """Read all micro-batch appends of a streamed tier as one DataFrame."""
    base = os.path.join(out_dir, tier)
    return spark.read.option("basePath", base).parquet(os.path.join(base, "batch=*"))


def windowed_event_rollup(
    events: DataFrame, watermark: str = "10 minutes", window: str = "1 minute"
) -> DataFrame:
    """Watermarked per-type windowed aggregation over a (streaming) events DF.

    Works identically on a batch DataFrame (watermark is a no-op there),
    which is how the batch/stream parity test pins the semantics.
    """
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        # Watermarks require an instant-typed column; NTZ is interpreted in
        # the session timezone (consistent across batch and stream).
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
            F.min(F.round(F.col("value") * 100).cast("long")).alias("min_cents"),
            F.max(F.round(F.col("value") * 100).cast("long")).alias("max_cents"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "cnt",
            "sum_cents",
            "min_cents",
            "max_cents",
        )
    )

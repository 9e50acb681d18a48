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


# ---------------------------------------------------------------------------
# sessionization: batch (JVM window ops) + custom stateful streaming operator
# ---------------------------------------------------------------------------


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization, fully JVM-side (the classic lag + running
    cumulative-flag pattern): events with the same ``user_id`` belong to one
    session while consecutive gaps are <= ``gap_seconds``.

    Input: (user_id, ts_sec, cents). Output one row per session:
    (user_id, session_start, session_end, n_events, cents).

    Scale: one shuffle on user_id + one sort; both windows are RUNNING
    frames (never unbounded-following). Ties on ts_sec are safe: a zero gap
    can't open a session, so the cumulative session id is order-insensitive
    within a tie group.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_sec")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_new = (
        F.col("ts_sec") - F.lag("ts_sec").over(w) > F.lit(gap_seconds)
    ).cast("long")
    with_ids = events.withColumn(
        "__new", F.coalesce(is_new, F.lit(1))
    ).withColumn("__session", F.sum("__new").over(run))
    return (
        with_ids.groupBy("user_id", "__session")
        .agg(
            F.min("ts_sec").alias("session_start"),
            F.max("ts_sec").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("cents"),
        )
        .drop("__session")
    )


def sessionize_stream(events, gap_seconds: int = 1800):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user open-session state carried across micro-batches; a session is
    EMITTED (append mode) once a later event exceeds the gap. The batch
    twin is :func:`sessionize_batch`; their parity on closed sessions is
    pinned by tests/test_streaming.py.

    The per-batch work is vectorized NumPy (gap split via flatnonzero +
    reduceat-style segment sums), not a per-event Python loop.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", LongType()),
            StructField("session_end", LongType()),
            StructField("n_events", LongType()),
            StructField("cents", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start", LongType()),
            StructField("end", LongType()),
            StructField("n", LongType()),
            StructField("cents", LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values("ts_sec", kind="mergesort")
        ts = rows["ts_sec"].to_numpy(dtype=np.int64)
        cents = rows["cents"].to_numpy(dtype=np.int64)
        if state.exists:
            s_start, s_end, s_n, s_cents = state.get
        else:
            s_start = s_end = None
            s_n = s_cents = 0
        # segment boundaries where the gap is exceeded
        breaks = np.flatnonzero(np.diff(ts) > gap_seconds) + 1
        starts = np.concatenate(([0], breaks))
        ends = np.concatenate((breaks, [len(ts)]))
        closed = []
        for lo, hi in zip(starts, ends):
            seg = (int(ts[lo]), int(ts[hi - 1]), int(hi - lo),
                   int(cents[lo:hi].sum()))
            if s_start is not None and seg[0] - s_end <= gap_seconds:
                # merge into the carried-over open session
                seg = (s_start, seg[1], s_n + seg[2], s_cents + seg[3])
            elif s_start is not None:
                closed.append((user_id, s_start, s_end, s_n, s_cents))
            s_start, s_end, s_n, s_cents = seg
        state.update((int(s_start), int(s_end), int(s_n), int(s_cents)))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "cents"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )

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
        # Replay-idempotent: a replayed batch must not append a duplicate
        # manifest record (metrics()/partitions_done would double-count).
        part = f"batch={batch_id}"
        if not any(
            r["tier"] == tier and r["partition"] == part for r in catalog.metrics()
        ):
            catalog.record(tier, part, rows=rows, bytes_out=0)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _rollup_up_partial(tier_df: DataFrame, tier_seconds: int) -> DataFrame:
    """Like rollup.rollup_up, but emits RE-AGGREGABLE partials: first/last
    carry their anchor timestamps (``first_ts``/``last_ts`` = the finer
    bucket the value came from), so partials of the same coarse bucket
    written by different micro-batches can later be combined exactly —
    min/max over (anchor_ts, value) structs is associative, while plain
    first/last values are not (TimescaleDB-style continuous-aggregate
    partials). Accepts either a finest-tier frame (anchors = bucket_ts) or
    a partial frame (anchors carried through)."""
    has_anchors = "first_ts" in tier_df.columns
    f_ts = F.col("first_ts") if has_anchors else F.col("bucket_ts")
    l_ts = F.col("last_ts") if has_anchors else F.col("bucket_ts")
    bucket = (F.floor(F.col("bucket_ts") / tier_seconds) * tier_seconds).cast("long")
    agg = (
        tier_df.groupBy("doc_id", "source", bucket.alias("bucket_ts"))
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum").alias("sum"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.min(F.struct(f_ts.alias("ts"), F.col("first").alias("v"))).alias("_f"),
            F.max(F.struct(l_ts.alias("ts"), F.col("last").alias("v"))).alias("_l"),
        )
    )
    return agg.select(
        "doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax",
        F.col("_f.v").alias("first"), F.col("_l.v").alias("last"),
        F.col("_f.ts").alias("first_ts"), F.col("_l.ts").alias("last_ts"),
    )


def stream_cascade_to_tiers(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    with_blocks: bool = True,
    block_method: Method = Method.DeltaOfDelta,
    schema=None,
    max_files_per_trigger: int = 8,
    with_sketches: bool = False,
    with_blooms: bool = False,
    with_cms: bool = False,
):
    """Streamed FULL cascade: each micro-batch ingests raw sequences into the
    1m tier AND cascades its own contribution up into 1h and 1d, so all three
    retention tiers stay continuously materialized (north_rule "continuous
    aggregates" over streams, not just batch).

    The coarse tiers hold per-batch PARTIALS (see _rollup_up_partial): a
    1h bucket touched by several micro-batches has several rows, combined
    exactly at read time by ``read_streamed_tier(..., finalize=True)``.
    With unique doc_ids each doc's rows land in one batch, so partials are
    already final; finalize also covers re-ingested doc_ids.

    Plan shape per batch: one Arrow kernel pass (raw->1m, map-only), then
    two tiny JVM hash aggregations over the batch's rolled output read back
    from the just-written parquet (re-scan of the small 1m output beats
    re-running the kernel via lineage). Idempotent per-batch dirs give
    restart-safe effectively-once appends, same as stream_sequences_to_tier.

    ``with_sketches=True`` streams the sketch tier families too (psk_* HDR
    percentile counts, hll_* distinct registers — see jobs.run_cascade).
    Unlike the core tiers (per-doc keys land whole in one batch), sketches
    aggregate ACROSS docs, so even the 1m level accumulates cross-batch
    partials per (source, bucket_ts); they combine exactly at read
    (``read_streamed_tier(..., finalize=True)`` -> groupBy sum / max).
    """
    from .shipping import ensure_shipped

    ensure_shipped(spark)
    if schema is None:
        schema = spark.read.parquet(input_dir).schema
    catalog = TierCatalog(out_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import pyarrow.dataset as pa_ds

        # Replay-idempotent lineage: a crash after the writes but before the
        # streaming checkpoint commits batch N makes foreachBatch replay N —
        # the batch=N dirs overwrite idempotently, and the manifest must not
        # gain duplicate records (metrics()/partitions_done would double-
        # count), so already-recorded (tier, batch) pairs are skipped.
        seen = {(r["tier"], r["partition"]) for r in catalog.metrics()}

        def _record_once(tier: str, out_dir_t: str) -> None:
            part = f"batch={batch_id}"
            if (tier, part) in seen:
                return
            catalog.record(
                tier, part,
                rows=pa_ds.dataset(out_dir_t, format="parquet").count_rows(),
                bytes_out=0,
            )

        rolled = rollup_raw(batch_df, TIERS["1m"], with_blocks, block_method)
        dir_1m = os.path.join(catalog.base_dir, "1m", f"batch={batch_id}")
        rolled.write.mode("overwrite").parquet(dir_1m)
        _record_once("1m", dir_1m)
        base = spark.read.parquet(dir_1m)
        if with_blocks:
            base = base.drop("block")
        up = _rollup_up_partial(base, TIERS["1h"])
        dir_1h = os.path.join(catalog.base_dir, "1h", f"batch={batch_id}")
        up.write.mode("overwrite").parquet(dir_1h)
        _record_once("1h", dir_1h)
        day = _rollup_up_partial(spark.read.parquet(dir_1h), TIERS["1d"])
        dir_1d = os.path.join(catalog.base_dir, "1d", f"batch={batch_id}")
        day.write.mode("overwrite").parquet(dir_1d)
        _record_once("1d", dir_1d)

        if with_sketches or with_blooms or with_cms:
            from .bloom import bloom_words, merge_words
            from .cms import cms_counters, merge_counters
            from .hll import hll_registers, merge_registers
            from .jobs import _sketch_points, merge_to_bucket
            from .sketch import merge_sketch, sketch as hdr_sketch

            pts = _sketch_points(batch_df)
            def _hll_dict(d, keys, col):
                return hll_registers(d, keys, col, dict_hash=True)

            def _blm_dict(d, keys, col):
                return bloom_words(d, keys, col, dict_hash=True)

            def _cms_dict(d, keys, col):
                return cms_counters(d, keys, col, dict_hash=True)

            families = []
            if with_sketches:
                families += [
                    ("psk", hdr_sketch, merge_sketch),
                    ("hll", _hll_dict, merge_registers),
                ]
            if with_blooms:
                # Bloom word tiers stream with the same cross-batch-partial
                # contract: bit_or is idempotent AND associative, so per-
                # batch word rows combine exactly at read/finalize.
                families.append(("blm", _blm_dict, merge_words))
            if with_cms:
                # Count-min cell tiers: sum is associative, so per-batch
                # cell rows combine exactly at read/finalize (NOT
                # idempotent — replay safety comes from the overwrite-
                # idempotent batch dirs, same as the psk family).
                families.append(("cms", _cms_dict, merge_counters))
            for family, build, merge in families:
                fine = build(pts, ["source", "bucket_ts"], "v")
                prev_dir = os.path.join(
                    catalog.base_dir, f"{family}_1m", f"batch={batch_id}"
                )
                fine.write.mode("overwrite").parquet(prev_dir)
                _record_once(f"{family}_1m", prev_dir)
                for suffix, secs in (("1h", TIERS["1h"]), ("1d", TIERS["1d"])):
                    below = spark.read.parquet(prev_dir)
                    up_sk = merge_to_bucket(below, secs, merge)
                    prev_dir = os.path.join(
                        catalog.base_dir, f"{family}_{suffix}", f"batch={batch_id}"
                    )
                    up_sk.write.mode("overwrite").parquet(prev_dir)
                    _record_once(f"{family}_{suffix}", prev_dir)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def finalize_streamed_tier(
    spark: SparkSession,
    stream_out_dir: str,
    catalog: TierCatalog,
    tier: str = "1h",
    files_per_partition: int = 1,
) -> int:
    """Bridge a STREAMED tier into the batch TierCatalog: combine the
    per-micro-batch partials exactly (read_streamed_tier finalize) and
    commit one run per source partition through the manifest — after which
    the streamed data is first-class catalog data (retention, further
    rollup, compaction, time travel all apply). Returns the number of
    source partitions committed.

    Scale: one pass over the streamed appends, shuffled once by the
    combine groupBy; the per-source writes are ordinary catalog commits."""
    df = read_streamed_tier(spark, stream_out_dir, tier, finalize=True)
    sources = sorted(r[0] for r in df.select("source").distinct().collect())
    for src in sources:
        catalog.write_partition(
            df.filter(F.col("source") == src).coalesce(files_per_partition),
            tier, src,
            finalized_from=os.path.join(stream_out_dir, tier),
        )
    return len(sources)


def read_streamed_tier(
    spark: SparkSession, out_dir: str, tier: str = "1m", finalize: bool = False
) -> DataFrame:
    """Read all micro-batch appends of a streamed tier as one DataFrame.

    ``finalize=True`` (coarse tiers from stream_cascade_to_tiers) combines
    cross-batch partials of the same (doc_id, source, bucket_ts) exactly —
    anchor-aware first/last — and drops the anchor columns, yielding the
    same schema and values as the batch cascade's tier.

    Resolution goes through the compaction tombstone
    (:func:`_live_stream_dirs`): consumed batch dirs are invisible, the
    compact remainder (``batch = -1``) is unioned in. Without a tombstone
    this is the plain ``batch=*`` read."""
    base = os.path.join(out_dir, tier)
    batch_dirs, compact_dirs = _live_stream_dirs(base)
    if not batch_dirs and not compact_dirs:
        raise FileNotFoundError(f"streamed tier {tier!r} has no live partials")
    parts = []
    if batch_dirs:
        parts.append(spark.read.option("basePath", base).parquet(*batch_dirs))
    for c in compact_dirs:
        parts.append(
            spark.read.parquet(c).withColumn("batch", F.lit(-1).cast("int"))
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    if not finalize:
        return df
    if tier.startswith("psk_"):  # percentile sketch tier: sum is the combine
        from .sketch import merge_sketch

        return merge_sketch(df.drop("batch"), ["source", "bucket_ts"])
    if tier.startswith("hll_"):  # HLL register tier: max is the combine
        from .hll import merge_registers

        return merge_registers(df.drop("batch"), ["source", "bucket_ts"])
    if tier.startswith("blm_"):  # Bloom word tier: bit_or is the combine
        from .bloom import merge_words

        return merge_words(df.drop("batch"), ["source", "bucket_ts"])
    if tier.startswith("cms_"):  # Count-min cell tier: sum is the combine
        from .cms import merge_counters

        return merge_counters(df.drop("batch"), ["source", "bucket_ts"])
    if "first_ts" not in df.columns:
        # finest core tier: per-doc rows are already final, but finalize
        # must still shed the micro-batch partition column so the committed
        # schema matches the batch cascade's tier exactly
        return df.drop("batch")
    # same-tier combine: floor(bucket_ts / 1) keeps the bucket; reuse the
    # anchor-aware partial combine then drop the anchors
    return _rollup_up_partial(df.drop("batch"), 1).drop("first_ts", "last_ts")


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


def sessionize_stream(events, gap_seconds: int = 1800,
                      idle_flush_seconds: int | None = None):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user open-session state carried across micro-batches; a session is
    EMITTED (append mode) once a later event exceeds the gap. The batch
    twin is :func:`sessionize_batch`; their parity on closed sessions is
    pinned by tests/test_streaming.py.

    The per-batch work is vectorized NumPy (gap split via flatnonzero +
    reduceat-style segment sums), not a per-event Python loop.

    Semantics notes: a session is only emitted when a LATER event closes it,
    so by default each user's final open session stays in state until more
    data arrives (NoTimeout — matching the batch twin requires knowing the
    stream ended, which append mode can't). Pass ``idle_flush_seconds`` to
    bound that: a ProcessingTimeTimeout flushes (emits + clears) any open
    session whose user has been silent that long, so state size tracks the
    ACTIVE user set instead of growing with every user ever seen. A user
    who returns within ``gap_seconds`` of a flushed session starts a new
    session where the batch twin would have extended the old one — the
    standard finalize-on-idle tradeoff, pinned by tests/test_streaming.py.
    Cross-batch out-of-order segments merge conservatively into the open
    session (interval union), never splitting it retroactively.
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

    out_cols = ["user_id", "session_start", "session_end", "n_events", "cents"]

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if idle_flush_seconds is not None and state.hasTimedOut:
            if state.exists:
                s_start, s_end, s_n, s_cents = state.get
                state.remove()
                yield pd.DataFrame(
                    [(user_id, s_start, s_end, s_n, s_cents)], columns=out_cols
                )
            return
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
                # Merge into the carried-over open session. min/max (not
                # blind replace) keeps start <= end even when a late batch
                # delivers a segment that PRECEDES the open session —
                # cross-batch disorder merges conservatively (one session)
                # rather than corrupting the interval; within a batch,
                # events are sorted, so segments are exact.
                seg = (min(s_start, seg[0]), max(s_end, seg[1]),
                       s_n + seg[2], s_cents + seg[3])
            elif s_start is not None:
                closed.append((user_id, s_start, s_end, s_n, s_cents))
            s_start, s_end, s_n, s_cents = seg
        state.update((int(s_start), int(s_end), int(s_n), int(s_cents)))
        if idle_flush_seconds is not None:
            state.setTimeoutDuration(int(idle_flush_seconds) * 1000)
        if closed:
            yield pd.DataFrame(closed, columns=out_cols)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_flush_seconds is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


# ---------------------------------------------------------------------------
# streamed incremental near-dup (MinHash LSH against the accumulated corpus)
# ---------------------------------------------------------------------------


def stream_dedup_minhash(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    k: int = 3,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema=None,
    max_files_per_trigger: int = 8,
):
    """Incremental near-duplicate detection over a DOCUMENT stream: each
    micro-batch is deduplicated against everything ingested before it (and
    itself) without ever re-pairing the historical corpus.

    Per batch, ``foreachBatch``:

    1. shingles + MinHash signature for the NEW docs only (one JVM xxhash64
       pass per shingle, same kernels as the batch path);
    2. banded-LSH candidates = (new x new) + (new x index) equi-joined on
       (band, bucket) — old x old pairs were found in their own batches, so
       per-batch work is O(|batch| x collision rate), not O(|corpus|^2);
    3. exact shingle-Jaccard verification of candidates only
       (:func:`tersets_spark.dedup.verify_candidate_pairs` — emitted pairs
       carry no approximation);
    4. append the new docs' (id, shingles, sig) to the persistent band
       index and the verified pairs to the pairs log, both under
       ``batch=<id>`` dirs — replays overwrite their own output, so the
       stream checkpoint gives restart-safe effectively-once emission.

    The discovered pair SET equals the batch ``minhash_lsh_pairs`` on the
    same corpus regardless of arrival order (same signatures, same banding
    expression via :func:`tersets_spark.dedup.band_buckets`, same exact
    verify; a pair is found in the batch of its LATER member) — parity is
    pinned by tests/test_streaming.py and the ``stream_dedup_pairs``
    contract query shares the batch path's brute-force SQL oracle.

    Scale notes: the index join is an equi-join shuffled on (band, bucket)
    — uniform buckets (hashes of signature slices), AQE-friendly. The index
    stores shingle STRINGS to keep verification exact; at 10^12-doc scale
    swap the verify side to the xxhash64 shingle sets (collision odds
    ~n^2/2^64) and partition the index dirs by band so the candidate join
    prunes. Doc ids are assumed unique across the stream (re-ingesting an
    id re-pairs it)."""
    from .dedup import _shingle_sets, band_buckets, minhash_udf, verify_candidate_pairs
    from .shipping import ensure_shipped

    ensure_shipped(spark)
    if schema is None:
        schema = spark.read.parquet(input_dir).schema
    rows_per_band = num_perm // bands
    index_base = os.path.join(out_dir, "index")
    pairs_base = os.path.join(out_dir, "pairs")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _banded(df: DataFrame) -> DataFrame:
        return df.select(
            "id",
            F.posexplode(band_buckets(F.col("sig"), bands, rows_per_band)).alias(
                "band", "bucket"
            ),
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        sets = _shingle_sets(batch_df, k, id_col, text_col)
        new = sets.select(
            "id", "shingles", minhash_udf(num_perm)(F.col("hashes")).alias("sig")
        )
        dir_new = os.path.join(index_base, f"batch={batch_id}")
        # write-then-read-back: the re-scan of the small per-batch index
        # beats recomputing shingles+signatures via lineage for each of the
        # three uses below (banding, verify, and the persistent index)
        new.write.mode("overwrite").parquet(dir_new)
        new_idx = spark.read.parquet(dir_new)
        nb = _banded(new_idx)
        cand_new = (
            nb.alias("x")
            .join(nb.alias("y"), on=["band", "bucket"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        )
        prior_dirs = [
            os.path.join(index_base, d)
            for d in sorted(os.listdir(index_base))
            if d.startswith("batch=") and d != f"batch={batch_id}"
        ]
        all_sets = new_idx.select("id", "shingles")
        candidates = cand_new
        if prior_dirs:
            prior = spark.read.parquet(*prior_dirs)
            pb = _banded(prior)
            cand_cross = (
                nb.alias("x")
                .join(pb.alias("y"), on=["band", "bucket"])
                .select(
                    F.least(F.col("x.id"), F.col("y.id")).alias("id_a"),
                    F.greatest(F.col("x.id"), F.col("y.id")).alias("id_b"),
                )
            )
            candidates = candidates.unionByName(cand_cross)
            all_sets = all_sets.unionByName(prior.select("id", "shingles"))
        verified = verify_candidate_pairs(candidates.distinct(), all_sets, threshold)
        verified.write.mode("overwrite").parquet(
            os.path.join(pairs_base, f"batch={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_dedup_pairs(spark: SparkSession, out_dir: str) -> DataFrame:
    """All verified near-dup pairs emitted so far by
    :func:`stream_dedup_minhash` (cross-batch set, no duplicates by
    construction — a pair is emitted only in its later member's batch)."""
    base = os.path.join(out_dir, "pairs")
    return (
        spark.read.option("basePath", base)
        .parquet(os.path.join(base, "batch=*"))
        .drop("batch")
    )


# ---------------------------------------------------------------------------
# bounded streamed state: tombstone-committed compaction + watermarked
# incremental finalize
# ---------------------------------------------------------------------------

#: Tombstone file committing a streamed-partial compaction (atomic file
#: replace = the commit point, same pattern as the TierCatalog manifest).
_COMPACT_TOMBSTONE = "_compacted.json"


def _live_stream_dirs(base: str) -> tuple[list[str], list[str]]:
    """Resolve a streamed tier dir through its compaction tombstone:
    returns (live ``batch=*`` dir paths, live compact dir paths). Without
    a tombstone this is exactly the old ``batch=*`` glob. Consumed batch
    dirs stay INVISIBLE even if a foreachBatch replay rewrites one after
    compaction deleted it — its rows are already folded into the compact
    remainder, so resurfacing them would double-count."""
    import json

    tomb = os.path.join(base, _COMPACT_TOMBSTONE)
    consumed: set[str] = set()
    compacts: list[str] = []
    if os.path.exists(tomb):
        with open(tomb) as f:
            data = json.load(f)
        consumed = set(data["consumed"])
        compacts = [
            os.path.join(base, c)
            for c in data["compacts"]
            if os.path.isdir(os.path.join(base, c))
        ]
    batches = sorted(
        os.path.join(base, e)
        for e in os.listdir(base)
        if e.startswith("batch=") and e not in consumed
    )
    return batches, compacts


def _combine_partials_keep_anchors(df: DataFrame, tier: str) -> DataFrame:
    """Per-family partial combine that stays IN partial form (anchors /
    registers / cells kept), so the output re-combines with future batch
    partials. The read-time finalize (:func:`read_streamed_tier`) is the
    anchor-DROPPING twin."""
    if tier.startswith("psk_"):
        from .sketch import merge_sketch

        return merge_sketch(df, ["source", "bucket_ts"])
    if tier.startswith("hll_"):
        from .hll import merge_registers

        return merge_registers(df, ["source", "bucket_ts"])
    if tier.startswith("blm_"):
        from .bloom import merge_words

        return merge_words(df, ["source", "bucket_ts"])
    if tier.startswith("cms_"):
        from .cms import merge_counters

        return merge_counters(df, ["source", "bucket_ts"])
    if "first_ts" in df.columns:
        return _rollup_up_partial(df, 1)  # same-bucket, anchors carried
    return df  # finest core tier: per-doc rows are already final


def compact_streamed_partials(
    spark: SparkSession, out_dir: str, tier: str, drop_below_ts: int | None = None
) -> dict:
    """Fold a streamed tier's accumulated per-batch partials into ONE
    compact remainder dir, optionally dropping rows below
    ``drop_below_ts`` (buckets already committed to the batch catalog by
    :func:`finalize_streamed_tier_incremental`) — the state bound a
    long-lived stream needs: without it partial files grow with stream
    LIFETIME; with it they are bounded by the open (un-finalized) bucket
    window.

    Commit protocol (manifest-file pattern, object-store safe): write the
    combined remainder to a new ``_compact_*`` dir, then atomically
    replace the tombstone file listing every consumed ``batch=*`` dir and
    naming the single live compact dir. Readers resolve through the
    tombstone, so a crash before the replace leaves the old state fully
    visible and the half-written compact dir invisible; consumed dirs are
    physically removed only after the commit point (a crash between
    commit and removal leaves invisible garbage, swept by the next
    compaction). Concurrent micro-batches appending NEW batch dirs are
    untouched — they are not in the consumed snapshot.
    """
    import json
    import shutil
    import uuid

    base = os.path.join(out_dir, tier)
    batch_dirs, compact_dirs = _live_stream_dirs(base)
    if not batch_dirs and not compact_dirs:
        raise FileNotFoundError(f"streamed tier {tier!r} has no partials")
    parts = []
    if batch_dirs:
        parts.append(
            spark.read.option("basePath", base).parquet(*batch_dirs).drop("batch")
        )
    for c in compact_dirs:
        parts.append(spark.read.parquet(c))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    dropped_pred = None
    if drop_below_ts is not None:
        dropped_pred = F.col("bucket_ts") < drop_below_ts
        df = df.where(~dropped_pred)
    combined = _combine_partials_keep_anchors(df, tier)
    new_compact = f"_compact_{uuid.uuid4().hex[:12]}"
    combined.write.mode("overwrite").parquet(os.path.join(base, new_compact))
    rows = spark.read.parquet(os.path.join(base, new_compact)).count()

    tomb = os.path.join(base, _COMPACT_TOMBSTONE)
    prior_consumed: set[str] = set()
    if os.path.exists(tomb):
        with open(tomb) as f:
            prior_consumed = set(json.load(f)["consumed"])
    consumed = prior_consumed | {os.path.basename(d) for d in batch_dirs}
    tmp = tomb + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"consumed": sorted(consumed), "compacts": [new_compact]}, f)
    os.replace(tmp, tomb)  # commit point

    # post-commit sweep: consumed batch dirs + superseded compact dirs +
    # any orphaned _compact_* a crashed prior attempt left uncommitted
    for d in batch_dirs + compact_dirs:
        shutil.rmtree(d, ignore_errors=True)
    for e in os.listdir(base):
        if e.startswith("_compact_") and e != new_compact:
            shutil.rmtree(os.path.join(base, e), ignore_errors=True)
    return {
        "consumed_batch_dirs": len(batch_dirs),
        "consumed_compact_dirs": len(compact_dirs),
        "remainder_rows": rows,
        "compact_dir": new_compact,
    }


def finalize_streamed_tier_incremental(
    spark: SparkSession,
    stream_out_dir: str,
    catalog: TierCatalog,
    tier: str,
    watermark_ts: int,
    compact: bool = True,
    files_per_partition: int = 1,
) -> dict:
    """WATERMARKED incremental bridge from streamed partials into the
    batch catalog: commit only the CLOSED buckets in ``[prev_watermark,
    watermark_ts)`` (the caller asserts no more data will arrive below
    ``watermark_ts`` — the standard event-time watermark contract), then
    compact the partials to drop what was committed.

    Exactly-once across crashes WITHOUT a cross-system transaction: each
    window lands as an APPEND commit (:meth:`TierCatalog.append_partition`
    — the partition keeps its real source name, prior windows stay live)
    carrying its watermark range in the manifest, and the next invocation
    starts from the highest recorded watermark — so a crash between the
    catalog commit and the compaction leaves already-committed rows in
    the partials as harmless leftovers that are never re-committed (the
    next window starts above them) and vanish at the next compaction.
    A bucket is CLOSED when its END is at or below the watermark
    (``bucket_ts + span <= watermark_ts`` with ``span`` = the tier's
    bucket width): committing on ``bucket_ts < watermark`` alone would
    commit a still-open day bucket whose later-arriving documents (ts0
    above the watermark, points inside the day) would then be dropped by
    the compaction — the classic coarse-tier watermark trap. Every
    contribution to a closed bucket comes from a document with
    ``ts0 < bucket_end <= watermark``, which the watermark contract says
    has already arrived. ``late_rows`` counts partial rows in buckets
    closed before the PREVIOUS watermark (genuine late arrivals if the
    last compaction succeeded); they are reported, never silently
    committed.

    Consumers see one continuously-growing catalog tier:
    ``catalog.read_tier(spark, tier)`` unions the appended windows;
    retention, small-file compaction (``TierCatalog.compact`` folds the
    accumulated appends into one run), validation and time travel apply
    as usual.
    """
    prev = 0
    for rec in catalog.metrics():
        if rec.get("tier") == tier and rec.get("watermark_ts") is not None:
            prev = max(prev, int(rec["watermark_ts"]))
    if watermark_ts <= prev:
        raise ValueError(
            f"watermark must advance: got {watermark_ts}, last committed {prev}"
        )
    suffix = tier.rsplit("_", 1)[-1]
    if suffix not in TIERS:
        raise ValueError(f"cannot derive bucket span from tier {tier!r}")
    span = TIERS[suffix]
    df = read_streamed_tier(spark, stream_out_dir, tier, finalize=True)
    # closed-bucket window: bucket END in (prev, watermark]
    # pin the combined window once: the per-source commit loop below would
    # otherwise re-run the full partial-combine |sources| times
    window = df.where(
        (F.col("bucket_ts") > prev - span)
        & (F.col("bucket_ts") <= watermark_ts - span)
    ).localCheckpoint()
    late = df.where(F.col("bucket_ts") <= prev - span).count()
    sources = sorted(r[0] for r in window.select("source").distinct().collect())
    for src in sources:
        part_df = window.filter(F.col("source") == src).coalesce(files_per_partition)
        catalog.append_partition(
            part_df, tier, src,
            watermark_ts=watermark_ts, watermark_from=prev,
            finalized_from=os.path.join(stream_out_dir, tier),
        )
    committed_rows = window.count()
    stats = {
        "tier": tier,
        "window": (prev, watermark_ts),
        "sources": len(sources),
        "rows_committed": committed_rows,
        "late_rows": late,
    }
    if compact:
        # drop exactly the closed range: open buckets (end > watermark)
        # keep their partials for future contributions
        stats["compaction"] = compact_streamed_partials(
            spark, stream_out_dir, tier, drop_below_ts=watermark_ts - span + 1
        )
    return stats


def read_tier_realtime_streamed(
    spark: SparkSession,
    stream_out_dir: str,
    catalog: TierCatalog,
    tier: str,
) -> DataFrame:
    """STREAMED-TAIL realtime serving: the committed catalog tier UNION
    the still-OPEN streamed partials — a consumer between watermark
    finalizes sees exactly the batch cascade over everything ingested so
    far, the streaming twin of :func:`jobs.read_tier_realtime`.

    The boundary is the tier's last committed watermark (from the
    manifest lineage :func:`finalize_streamed_tier_incremental` writes):
    buckets CLOSED at that watermark (end <= watermark) live in the
    catalog; buckets still open live in the partials, combined exactly
    (anchor-aware first/last via ``read_streamed_tier(finalize=True)``)
    — the two sets are disjoint by the finalize contract, so the union
    never double-counts. Crash-window safe: leftovers of already-
    committed buckets that a crashed compaction left in the partials sit
    BELOW the boundary and are excluded by the same predicate that makes
    the next finalize skip them. With no finalize yet (no watermark
    lineage) the whole answer comes from the partials; with everything
    finalized the open set is empty and this is a plain catalog read.

    Scale: the open window is bounded by the watermark lag (hours of
    buckets, not history); the committed read is the ordinary pruned
    manifest-resolved scan.
    """
    suffix = tier.rsplit("_", 1)[-1]
    if suffix not in TIERS:
        raise ValueError(f"cannot derive bucket span from tier {tier!r}")
    span = TIERS[suffix]
    prev = 0
    for rec in catalog.metrics():
        if rec.get("tier") == tier and rec.get("watermark_ts") is not None:
            prev = max(prev, int(rec["watermark_ts"]))
    open_rows = read_streamed_tier(
        spark, stream_out_dir, tier, finalize=True
    ).where(F.col("bucket_ts") > prev - span)
    try:
        committed = catalog.read_tier(spark, tier)
    except FileNotFoundError:  # nothing finalized yet: all-open answer
        return open_rows
    return committed.select(*open_rows.columns).unionByName(open_rows)


# ---------------------------------------------------------------------------
# streamed threshold alerting
# ---------------------------------------------------------------------------


def stream_threshold_alerts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: int,
    mode: str = ">=",
    tier_seconds: int = TIERS["1m"],
    schema=None,
    max_files_per_trigger: int = 8,
):
    """REAL-TIME spike alerting over the ingest stream (PromQL alerting
    analog): per micro-batch, run the same Arrow rollup kernel as the
    cascade, fold to (source, bucket) extremes, and log every
    source-bucket whose batch-local extreme crosses ``threshold`` —
    ``max(vmax) >= threshold`` for mode ``">="``, ``min(vmin) <=`` for
    ``"<="`` — as an append-only alert log.

    EXACTNESS (arrival-order independence, the stream/batch parity
    proof): a source-bucket DOES split across micro-batches (different
    documents of one source arrive in different files), but its extreme
    is MONOTONE under batch union — the true vmax is the max of the
    batch-local vmaxes — so (a) some batch slice crosses the threshold
    iff the finished source-bucket does (no false or missed alerts from
    batch splits), and (b) the logged rows' ``max(peak)`` (min for
    ``"<="``) equals the finished bucket's true extreme, because every
    UNLOGGED slice of an alerted bucket is on the sub-threshold side of
    every logged one. :func:`read_stream_alerts` applies that fold, so
    the folded log is bitwise the batch answer regardless of how the
    corpus was split into batches.

    Per-batch cost: the map-only kernel plus one aggregation bounded at
    (sources x batch's buckets) rows. Same idempotent-sink pattern as
    stream_sequences_to_tier: a replayed batch overwrites its own
    ``alerts/batch=N`` directory.
    """
    from .shipping import ensure_shipped

    if mode not in (">=", "<="):
        raise ValueError(f"mode must be '>=' or '<=', got {mode!r}")
    ensure_shipped(spark)
    if schema is None:
        schema = spark.read.parquet(input_dir).schema
    thr = int(threshold)
    fold = F.max("vmax") if mode == ">=" else F.min("vmin")
    base = os.path.join(out_dir, "alerts")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rolled = rollup_raw(batch_df, tier_seconds, with_blocks=False)
        peaks = rolled.groupBy("source", "bucket_ts").agg(
            fold.cast("long").alias("peak")
        )
        pred = (
            (F.col("peak") >= thr) if mode == ">=" else (F.col("peak") <= thr)
        )
        alerts = peaks.where(pred).select(
            "source", "bucket_ts", "peak", F.lit(mode).alias("mode"),
            F.lit(thr).cast("long").alias("threshold"),
        )
        batch_dir = os.path.join(base, f"batch={batch_id}")
        alerts.write.mode("overwrite").parquet(batch_dir)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _alert_log_schema():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("bucket_ts", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("mode", T.StringType()),
        T.StructField("threshold", T.LongType()),
    ])


def read_stream_alerts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold the streamed alert log to one row per alerted (source,
    bucket): ``peak`` = max of the logged batch-local peaks (min for a
    ``"<="`` log) — exactly the finished bucket's true extreme (see
    :func:`stream_threshold_alerts`). Output: (source, bucket_ts, peak,
    mode).

    The log is read with an EXPLICIT schema (a run whose every
    micro-batch logged zero alerts leaves only empty ``batch=N`` dirs —
    schema inference would fail); an all-empty or absent log returns an
    empty DataFrame with the output schema. Each logged row carries the
    run's ``threshold``, and a log mixing distinct thresholds (stale
    ``batch=N`` dirs from a prior run against the same out_dir) is
    rejected exactly like a mode mix — clear the alerts dir between runs
    with different thresholds."""
    import glob as _glob

    base = os.path.join(out_dir, "alerts")
    batch_dirs = sorted(_glob.glob(os.path.join(base, "batch=*")))
    schema = _alert_log_schema()
    out_cols = ["source", "bucket_ts", "peak", "mode"]
    has_files = any(
        f.endswith(".parquet") and not f.startswith("_")
        for d in batch_dirs
        if os.path.isdir(d)
        for f in os.listdir(d)
    )
    if not has_files:
        return spark.createDataFrame([], schema).select(*out_cols)
    df = spark.read.schema(schema).option("basePath", base).parquet(
        os.path.join(base, "batch=*")
    )
    heads = df.select("mode", "threshold").distinct().collect()
    modes = sorted({r["mode"] for r in heads})
    if len(modes) > 1:
        raise ValueError(f"alert log mixes modes {modes}")
    # rows written before thresholds were logged read back as null — only
    # distinct NON-null thresholds constitute a mix
    thresholds = sorted({r["threshold"] for r in heads if r["threshold"] is not None})
    if len(thresholds) > 1:
        raise ValueError(
            f"alert log mixes thresholds {thresholds} — stale batch dirs "
            f"from a prior run? clear {base} between runs"
        )
    fold = F.max("peak") if modes == [">="] else F.min("peak")
    return (
        df.groupBy("source", "bucket_ts", "mode")
        .agg(fold.cast("long").alias("peak"))
        .select(*out_cols)
    )

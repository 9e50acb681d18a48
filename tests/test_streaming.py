"""Structured Streaming tests: file-source ingest into the 1m tier (exactly
the batch kernel's output), restart/resume via the stream checkpoint, and
batch/stream parity of the watermarked windowed rollup."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.rollup import TIERS, rollup_raw
from tersets_spark.streaming import (
    read_streamed_tier,
    stream_sequences_to_tier,
    windowed_event_rollup,
)
from tersets_spark.tables import ensure_sequences


@pytest.fixture(scope="module")
def staged_input(tmp_path_factory):
    """Split the sf0.001 sequences parquet into 4 files in a stream dir."""
    src = ensure_sequences("sf0.001")
    stage = tmp_path_factory.mktemp("stream_in")
    table = pq.read_table(src)
    n = table.num_rows
    bounds = [i * n // 4 for i in range(5)]  # exact cover for any n mod 4
    for i in range(4):
        pq.write_table(table.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       os.path.join(stage, f"part-{i}.parquet"))
    return str(stage)


def test_stream_matches_batch_rollup(spark, staged_input, tmp_path):
    out = str(tmp_path / "tiers")
    ckpt = str(tmp_path / "ckpt")
    q = stream_sequences_to_tier(
        spark, staged_input, out, ckpt, max_files_per_trigger=2, with_blocks=False
    )
    q.awaitTermination()

    streamed = read_streamed_tier(spark, out).drop("batch")
    batch = rollup_raw(spark.read.parquet(staged_input), TIERS["1m"], with_blocks=False)
    cols = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]
    assert streamed.count() == batch.count()
    assert (
        streamed.select(cols).exceptAll(batch.select(cols)).count() == 0
    ), "streamed tier differs from batch rollup"


def test_stream_resume_processes_only_new_files(spark, staged_input, tmp_path):
    out = str(tmp_path / "tiers")
    ckpt = str(tmp_path / "ckpt")
    # stage only the first half, run to completion
    half = str(tmp_path / "in")
    os.makedirs(half)
    files = sorted(os.listdir(staged_input))
    for f in files[:2]:
        shutil.copy(os.path.join(staged_input, f), half)
    q = stream_sequences_to_tier(spark, half, out, ckpt, with_blocks=False)
    q.awaitTermination()
    rows_first = read_streamed_tier(spark, out).count()
    assert rows_first > 0

    # add the second half; a RESTARTED stream (same checkpoint) picks up
    # only the new files
    for f in files[2:]:
        shutil.copy(os.path.join(staged_input, f), half)
    q2 = stream_sequences_to_tier(spark, half, out, ckpt, with_blocks=False)
    q2.awaitTermination()
    streamed = read_streamed_tier(spark, out)
    batch = rollup_raw(spark.read.parquet(half), TIERS["1m"], with_blocks=False)
    assert streamed.count() == batch.count() > rows_first


def test_windowed_rollup_batch_stream_parity(spark, tmp_path):
    events_path = "/root/testdata/sf0.001/events.parquet"
    events = spark.read.parquet(events_path)
    batch_out = windowed_event_rollup(events).orderBy("bucket_start", "event_type")

    out_dir = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "win_ckpt")
    in_dir = str(tmp_path / "win_in")  # file stream sources need a directory
    os.makedirs(in_dir)
    shutil.copy(events_path, in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    q = (
        windowed_event_rollup(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(out_dir)
    # Append mode only emits windows the watermark has closed; every emitted
    # window must match the batch result exactly, and most windows close.
    b = batch_out.collect()
    s = {(r.bucket_start, r.event_type): r for r in streamed.collect()}
    assert len(s) > 0
    matched = 0
    for r in b:
        key = (r.bucket_start, r.event_type)
        if key in s:
            got = s[key]
            assert (got.cnt, got.sum_cents, got.min_cents, got.max_cents) == (
                r.cnt, r.sum_cents, r.min_cents, r.max_cents
            ), key
            matched += 1
    assert matched == len(s)


def test_sessionize_stream_matches_batch_closed_sessions(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): sessions closed by
    the stream equal the batch sessionization minus each user's final
    (still-open) session. Events arrive across two micro-batch files in
    non-session order to exercise cross-batch state carry."""
    import pandas as pd

    from tersets_spark.streaming import sessionize_batch, sessionize_stream

    gap = 100
    rows = []
    for uid in range(6):
        t = uid * 10_000
        for s in range(4):  # 4 sessions per user
            for i in range(3):
                rows.append((uid, t + i * 10, 7))
            t += gap + 50 + s  # gap > 100 closes the session
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_sec", "cents"])

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # split mid-session so state must carry across micro-batches
    cut = len(pdf) // 2 + 1
    spark.createDataFrame(pdf.iloc[:cut]).coalesce(1).write.parquet(in_dir + "/a")
    spark.createDataFrame(pdf.iloc[cut:]).coalesce(1).write.parquet(in_dir + "/b")

    schema = spark.read.parquet(in_dir + "/a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/*")
    )
    out_dir = str(tmp_path / "out")
    q = (
        sessionize_stream(stream, gap_seconds=gap)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    batch = sessionize_batch(spark.createDataFrame(pdf), gap_seconds=gap)
    # drop each user's LAST session (still open in the stream's state)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    closed_expected = batch.withColumn(
        "_max_start", F.max("session_start").over(w)
    ).filter(F.col("session_start") < F.col("_max_start")).drop("_max_start")

    cols = ["user_id", "session_start", "session_end", "n_events", "cents"]
    assert got.count() == closed_expected.count() == 6 * 3
    assert got.select(cols).exceptAll(closed_expected.select(cols)).count() == 0
    assert closed_expected.select(cols).exceptAll(got.select(cols)).count() == 0


def test_stream_full_cascade_matches_batch_all_tiers(spark, staged_input, tmp_path):
    """Streamed 1m/1h/1d (per-batch partials + exact finalize combine) must
    equal the batch cascade tier-for-tier — the north_rule continuous-
    aggregate contract extended to the streaming path."""
    from tersets_spark.rollup import cascade
    from tersets_spark.streaming import stream_cascade_to_tiers

    out = str(tmp_path / "tiers")
    ckpt = str(tmp_path / "ckpt")
    q = stream_cascade_to_tiers(
        spark, staged_input, out, ckpt, max_files_per_trigger=2, with_blocks=False
    )
    q.awaitTermination()

    batch_tiers = cascade(spark.read.parquet(staged_input), with_blocks=False)
    cols = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]
    for tier in ("1m", "1h", "1d"):
        finalized = read_streamed_tier(spark, out, tier, finalize=True)
        # finalize must shed the micro-batch partition column on EVERY tier
        # (incl. the finest early-return branch) so committed schemas match
        # the batch cascade exactly
        assert "batch" not in finalized.columns, f"{tier}: finalize kept 'batch'"
        streamed = finalized.select(cols)
        batch = batch_tiers[tier].select(cols)
        n_s, n_b = streamed.count(), batch.count()
        assert n_s == n_b, f"{tier}: {n_s} streamed vs {n_b} batch rows"
        assert streamed.exceptAll(batch).count() == 0, f"{tier}: values differ"


def test_stream_cascade_partials_finalize_across_batches(spark, tmp_path):
    """Force a coarse bucket to span micro-batches (same doc_id re-ingested
    in a second file) and pin that finalize combines partials exactly —
    including anchor-aware first/last, which plain min/max of values would
    get wrong."""
    import pyarrow as pa

    from tersets_spark.rollup import cascade
    from tersets_spark.streaming import stream_cascade_to_tiers

    # one doc whose two halves land in different batches: first half covers
    # the early 1h bucket minutes with DESCENDING values, second half later
    # minutes with ASCENDING values -> the true 1h first comes from file 0,
    # the true last from file 1, and vmin/vmax straddle both.
    stage = tmp_path / "in"
    stage.mkdir()
    tok_a = list(range(4000, 4000 - 120 * 5, -5))  # 120 tokens, descending
    tok_b = list(range(100, 100 + 240 * 3, 3))     # 240 tokens, ascending
    for name, toks in (("part-0.parquet", tok_a), ("part-1.parquet", tok_b)):
        offset = 0 if name == "part-0.parquet" else len(tok_a)
        tab = pa.table(
            {
                "doc_id": ["doc_x"],
                "tokens": [toks],
                "n_tok": pa.array([len(toks)], type=pa.int32()),
                "source": ["src_00"],
                "ts0": pa.array([1_700_000_000 + offset], type=pa.int64()),
            }
        )
        pq.write_table(tab, str(stage / name))

    out = str(tmp_path / "tiers")
    ckpt = str(tmp_path / "ckpt")
    q = stream_cascade_to_tiers(
        spark, str(stage), out, ckpt, max_files_per_trigger=1, with_blocks=False
    )
    q.awaitTermination()

    # raw partials: the 1h tier must hold >1 row for the shared bucket
    raw_1h = read_streamed_tier(spark, out, "1h", finalize=False)
    shared = raw_1h.groupBy("bucket_ts").count().filter(F.col("count") > 1)
    assert shared.count() > 0, "test setup failed to split a 1h bucket across batches"

    batch_tiers = cascade(spark.read.parquet(str(stage)), with_blocks=False)
    cols = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]
    for tier in ("1h", "1d"):
        streamed = read_streamed_tier(spark, out, tier, finalize=True).select(cols)
        batch = batch_tiers[tier].select(cols)
        assert streamed.count() == batch.count()
        assert streamed.exceptAll(batch).count() == 0, f"{tier}: partial combine wrong"


def test_finalize_streamed_tier_into_catalog(spark, staged_input, tmp_path):
    """Streamed 1h partials committed into a TierCatalog equal the batch
    cascade's 1h tier read through the catalog — streamed data becomes
    first-class catalog data (retention/compaction/time-travel apply)."""
    from tersets_spark.catalog import TierCatalog
    from tersets_spark.rollup import cascade
    from tersets_spark.streaming import finalize_streamed_tier, stream_cascade_to_tiers

    out = str(tmp_path / "stream_tiers")
    ckpt = str(tmp_path / "ckpt")
    q = stream_cascade_to_tiers(
        spark, staged_input, out, ckpt, max_files_per_trigger=2, with_blocks=False
    )
    q.awaitTermination()

    cat = TierCatalog(str(tmp_path / "catalog"))
    n = finalize_streamed_tier(spark, out, cat, "1h")
    assert n > 0

    cols = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]
    got = cat.read_tier(spark, "1h").select(cols)
    want = cascade(spark.read.parquet(staged_input), with_blocks=False)["1h"].select(cols)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_stream_cascade_restart_no_duplicate_partials(spark, staged_input, tmp_path):
    """Kill/restart semantics for the FULL streamed cascade: process half the
    files, restart the stream over the complete input with the same
    checkpoint, and verify (a) only new files are processed (batch dirs grow,
    never rewritten to duplicates), (b) every tier finalizes to exactly the
    batch cascade's rows — i.e. replays/idempotent per-batch dirs left no
    duplicate or missing partials."""
    import os
    import shutil

    from tersets_spark.rollup import cascade
    from tersets_spark.streaming import stream_cascade_to_tiers

    out = str(tmp_path / "tiers")
    ckpt = str(tmp_path / "ckpt")
    half = str(tmp_path / "in")
    os.makedirs(half)
    files = sorted(os.listdir(staged_input))
    for f in files[:2]:
        shutil.copy(os.path.join(staged_input, f), half)

    q = stream_cascade_to_tiers(spark, half, out, ckpt, with_blocks=False,
                                max_files_per_trigger=1)
    q.awaitTermination()
    batches_first = set(os.listdir(os.path.join(out, "1h")))
    assert batches_first

    for f in files[2:]:
        shutil.copy(os.path.join(staged_input, f), half)
    q2 = stream_cascade_to_tiers(spark, half, out, ckpt, with_blocks=False,
                                 max_files_per_trigger=1)
    q2.awaitTermination()
    batches_after = set(os.listdir(os.path.join(out, "1h")))
    assert batches_first < batches_after  # old batch dirs untouched, new appended

    batch_tiers = cascade(spark.read.parquet(half), with_blocks=False)
    cols = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]
    for tier in ("1m", "1h", "1d"):
        got = read_streamed_tier(spark, out, tier, finalize=True).select(cols)
        want = batch_tiers[tier].select(cols)
        assert got.count() == want.count(), tier
        assert got.exceptAll(want).count() == 0, f"{tier}: restart corrupted partials"


def test_stream_replay_appends_no_duplicate_manifest_records(spark, staged_input, tmp_path):
    """foreachBatch replay (crash after the sink ran, before the streaming
    checkpoint committed) must not duplicate manifest lineage: simulate a
    full replay by re-running the SAME input with a FRESH checkpoint (same
    batch ids, same batch dirs) against the same tier catalog — every
    (tier, batch) must still have exactly ONE manifest record, and the
    finalized tiers must be unchanged."""
    import os

    from tersets_spark.catalog import TierCatalog
    from tersets_spark.streaming import stream_cascade_to_tiers

    out = str(tmp_path / "tiers")
    q = stream_cascade_to_tiers(spark, staged_input, out, str(tmp_path / "ck1"),
                                with_blocks=False, max_files_per_trigger=2)
    q.awaitTermination()
    cat = TierCatalog(out)
    first = [(r["tier"], r["partition"]) for r in cat.metrics()]
    rows_first = read_streamed_tier(spark, out, "1h", finalize=True).count()

    # fresh checkpoint -> Structured Streaming replays every file as the
    # same-numbered batches; the sink's writes overwrite idempotently and
    # the manifest must not grow
    q2 = stream_cascade_to_tiers(spark, staged_input, out, str(tmp_path / "ck2"),
                                 with_blocks=False, max_files_per_trigger=2)
    q2.awaitTermination()
    after = [(r["tier"], r["partition"]) for r in cat.metrics()]
    assert sorted(after) == sorted(first), "replay duplicated manifest records"
    assert len(set(after)) == len(after)
    assert read_streamed_tier(spark, out, "1h", finalize=True).count() == rows_first
    assert os.path.isdir(os.path.join(out, "1h"))


def test_sessionize_stream_idle_flush_emits_open_sessions(spark, tmp_path):
    """With idle_flush_seconds set, a ProcessingTimeTimeout finalizes open
    sessions after a quiet period: every session — including each user's
    last — eventually reaches the sink, matching the batch twin exactly,
    and per-user state is cleared instead of living forever."""
    import time

    import pandas as pd

    from tersets_spark.streaming import sessionize_batch, sessionize_stream

    rows = []
    for uid in range(3):
        for i in range(4):
            rows.append((uid, uid * 10_000 + i * 10, 5))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_sec", "cents"])

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(in_dir + "/a")
    schema = spark.read.parquet(in_dir + "/a").schema
    stream = spark.readStream.schema(schema).parquet(in_dir + "/*")
    out_dir = str(tmp_path / "out")
    q = (
        sessionize_stream(stream, gap_seconds=100, idle_flush_seconds=1)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if spark.read.parquet(out_dir).count() >= 3:
                    break
            except Exception:
                pass  # sink not materialized yet
            time.sleep(1)
    finally:
        q.stop()

    got = spark.read.parquet(out_dir)
    batch = sessionize_batch(spark.createDataFrame(pdf), gap_seconds=100)
    cols = ["user_id", "session_start", "session_end", "n_events", "cents"]
    assert got.count() == 3
    assert got.select(cols).exceptAll(batch.select(cols)).count() == 0


# ---------------------------------------------------------------------------
# streamed incremental near-dup: parity with the batch LSH on the same corpus
# ---------------------------------------------------------------------------


def _toy_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = []
    for i in range(30):
        if i % 5 == 0 and i > 0:
            text = base + f"tail {i % 3}"          # near-dup family
        elif i % 7 == 0:
            text = base * 2 + f"tail {i}"          # longer variant
        else:
            text = f"unique document number {i} " + " ".join(
                f"w{i}_{j}" for j in range(25)
            )
        rows.append((f"d{i:03d}", text))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_stream_dedup_matches_batch_lsh(spark, tmp_path):
    from tersets_spark.dedup import minhash_lsh_pairs
    from tersets_spark.streaming import read_stream_dedup_pairs, stream_dedup_minhash

    docs = _toy_docs(spark)
    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)
    # 3 staged files x maxFilesPerTrigger=1 -> 3 micro-batches, so both the
    # new-x-new and new-x-index candidate paths are exercised
    parts = docs.collect()
    for i in range(3):
        spark.createDataFrame(parts[i * 10 : (i + 1) * 10], docs.schema).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(in_dir, f"chunk={i}"))
    import glob as _glob

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    for j, f in enumerate(sorted(_glob.glob(os.path.join(in_dir, "chunk=*", "*.parquet")))):
        shutil.copy(f, os.path.join(stage, f"part-{j}.parquet"))

    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    q = stream_dedup_minhash(
        spark, stage, out, ckpt, k=3, threshold=0.8, max_files_per_trigger=1
    )
    q.awaitTermination()

    got = {
        (r.id_a, r.id_b, r.n_inter, r.n_a, r.n_b)
        for r in read_stream_dedup_pairs(spark, out).collect()
    }
    want = {
        (r.id_a, r.id_b, r.n_inter, r.n_a, r.n_b)
        for r in minhash_lsh_pairs(docs, k=3, threshold=0.8).collect()
    }
    assert want, "toy corpus must contain near-dups for the test to bite"
    assert got == want


def test_stream_dedup_restart_is_idempotent(spark, tmp_path):
    from tersets_spark.dedup import minhash_lsh_pairs
    from tersets_spark.streaming import read_stream_dedup_pairs, stream_dedup_minhash

    docs = _toy_docs(spark)
    parts = docs.collect()
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    spark.createDataFrame(parts[:15], docs.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage + "_tmp1")
    import glob as _glob

    shutil.copy(_glob.glob(stage + "_tmp1/*.parquet")[0], os.path.join(stage, "a.parquet"))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_dedup_minhash(spark, stage, out, ckpt, max_files_per_trigger=4)
    q.awaitTermination()
    n_first = read_stream_dedup_pairs(spark, out).count()

    # second half arrives; resumed stream must only pair against, not
    # re-emit, the first half
    spark.createDataFrame(parts[15:], docs.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage + "_tmp2")
    shutil.copy(_glob.glob(stage + "_tmp2/*.parquet")[0], os.path.join(stage, "b.parquet"))
    q = stream_dedup_minhash(spark, stage, out, ckpt, max_files_per_trigger=4)
    q.awaitTermination()

    got = {
        (r.id_a, r.id_b) for r in read_stream_dedup_pairs(spark, out).collect()
    }
    want = {
        (r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, k=3, threshold=0.8).collect()
    }
    assert got == want
    assert len(got) >= n_first


def test_stream_sketch_tiers_match_batch(spark, staged_input, tmp_path):
    """Streamed sketch tiers (cross-batch partials, combine = sum / max at
    finalize) must equal direct builds over the whole input — per-batch
    one-file triggers force every (source, bucket) to span batches."""
    from tersets_spark.hll import hll_registers, merge_registers
    from tersets_spark.jobs import _sketch_points
    from tersets_spark.sketch import merge_sketch, sketch as hdr_sketch
    from tersets_spark.streaming import stream_cascade_to_tiers

    out = str(tmp_path / "tiers")
    ckpt = str(tmp_path / "ckpt")
    q = stream_cascade_to_tiers(
        spark, staged_input, out, ckpt, max_files_per_trigger=1,
        with_blocks=False, with_sketches=True,
    )
    q.awaitTermination()

    pts = _sketch_points(spark.read.parquet(staged_input))
    day = (F.floor(F.col("bucket_ts") / 86400) * 86400).cast("long")
    exp_psk_1m = hdr_sketch(pts, ["source", "bucket_ts"], "v")
    exp_hll_1m = hll_registers(pts, ["source", "bucket_ts"], "v")
    cases = {
        "psk_1m": (exp_psk_1m, ["source", "bucket_ts", "bucket_id", "cnt"]),
        "psk_1d": (
            merge_sketch(exp_psk_1m.withColumn("bucket_ts", day),
                         ["source", "bucket_ts"]),
            ["source", "bucket_ts", "bucket_id", "cnt"],
        ),
        "hll_1m": (exp_hll_1m, ["source", "bucket_ts", "bucket", "rho"]),
        "hll_1d": (
            merge_registers(exp_hll_1m.withColumn("bucket_ts", day),
                            ["source", "bucket_ts"]),
            ["source", "bucket_ts", "bucket", "rho"],
        ),
    }
    for tier, (expected, cols) in cases.items():
        streamed = read_streamed_tier(spark, out, tier, finalize=True).select(cols)
        # cross-batch partials must exist at the 1m level (sketches aggregate
        # across docs, unlike the per-doc core tiers)
        if tier.endswith("_1m"):
            raw = read_streamed_tier(spark, out, tier, finalize=False)
            key = [c for c in cols if c not in ("cnt", "rho")]
            dupes = raw.groupBy(*key).count().filter(F.col("count") > 1).count()
            assert dupes > 0, f"{tier}: expected cross-batch partials"
        assert streamed.count() == expected.count(), tier
        assert streamed.exceptAll(expected.select(cols)).count() == 0, tier
        assert expected.select(cols).exceptAll(streamed).count() == 0, tier


def test_stream_bloom_tiers_match_batch(spark, staged_input, tmp_path):
    """Streamed Bloom word tiers (cross-batch partials, combine = bit_or at
    finalize) must equal direct builds over the whole input."""
    from tersets_spark.bloom import bloom_words, merge_words
    from tersets_spark.jobs import _sketch_points
    from tersets_spark.streaming import stream_cascade_to_tiers

    out = str(tmp_path / "tiers")
    ckpt = str(tmp_path / "ckpt")
    q = stream_cascade_to_tiers(
        spark, staged_input, out, ckpt, max_files_per_trigger=1,
        with_blocks=False, with_blooms=True,
    )
    q.awaitTermination()

    pts = _sketch_points(spark.read.parquet(staged_input))
    day = (F.floor(F.col("bucket_ts") / 86400) * 86400).cast("long")
    exp_1m = bloom_words(pts, ["source", "bucket_ts"], "v")
    cols = ["source", "bucket_ts", "widx", "word"]
    cases = {
        "blm_1m": exp_1m,
        "blm_1d": merge_words(
            exp_1m.withColumn("bucket_ts", day), ["source", "bucket_ts"]
        ),
    }
    for tier, expected in cases.items():
        streamed = read_streamed_tier(spark, out, tier, finalize=True).select(cols)
        if tier.endswith("_1m"):
            raw = read_streamed_tier(spark, out, tier, finalize=False)
            dupes = (
                raw.groupBy("source", "bucket_ts", "widx")
                .count().filter(F.col("count") > 1).count()
            )
            assert dupes > 0, f"{tier}: expected cross-batch partials"
        assert streamed.count() == expected.count(), tier
        assert streamed.exceptAll(expected.select(cols)).count() == 0, tier
        assert expected.select(cols).exceptAll(streamed).count() == 0, tier


def test_stream_cms_tiers_match_batch(spark, staged_input, tmp_path):
    """Streamed Count-Min cell tiers (cross-batch partials, combine = sum at
    finalize) must equal direct builds over the whole input."""
    from tersets_spark.cms import cms_counters, merge_counters
    from tersets_spark.jobs import _sketch_points
    from tersets_spark.streaming import stream_cascade_to_tiers

    out = str(tmp_path / "tiers")
    ckpt = str(tmp_path / "ckpt")
    q = stream_cascade_to_tiers(
        spark, staged_input, out, ckpt, max_files_per_trigger=1,
        with_blocks=False, with_cms=True,
    )
    q.awaitTermination()

    pts = _sketch_points(spark.read.parquet(staged_input))
    day = (F.floor(F.col("bucket_ts") / 86400) * 86400).cast("long")
    exp_1m = cms_counters(pts, ["source", "bucket_ts"], "v")
    cols = ["source", "bucket_ts", "ridx", "cidx", "cnt"]
    cases = {
        "cms_1m": exp_1m,
        "cms_1d": merge_counters(
            exp_1m.withColumn("bucket_ts", day), ["source", "bucket_ts"]
        ),
    }
    for tier, expected in cases.items():
        streamed = read_streamed_tier(spark, out, tier, finalize=True).select(cols)
        if tier.endswith("_1m"):
            raw = read_streamed_tier(spark, out, tier, finalize=False)
            dupes = (
                raw.groupBy("source", "bucket_ts", "ridx", "cidx")
                .count().filter(F.col("count") > 1).count()
            )
            assert dupes > 0, f"{tier}: expected cross-batch partials"
        assert streamed.count() == expected.count(), tier
        assert streamed.exceptAll(expected.select(cols)).count() == 0, tier
        assert expected.select(cols).exceptAll(streamed).count() == 0, tier

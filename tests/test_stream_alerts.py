"""Streamed threshold alerting (streaming.stream_threshold_alerts):
stream/batch parity under real cross-batch source-bucket splits, both
modes, restart idempotence, and the folded peak's exactness."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.rollup import TIERS, rollup_raw
from tersets_spark.streaming import read_stream_alerts, stream_threshold_alerts
from tersets_spark.tables import ensure_sequences


@pytest.fixture(scope="module")
def staged_input(tmp_path_factory):
    src = ensure_sequences("sf0.001")
    stage = tmp_path_factory.mktemp("alert_in")
    table = pq.read_table(src)
    n = table.num_rows
    bounds = [i * n // 4 for i in range(5)]
    for i in range(4):
        pq.write_table(table.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       os.path.join(stage, f"part-{i}.parquet"))
    return str(stage)


def _batch_answer(spark, staged_input, thr, mode):
    m1 = rollup_raw(spark.read.parquet(staged_input), TIERS["1m"],
                    with_blocks=False)
    fold = F.max("vmax") if mode == ">=" else F.min("vmin")
    peaks = m1.groupBy("source", "bucket_ts").agg(
        fold.cast("long").alias("peak"))
    pred = (F.col("peak") >= thr) if mode == ">=" else (F.col("peak") <= thr)
    return {(r["source"], r["bucket_ts"]): r["peak"]
            for r in peaks.where(pred).collect()}


def _pick_threshold(spark, staged_input, q):
    m1 = rollup_raw(spark.read.parquet(staged_input), TIERS["1m"],
                    with_blocks=False)
    return int(m1.agg(F.expr(f"percentile_approx(vmax, {q})")).head()[0])


def test_stream_alerts_match_batch_hi(spark, staged_input, tmp_path):
    thr = _pick_threshold(spark, staged_input, 0.95)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_threshold_alerts(spark, staged_input, out, ckpt, thr,
                                max_files_per_trigger=1)
    q.awaitTermination()
    want = _batch_answer(spark, staged_input, thr, ">=")
    got = {(r["source"], r["bucket_ts"]): r["peak"]
           for r in read_stream_alerts(spark, out).collect()}
    assert want and got == want
    # the split was real: more than one batch dir logged alerts
    dirs = [d for d in os.listdir(os.path.join(out, "alerts"))
            if d.startswith("batch=")]
    assert len(dirs) > 1


def test_stream_alerts_match_batch_lo(spark, staged_input, tmp_path):
    m1 = rollup_raw(spark.read.parquet(staged_input), TIERS["1m"],
                    with_blocks=False)
    thr = int(m1.agg(F.expr("percentile_approx(vmin, 0.05)")).head()[0])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_threshold_alerts(spark, staged_input, out, ckpt, thr,
                                mode="<=", max_files_per_trigger=1)
    q.awaitTermination()
    want = _batch_answer(spark, staged_input, thr, "<=")
    got = {(r["source"], r["bucket_ts"]): r["peak"]
           for r in read_stream_alerts(spark, out).collect()}
    assert want and got == want


def test_cross_batch_fold_is_exact(spark, staged_input, tmp_path):
    # a source-bucket alerted in >=2 batches must fold to the TRUE extreme
    thr = _pick_threshold(spark, staged_input, 0.5)  # dense alerts
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_threshold_alerts(spark, staged_input, out, ckpt, thr,
                                max_files_per_trigger=1)
    q.awaitTermination()
    base = os.path.join(out, "alerts")
    raw_log = spark.read.option("basePath", base).parquet(
        os.path.join(base, "batch=*"))
    multi = (raw_log.groupBy("source", "bucket_ts")
             .agg(F.count(F.lit(1)).alias("k")).where(F.col("k") > 1).count())
    assert multi > 0, "fixture produced no cross-batch alerted buckets"
    want = _batch_answer(spark, staged_input, thr, ">=")
    got = {(r["source"], r["bucket_ts"]): r["peak"]
           for r in read_stream_alerts(spark, out).collect()}
    assert got == want


def test_restart_does_not_duplicate(spark, staged_input, tmp_path):
    thr = _pick_threshold(spark, staged_input, 0.95)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    half = str(tmp_path / "in")
    os.makedirs(half)
    files = sorted(os.listdir(staged_input))
    for f in files[:2]:
        shutil.copy(os.path.join(staged_input, f), half)
    stream_threshold_alerts(spark, half, out, ckpt, thr).awaitTermination()
    for f in files[2:]:
        shutil.copy(os.path.join(staged_input, f), half)
    stream_threshold_alerts(spark, half, out, ckpt, thr).awaitTermination()
    want = _batch_answer(spark, staged_input, thr, ">=")
    got = {(r["source"], r["bucket_ts"]): r["peak"]
           for r in read_stream_alerts(spark, out).collect()}
    assert got == want


def test_mode_validation(spark, staged_input, tmp_path):
    with pytest.raises(ValueError):
        stream_threshold_alerts(spark, staged_input, str(tmp_path / "o"),
                                str(tmp_path / "c"), 0, mode="==")

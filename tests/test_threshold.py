"""Value-threshold scan served off the 1m tier's vmin/vmax zone maps
(rollup.threshold_points / jobs.threshold_from_catalog): exactness vs a
token-explode replica, candidate pruning, range clamping, catalog twin
equality, and the retention-horizon guard on BOTH tiers it reads."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import apply_retention, run_cascade, threshold_from_catalog
from tersets_spark.kernels import compress_udf
from tersets_spark.methods import Method
from tersets_spark.rollup import rollup_raw, threshold_candidates, threshold_points
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("thr_seq") / "seq.parquet")
    pq.write_table(generate_sequences(240, seed=31), path)
    return path


@pytest.fixture(scope="module")
def seq(spark, seq_path):
    return spark.read.parquet(seq_path)


@pytest.fixture(scope="module")
def raw_m1(seq):
    raw = seq.select(
        "doc_id", "source", "ts0", "n_tok",
        compress_udf(Method.DeltaOfDelta, 0.0)(F.col("tokens")).alias("blob"),
    )
    return raw, rollup_raw(seq)


def _replica(seq_pdf: pd.DataFrame, thr: int, mode: str,
             start: int | None = None, end: int | None = None) -> pd.DataFrame:
    rows = []
    for r in seq_pdf.itertuples():
        for i, v in enumerate(r.tokens):
            ts = r.ts0 + i
            if start is not None and ts < start:
                continue
            if end is not None and ts >= end:
                continue
            if (v >= thr) if mode == ">=" else (v <= thr):
                rows.append((r.doc_id, r.source, ts, int(v)))
    return pd.DataFrame(rows, columns=["doc_id", "source", "ts", "v"])


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["doc_id", "ts"], ignore_index=True).astype(
        {"ts": "int64", "v": "int64"}
    )


def test_threshold_points_exact_both_modes(seq, raw_m1):
    raw, m1 = raw_m1
    pdf = seq.toPandas()
    flat = pd.Series([v for t in pdf.tokens for v in t])
    thr_hi = int(flat.quantile(0.999))
    thr_lo = int(flat.quantile(0.001))
    for thr, mode in ((thr_hi, ">="), (thr_lo, "<=")):
        got = threshold_points(raw, m1, thr, mode=mode).toPandas()
        want = _replica(pdf, thr, mode)
        assert len(got) > 0, (thr, mode)
        pd.testing.assert_frame_equal(_norm(got), _norm(want))
        # dynamic-join fallback (candidates above push_limit) is identical
        joined = threshold_points(raw, m1, thr, mode=mode,
                                  push_limit=0).toPandas()
        pd.testing.assert_frame_equal(_norm(joined), _norm(want))
        # tiny push_limit forces the fallback via the limit probe too
        probed = threshold_points(raw, m1, thr, mode=mode,
                                  push_limit=1).toPandas()
        pd.testing.assert_frame_equal(_norm(probed), _norm(want))


def test_threshold_points_range_clamped(seq, raw_m1):
    raw, m1 = raw_m1
    pdf = seq.toPandas()
    lo = int(pdf.ts0.min())
    hi = int((pdf.ts0 + pdf.n_tok).max())
    # a range cutting through candidate minutes on both sides
    start, end = lo + (hi - lo) // 3 + 7, lo + 2 * (hi - lo) // 3 + 11
    flat = pd.Series([v for t in pdf.tokens for v in t])
    thr = int(flat.quantile(0.99))
    got = threshold_points(raw, m1, thr, start=start, end=end).toPandas()
    want = _replica(pdf, thr, ">=", start, end)
    assert len(want) > 0
    assert got.ts.between(start, end - 1).all()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_threshold_candidates_prune_and_clamp(spark):
    # hand-built 1m tier: doc A has one hot minute, doc B never qualifies
    m1 = spark.createDataFrame(
        [
            ("A", "s", 1_700_000_000, 10, 50),
            ("A", "s", 1_700_000_060, 10, 500),
            ("A", "s", 1_700_000_120, 10, 60),
            ("B", "s", 1_700_000_000, 80, 90),
        ],
        "doc_id string, source string, bucket_ts long, vmin long, vmax long",
    )
    cand = threshold_candidates(m1, 100).collect()
    assert len(cand) == 1 and cand[0]["doc_id"] == "A"
    assert cand[0]["w_lo"] == 1_700_000_060 and cand[0]["w_hi"] == 1_700_000_120
    # clamp: requested range tighter than the candidate minutes
    cand = threshold_candidates(
        m1, 100, start=1_700_000_070, end=1_700_000_100
    ).collect()
    assert cand[0]["w_lo"] == 1_700_000_070 and cand[0]["w_hi"] == 1_700_000_100
    # vmin path for '<='
    cand = threshold_candidates(m1, 55, mode="<=").collect()
    assert {r["doc_id"] for r in cand} == {"A"}
    with pytest.raises(ValueError):
        threshold_candidates(m1, 100, mode="==")


def test_threshold_points_empty_and_validation(seq, raw_m1):
    raw, m1 = raw_m1
    vmax = int(m1.agg(F.max("vmax")).head()[0])
    assert threshold_points(raw, m1, vmax + 1).count() == 0
    with pytest.raises(ValueError):
        threshold_points(raw, m1, 0, start=100, end=100)
    with pytest.raises(ValueError):
        threshold_points(raw, m1, 0, mode="!=")


def test_threshold_from_catalog_matches_direct(spark, seq_path, seq, raw_m1, tmp_path):
    raw, m1 = raw_m1
    out = str(tmp_path / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False)
    pdf = seq.toPandas()
    flat = pd.Series([v for t in pdf.tokens for v in t])
    thr = int(flat.quantile(0.995))
    got = threshold_from_catalog(spark, out, thr).toPandas()
    want = threshold_points(raw, m1, thr).toPandas()
    assert len(got) > 0
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    # serve routing reaches the same path
    from tersets_spark.jobs import serve

    lo = int(pdf.ts0.min())
    hi = int((pdf.ts0 + pdf.n_tok).max())
    via_serve = serve(spark, out, lo, hi, threshold=thr).toPandas()
    pd.testing.assert_frame_equal(_norm(via_serve), _norm(want))
    with pytest.raises(ValueError):
        serve(spark, out, lo, hi, threshold=thr, k=4)


def test_threshold_retention_guard(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False)
    row = (
        spark.read.parquet(seq_path)
        .agg(F.min("ts0"), F.max(F.col("ts0") + F.col("n_tok")))
        .collect()[0]
    )
    lo, hi = int(row[0]), int(row[1])
    keep = (hi - lo) // 2
    apply_retention(spark, out, hi, {"raw": keep, "1m": keep})
    horizon = hi - keep
    # unbounded scan and below-horizon start both fail fast
    with pytest.raises(ValueError, match="retention horizon"):
        threshold_from_catalog(spark, out, 0)
    with pytest.raises(ValueError, match="retention horizon"):
        threshold_from_catalog(spark, out, 0, start=lo, end=hi)
    # above-horizon start serves
    got = threshold_from_catalog(spark, out, 0, start=horizon + 60, end=hi)
    assert got.count() > 0


def test_footer_stat_resolver_runs_zero_jobs(spark, seq, seq_path):
    """max_doc_seconds resolves from parquet FOOTER statistics — a
    driver-side metadata read, not a Spark job (the r4 plan ran a full
    max(n_tok) scan per serving call when the bound was unset)."""
    from tersets_spark.rollup import _footer_stat_max, _resolve_max_doc_seconds

    sc = spark.sparkContext
    sc.setJobGroup("footer_stat_probe", "must stay empty")
    try:
        got = _resolve_max_doc_seconds(seq, None)
        stat = _footer_stat_max(seq, "n_tok")
    finally:
        sc.setJobGroup("footer_stat_probe_done", "reset")
    assert list(sc.statusTracker().getJobIdsForGroup("footer_stat_probe")) == []
    true_max = int(pd.read_parquet(seq_path, columns=["n_tok"])["n_tok"].max())
    assert got == stat == true_max
    # a FILTERED frame still resolves soundly (footer max >= frame max)
    filtered = seq.where(F.col("n_tok") < true_max)
    assert _resolve_max_doc_seconds(filtered, None) >= int(
        filtered.agg(F.max("n_tok")).head()[0]
    )
    # caller-supplied bound always wins
    assert _resolve_max_doc_seconds(seq, 123) == 123
    # non-file-backed frames fall back (tiny test inputs only)
    mem = spark.createDataFrame([(5,), (9,)], "n_tok int")
    assert _footer_stat_max(mem, "n_tok") is None
    assert _resolve_max_doc_seconds(mem, None) == 9


def test_push_limit_defaults_to_session_in_filter_threshold(spark, raw_m1):
    """The static doc_id IN(...) path only triggers when the predicate
    actually converts to a parquet filter: the default collect bound IS
    the session's inFilterThreshold (one shared knob, read at call time).
    The fixture is 240 docs, so the conf is temporarily lowered below it
    to drive the default path onto the broadcast-join fallback."""
    raw, m1 = raw_m1
    key = "spark.sql.parquet.pushdown.inFilterThreshold"
    saved = spark.conf.get(key)
    n_cand = threshold_candidates(m1, 1).count()  # every doc qualifies
    try:
        spark.conf.set(key, "64")
        assert n_cand > 64, "fixture must exceed the lowered threshold"
        # with the default push_limit (None -> session conf), the candidate
        # set above the threshold takes the broadcast-join path — and still
        # matches the explicitly-pushed twin computed with a raised limit
        a = sorted(map(tuple, threshold_points(raw, m1, 1).collect()))
        b = sorted(map(tuple,
                       threshold_points(raw, m1, 1,
                                        push_limit=n_cand + 1).collect()))
        assert a == b and a
        # below the lowered threshold the default path pushes statically
        # and must agree as well
        c = sorted(map(tuple, threshold_points(raw, m1, 1,
                                               push_limit=64).collect()))
        assert c == a
    finally:
        spark.conf.set(key, saved)

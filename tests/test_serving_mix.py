"""Tier-stitched range serving, real-time tier reads, and the mixing ops
(remix_sources / shard_assign) — each checked against an independent exact
replica (raw-token recompute, Fraction arithmetic, pandas cumsum)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tersets_spark.rollup import (
    cascade,
    range_aggregate,
    rollup_raw,
    rollup_up,
    stitch_segments,
)
from tersets_spark.tables import ensure_sequences

# ranges chosen to exercise every stitch case over the sf0.001 time span
# ([~1.7000000e9, ~1.70009e9)): left 1m+1h edges, a full 1d interior,
# a trailing 1m edge with data, and a no-1d hour-dominated range.
RANGES = [
    (1_700_000_100, 1_700_095_260),
    (1_700_003_700, 1_700_085_600),
    (1_700_006_400, 1_700_089_860),
]


@pytest.fixture(scope="module")
def seq(spark):
    return spark.read.parquet(ensure_sequences("sf0.001"))


def test_stitch_segments_exact_partition():
    for start, end in RANGES + [(1_700_000_040, 1_700_000_100), (0, 86400 * 3)]:
        segs = stitch_segments(start, end)
        cur = start
        for name, a, b in segs:
            assert a == cur and b > a, (name, a, b, cur)
            step = {"1m": 60, "1h": 3600, "1d": 86400}[name]
            assert a % step == 0 and b % step == 0
            cur = b
        assert cur == end
        # maximality: two adjacent segments never share a tier (they would
        # have been emitted as one), and every aligned day inside the range
        # is served by 1d
        for (n1, _, b1), (n2, a2, _) in zip(segs, segs[1:]):
            assert not (n1 == n2 and b1 == a2)


def test_stitch_segments_rejects_bad_ranges():
    with pytest.raises(ValueError):
        stitch_segments(100, 100)
    with pytest.raises(ValueError):
        stitch_segments(30, 120)  # start not minute-aligned
    with pytest.raises(ValueError):
        stitch_segments(60, 90)  # end not minute-aligned


def _raw_range_agg(seq, start, end):
    """Independent replica: aggregate the raw token stream directly."""
    pts = seq.select(
        "source",
        F.posexplode("tokens").alias("pos", "v"),
        (F.col("ts0")).alias("ts0"),
    ).select("source", (F.col("ts0") + F.col("pos")).alias("ts"), "v")
    return (
        pts.where((F.col("ts") >= start) & (F.col("ts") < end))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("v").cast("long").alias("sum"),
            F.min("v").cast("long").alias("vmin"),
            F.max("v").cast("long").alias("vmax"),
            (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean"),
        )
    )


def test_range_aggregate_matches_raw_scan(seq, spark):
    tiers = cascade(seq)
    for start, end in RANGES:
        got = {
            r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"], r["mean"])
            for r in range_aggregate(tiers, start, end).collect()
        }
        want = {
            r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"], r["mean"])
            for r in _raw_range_agg(seq, start, end).collect()
        }
        assert got == want and got


def test_range_aggregate_missing_tier_fails(seq):
    tiers = cascade(seq)
    del tiers["1d"]
    with pytest.raises(KeyError):
        range_aggregate(tiers, RANGES[0][0], RANGES[0][1]).collect()


def test_catalog_range_and_realtime_serving(seq, spark, tmp_path):
    """Cascade a doc-subset into a catalog; (a) the catalog-served stitched
    range equals the in-memory one, (b) read_tier_realtime over the FULL
    table equals a full recompute — committed rows plus a fresh-tail rollup,
    (c) with no fresh docs realtime == committed tier."""
    from tersets_spark.jobs import (
        range_aggregate_from_catalog,
        read_tier_realtime,
        run_cascade,
    )

    gate = F.substring(F.md5(F.concat(F.lit("rt-test:"), F.col("doc_id"))), 1, 1) < "c"
    committed_seq = seq.where(gate)
    sub_path = str(tmp_path / "committed.parquet")
    committed_seq.write.parquet(sub_path)
    out = str(tmp_path / "cat")
    import os

    os.makedirs(out, exist_ok=True)
    run_cascade(spark, sub_path, out, with_blocks=False)

    start, end = RANGES[0]
    got = {
        r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"])
        for r in range_aggregate_from_catalog(spark, out, start, end).collect()
    }
    want = {
        r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"])
        for r in range_aggregate(cascade(committed_seq), start, end).collect()
    }
    assert got == want and got

    cols = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]
    # the md5-gated committed set is NOT an ingest prefix -> antijoin mode
    for tier, secs in [("1h", 3600), ("1d", 86400)]:
        served = read_tier_realtime(spark, out, tier, seq, mode="antijoin")
        full = rollup_up(rollup_raw(seq, 60), 3600)
        if tier == "1d":
            full = rollup_up(full, 86400)
        a = sorted(map(tuple, served.select(*cols).collect()))
        b = sorted(map(tuple, full.select(*cols).collect()))
        assert a == b and a

    # no fresh docs: realtime == the committed tier exactly
    served = read_tier_realtime(spark, out, "1h", committed_seq, mode="antijoin")
    committed_tier = rollup_up(rollup_raw(committed_seq, 60), 3600)
    assert sorted(map(tuple, served.select(*cols).collect())) == sorted(
        map(tuple, committed_tier.select(*cols).collect())
    )


# ---------------------------------------------------------------------------
# remix_sources
# ---------------------------------------------------------------------------


def test_remix_thresholds_exact():
    from fractions import Fraction

    from tersets_spark.seqops import REMIX_SCALE, remix_thresholds

    toks = {"a": 1000, "b": 300, "c": 77}
    weights = {"a": 2, "b": 3, "c": 1}
    thr = remix_thresholds(toks, weights)
    m = min(toks, key=lambda s: (Fraction(toks[s], weights[s]), s))
    assert thr[m] == REMIX_SCALE  # binding source kept whole
    for s in toks:
        want = (weights[s] * toks[m] * REMIX_SCALE) // (weights[m] * toks[s])
        assert thr[s] == want
        assert thr[s] <= REMIX_SCALE


def test_remix_thresholds_validation():
    from tersets_spark.seqops import remix_thresholds

    with pytest.raises(ValueError):
        remix_thresholds({"a": 10}, {})
    with pytest.raises(ValueError):
        remix_thresholds({"a": 10}, {"a": 0})


def test_remix_sources_matches_python_replica(seq, spark):
    from tersets_spark.seqops import remix_gate_hex, remix_sources, remix_thresholds

    pdf = seq.select("doc_id", "source", "n_tok").toPandas()
    weights = {f"src_{i:02d}": i + 1 for i in range(12)}
    toks = pdf.groupby("source")["n_tok"].sum().astype(int).to_dict()
    thrs = {s: remix_gate_hex(t) for s, t in remix_thresholds(toks, weights).items()}

    def kept(row):
        pfx = hashlib.md5(f"remix-v1:{row.doc_id}".encode()).hexdigest()[:12]
        return pfx < thrs[row.source]

    pdf["kept"] = [kept(r) for r in pdf.itertuples()]
    k = pdf[pdf.kept]
    want = {
        s: (int(g["n_tok"].count()), int(g["n_tok"].sum()))
        for s, g in k.groupby("source")
    }

    got = {
        r["source"]: (r["docs_kept"], r["tokens_kept"])
        for r in remix_sources(seq, weights).collect()
    }
    assert got == want
    # the binding source is kept whole
    rows = {r["source"]: r for r in remix_sources(seq, weights).collect()}
    whole = [s for s, r in rows.items() if r["thr_hex"] == "g"]
    assert len(whole) >= 1
    for s in whole:
        assert rows[s]["docs_kept"] == int((pdf.source == s).sum())


# ---------------------------------------------------------------------------
# shard_assign
# ---------------------------------------------------------------------------


def test_shard_assign_matches_replica_and_balance(seq, spark):
    from tersets_spark.seqops import shard_assign

    n = 16
    pdf = seq.select("doc_id", "n_tok").toPandas()
    pdf["key"] = [
        hashlib.md5(f"shard-v1:{d}".encode()).hexdigest() + "|" + d
        for d in pdf.doc_id
    ]
    pdf = pdf.sort_values("key").reset_index(drop=True)
    total = int(pdf.n_tok.sum())
    ps = pdf.n_tok.astype("int64").cumsum().shift(fill_value=0)
    pdf["shard"] = (ps * n) // total
    want = dict(zip(pdf.doc_id, pdf["shard"].astype(int)))

    # small bucket_docs exercises multi-bucket prefix stitching
    got_df = shard_assign(seq, n_shards=n, bucket_docs=128)
    got = {r["doc_id"]: r["shard"] for r in got_df.select("doc_id", "shard").collect()}
    assert got == want

    # balance: every shard's token mass <= ideal + one max document;
    # shards are contiguous in key order and all present
    per = pdf.groupby("shard")["n_tok"].sum()
    assert len(per) == n
    assert per.max() <= total / n + int(pdf.n_tok.max())
    assert (pdf["shard"].diff().dropna() >= 0).all()


def test_shard_assign_validation(seq):
    from tersets_spark.seqops import shard_assign

    with pytest.raises(ValueError):
        shard_assign(seq, n_shards=0)
    with pytest.raises(ValueError):
        shard_assign(seq.where(F.lit(False)), n_shards=4)


# ---------------------------------------------------------------------------
# second-resolution edges (raw-tier blob decode)
# ---------------------------------------------------------------------------

SEC_RANGES = [
    (1_700_000_123, 1_700_095_297),  # ragged-second edges on both ends
    (1_700_006_461, 1_700_089_777),  # no 1d interior after alignment
    (1_700_040_007, 1_700_040_043),  # entirely inside one minute: raw only
]


def _raw_tier_df(seq):
    from tersets_spark.kernels import compress_udf
    from tersets_spark.methods import Method

    return seq.select(
        "doc_id", "source", "ts0", "n_tok",
        compress_udf(Method.DeltaOfDelta, 0.0)(F.col("tokens")).alias("blob"),
    )


def test_range_aggregate_second_resolution(seq, spark):
    tiers = cascade(seq)
    raw = _raw_tier_df(seq)
    for start, end in SEC_RANGES:
        got = {
            r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"], r["mean"])
            for r in range_aggregate(tiers, start, end, raw_df=raw).collect()
        }
        want = {
            r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"], r["mean"])
            for r in _raw_range_agg(seq, start, end).collect()
        }
        assert got == want and got


def test_range_aggregate_seconds_require_raw(seq):
    tiers = cascade(seq)
    with pytest.raises(ValueError):
        # ragged seconds without a raw tier: must fail fast, not mis-bucket
        range_aggregate(tiers, SEC_RANGES[0][0], SEC_RANGES[0][1])


def test_catalog_range_second_resolution(seq, spark, tmp_path):
    """Catalog-served second-resolution range: the raw tier is read (and
    decoded) only for the sub-minute edges."""
    import os

    from tersets_spark.jobs import range_aggregate_from_catalog, run_cascade

    sub_path = str(tmp_path / "seq.parquet")
    seq.write.parquet(sub_path)
    out = str(tmp_path / "cat")
    os.makedirs(out, exist_ok=True)
    run_cascade(spark, sub_path, out, with_blocks=False)
    start, end = SEC_RANGES[0]
    got = {
        r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"])
        for r in range_aggregate_from_catalog(spark, out, start, end).collect()
    }
    want = {
        r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"])
        for r in _raw_range_agg(seq, start, end).collect()
    }
    assert got == want and got


# ---------------------------------------------------------------------------
# retention guard + plan shape
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def full_cat(seq, spark, tmp_path_factory):
    """Full-table cascade committed once for the read-only serving tests."""
    import os

    from tersets_spark.jobs import run_cascade

    work = tmp_path_factory.mktemp("serving_cat")
    sub_path = str(work / "seq.parquet")
    seq.write.parquet(sub_path)
    out = str(work / "cat")
    os.makedirs(out, exist_ok=True)
    run_cascade(spark, sub_path, out, with_blocks=False)
    return out


def test_range_retention_guard(seq, spark, full_cat, tmp_path):
    """Serving a range whose fine segments were retention-expired must fail
    fast (the rows are GONE — silently undercounting is the failure mode),
    while ranges above the horizon still serve exactly."""
    import shutil

    from tersets_spark.jobs import apply_retention, range_aggregate_from_catalog

    out = str(tmp_path / "cat")
    shutil.copytree(full_cat, out)
    # expire 1m rows below ~mid-span (policy keeps the last 12h as of the
    # data's end); 1h/1d keep everything
    now_ts = 1_700_090_000
    dropped = apply_retention(
        spark, out, now_ts, policy={"1m": 12 * 3600, "1h": None, "1d": None}
    )
    assert dropped["1m"] > 0
    horizon = now_ts - 12 * 3600  # 1_700_046_800

    # a range whose 1m edge starts below the horizon: fail fast
    with pytest.raises(ValueError, match="retention horizon"):
        range_aggregate_from_catalog(spark, out, 1_700_000_100, 1_700_095_260)

    # a range entirely above the horizon (1m edges >= horizon) still serves
    # and equals the raw recompute
    start, end = 1_700_047_860, 1_700_095_260
    got = {
        r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"])
        for r in range_aggregate_from_catalog(spark, out, start, end).collect()
    }
    want = {
        r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"])
        for r in _raw_range_agg(seq, start, end).collect()
    }
    assert got == want and got


def test_catalog_range_plan_pushes_bucket_predicates(spark, full_cat):
    """The stitched segments' bucket_ts ranges must reach the committed
    tiers' parquet scans (row-group pruning at scale) — and each tier is
    scanned once, not once per segment."""
    from tersets_spark.jobs import range_aggregate_from_catalog

    df = range_aggregate_from_catalog(spark, full_cat, RANGES[0][0], RANGES[0][1])
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "bucket_ts" in ln
    ]
    # three tier scans (1m, 1h, 1d), each with bucket_ts filters pushed
    assert len(pushed) == 3, plan
    assert plan.count("Scan parquet") == 3, plan


# ---------------------------------------------------------------------------
# upsample_mix
# ---------------------------------------------------------------------------


def test_upsample_plan_exact():
    from fractions import Fraction

    from tersets_spark.seqops import REMIX_SCALE, upsample_plan

    toks = {"a": 1000, "b": 300, "c": 77}
    weights = {"a": 1, "b": 3, "c": 2}
    plan = upsample_plan(toks, weights)
    total, wsum = sum(toks.values()), sum(weights.values())
    for s, t in toks.items():
        rate = Fraction(weights[s] * total, wsum * t)
        k, thr = plan[s]
        assert k == rate.numerator // rate.denominator
        frac = rate - k
        assert thr == (frac.numerator * REMIX_SCALE) // frac.denominator
        assert 0 <= thr < REMIX_SCALE
    # expected token mass == target share exactly (in expectation):
    # k + thr/SCALE approximates rate from below within 1/SCALE
    for s, t in toks.items():
        rate = Fraction(weights[s] * total, wsum * t)
        k, thr = plan[s]
        assert 0 <= rate - (k + Fraction(thr, REMIX_SCALE)) < Fraction(1, REMIX_SCALE)


def test_upsample_plan_validation():
    from tersets_spark.seqops import upsample_plan

    with pytest.raises(ValueError):
        upsample_plan({"a": 10}, {})
    with pytest.raises(ValueError):
        upsample_plan({"a": 10}, {"a": -1})


def test_upsample_mix_matches_python_replica(seq, spark):
    from tersets_spark.seqops import upsample_mix, upsample_plan

    pdf = seq.select("doc_id", "source", "n_tok").toPandas()
    weights = {f"src_{i:02d}": (i % 4) + 1 for i in range(12)}
    toks = pdf.groupby("source")["n_tok"].sum().astype(int).to_dict()
    plan = upsample_plan(toks, weights)

    def copies(row):
        k, thr = plan[row.source]
        pfx = hashlib.md5(f"upmix-v1:{row.doc_id}".encode()).hexdigest()[:12]
        return k + (1 if pfx < format(thr, "012x") else 0)

    pdf["copies"] = [copies(r) for r in pdf.itertuples()]
    want = dict(zip(pdf.doc_id, pdf["copies"].astype(int)))

    got = {
        r["doc_id"]: r["copies"]
        for r in upsample_mix(seq, weights).select("doc_id", "copies").collect()
    }
    assert got == want
    # upsampling actually happens: at least one source replicates >= 2x
    assert pdf.groupby("source")["copies"].min().max() >= 2
    # and the realized mix approaches the target shares (within one doc's
    # granularity per source — loose sanity, the exact check is the plan)
    out_tokens = (pdf.n_tok * pdf.copies).groupby(pdf.source).sum()
    wsum = sum(weights[s] for s in toks)
    total = sum(toks.values())
    for s in out_tokens.index:
        target = weights[s] / wsum * total
        assert abs(out_tokens[s] - target) / target < 0.25


def test_sketch_serving_in_range_from_catalog(seq, spark, tmp_path):
    """Catalog-served range-scoped sketch reads (percentiles_in_range /
    distinct_in_range) equal one-shot sketches over the range's raw
    points — stitched merge is exact for sum (psk) and idempotent-max
    (hll)."""
    import os

    from tersets_spark.hll import hll_registers, hll_summary, merge_registers
    from tersets_spark.jobs import (
        _sketch_points,
        distinct_in_range,
        percentiles_in_range,
        run_cascade,
    )
    from tersets_spark.sketch import merge_sketch, percentiles, sketch

    sub_path = str(tmp_path / "seq.parquet")
    seq.write.parquet(sub_path)
    out = str(tmp_path / "cat")
    os.makedirs(out, exist_ok=True)
    run_cascade(spark, sub_path, out, with_blocks=False, with_sketches=True)

    start, end = RANGES[0]
    pts = _sketch_points(seq).where(
        (F.col("bucket_ts") >= start) & (F.col("bucket_ts") < end)
    )

    got_p = sorted(map(tuple, percentiles_in_range(spark, out, start, end).collect()))
    want_p = sorted(map(tuple, percentiles(
        merge_sketch(sketch(pts, ["source", "bucket_ts"], "v"), ["source"]),
        ["source"], [50, 90, 99],
    ).collect()))
    assert got_p == want_p and got_p

    got_d = sorted(map(tuple, distinct_in_range(spark, out, start, end).collect()))
    want_d = sorted(map(tuple, hll_summary(
        merge_registers(
            hll_registers(pts, ["source", "bucket_ts"], "v", dict_hash=True),
            ["source"],
        ),
        ["source"],
    ).collect()))
    assert got_d == want_d and got_d

    # ragged-second endpoints: raw-tier edge decode feeds the sketches
    rs, re_ = SEC_RANGES[0]
    pts_sec = _sketch_points(seq)  # minute buckets; rebuild at point ts
    pts_pt = (
        seq.select("source", F.posexplode("tokens").alias("pos", "v"), "ts0")
        .select("source", (F.col("ts0") + F.col("pos")).alias("ts"), "v")
        .where((F.col("ts") >= rs) & (F.col("ts") < re_))
        .withColumn("bucket_ts", (F.floor(F.col("ts") / 60) * 60).cast("long"))
    )
    got_ps = sorted(map(tuple, percentiles_in_range(spark, out, rs, re_).collect()))
    want_ps = sorted(map(tuple, percentiles(
        merge_sketch(sketch(pts_pt, ["source", "bucket_ts"], "v"), ["source"]),
        ["source"], [50, 90, 99],
    ).collect()))
    assert got_ps == want_ps and got_ps

    got_ds = sorted(map(tuple, distinct_in_range(spark, out, rs, re_).collect()))
    want_ds = sorted(map(tuple, hll_summary(
        merge_registers(
            hll_registers(pts_pt, ["source", "bucket_ts"], "v", dict_hash=True),
            ["source"],
        ),
        ["source"],
    ).collect()))
    assert got_ds == want_ds and got_ds


def test_realtime_hwm_mode_prefix_commit(seq, spark, tmp_path):
    """The scale path: committed set = ingest-order prefix per source;
    high-water-mark gating (map-side, no payload shuffle) equals the
    anti-join and the full recompute."""
    import os

    from tersets_spark.jobs import read_tier_realtime, run_cascade
    from tersets_spark.seqops import default_order_key

    committed_seq = seq.where(default_order_key() < 1200)
    sub_path = str(tmp_path / "committed.parquet")
    committed_seq.write.parquet(sub_path)
    out = str(tmp_path / "cat")
    os.makedirs(out, exist_ok=True)
    run_cascade(spark, sub_path, out, with_blocks=False)

    cols = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax",
            "first", "last"]
    hwm = sorted(map(tuple, read_tier_realtime(spark, out, "1h", seq, mode="hwm")
                     .select(*cols).collect()))
    aj = sorted(map(tuple, read_tier_realtime(spark, out, "1h", seq,
                                              mode="antijoin")
                    .select(*cols).collect()))
    full = sorted(map(tuple, rollup_up(rollup_raw(seq, 60), 3600)
                      .select(*cols).collect()))
    assert hwm == aj == full and hwm

    with pytest.raises(ValueError, match="mode"):
        read_tier_realtime(spark, out, "1h", seq, mode="nope")


# ---------------------------------------------------------------------------
# range_gapfill serving
# ---------------------------------------------------------------------------


def test_serving_tier_for_step_picks_coarsest_divisor():
    from tersets_spark.rollup import serving_tier_for_step

    assert serving_tier_for_step(60) == ("1m", 60)
    assert serving_tier_for_step(120) == ("1m", 60)  # 1h does not divide
    assert serving_tier_for_step(3600) == ("1h", 3600)
    assert serving_tier_for_step(7200) == ("1h", 3600)
    assert serving_tier_for_step(86400) == ("1d", 86400)
    with pytest.raises(ValueError, match="no tier divides"):
        serving_tier_for_step(90)


def test_range_gapfill_grid_fill_and_validation(spark, seq):
    """Fixed requested grid, cnt=0 + LOCF/linear fills on gap rows, exact
    non-gap values vs a raw-token pandas replica."""
    from tersets_spark.rollup import cascade, range_gapfill

    tiers = cascade(seq)
    start, end, step = 1_700_000_400, 1_700_003_400, 60
    out = range_gapfill(tiers, start, end, step, strategy="locf").toPandas()
    grid = list(range(start, end, step))
    # every present source carries the FULL requested grid
    for _src, g in out.groupby("source"):
        assert sorted(g["bucket_ts"]) == grid

    # independent replica from the raw tokens
    import pandas as pd

    pts = seq.select(
        "source",
        F.explode(F.expr("transform(tokens, (v, i) -> struct(ts0 + i AS ts, v))")).alias("p"),
    ).select("source", "p.ts", "p.v").where(
        (F.col("ts") >= start) & (F.col("ts") < end)
    ).toPandas()
    pts["bucket_ts"] = (pts["ts"] // step) * step
    ref = pts.groupby(["source", "bucket_ts"]).agg(
        cnt=("v", "size"), s=("v", "sum")
    ).reset_index()
    ref["mean"] = ref["s"].astype(float) / ref["cnt"]
    merged = out.merge(ref, on=["source", "bucket_ts"], how="left", suffixes=("", "_ref"))
    nongap = merged[~merged["gap_filled"]]
    assert (nongap["cnt"] == nongap["cnt_ref"]).all()
    assert (nongap["mean"] == nongap["mean_ref"]).all()
    gaps = merged[merged["gap_filled"]]
    assert (gaps["cnt"] == 0).all() and gaps["cnt_ref"].isna().all()
    # LOCF: each gap mean equals the last non-gap mean before it
    for _src, g in merged.sort_values("bucket_ts").groupby("source"):
        last = None
        for _, row in g.iterrows():
            if not row["gap_filled"]:
                last = row["mean"]
            elif last is not None:
                assert row["mean"] == last

    with pytest.raises(ValueError, match="aligned"):
        range_gapfill(tiers, start + 1, end, step)
    with pytest.raises(ValueError, match="empty"):
        range_gapfill(tiers, start, start, step)


def test_range_gapfill_from_catalog_pushdown_and_retention_guard(spark, full_cat):
    from tersets_spark.jobs import range_gapfill_from_catalog

    start, end = 1_700_002_800, 1_700_053_200  # hour-aligned 14 h window
    df = range_gapfill_from_catalog(spark, full_cat, start, end, 3600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    # only the 1h tier is read (the 3600s grid's coarsest divisor) and the
    # bucket_ts range predicate is pushed into EVERY scan of it
    assert scans and all("/1h/" in ln for ln in scans), plan
    assert all(
        "PushedFilters" in ln and "GreaterThanOrEqual(bucket_ts" in ln
        for ln in scans
    ), plan
    assert df.count() > 0

    # retention-expired serving tier must fail fast, not serve all-gaps
    # (scratch catalog: the guard fires before any tier read)
    import tempfile

    from tersets_spark.catalog import TierCatalog

    with tempfile.TemporaryDirectory() as scratch:
        TierCatalog(scratch).record(
            "1h", "_retention", status="retention", horizon_ts=end + 3600
        )
        with pytest.raises(ValueError, match="retention horizon"):
            range_gapfill_from_catalog(spark, scratch, start, end, 3600)

    # the same guard protects every catalog serving read
    from tersets_spark.jobs import overview_from_catalog, read_doc_range

    with tempfile.TemporaryDirectory() as scratch:
        cat = TierCatalog(scratch)
        cat.record("1h", "_retention", status="retention", horizon_ts=end + 3600)
        cat.record("raw", "_retention", status="retention", horizon_ts=end + 3600)
        with pytest.raises(ValueError, match="retention horizon"):
            overview_from_catalog(spark, scratch, start, start + 50 * 3600 * 4, 48)
        with pytest.raises(ValueError, match="retention horizon"):
            read_doc_range(spark, scratch, start, end)


def test_range_gapfill_composes_with_realtime_tier(spark, seq, tmp_path):
    """Serving freshness: range_gapfill over read_tier_realtime (committed
    tier UNION un-materialized tail) equals the same grid over a full
    recompute — between cascade runs a dashboard sees exact, gap-filled,
    up-to-the-batch data."""
    import os

    from tersets_spark.jobs import read_tier_realtime, run_cascade
    from tersets_spark.rollup import range_gapfill
    from tersets_spark.seqops import default_order_key

    committed_seq = seq.where(default_order_key() < 1200)
    sub_path = str(tmp_path / "committed.parquet")
    committed_seq.write.parquet(sub_path)
    out = str(tmp_path / "cat")
    os.makedirs(out, exist_ok=True)
    run_cascade(spark, sub_path, out, with_blocks=False)

    start, end, step = 1_700_002_800, 1_700_053_200, 3600
    rt_1h = read_tier_realtime(spark, out, "1h", seq, mode="hwm")
    got = sorted(map(tuple, range_gapfill({"1h": rt_1h}, start, end, step).collect()))
    full = rollup_up(rollup_raw(seq, 60), 3600)
    want = sorted(map(tuple, range_gapfill({"1h": full}, start, end, step).collect()))
    assert got == want and got


# ---------------------------------------------------------------------------
# doc_points / read_doc_range (per-document point reads)
# ---------------------------------------------------------------------------


def _inline_raw(seq):
    from tersets_spark.kernels import compress_udf
    from tersets_spark.methods import Method

    return seq.select(
        "doc_id", "source", "ts0", "n_tok",
        compress_udf(Method.DeltaOfDelta, 0.0)(F.col("tokens")).alias("blob"),
    )


def test_doc_points_bitwise_equals_ingested_tokens(spark, seq):
    from tersets_spark.rollup import doc_points

    ids = [r[0] for r in seq.select("doc_id").limit(5).collect()]
    start, end = 1_700_010_000, 1_700_050_000
    got = sorted(map(tuple, doc_points(_inline_raw(seq), start, end, ids).collect()))
    ref = sorted(map(tuple, seq.where(F.col("doc_id").isin(ids)).select(
        "doc_id", "source",
        F.explode(F.expr("transform(tokens, (v, i) -> struct(ts0 + i AS ts, CAST(v AS LONG) AS v))")).alias("p"),
    ).select("doc_id", "source", "p.ts", "p.v")
        .where((F.col("ts") >= start) & (F.col("ts") < end)).collect()))
    assert got == ref and got  # non-empty, bitwise equal

    # whole-window export: every overlapping document's in-window points
    w0, w1 = 1_700_040_000, 1_700_040_090
    got_w = sorted(map(tuple, doc_points(_inline_raw(seq), w0, w1).collect()))
    ref_w = sorted(map(tuple, seq.select(
        "doc_id", "source",
        F.explode(F.expr("transform(tokens, (v, i) -> struct(ts0 + i AS ts, CAST(v AS LONG) AS v))")).alias("p"),
    ).select("doc_id", "source", "p.ts", "p.v")
        .where((F.col("ts") >= w0) & (F.col("ts") < w1)).collect()))
    assert got_w == ref_w and got_w

    with pytest.raises(ValueError, match="empty range"):
        doc_points(_inline_raw(seq), start, start, ids)
    with pytest.raises(ValueError, match="non-empty"):
        doc_points(_inline_raw(seq), start, end, [])


def test_read_doc_range_pushes_docid_and_ts0(spark, full_cat):
    from tersets_spark.jobs import read_doc_range

    df = read_doc_range(spark, full_cat, 1_700_010_000, 1_700_050_000,
                        ["doc_000000000001", "doc_000000000002"],
                        max_doc_seconds=4096)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans and all("/raw/" in ln for ln in scans), plan
    assert any("In(doc_id" in ln and "LessThan(ts0" in ln for ln in scans), plan
    # and the result is the committed lossless decode of those docs
    assert df.count() > 0
    assert set(r[0] for r in df.select("doc_id").distinct().collect()) <= {
        "doc_000000000001", "doc_000000000002"}


# ---------------------------------------------------------------------------
# overview_points (k-point LTTB dashboard serving)
# ---------------------------------------------------------------------------


def _lttb_ref_indices(vals, k):
    """Plain-loop canonical LTTB (Steinarsson 2013) — independent of the
    package's vectorized implementation."""
    n = len(vals)
    if k >= n or k < 3:
        return list(range(n))
    import math

    every = (n - 2) / (k - 2)
    bounds = [int(math.floor(i * every)) + 1 for i in range(k - 1)] + [n - 1]
    out = [0]
    prev = 0
    for i in range(k - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = bounds[i + 1], (bounds[i + 2] if i + 2 < len(bounds) else n)
        if i == k - 3:
            nhi = n
        if nhi > nlo:
            avg_t = sum(range(nlo, nhi)) / (nhi - nlo)
            avg_v = sum(vals[nlo:nhi]) / (nhi - nlo)
        else:
            avg_t, avg_v = float(n - 1), vals[n - 1]
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs((prev - avg_t) * (vals[j] - vals[prev])
                       - (prev - j) * (avg_v - vals[prev]))
            if area > best_area:
                best, best_area = j, area
        out.append(best)
        prev = best
    out.append(n - 1)
    return out


def test_overview_tier_choice():
    from tersets_spark.rollup import overview_tier_for_range

    assert overview_tier_for_range(0, 6 * 3600, 48) == ("1m", 60)
    assert overview_tier_for_range(0, 30 * 86400, 48) == ("1h", 3600)
    assert overview_tier_for_range(0, 365 * 86400, 48) == ("1d", 86400)
    assert overview_tier_for_range(0, 300, 48) == ("1m", 60)  # finest fallback


def test_overview_points_matches_plain_loop_replica(spark, seq):
    from tersets_spark.rollup import cascade, overview_points

    k, start, end = 24, 1_700_000_400, 1_700_021_400  # 350 1m buckets
    got = overview_points(cascade(seq), start, end, k).toPandas()

    pts = seq.select(
        "source",
        F.explode(F.expr("transform(tokens, (v, i) -> struct(ts0 + i AS ts, CAST(v AS LONG) AS v))")).alias("p"),
    ).select("source", "p.ts", "p.v").where(
        (F.col("ts") >= start) & (F.col("ts") < end)).toPandas()
    pts["bucket_ts"] = (pts["ts"] // 60) * 60
    ref_rows = []
    for src, g in pts.groupby("source"):
        b = g.groupby("bucket_ts")["v"].agg(["sum", "count"]).reset_index()
        b = b.sort_values("bucket_ts").reset_index(drop=True)
        means = (b["sum"].astype(float) / b["count"]).tolist()
        for i in _lttb_ref_indices(means, k):
            ref_rows.append((src, int(b["bucket_ts"][i]), means[i]))
    got_rows = sorted(map(tuple, got.itertuples(index=False)))
    assert got_rows == sorted(ref_rows) and got_rows

    with pytest.raises(ValueError, match="k must be"):
        overview_points(cascade(seq), start, end, 2)


def test_overview_from_catalog_prunes_one_tier(spark, full_cat):
    from tersets_spark.jobs import overview_from_catalog

    df = overview_from_catalog(spark, full_cat, 1_700_000_400, 1_700_021_400, 24)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans and all("/1m/" in ln for ln in scans), plan
    assert all("GreaterThanOrEqual(bucket_ts" in ln for ln in scans), plan
    out = df.toPandas()
    assert (out.groupby("source")["ts"].count() <= 24).all() and len(out)

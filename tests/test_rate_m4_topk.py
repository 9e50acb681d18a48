"""Session-5 serving operators: counter_rate, m4_points, windowed_token_topk.

Each test pins the SEMANTIC edge the oracle hash-match exercises only in
aggregate: counter reset correction and sparse-gap elapsed time for rate,
lexicographic struct tie-breaks for M4, and the total (cnt DESC, token ASC)
order for windowed heavy hitters.
"""

from __future__ import annotations

import pytest

from tersets_spark.downsample import m4_points
from tersets_spark.rollup import counter_rate
from tersets_spark.seqops import windowed_token_topk


def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, bucket_ts long, last long"
    )


def test_counter_rate_reset_correction(spark):
    # series: 10 -> 25 -> 4 (RESET) -> 9; hourly buckets
    rows = [("d", "s", h * 3600, v) for h, v in enumerate([10, 25, 4, 9])]
    out = counter_rate(_tier(spark, rows)).orderBy("bucket_ts").collect()
    assert [r.delta for r in out] == [15, -21, 5]
    # reset bucket: increase = new reading (PromQL correction), not negative
    assert [r.increase for r in out] == [15, 4, 5]
    assert all(r.elapsed == 3600 for r in out)
    assert out[1].rate == 4 / 3600


def test_counter_rate_sparse_gap_elapsed(spark):
    # a 3-bucket gap: elapsed must be the TRUE seconds, not the tier step
    rows = [("d", "s", 0, 100), ("d", "s", 4 * 3600, 136)]
    (r,) = counter_rate(_tier(spark, rows)).collect()
    assert (r.delta, r.increase, r.elapsed) == (36, 36, 4 * 3600)
    assert r.rate == 36 / (4 * 3600)


def test_counter_rate_first_bucket_dropped_per_series(spark):
    rows = [("a", "s", 0, 1), ("a", "s", 60, 2), ("b", "s", 0, 7)]
    out = counter_rate(_tier(spark, rows), value_col="last", keys=("doc_id", "source"))
    got = {(r.doc_id, r.bucket_ts) for r in out.collect()}
    assert got == {("a", 60)}  # single-point series b emits nothing


def test_counter_rate_no_reset_correction_flag(spark):
    rows = [("d", "s", 0, 10), ("d", "s", 60, 4)]
    (r,) = counter_rate(_tier(spark, rows), reset_correction=False).collect()
    assert r.increase == -6 and r.delta == -6


def _series(spark, pts):
    return spark.createDataFrame(
        [("s", t, v) for t, v in pts], "source string, ts long, v long"
    )


def test_m4_extrema_and_tiebreaks(spark):
    # one pixel bucket [0,100), k=1; duplicate min value 1 at ts 20 and 70,
    # duplicate max value 9 at ts 30 and 60
    pts = [(0, 5), (20, 1), (30, 9), (60, 9), (70, 1), (99, 4)]
    (r,) = m4_points(_series(spark, pts), ["source"], "ts", "v", 0, 100, 1).collect()
    assert (r.t_first, r.v_first) == (0, 5)
    assert (r.t_last, r.v_last) == (99, 4)
    # min tie -> EARLIER ts; max tie -> LATER ts (struct lexicographic)
    assert (r.t_min, r.v_min) == (20, 1)
    assert (r.t_max, r.v_max) == (60, 9)


def test_m4_pixel_assignment_and_range_filter(spark):
    # k=4 over [0,8): point at ts=8 excluded; ts=7 -> last pixel
    pts = [(0, 1), (2, 2), (7, 3), (8, 99)]
    out = m4_points(_series(spark, pts), ["source"], "ts", "v", 0, 8, 4)
    got = {r.pxl: (r.t_first, r.v_first) for r in out.collect()}
    assert set(got) == {0, 1, 3}
    assert got[3] == (7, 3)


def test_m4_single_point_bucket_is_all_four_roles(spark):
    (r,) = m4_points(_series(spark, [(5, 42)]), ["source"], "ts", "v", 0, 10, 2).collect()
    assert (
        r.t_first, r.v_first, r.t_min, r.v_min, r.t_max, r.v_max, r.t_last, r.v_last
    ) == (5, 42, 5, 42, 5, 42, 5, 42)


def test_m4_rejects_degenerate_args(spark):
    df = _series(spark, [(0, 1)])
    with pytest.raises(ValueError):
        m4_points(df, ["source"], "ts", "v", 10, 10, 4)
    with pytest.raises(ValueError):
        m4_points(df, ["source"], "ts", "v", 0, 10, 0)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(d, s, t0, toks, len(toks)) for d, s, t0, toks in rows],
        "doc_id string, source string, ts0 long, tokens array<int>, n_tok int",
    )


def test_topk_rank_order_and_ties(spark):
    # window 0: token 7 x3, token 3 x3 (tie -> lower id first), token 9 x1
    seq = _docs(spark, [("a", "s", 0, [7, 3, 7, 3, 9, 7, 3])])
    out = windowed_token_topk(seq, k=2, bucket_seconds=3600).collect()
    assert [(r.rank, r.token, r.cnt) for r in out] == [(1, 3, 3), (2, 7, 3)]
    assert all(r.bucket_tokens == 7 for r in out)


def test_topk_event_time_windows_follow_token_clock(spark):
    # doc starts at ts0=3599: first token in hour 0, the rest in hour 1
    seq = _docs(spark, [("a", "s", 3599, [5, 6, 6])])
    out = windowed_token_topk(seq, k=5, bucket_seconds=3600)
    got = {(r.bucket_ts, r.token): (r.rank, r.cnt) for r in out.collect()}
    assert got == {(0, 5): (1, 1), (3600, 6): (1, 2)}


def test_topk_per_source_windows_are_independent(spark):
    seq = _docs(
        spark,
        [("a", "s1", 0, [1, 1, 2]), ("b", "s2", 0, [2, 2, 1])],
    )
    out = windowed_token_topk(seq, k=1, bucket_seconds=3600).collect()
    got = {r.source: r.token for r in out}
    assert got == {"s1": 1, "s2": 2}


# ---------------------------------------------------------------------------
# catalog serving twins: rate_from_catalog / m4_from_catalog / serve routing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def served_catalog(spark, tmp_path_factory):
    import os

    import pyarrow.parquet as pq

    from tersets_spark.jobs import run_cascade
    from tersets_spark.tables import generate_sequences

    d = tmp_path_factory.mktemp("serve_rate_m4")
    seq_path = str(d / "seq.parquet")
    pq.write_table(generate_sequences(120, seed=23), seq_path)
    out = str(d / "cat")
    os.makedirs(out, exist_ok=True)
    run_cascade(spark, seq_path, out, with_blocks=False)
    return {"seq": seq_path, "out": out}


def _range_of(spark, served_catalog):
    from tersets_spark.catalog import TierCatalog

    t = TierCatalog(served_catalog["out"]).read_tier(spark, "1h")
    import pyspark.sql.functions as SF

    lo, hi = t.agg(SF.min("bucket_ts"), SF.max("bucket_ts")).first()
    return int(lo), int(hi) + 3600


def test_rate_from_catalog_matches_direct(spark, served_catalog):
    from tersets_spark.catalog import TierCatalog
    from tersets_spark.jobs import rate_from_catalog, serve

    start, end = _range_of(spark, served_catalog)
    got = rate_from_catalog(spark, served_catalog["out"], start, end)
    direct = counter_rate(
        TierCatalog(served_catalog["out"]).read_tier(spark, "1h")
    )
    assert got.exceptAll(direct).count() == 0
    assert direct.exceptAll(got).count() == 0
    assert got.count() > 0
    routed = serve(spark, served_catalog["out"], start, end, rate_tier="1h")
    assert routed.exceptAll(got).count() == 0


def test_rate_from_catalog_range_is_restricted(spark, served_catalog):
    from tersets_spark.jobs import rate_from_catalog

    start, end = _range_of(spark, served_catalog)
    mid = start + ((end - start) // 2 // 3600) * 3600
    sub = rate_from_catalog(spark, served_catalog["out"], start, mid)
    rows = sub.collect()
    assert rows and all(start <= r.bucket_ts < mid for r in rows)


def test_m4_from_catalog_matches_direct(spark, served_catalog):
    import pyspark.sql.functions as SF

    from tersets_spark.catalog import TierCatalog
    from tersets_spark.jobs import m4_from_catalog, serve
    from tersets_spark.rollup import overview_tier_for_range

    start, end = _range_of(spark, served_catalog)
    k = 8
    name, _secs = overview_tier_for_range(start, end, k)
    tier = TierCatalog(served_catalog["out"]).read_tier(spark, name)
    series = tier.groupBy("source", "bucket_ts").agg(
        SF.sum("sum").cast("long").alias("v")
    )
    direct = m4_points(series, ["source"], "bucket_ts", "v", start, end, k)
    got = m4_from_catalog(spark, served_catalog["out"], start, end, k)
    assert got.exceptAll(direct).count() == 0
    assert direct.exceptAll(got).count() == 0
    assert got.count() > 0
    routed = serve(spark, served_catalog["out"], start, end, k=k, style="m4")
    assert routed.exceptAll(got).count() == 0


def test_serve_rejects_ambiguous_and_bad_style(spark, served_catalog):
    from tersets_spark.jobs import serve

    start, end = _range_of(spark, served_catalog)
    with pytest.raises(ValueError):
        serve(spark, served_catalog["out"], start, end, k=8, rate_tier="1h")
    with pytest.raises(ValueError):
        serve(spark, served_catalog["out"], start, end, k=8, style="wat")


# ---------------------------------------------------------------------------
# rate_grid: gridded PromQL rate panels
# ---------------------------------------------------------------------------


def test_rate_grid_cell_attribution_and_resets(spark):
    from tersets_spark.rollup import rate_grid

    # 1m buckets, 2-bucket grid cells (step=120). Values 10->25->4->9->9:
    # pairs land in the cell of their LATER bucket; reset at t=120.
    rows = [("d", "s", 60 * i, v) for i, v in enumerate([10, 25, 4, 9, 9])]
    out = {
        r.grid_ts: r
        for r in rate_grid(_tier(spark, rows), 0, 600, 120).collect()
    }
    # cell 0 holds the (0,60) pair; cell 120 holds (60,120)+(120,180);
    # cell 240 holds (180,240)
    assert set(out) == {0, 120, 240}
    assert (out[0].n_pairs, out[0].increase, out[0].elapsed) == (1, 15, 60)
    assert (out[0].n_resets, out[120].n_resets) == (0, 1)
    assert (out[120].n_pairs, out[120].increase) == (2, 4 + 5)  # reset: 4
    assert (out[240].n_pairs, out[240].increase) == (1, 0)
    assert out[120].rate == 9 / 120


def test_rate_grid_range_excludes_outside_pairs(spark):
    from tersets_spark.rollup import rate_grid

    rows = [("d", "s", t, v) for t, v in [(0, 1), (60, 2), (120, 3), (180, 4)]]
    # range [60, 180): the (0,60) pair is cut because bucket 0 is filtered
    # BEFORE the lag, so bucket 60 has no predecessor inside the range
    out = rate_grid(_tier(spark, rows), 60, 180, 60).collect()
    assert sorted(r.grid_ts for r in out) == [120]


def test_rate_grid_sparse_gap_true_elapsed(spark):
    from tersets_spark.rollup import rate_grid

    rows = [("d", "s", 0, 5), ("d", "s", 300, 35)]
    (r,) = rate_grid(_tier(spark, rows), 0, 600, 600).collect()
    assert (r.grid_ts, r.increase, r.elapsed) == (0, 30, 300)
    assert r.rate == 30 / 300


def test_rate_grid_validates_args(spark):
    from tersets_spark.rollup import rate_grid

    df = _tier(spark, [("d", "s", 0, 1)])
    with pytest.raises(ValueError, match="end must be > start"):
        rate_grid(df, 10, 10, 60)
    with pytest.raises(ValueError, match="step must be > 0"):
        rate_grid(df, 0, 100, 0)


def test_rate_grid_from_catalog_matches_direct(spark, served_catalog):
    from tersets_spark.catalog import TierCatalog
    from tersets_spark.jobs import rate_grid_from_catalog
    from tersets_spark.rollup import rate_grid

    lo, hi = _range_of(spark, served_catalog)
    t = TierCatalog(served_catalog["out"]).read_tier(spark, "1m")
    want = sorted(map(tuple, rate_grid(t, lo, hi, 3600).collect()))
    got = sorted(
        map(
            tuple,
            rate_grid_from_catalog(
                spark, served_catalog["out"], lo, hi, 3600
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_rate_grid_plan_single_exchange(spark):
    """The grid groupBy's keys contain the lag window's partition keys,
    so the aggregate reuses the window's shuffle — ONE exchange total."""
    from tersets_spark.rollup import rate_grid

    df = _tier(spark, [("d", "s", 0, 1)])
    p = (
        rate_grid(df, 0, 600, 60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("Exchange hashpartitioning") == 1


def test_rate_family_rejects_fractional_value_col(spark):
    """counter_rate / rate_grid (and the predict/alert reads) apply the
    m4_points integer-value contract: a fractional gauge column fails
    fast instead of silently truncating."""
    from tersets_spark.rollup import alert_intervals, linear_predict, rate_grid

    df = spark.createDataFrame(
        [("d", "s", 0, 1.5)],
        "doc_id string, source string, bucket_ts long, last double",
    )
    for fn in (
        lambda: counter_rate(df),
        lambda: rate_grid(df, 0, 600, 60),
        lambda: linear_predict(df, 0, 600, 0, value_col="last"),
        lambda: alert_intervals(df, 0, 60, 60, value_col="last"),
    ):
        with pytest.raises(TypeError, match="fractional"):
            fn()


def test_serve_routes_new_reads(spark, served_catalog):
    """serve() routes the round-5 reads: gridded rate, instant vector,
    trend extrapolation, alert intervals and smoothing — each equal to
    its direct catalog twin, mutual exclusivity enforced."""
    import pyspark.sql.functions as SF

    from tersets_spark.jobs import (
        alerts_from_catalog,
        instant_from_catalog,
        predict_from_catalog,
        rate_grid_from_catalog,
        serve,
        smooth_from_catalog,
    )

    out = served_catalog["out"]
    lo, hi = _range_of(spark, served_catalog)

    def eq(a, b):
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    eq(serve(spark, out, lo, hi, rate_step=3600),
       rate_grid_from_catalog(spark, out, lo, hi, 3600))
    eq(serve(spark, out, hi - 7200, hi, instant_tier="1m"),
       instant_from_catalog(spark, out, hi, 7200, tier="1m"))
    eq(serve(spark, out, lo, hi, horizon=3600),
       predict_from_catalog(spark, out, lo, hi, 3600))
    from tersets_spark.catalog import TierCatalog

    m1 = TierCatalog(out).read_tier(spark, "1m")
    thr = int(m1.agg(SF.expr("CAST(avg(sum) AS LONG)")).first()[0])
    eq(serve(spark, out, lo, hi, alert_for=300, alert_threshold=thr),
       alerts_from_catalog(spark, out, thr, 300, start=lo, end=hi))
    eq(serve(spark, out, lo, hi, smooth=True),
       smooth_from_catalog(spark, out, lo, hi))

    with pytest.raises(ValueError, match="mutually exclusive"):
        serve(spark, out, lo, hi, rate_step=3600, horizon=60)
    with pytest.raises(ValueError, match="requires alert_threshold"):
        serve(spark, out, lo, hi, alert_for=300)

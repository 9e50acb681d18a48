"""PromQL instant-vector serving (rollup.instant_read / jobs.
instant_from_catalog): staleness-window semantics against a hand-built
reference, reset correction on irate, single-bucket NULLs, absent series,
catalog-twin equality and the retention-horizon guard."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import instant_from_catalog, run_cascade
from tersets_spark.rollup import TIERS, instant_read, rollup_raw
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ir_seq") / "seq.parquet")
    pq.write_table(generate_sequences(240, seed=53), path)
    return path


@pytest.fixture(scope="module")
def catalog_dir(spark, seq_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ir_cat") / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False)
    return out


def _mk_tier(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, bucket_ts long, last long"
    )


def test_instant_semantics_hand_built(spark):
    tier = _mk_tier(
        spark,
        [
            # series a: two buckets inside the window -> full row
            ("d1", "a", 100, 10),
            ("d1", "a", 160, 25),
            # series b: one bucket in window -> NULL prev/idelta/irate
            ("d1", "b", 40, 7),   # outside (at-lookback, at]
            ("d1", "b", 130, 9),
            # series c: entirely stale -> absent
            ("d1", "c", 30, 99),
            # series d: reset between the final pair (25 -> 4)
            ("d1", "d", 100, 25),
            ("d1", "d", 190, 4),
        ],
    )
    got = {
        (r.doc_id, r.source): r
        for r in instant_read(tier, at_ts=200, lookback=120).collect()
    }
    assert set(got) == {("d1", "a"), ("d1", "b"), ("d1", "d")}
    a = got[("d1", "a")]
    assert (a.sample_ts, a.value, a.staleness) == (160, 25, 40)
    assert (a.prev_ts, a.idelta) == (100, 15)
    assert a.irate == pytest.approx(15 / 60)
    b = got[("d1", "b")]
    assert (b.sample_ts, b.value, b.staleness) == (130, 9, 70)
    assert b.prev_ts is None and b.idelta is None and b.irate is None
    d = got[("d1", "d")]
    # reset correction: counter restarted, increase = new reading (4)
    assert (d.sample_ts, d.value, d.idelta) == (190, 4, -21)
    assert d.irate == pytest.approx(4 / 90)


def test_instant_no_reset_correction(spark):
    tier = _mk_tier(spark, [("d1", "d", 100, 25), ("d1", "d", 190, 4)])
    (r,) = instant_read(tier, 200, 120, reset_correction=False).collect()
    assert r.irate == pytest.approx(-21 / 90)


def test_instant_window_boundaries(spark):
    # (at - lookback, at]: bucket exactly at at-lookback is OUT, at at is IN
    tier = _mk_tier(spark, [("d1", "a", 80, 1), ("d1", "a", 200, 2)])
    (r,) = instant_read(tier, 200, 120, keys=("doc_id", "source")).collect()
    assert (r.sample_ts, r.value) == (200, 2)
    assert r.prev_ts is None  # the 80 bucket == at-lookback is excluded


def test_catalog_twin_matches_direct(spark, seq_path, catalog_dir):
    m1 = TierCatalog(catalog_dir).read_tier(spark, "1m")
    hi = int(m1.agg(F.max("bucket_ts")).first()[0])
    want = sorted(map(tuple, instant_read(m1, hi, 7200).collect()))
    got = sorted(
        map(tuple, instant_from_catalog(spark, catalog_dir, hi, 7200).collect())
    )
    assert got == want and len(got) > 0
    # matches a fresh rollup too (catalog read is the same tier)
    seq = spark.read.parquet(seq_path)
    fresh = sorted(
        map(tuple, instant_read(rollup_raw(seq, TIERS["1m"]), hi, 7200).collect())
    )
    assert got == fresh


def test_batch_many_matches_single_reads(spark, seq_path):
    """instant_read_many over N panels == N independent instant_read
    calls, including overlapping and empty panels."""
    from tersets_spark.rollup import instant_read_many

    seq = spark.read.parquet(seq_path)
    m1 = rollup_raw(seq, TIERS["1m"])
    hi = int(m1.agg(F.max("bucket_ts")).first()[0])
    panels = [(hi, 7200), (hi - 3600, 7200), (hi, 300), (hi - 10**9, 60)]
    got = sorted(map(tuple, instant_read_many(m1, panels).collect()))
    want = sorted(
        (i, *row)
        for i, (at, lb) in enumerate(panels)
        for row in map(tuple, instant_read(m1, at, lb).collect())
    )
    assert got == want and got
    # the prehistoric panel matched nothing
    assert not any(t[0] == 3 for t in got)


def test_batch_many_validates_empty_panels(spark):
    from tersets_spark.rollup import instant_read_many

    tier = _mk_tier(spark, [("d", "s", 0, 1)])
    with pytest.raises(ValueError, match="at least one panel"):
        instant_read_many(tier, [])


def test_plan_shape_one_exchange_with_group_limit(spark):
    """The rank<=2 pivot must compile to ONE exchange with a PARTIAL
    WindowGroupLimit below it — map-side top-2 per series, so at most two
    rows per (series, input partition) ever cross the shuffle."""
    tier = _mk_tier(spark, [("d", "s", 0, 1)])
    plan = (
        instant_read(tier, 1000, 500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan and "Partial" in plan
    # the batch twin keeps the same shape: one exchange, group-limit pushed
    from tersets_spark.rollup import instant_read_many

    p2 = (
        instant_read_many(tier, [(100, 50), (200, 60)])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p2.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in p2


def test_instant_over_realtime_tail_matches_batch(spark, seq_path, tmp_path):
    """Live instant vector: instant_read composed over read_tier_realtime
    (committed tier UNION un-materialized fresh docs) equals instant_read
    over a full fresh rollup — a consumer between cascade runs gets the
    same PromQL instant answer a full re-run would give."""
    from tersets_spark.jobs import read_tier_realtime

    seq = spark.read.parquet(seq_path)
    gate = (
        F.substring(F.md5(F.concat(F.lit("irt:"), F.col("doc_id"))), 1, 1) < "c"
    )
    committed = seq.where(gate)
    sub = str(tmp_path / "committed.parquet")
    committed.write.parquet(sub)
    out = str(tmp_path / "cat")
    os.makedirs(out, exist_ok=True)
    run_cascade(spark, sub, out, with_blocks=False)

    full_m1 = rollup_raw(seq, TIERS["1m"])
    hi = int(full_m1.agg(F.max("bucket_ts")).first()[0])
    live = read_tier_realtime(spark, out, "1m", seq, mode="antijoin")
    got = sorted(map(tuple, instant_read(live, hi, 7200).collect()))
    want = sorted(map(tuple, instant_read(full_m1, hi, 7200).collect()))
    assert got == want and got


def test_retention_guard(spark, seq_path, tmp_path):
    from tersets_spark.jobs import apply_retention

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
    apply_retention(spark, out, hi, {"1m": keep})
    # lookback window reaching below the horizon is refused
    with pytest.raises(ValueError, match="retention horizon"):
        instant_from_catalog(spark, out, hi, hi - lo)
    # a window entirely above the horizon serves
    assert instant_from_catalog(spark, out, hi, keep // 2).count() > 0

"""Trend extrapolation (rollup.linear_predict / jobs.predict_from_catalog)
and alert-rule `for:` intervals (rollup.alert_intervals /
jobs.alerts_from_catalog): least-squares pinned to an explicit NumPy
regression, gaps-and-islands semantics against hand-built runs, input
validation, and catalog-twin equality."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import alerts_from_catalog, predict_from_catalog, run_cascade
from tersets_spark.rollup import TIERS, alert_intervals, linear_predict, rollup_raw
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pa_seq") / "seq.parquet")
    pq.write_table(generate_sequences(200, seed=61), path)
    return path


@pytest.fixture(scope="module")
def catalog_dir(spark, seq_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pa_cat") / "tiers")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False)
    return out


def _mk_series(spark, rows):
    return spark.createDataFrame(rows, "source string, bucket_ts long, sum long")


# ---------------------------------------------------------------------------
# linear_predict
# ---------------------------------------------------------------------------


def test_predict_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(7)
    rows, expect = [], {}
    for s, (base, slope) in {"a": (500, 11), "b": (90, -3)}.items():
        ts = [1000 + 60 * i for i in range(40)]
        vs = [base + slope * i + int(rng.integers(0, 9)) for i in range(40)]
        rows += [(s, t, v) for t, v in zip(ts, vs)]
        t_c = np.array(ts, float) - 1000.0
        co = np.polyfit(t_c, np.array(vs, float), 1)
        expect[s] = (co[0], co[1], co[1] + co[0] * (40 * 60 + 600))
    got = {
        r.source: r
        for r in linear_predict(
            _mk_series(spark, rows), 1000, 1000 + 40 * 60, 600, keys=("source",)
        ).collect()
    }
    for s, (sl, ic, pr) in expect.items():
        assert got[s].n == 40
        assert got[s].slope == pytest.approx(sl, rel=1e-12)
        assert got[s].intercept == pytest.approx(ic, rel=1e-9)
        assert got[s].predicted == pytest.approx(pr, rel=1e-9)


def test_predict_drops_underdetermined_series(spark):
    # one point -> dropped; two identical-ts rows -> den 0 -> dropped;
    # exactly two distinct points -> exact line through both
    df = _mk_series(
        spark,
        [("one", 100, 5), ("dup", 160, 3), ("dup", 160, 9),
         ("two", 100, 10), ("two", 200, 30)],
    )
    got = {r.source: r for r in
           linear_predict(df, 0, 1000, 0, keys=("source",)).collect()}
    assert set(got) == {"two"}
    assert got["two"].slope == pytest.approx(0.2)
    # predicted at t = end-start+horizon = 1000 (centered at 0):
    # value(100)=10 -> intercept 10 - 0.2*100 = -10 + ... line: v = 0.2t - 10
    assert got["two"].predicted == pytest.approx(0.2 * 1000 - 10)


def test_predict_range_is_half_open(spark):
    df = _mk_series(
        spark, [("a", 100, 1), ("a", 200, 2), ("a", 300, 100)]
    )
    (r,) = linear_predict(df, 100, 300, 0, keys=("source",)).collect()
    # the 300 bucket is outside [100, 300) -> slope from the first pair only
    assert r.n == 2 and r.slope == pytest.approx(0.01)


def test_predict_validates_args(spark):
    df = _mk_series(spark, [("a", 0, 1)])
    with pytest.raises(ValueError, match="end must be > start"):
        linear_predict(df, 10, 10, 0)
    with pytest.raises(ValueError, match="min_points"):
        linear_predict(df, 0, 10, 0, min_points=1)


def test_predict_catalog_twin_matches_direct(spark, seq_path, catalog_dir):
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    hi = int(h1.agg(F.max("bucket_ts")).first()[0])
    start, end = hi - 86400, hi + 3600
    want = sorted(map(tuple, linear_predict(h1, start, end, 14400).collect()))
    got = sorted(
        map(
            tuple,
            predict_from_catalog(spark, catalog_dir, start, end, 14400).collect(),
        )
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# alert_intervals
# ---------------------------------------------------------------------------


def test_alert_runs_hand_built(spark):
    rows = []
    for i in range(30):
        val = 200 if 5 <= i < 12 or 20 <= i < 22 else 10
        rows.append(("a", 1000 + 60 * i, val))
    rows.append(("a", 1000 + 60 * 40, 500))  # isolated breach: too short
    # series b breaches throughout but with a one-bucket GAP at i=3
    for i in list(range(3)) + list(range(4, 8)):
        rows.append(("b", 5000 + 60 * i, 999))
    got = sorted(
        map(
            tuple,
            alert_intervals(
                _mk_series(spark, rows), 100, 60, 300, keys=("source",)
            ).collect(),
        )
    )
    # a: 7-bucket run [1300, 1720) fires; 2-bucket and 1-bucket runs don't.
    # b: the gap splits 3+4 buckets -> neither reaches 5 buckets.
    assert got == [("a", 1300, 1720, 7, 420, 200, 1400)]


def test_alert_exact_threshold_not_breach(spark):
    df = _mk_series(spark, [("a", 60 * i, 100) for i in range(10)])
    assert alert_intervals(df, 100, 60, 60, keys=("source",)).count() == 0
    assert alert_intervals(df, 99, 60, 60, keys=("source",)).count() == 1


def test_alert_whole_series_one_interval(spark):
    df = _mk_series(spark, [("a", 60 * i, 100 + i) for i in range(10)])
    (r,) = alert_intervals(df, 0, 60, 600, keys=("source",)).collect()
    assert (r.start_ts, r.end_ts, r.n_buckets) == (0, 600, 10)
    assert (r.peak, r.total) == (109, sum(100 + i for i in range(10)))


def test_alert_validates_args(spark):
    df = _mk_series(spark, [("a", 0, 1)])
    with pytest.raises(ValueError, match="step and min_duration"):
        alert_intervals(df, 0, 0, 60)
    with pytest.raises(ValueError, match="step and min_duration"):
        alert_intervals(df, 0, 60, 0)


def test_alert_catalog_twin_matches_direct(spark, seq_path, catalog_dir):
    m1 = TierCatalog(catalog_dir).read_tier(spark, "1m")
    thr = int(m1.agg(F.expr("CAST(avg(sum) AS LONG)")).first()[0])
    want = sorted(
        map(tuple, alert_intervals(m1, thr, TIERS["1m"], 300).collect())
    )
    got = sorted(
        map(
            tuple,
            alerts_from_catalog(spark, catalog_dir, thr, 300).collect(),
        )
    )
    assert got == want


def test_alert_bounded_window_matches_prefiltered(spark, seq_path, catalog_dir):
    m1 = TierCatalog(catalog_dir).read_tier(spark, "1m")
    lo = int(m1.agg(F.min("bucket_ts")).first()[0])
    hi = lo + 7200
    thr = int(m1.agg(F.expr("CAST(avg(sum) AS LONG)")).first()[0])
    want = sorted(
        map(
            tuple,
            alert_intervals(
                m1.where((F.col("bucket_ts") >= lo) & (F.col("bucket_ts") < hi)),
                thr, TIERS["1m"], 300,
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            alerts_from_catalog(
                spark, catalog_dir, thr, 300, start=lo, end=hi
            ).collect(),
        )
    )
    assert got == want


def test_plan_shape_single_exchange(spark):
    """Both serving reads must compile to exactly ONE exchange on the
    series key: linear_predict's five sums aggregate map-side-partial
    before the shuffle, and alert_intervals' island window + run groupBy
    share one partitioning (the groupBy keys contain the window keys)."""
    df = _mk_series(spark, [("a", 0, 1)])
    p = (
        linear_predict(df, 0, 100, 10, keys=("source",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in p  # map-side combine of the decimal sums
    p2 = (
        alert_intervals(df, 0, 60, 60, keys=("source",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p2.count("Exchange hashpartitioning") == 1

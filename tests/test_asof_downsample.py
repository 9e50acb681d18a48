"""As-of join, bucketed range join, and LTTB downsampling: semantics vs
pandas/NumPy oracles, plus plan-shape scale regressions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tersets_spark.downsample import lttb


# ---------------------------------------------------------------------------
# LTTB kernel (no Spark)
# ---------------------------------------------------------------------------


def test_lttb_passthrough_when_small():
    v = np.array([3.0, 1.0, 2.0])
    assert lttb(v, 10).tolist() == [3.0, 1.0, 2.0]
    assert lttb(v, 2).tolist() == [3.0, 1.0, 2.0]  # threshold < 3: passthrough


def test_lttb_keeps_endpoints_and_length():
    rng = np.random.default_rng(4)
    v = rng.standard_normal(1000).cumsum()
    for k in (3, 10, 64, 500):
        out = lttb(v, k)
        assert len(out) == k
        assert out[0] == v[0] and out[-1] == v[-1]


def test_lttb_picks_extreme_point():
    # flat signal with one big spike: the spike must survive downsampling
    v = np.zeros(1000)
    v[457] = 100.0
    out = lttb(v, 10)
    assert 100.0 in out


def test_lttb_preserves_time_order_subset():
    rng = np.random.default_rng(9)
    v = rng.uniform(0, 100, 500)
    out = lttb(v, 20)
    # every output value occurs in v, and indices are strictly increasing
    idx = []
    start = 0
    for x in out:
        matches = np.flatnonzero(v[start:] == x)
        assert matches.size > 0
        start += matches[0] + 1
        idx.append(start - 1)
    assert idx == sorted(idx)


# ---------------------------------------------------------------------------
# as-of join vs pandas.merge_asof
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def asof_frames():
    rng = np.random.default_rng(21)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "t": rng.integers(0, 10_000, 200).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 80),
            "t": rng.integers(0, 10_000, 80).astype("int64"),
            "val": rng.integers(0, 1000, 80).astype("int64"),
        }
    ).drop_duplicates(["k", "t"])
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 500])
def test_asof_join_matches_pandas(spark, asof_frames, direction, tolerance):
    from tersets_spark.asof import asof_join

    left, right = asof_frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by=["k"],
            value_cols=["val"],
            tolerance=tolerance,
            direction=direction,
        )
        .toPandas()
        .sort_values(["k", "t", "val_right"], na_position="first")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t").rename(columns={"t": "t_right", "val": "val_right"}),
        left_on="t",
        right_on="t_right",
        by="k",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=True,
    ).sort_values(["k", "t", "val_right"], na_position="first").reset_index(drop=True)
    for col in ("t_right", "val_right"):
        g = got[col].astype("float64").to_numpy()
        e = exp[col].astype("float64").to_numpy()
        assert np.array_equal(g, e, equal_nan=True), f"{col} mismatch"


def test_asof_plan_has_no_join_node(spark, asof_frames):
    """The as-of operator is union + running window — a single shuffle on
    the by-key, never a join (and never the O(n^2) unbounded-FOLLOWING
    first() frame)."""
    from tersets_spark.asof import asof_join

    left, right = asof_frames
    df = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="t",
        by=["k"],
        value_cols=["val"],
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert "unboundedpreceding" in plan.lower()


# ---------------------------------------------------------------------------
# range join vs naive pairs
# ---------------------------------------------------------------------------


def test_range_join_matches_naive(spark, asof_frames):
    from tersets_spark.asof import range_join

    left, right = asof_frames
    lo, hi = 1, 601
    got = (
        range_join(
            spark.createDataFrame(left.drop_duplicates(["k", "t"])),
            spark.createDataFrame(right),
            on="t",
            by=["k"],
            lower=lo,
            upper=hi,
        )
        .select("k", "t", "t_right", "val_right")
        .toPandas()
    )
    naive = left.drop_duplicates(["k", "t"]).merge(
        right.rename(columns={"t": "t_right", "val": "val_right"}), on="k"
    )
    naive = naive[(naive.t_right >= naive.t + lo) & (naive.t_right < naive.t + hi)]
    key = lambda df: sorted(map(tuple, df[["k", "t", "t_right", "val_right"]].to_numpy()))
    assert key(got) == key(naive)


def test_range_join_plan_is_hash_join(spark, asof_frames):
    from tersets_spark.asof import range_join

    left, right = asof_frames
    df = range_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="t",
        by=["k"],
        lower=0,
        upper=600,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan

"""Plan-shape regressions for the sketch layer: pruned scans, map-side
partial aggregation before any exchange, and a broadcast (never shuffled)
dictionary join on the HLL fast path."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tersets_spark.hll import hll_registers
from tersets_spark.jobs import _sketch_points
from tersets_spark.sketch import sketch as hdr_sketch
from tersets_spark.tables import ensure_sequences


@pytest.fixture(scope="module")
def pts(spark):
    return _sketch_points(spark.read.parquet(ensure_sequences("sf0.001")))


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sketch_scan_is_pruned(spark, pts):
    """The parquet scan under the sketch build reads only the three needed
    columns — doc_id / n_tok never leave the scan."""
    plan = _physical_plan(hdr_sketch(pts, ["source", "bucket_ts"], "v"))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, "expected a parquet scan with ReadSchema"
    assert "doc_id" not in scan[0] and "n_tok" not in scan[0], scan[0]


def test_sketch_has_mapside_partial_agg(spark, pts):
    """A partial hash aggregate must sit BELOW the exchange: the shuffle
    carries bucket-bounded partials, never the exploded token stream."""
    plan = _physical_plan(hdr_sketch(pts, ["source", "bucket_ts"], "v"))
    lines = plan.splitlines()
    first_exchange = next(i for i, ln in enumerate(lines) if "Exchange" in ln)
    assert any(
        "HashAggregate" in ln for ln in lines[first_exchange:]
    ), "no partial aggregate below the first exchange"


def test_hll_dict_join_is_broadcast(spark, pts):
    """The dictionary lookup join must be a BroadcastHashJoin — a sort-merge
    or shuffled-hash join here would shuffle the full token stream by value."""
    plan = _physical_plan(hll_registers(pts, ["source", "bucket_ts"], "v", dict_hash=True))
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln and "Reused" not in ln]
    assert join_lines, "expected the dictionary join in the plan"
    assert all("BroadcastHashJoin" in ln for ln in join_lines), join_lines
    assert not any("SortMergeJoin" in ln for ln in plan.splitlines()), "token stream shuffled by value"

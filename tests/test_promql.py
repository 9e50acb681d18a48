"""PromQL-lite surface (promql.py): parser errors are loud and
specific, and every supported expression compiles to EXACTLY the
underlying catalog read (equality against the direct twin)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import (
    absent_from_catalog,
    percentile_grid_from_catalog,
    predict_from_catalog,
    run_cascade,
    top_from_catalog,
)
from tersets_spark.promql import parse, query_range
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def catalog_dir(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("pql")
    p = str(work / "seq.parquet")
    pq.write_table(generate_sequences(260, seed=97), p)
    out = str(work / "cat")
    os.makedirs(out)
    run_cascade(spark, p, out, with_sketches=True)
    return out


@pytest.fixture(scope="module")
def span(spark, catalog_dir):
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    lo = int(h1.agg(F.min("bucket_ts")).head()[0])
    hi = int(h1.agg(F.max("bucket_ts")).head()[0]) + 3600
    return lo, hi


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("expr,msg", [
    ("florp(tokens)", "unsupported function"),
    ("tokens{host=\"x\"}", "unknown label"),
    ("tokens{source=~\"src_.*\"}", "literal alternation"),
    ("rate(tokens)", "needs a \\[window\\]"),
    ("sum by (region) (tokens)", "unknown by-label"),
    ("tokens tokens", "trailing input"),
    ("rate(tokens[2h])", "must equal step"),
])
def test_parse_and_eval_errors(spark, catalog_dir, span, expr, msg):
    lo, hi = span
    with pytest.raises(ValueError, match=msg):
        query_range(spark, catalog_dir, expr, lo, hi, 3600)


def test_parse_shapes():
    sel = parse('tokens{source=~"a|b"}[5m]')
    assert sel.sources == ["a", "b"] and sel.window == 300
    call = parse("quantile_over_time(0.5, tokens[1h])")
    assert call.func == "quantile_over_time" and call.args[0] == 0.5


def test_misaligned_range_rejected(spark, catalog_dir, span):
    lo, hi = span
    with pytest.raises(ValueError, match="step-aligned"):
        query_range(spark, catalog_dir, "tokens", lo + 1, hi, 3600)


# ---------------------------------------------------------------------------
# expression == direct twin
# ---------------------------------------------------------------------------


def test_selector_equals_tier_grid(spark, catalog_dir, span):
    lo, hi = span
    got = query_range(spark, catalog_dir, "tokens", lo, hi, 3600)
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h").where(
        (F.col("bucket_ts") >= lo) & (F.col("bucket_ts") < hi)
    )
    want = h1.groupBy("source", "bucket_ts").agg(
        F.sum("sum").cast("long").alias("value")
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_matcher_filters_sources(spark, catalog_dir, span):
    lo, hi = span
    one = query_range(
        spark, catalog_dir, 'tokens{source="src_00"}', lo, hi, 3600
    )
    assert {r["source"] for r in one.collect()} == {"src_00"}
    two = query_range(
        spark, catalog_dir, 'tokens{source=~"src_00|src_01"}', lo, hi, 3600
    )
    assert {r["source"] for r in two.collect()} <= {"src_00", "src_01"}


def test_rate_equals_manual_lag(spark, catalog_dir, span):
    lo, hi = span
    got = query_range(spark, catalog_dir, "rate(tokens[1h])", lo, hi, 3600)
    base = query_range(spark, catalog_dir, "tokens", lo, hi, 3600).collect()
    series = {}
    for r in base:
        series.setdefault(r["source"], []).append((r["bucket_ts"], r["value"]))
    want = []
    for src, pts in series.items():
        pts.sort()
        for (t0, v0), (t1, v1) in zip(pts, pts[1:]):
            inc = v1 - v0 if v1 >= v0 else v1
            want.append((src, t1, inc / (t1 - t0)))
    assert _rows(got) == sorted(want)


def test_quantile_equals_percentile_grid(spark, catalog_dir, span):
    lo, hi = span
    got = query_range(
        spark, catalog_dir, "quantile_over_time(0.99, tokens[1h])",
        lo, hi, 3600,
    )
    want = percentile_grid_from_catalog(
        spark, catalog_dir, lo, hi, 3600, pcts=(99,)
    ).select(
        "source", "bucket_ts", F.col("estimate").cast("double").alias("value")
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_topk_absent_predict_route_to_twins(spark, catalog_dir, span):
    lo, hi = span
    assert _rows(
        query_range(spark, catalog_dir, "topk(3, tokens)", lo, hi, 3600)
    ) == _rows(
        top_from_catalog(spark, catalog_dir, k=3, window_seconds=3600,
                         start=lo, end=hi)
    )
    assert _rows(
        query_range(spark, catalog_dir, "absent_over_time(tokens[1h])",
                    lo, hi, 3600)
    ) == _rows(absent_from_catalog(spark, catalog_dir, lo, hi, tier="1h",
                                   step_seconds=3600))
    assert _rows(
        query_range(spark, catalog_dir, "predict_linear(tokens[6h], 3600)",
                    lo, hi, 3600)
    ) == _rows(predict_from_catalog(spark, catalog_dir, hi - 21600, hi, 3600))


def test_sum_by_grp_routes_to_group_read(spark, catalog_dir, span):
    from tersets_spark.jobs import group_from_catalog

    lo, hi = span
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h")
    mapping = h1.select("source").distinct().withColumn(
        "grp", F.substring("source", 6, 1)
    )
    got = query_range(
        spark, catalog_dir, "sum by (grp) (tokens)", lo, hi, 3600,
        mapping=mapping,
    )
    want = group_from_catalog(
        spark, catalog_dir, mapping, tier="1h", start=lo, end=hi
    ).select("grp", "bucket_ts", F.col("sum").alias("value"))
    assert _rows(got) == _rows(want) and got.count() > 0


def test_query_instant_routes_and_filters(spark, catalog_dir, span):
    from tersets_spark.jobs import instant_from_catalog
    from tersets_spark.promql import query_instant

    lo, hi = span
    at = hi - 3600
    got = query_instant(spark, catalog_dir, "tokens", at, lookback=7200)
    want = instant_from_catalog(spark, catalog_dir, at, 7200)
    assert _rows(got) == _rows(want) and got.count() > 0
    one = query_instant(
        spark, catalog_dir, 'tokens{source="src_00"}', at, lookback=7200
    )
    assert {r["source"] for r in one.collect()} == {"src_00"}
    ir = query_instant(spark, catalog_dir, "irate(tokens[2h])", at)
    assert ir.columns == ["doc_id", "source", "sample_ts", "value"]
    want_ir = want.select(
        "doc_id", "source", "sample_ts",
        F.col("irate").cast("double").alias("value"),
    )
    assert _rows(ir) == _rows(want_ir)
    with pytest.raises(ValueError, match="takes no \\[window\\]"):
        query_instant(spark, catalog_dir, "tokens[1h]", at)
    with pytest.raises(ValueError, match="irate/idelta"):
        query_instant(spark, catalog_dir, "rate(tokens[1h])", at)


def test_review_guards(spark, catalog_dir, span):
    """Round-5 review regressions: fractional durations, sub-percent
    quantiles, and unservable absent/topk steps are rejected loudly."""
    lo, hi = span
    with pytest.raises(ValueError, match="durations are integers"):
        query_range(spark, catalog_dir, "sum_over_time(tokens[1.5h])",
                    lo, hi, 3600)
    with pytest.raises(ValueError, match="whole percent"):
        query_range(spark, catalog_dir,
                    "quantile_over_time(0.995, tokens[1h])", lo, hi, 3600)
    with pytest.raises(ValueError, match="no tier divides"):
        query_range(spark, catalog_dir, "absent_over_time(tokens[30s])",
                    lo, lo + 60, 30)


def test_avg_by_source_is_sum_over_cnt(spark, catalog_dir, span):
    lo, hi = span
    got = query_range(spark, catalog_dir, "avg by (source) (tokens)",
                      lo, hi, 3600)
    h1 = TierCatalog(catalog_dir).read_tier(spark, "1h").where(
        (F.col("bucket_ts") >= lo) & (F.col("bucket_ts") < hi)
    )
    want = h1.groupBy("source", "bucket_ts").agg(
        (F.sum("sum").cast("double") / F.sum("cnt")).alias("value")
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_topk_routes_to_step_serving_tier(spark, catalog_dir, span):
    # a 60s-step topk must serve hour-spaced windows from the 1m tier,
    # not silently re-label 1h buckets as minute windows
    lo, hi = span
    got = query_range(spark, catalog_dir, "topk(2, tokens)", lo, hi, 60)
    want = top_from_catalog(spark, catalog_dir, tier="1m", k=2,
                            window_seconds=60, start=lo, end=hi)
    assert _rows(got) == _rows(want) and got.count() > 0

"""Count-Min frequency tiers: Python-twin parity, one-sided estimate
guarantee (est >= true, always), exact re-aggregability, dict-hash path
identity, fused-kernel bit-identity, cascade/validate/serve integration."""

from __future__ import annotations

import collections
import random

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.cms import (
    D,
    WIDTH,
    cms_counters,
    cms_positions_py,
    estimate_counts,
    merge_counters,
)
from tersets_spark.jobs import (
    CMS_TIER_NAMES,
    frequency_estimates_from_catalog,
    run_cascade,
    validate_tiers,
)
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cmsseq") / "seq.parquet")
    pq.write_table(generate_sequences(200, seed=13), path)
    return path


def _py_counters(pairs) -> dict:
    """Python replica of cms_counters over (key, value) occurrence pairs."""
    cells: dict = collections.defaultdict(int)
    for k, v in pairs:
        for j, p in enumerate(cms_positions_py(v)):
            cells[(k, j, p)] += 1
    return dict(cells)


def _py_estimate(cells: dict, key, v) -> int:
    return min(
        cells.get((key, j, p), 0) for j, p in enumerate(cms_positions_py(v))
    )


def test_spark_counters_match_python_replica(spark):
    rng = random.Random(5)
    pairs = [("s1", rng.randrange(0, 300)) for _ in range(900)] + [
        ("s2", rng.randrange(0, 40)) for _ in range(200)
    ]
    df = spark.createDataFrame(pairs, "k string, v long")
    want = _py_counters(pairs)
    got = {
        (r["k"], r["ridx"], r["cidx"]): r["cnt"]
        for r in cms_counters(df, ["k"], "v").collect()
    }
    assert got == want
    # dict-hash fast path is bit-identical
    got_dict = {
        (r["k"], r["ridx"], r["cidx"]): r["cnt"]
        for r in cms_counters(df, ["k"], "v", dict_hash=True).collect()
    }
    assert got_dict == got


def test_null_values_ignored_both_paths(spark):
    df = spark.createDataFrame(
        [("s1", 5), ("s1", None), ("s1", 5), ("s1", 9)], "k string, v long"
    )
    want = _py_counters([("s1", 5), ("s1", 5), ("s1", 9)])
    for dh in (False, True):
        got = {
            (r["k"], r["ridx"], r["cidx"]): r["cnt"]
            for r in cms_counters(df, ["k"], "v", dict_hash=dh).collect()
        }
        assert got == want, f"dict_hash={dh}"


def test_estimate_never_underestimates_and_error_bounded(spark):
    """est >= true for EVERY probe (present and absent), and at this fill
    (600 insertions, WIDTH=512) the deterministic overshoot stays within
    the 2N/WIDTH Markov budget for all probes."""
    rng = random.Random(17)
    values = [rng.randrange(0, 150) for _ in range(600)]
    true = collections.Counter(values)
    df = spark.createDataFrame([("w", v) for v in values], "k string, v long")
    counters = cms_counters(df, ["k"], "v")
    probe_vals = sorted(true)[:20] + [10_000_001, 10_000_002, 10_000_003]
    probes = spark.createDataFrame([(v,) for v in probe_vals], "probe long")
    est = {
        r["probe"]: r["est"]
        for r in estimate_counts(counters, ["k"], probes).collect()
    }
    assert set(est) == set(probe_vals)
    budget = 2 * len(values) / WIDTH
    for v in probe_vals:
        assert est[v] >= true.get(v, 0), f"UNDERESTIMATE at {v}"
        assert est[v] - true.get(v, 0) <= budget, f"overshoot blew budget at {v}"
    # python twin agrees cell-for-cell on the estimates
    cells = _py_counters([("w", v) for v in values])
    for v in probe_vals:
        assert est[v] == _py_estimate(cells, "w", v)


def test_merge_is_exact_reaggregation(spark):
    """Counters merged to a coarser key equal a direct build at that key —
    count-min is closed under addition (the re-aggregability proof)."""
    rng = random.Random(23)
    rows = [
        (f"s{i % 2}", 60 * (i % 5), rng.randrange(0, 99))
        for i in range(700)
    ]
    df = spark.createDataFrame(rows, "source string, bucket_ts long, v long")
    fine = cms_counters(df, ["source", "bucket_ts"], "v")
    merged = sorted(map(tuple, merge_counters(fine, ["source"]).collect()))
    direct = sorted(map(tuple, cms_counters(df, ["source"], "v").collect()))
    assert merged == direct


def test_kernel_path_matches_expression_path(spark):
    """The fused Arrow kernel's 'c' family is bit-identical to the pure-JVM
    expression path — alone and co-resident with the p/h/b families."""
    from tersets_spark.jobs import _sketch_points
    from tersets_spark.kernels import (
        SKETCH_PARTIALS_SCHEMA,
        sketch_partials_map_in_arrow,
    )

    rng = random.Random(31)
    rows = [
        (
            f"d{i}",
            f"src_{i % 3}",
            1_700_000_000 + i * 41,
            [rng.randrange(0, 400) for _ in range(rng.randrange(1, 120))],
        )
        for i in range(250)
    ]
    seq = spark.createDataFrame(
        [(d, s, t, toks, len(toks)) for d, s, t, toks in rows],
        "doc_id string, source string, ts0 long, tokens array<int>, n_tok int",
    )
    expr = sorted(
        map(
            tuple,
            cms_counters(
                _sketch_points(seq), ["source", "bucket_ts"], "v", dict_hash=True
            ).collect(),
        )
    )
    for fams in (("c",), ("p", "h", "b", "c")):
        part = seq.select("source", "ts0", "tokens").mapInArrow(
            sketch_partials_map_in_arrow(60, families=fams),
            SKETCH_PARTIALS_SCHEMA,
        )
        kern = (
            part.filter(F.col("family") == "c")
            .groupBy(
                "source",
                "bucket_ts",
                (F.col("bucket") / WIDTH).cast("int").alias("ridx"),
                (F.col("bucket") % WIDTH).cast("int").alias("cidx"),
            )
            .agg(F.sum("val").alias("cnt"))
        )
        assert sorted(map(tuple, kern.collect())) == expr, f"families={fams}"


def test_cascade_cms_tiers_commit_validate_and_serve(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    dirs = run_cascade(spark, seq_path, out, with_cms=True)
    for t in CMS_TIER_NAMES:
        assert t in dirs
    cat = TierCatalog(out)
    for t in CMS_TIER_NAMES:
        df = cat.read_tier(spark, t)
        assert sorted(df.columns) == sorted(
            ["source", "bucket_ts", "ridx", "cidx", "cnt"]
        )
        assert df.count() > 0
        # bounded: at most D * WIDTH cell rows per (source, bucket)
        mx = df.groupBy("source", "bucket_ts").count().agg(F.max("count")).head()[0]
        assert mx <= D * WIDTH

    # upper tiers audit as exact merges of the tier below
    rep = validate_tiers(spark, seq_path, out)
    for t in ("cms_1h", "cms_1d"):
        assert rep[t]["mismatches"] == 0 and rep[t]["checked"] > 0

    # serving: per-window estimate >= exact truth for a present probe, at
    # every tier granularity
    seq = spark.read.parquet(seq_path)
    probe = int(seq.selectExpr("tokens[5]").head()[0])
    pts = seq.select(
        "source", F.posexplode("tokens").alias("pos", "v"), "ts0"
    ).select(
        "source",
        ((F.floor((F.col("ts0") + F.col("pos")) / 60)) * 60)
        .cast("long")
        .alias("bucket_ts"),
        "v",
    )
    truth = {
        (r["source"], r["bucket_ts"]): r["n"]
        for r in pts.where(F.col("v") == probe)
        .groupBy("source", "bucket_ts")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    served = {
        (r["source"], r["bucket_ts"]): r["est"]
        for r in frequency_estimates_from_catalog(spark, out, [probe]).collect()
    }
    assert set(truth) <= set(served), "a true window is missing (underestimate)"
    for k, n in truth.items():
        assert served[k] >= n

    # time-scoped estimates: [start, end) bounds the probed counters exactly
    lo, hi = 1_700_030_000, 1_700_060_000
    scoped = {
        (r["source"], r["bucket_ts"]): r["est"]
        for r in frequency_estimates_from_catalog(
            spark, out, [probe], start=lo, end=hi
        ).collect()
    }
    assert set(scoped) == {k for k in served if lo <= k[1] < hi}

    # resume: nothing pending on a second run (no duplicate commits)
    before = len(cat.metrics())
    run_cascade(spark, seq_path, out, with_cms=True)
    assert len(cat.metrics()) == before


def test_cascade_cms_resume_after_injected_crash(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    with pytest.raises(RuntimeError, match="injected failure after cms_1m"):
        run_cascade(spark, seq_path, out, with_cms=True, fail_after_tier="cms_1m")
    cat = TierCatalog(out)
    assert cat.completed("cms_1m") and not cat.completed("cms_1h")
    run_cascade(spark, seq_path, out, with_cms=True)
    keys = [(m["tier"], m["partition"]) for m in cat.metrics()]
    assert len(keys) == len(set(keys)), "duplicate partition commits after resume"
    rep = validate_tiers(spark, seq_path, out)
    for t in ("cms_1h", "cms_1d"):
        assert rep[t]["mismatches"] == 0

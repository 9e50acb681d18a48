"""Sketch tiers as continuous aggregates: run_cascade(with_sketches=True)
materializes psk_*/hll_* through the same catalog, resumes per source, and
validate_tiers audits the merge chain."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.hll import hll_registers, merge_registers
from tersets_spark.jobs import (
    SKETCH_TIER_NAMES,
    _sketch_points,
    run_cascade,
    validate_tiers,
)
from tersets_spark.catalog import TierCatalog
from tersets_spark.sketch import merge_sketch, sketch as hdr_sketch
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skseq") / "seq.parquet")
    pq.write_table(generate_sequences(300, seed=23), path)
    return path


def _rows(df, *order):
    # partitioned reads append the partition column last; fix the projection
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*order).collect()]


def test_sketch_tiers_match_direct_builds(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    dirs = run_cascade(spark, seq_path, out, with_sketches=True)
    assert set(SKETCH_TIER_NAMES) <= set(dirs)
    cat = TierCatalog(out)
    seq = spark.read.parquet(seq_path)
    pts = _sketch_points(seq)
    order = ["source", "bucket_ts", "bucket_id"]

    got_1m = cat.read_tier(spark, "psk_1m")
    exp_1m = hdr_sketch(pts, ["source", "bucket_ts"], "v")
    assert _rows(got_1m, *order) == _rows(exp_1m, *order)

    # 1d committed == direct sketch at 1d granularity (merge chain is exact)
    day = (F.floor(F.col("bucket_ts") / 86400) * 86400).cast("long")
    got_1d = cat.read_tier(spark, "psk_1d")
    exp_1d = merge_sketch(exp_1m.withColumn("bucket_ts", day), ["source", "bucket_ts"])
    assert _rows(got_1d, *order) == _rows(exp_1d, *order)

    horder = ["source", "bucket_ts", "bucket"]
    got_h1m = cat.read_tier(spark, "hll_1m")
    exp_h1m = hll_registers(pts, ["source", "bucket_ts"], "v")
    assert _rows(got_h1m, *horder) == _rows(exp_h1m, *horder)
    got_h1d = cat.read_tier(spark, "hll_1d")
    exp_h1d = merge_registers(
        exp_h1m.withColumn("bucket_ts", day), ["source", "bucket_ts"]
    )
    assert _rows(got_h1d, *horder) == _rows(exp_h1d, *horder)


def test_sketch_tiers_resume_after_core_cascade(spark, seq_path, tmp_path):
    """A cascade killed before the sketch stage resumes into ONLY the sketch
    tiers: core tiers stay as-committed (run dirs untouched), sketch tiers
    appear, and the audit passes over the whole family."""
    out = str(tmp_path / "tiers")
    with pytest.raises(RuntimeError, match="injected failure after 1d"):
        run_cascade(spark, seq_path, out, with_sketches=True, fail_after_tier="1d")
    cat = TierCatalog(out)
    core_runs = {t: sorted(cat.completed(t)) for t in ("raw", "1m", "1h", "1d")}
    assert all(core_runs.values())
    assert not cat.completed("psk_1m") and not cat.completed("hll_1m")

    run_cascade(spark, seq_path, out, with_sketches=True, resume=True)
    for tier in SKETCH_TIER_NAMES:
        assert cat.completed(tier), tier
    assert {t: sorted(cat.completed(t)) for t in core_runs} == core_runs

    report = validate_tiers(spark, seq_path, out, sample_frac=1.0)
    upper = {"psk_1h", "psk_1d", "hll_1h", "hll_1d"}
    assert upper <= set(report)
    for tier in upper:
        assert report[tier]["checked"] > 0
        assert report[tier]["mismatches"] == 0, (tier, report[tier])


def test_validate_catches_tampered_sketch_tier(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out, with_sketches=True)
    import glob

    victim = sorted(
        glob.glob(os.path.join(out, "psk_1h", "source=*", "run=*", "*.parquet"))
    )[0]
    t = pq.read_table(victim)
    cnts = t["cnt"].to_pylist()
    cnts[0] += 7
    import pyarrow as pa

    cols = {name: t[name] for name in t.column_names}
    cols["cnt"] = pa.array(cnts, type=t["cnt"].type)
    crc = os.path.join(os.path.dirname(victim), f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    pq.write_table(pa.table(cols), victim)

    report = validate_tiers(spark, seq_path, out, sample_frac=1.0)
    # the tampered 1h fails its own check (vs merge of 1m) AND poisons the
    # 1d check (1d was derived pre-tamper, so it no longer matches merge(1h))
    assert report["psk_1h"]["mismatches"] > 0
    assert report["psk_1d"]["mismatches"] > 0
    # the untouched hll family still audits clean
    assert report["hll_1h"]["mismatches"] == 0
    assert report["hll_1d"]["mismatches"] == 0


def test_retention_and_audit_on_sketch_tiers(spark, seq_path, tmp_path):
    """Sketch tiers participate in retention (they carry bucket_ts), and the
    retention-aware audit bound keeps a trimmed family auditing clean."""
    from tersets_spark.jobs import apply_retention
    from tersets_spark.tables import EPOCH

    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out, with_sketches=True)
    cat = TierCatalog(out, superseded_grace_sec=0.0)
    m1 = cat.read_tier(spark, "psk_1m")
    lo, hi = m1.agg(F.min("bucket_ts"), F.max("bucket_ts")).collect()[0]
    cut = (lo + hi) // 2
    now = EPOCH + 10 * 86400
    before = m1.count()
    expected = m1.filter(F.col("bucket_ts") < cut).count()
    assert 0 < expected < before

    policy = {t: None for t in ("raw", "1m", "1h", "1d", *SKETCH_TIER_NAMES)}
    policy["psk_1m"] = now - cut
    dropped = apply_retention(spark, out, now, policy=policy,
                              superseded_grace_sec=0.0)
    assert dropped["psk_1m"] == expected

    # the 1h-vs-merge(1m) audit is restricted to buckets where BOTH sides
    # are complete (horizon lineage), so the trimmed catalog audits clean
    report = validate_tiers(spark, seq_path, out, sample_frac=1.0)
    assert report["psk_1h"]["mismatches"] == 0, report["psk_1h"]
    assert report["psk_1h"]["checked"] > 0


def test_serving_from_catalog_matches_direct(spark, seq_path, tmp_path):
    """percentiles_from_catalog / distinct_from_catalog over committed tiers
    equal direct builds from the raw points — serving never rescans tokens."""
    from tersets_spark.hll import hll_summary
    from tersets_spark.jobs import distinct_from_catalog, percentiles_from_catalog
    from tersets_spark.sketch import percentiles

    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out, with_sketches=True)
    pts = _sketch_points(spark.read.parquet(seq_path))

    served = percentiles_from_catalog(spark, out).orderBy("source", "pct")
    direct = percentiles(
        merge_sketch(hdr_sketch(pts, ["source"], "v"), ["source"]),
        ["source"], [50, 90, 99],
    ).orderBy("source", "pct")
    assert [tuple(r) for r in served.select(*sorted(served.columns)).collect()] == [
        tuple(r) for r in direct.select(*sorted(direct.columns)).collect()
    ]

    served_d = distinct_from_catalog(spark, out).orderBy("source")
    direct_d = hll_summary(
        hll_registers(pts, ["source"], "v"), ["source"]
    ).orderBy("source")
    assert [tuple(r) for r in served_d.select(*sorted(served_d.columns)).collect()] == [
        tuple(r) for r in direct_d.select(*sorted(direct_d.columns)).collect()
    ]


def test_time_travel_on_sketch_tier(spark, seq_path, tmp_path):
    """Snapshot time travel is tier-generic: a retention rewrite of psk_1m
    supersedes runs, but as_of the pre-retention snapshot still reads the
    full sketch (runs survive vacuum for the reader-grace window)."""
    from tersets_spark.jobs import apply_retention
    from tersets_spark.tables import EPOCH

    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out, with_sketches=True)
    cat = TierCatalog(out, superseded_grace_sec=600.0)
    snap = cat.snapshot()
    before = cat.read_tier(spark, "psk_1m").count()

    m1 = cat.read_tier(spark, "psk_1m")
    lo, hi = m1.agg(F.min("bucket_ts"), F.max("bucket_ts")).collect()[0]
    now = EPOCH + 10 * 86400
    policy = {t: None for t in ("raw", "1m", "1h", "1d", *SKETCH_TIER_NAMES)}
    policy["psk_1m"] = now - (lo + hi) // 2
    apply_retention(spark, out, now, policy=policy)

    assert cat.read_tier(spark, "psk_1m").count() < before  # head moved on
    assert cat.read_tier(spark, "psk_1m", as_of=snap).count() == before

"""Churn-bounded sketch-tier rebuild after per-document deletion
(jobs._rebuild_sketches_after_delete via delete_documents): every sketch
family's post-delete tier must equal a fresh build over the kept corpus,
validate_tiers must audit clean on all families, and the lineage must show
cost proportional to touched buckets (only touched sources rewritten)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tersets_spark.bloom import bloom_words, merge_words
from tersets_spark.catalog import TierCatalog
from tersets_spark.cms import cms_counters, merge_counters
from tersets_spark.hll import hll_registers, merge_registers
from tersets_spark.jobs import (
    _sketch_points,
    delete_documents,
    merge_to_bucket,
    run_cascade,
    validate_tiers,
)
from tersets_spark.sketch import merge_sketch, sketch as hdr_sketch
from tersets_spark.tables import ensure_sequences

FAMS = {
    "psk": (lambda p: hdr_sketch(p, ["source", "bucket_ts"], "v"),
            merge_sketch, ["bucket_id"], "cnt"),
    "hll": (lambda p: hll_registers(p, ["source", "bucket_ts"], "v", dict_hash=True),
            merge_registers, ["bucket"], "rho"),
    "blm": (lambda p: bloom_words(p, ["source", "bucket_ts"], "v", dict_hash=True),
            merge_words, ["widx"], "word"),
    "cms": (lambda p: cms_counters(p, ["source", "bucket_ts"], "v", dict_hash=True),
            merge_counters, ["ridx", "cidx"], "cnt"),
}
SECS = {"1m": 60, "1h": 3600, "1d": 86400}


@pytest.fixture(scope="module")
def deleted_catalog(spark, tmp_path_factory):
    seq_path = ensure_sequences("sf0.001")
    seq = spark.read.parquet(seq_path)
    out = str(tmp_path_factory.mktemp("delrb") / "cat")
    os.makedirs(out)
    run_cascade(spark, seq_path, out, with_blocks=False,
                with_sketches=True, with_blooms=True, with_cms=True)
    gate = F.substring(F.md5(F.concat(F.lit("t-del:"), F.col("doc_id"))), 1, 1) < "2"
    del_ids = seq.where(gate).select("doc_id")
    report = delete_documents(spark, out, del_ids)  # rebuild_sketches default
    kept = seq.where(~gate)
    return out, report, kept, seq_path


def test_rebuild_reported_per_tier(deleted_catalog):
    _, report, _, _ = deleted_catalog
    assert "sketch_tiers_skipped" not in report
    for fam in FAMS:
        for level in SECS:
            assert f"{fam}_{level}_rebuilt" in report, (fam, level)


@pytest.mark.parametrize("fam", sorted(FAMS))
@pytest.mark.parametrize("level", ["1m", "1h", "1d"])
def test_post_delete_sketch_equals_fresh_build(deleted_catalog, spark, fam, level):
    out, _, kept, _ = deleted_catalog
    build, merge, id_cols, val_col = FAMS[fam]
    got = TierCatalog(out).read_tier(spark, f"{fam}_{level}")
    got = merge_to_bucket(got, SECS[level], merge)  # serving view (idempotent)
    want = build(_sketch_points(kept))
    if level != "1m":
        want = merge_to_bucket(want, SECS[level], merge)
    keys = ["source", "bucket_ts", *id_cols, val_col]
    g = sorted(map(tuple, got.select(*keys).collect()))
    w = sorted(map(tuple, want.select(*keys).collect()))
    assert g == w and g, (fam, level, len(g), len(w))


def test_validate_tiers_clean_after_rebuild(deleted_catalog, spark):
    out, _, _, seq_path = deleted_catalog
    # audit against the post-delete corpus view: validate_tiers' sketch
    # checks compare tier-below vs tier, which the rebuild must keep
    # consistent; core checks need the kept docs only, so sample the
    # whole catalog (deleted docs are absent on BOTH sides of the joins
    # only if we audit kept docs — write them out)
    rep = validate_tiers(spark, seq_path, out, sample_frac=1.0)
    # deleted docs exist in the original sequences but not the catalog:
    # raw/1m would flag them; restrict the assertion to the sketch tiers
    # (inter-level consistency) which must be mismatch-free
    for tier, r in rep.items():
        if tier.split("_", 1)[0] in FAMS:
            assert r["mismatches"] == 0, (tier, r)
            assert r["checked"] > 0, tier


def test_lineage_cost_proportional_to_touched(deleted_catalog, spark):
    out, _, kept, seq_path = deleted_catalog
    seq = spark.read.parquet(seq_path)
    gate = F.substring(F.md5(F.concat(F.lit("t-del:"), F.col("doc_id"))), 1, 1) < "2"
    touched_sources = {r[0] for r in seq.where(gate).select("source").distinct().collect()}
    cat = TierCatalog(out)
    recs = [r for r in cat.metrics() if r.get("status") == "delete_rebuild"]
    assert recs
    # only touched sources were rewritten, each with touched-bucket lineage
    assert {r["partition"] for r in recs} <= touched_sources
    assert all(r.get("touched_buckets", 0) > 0 for r in recs)
    # coarser levels touch at most as many buckets as 1m
    per = {}
    for r in recs:
        per.setdefault((r["tier"], r["partition"]), r["touched_buckets"])
    for (tier, src), n in per.items():
        fam, _, level = tier.partition("_")
        if level != "1m":
            assert n <= per[(f"{fam}_1m", src)], (tier, src)

"""Late-data batch ingest (jobs.ingest_append): APPEND-only absorption.

The contract under test: after cascading a BASE corpus and ingest-appending
a LATE batch, every tier serves exactly what run_cascade over base∪late
would have produced — core tiers bitwise (per-doc keying makes late docs
purely additive), sketch families exactly under their merges (sum / max /
bit_or, which every serving read applies). Plus the operational half:
exactly-once per batch_id across crash replays, idempotent re-delivery,
retention-horizon exclusion, and a clean validate_tiers audit afterwards.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import (
    SKETCH_CASCADE,
    apply_retention,
    ingest_append,
    merge_to_bucket,
    run_cascade,
    validate_tiers,
)
from tersets_spark.tables import generate_sequences

ALL_FAMS = dict(with_sketches=True, with_blooms=True, with_cms=True,
                sketch_kernel=True)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """full / base / late parquet paths (340 = 240 base + 100 late docs)."""
    d = tmp_path_factory.mktemp("ingest_seq")
    table = generate_sequences(340, seed=11)
    paths = {}
    for name, tbl in (
        ("full", table),
        ("base", table.slice(0, 240)),
        ("late", table.slice(240, 100)),
    ):
        p = str(d / f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


def _family_merge_fns():
    from tersets_spark.bloom import merge_words
    from tersets_spark.cms import merge_counters
    from tersets_spark.hll import merge_registers
    from tersets_spark.sketch import merge_sketch

    return {"psk": merge_sketch, "hll": merge_registers,
            "blm": merge_words, "cms": merge_counters}


def _assert_catalogs_equivalent(spark, out, out_ref):
    cat, ref = TierCatalog(out), TierCatalog(out_ref)
    for tier in ("raw", "1m", "1h", "1d"):
        a, b = cat.read_tier(spark, tier), ref.read_tier(spark, tier)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, tier
    merges = _family_merge_fns()
    for fam, merge in merges.items():
        for tier, _below, secs in ((f"{fam}_1m", None, 60),) + SKETCH_CASCADE[fam]:
            a = merge_to_bucket(cat.read_tier(spark, tier), secs, merge)
            b = merge_to_bucket(ref.read_tier(spark, tier), secs, merge)
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, tier


@pytest.fixture(scope="module")
def ref_catalog(spark, corpus, tmp_path_factory):
    """run_cascade over the FULL corpus — the ground truth every ingest
    scenario must reproduce."""
    out_ref = str(tmp_path_factory.mktemp("ingest_ref") / "cat")
    os.makedirs(out_ref, exist_ok=True)
    run_cascade(spark, corpus["full"], out_ref, with_blocks=False, **ALL_FAMS)
    return out_ref


def test_ingest_append_matches_full_cascade(spark, corpus, ref_catalog, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, corpus["base"], out, with_blocks=False, **ALL_FAMS)
    res = ingest_append(spark, corpus["late"], out, batch_id="b1")
    assert res["docs"] == 100 and res["skipped_existing"] == 0
    # family flags were sniffed from the catalog: all 8 sketch tiers appended
    assert set(res["tiers"]) >= {
        "raw", "1m", "1h", "1d",
        "psk_1m", "psk_1h", "psk_1d", "hll_1m", "hll_1h", "hll_1d",
        "blm_1m", "blm_1h", "blm_1d", "cms_1m", "cms_1h", "cms_1d",
    }
    _assert_catalogs_equivalent(spark, out, ref_catalog)
    # the manifest knows the batch: every append record carries the id
    recs = [r for r in TierCatalog(out).metrics() if r.get("status") == "append"]
    assert recs and all(r.get("batch_id") == "b1" for r in recs)

    # idempotent re-delivery of a COMPLETED batch: a no-op
    res2 = ingest_append(spark, corpus["late"], out, batch_id="b1")
    assert res2.get("resumed") and res2["tiers"] == {}
    _assert_catalogs_equivalent(spark, out, ref_catalog)

    # the audit machinery itself must accept appended tiers (upper sketch
    # tiers now hold duplicate keys; validate merges to the serving value)
    report = validate_tiers(spark, corpus["full"], out, sample_frac=1.0)
    assert all(v["mismatches"] == 0 for v in report.values()), report
    assert report["raw"]["checked"] == 340

    # compaction folds the appended runs; serving is unchanged
    cat = TierCatalog(out)
    for tier in ("raw", "1m", "1h", "1d"):
        cat.compact(spark, tier)
        assert all(
            len(runs) == 1 for runs in cat.current_run_lists(tier).values()
        )
    _assert_catalogs_equivalent(spark, out, ref_catalog)


def test_ingest_crash_replay_is_exactly_once(spark, corpus, ref_catalog, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, corpus["base"], out, with_blocks=False, **ALL_FAMS)

    with pytest.raises(RuntimeError, match="injected failure after 1m"):
        ingest_append(spark, corpus["late"], out, batch_id="crash1",
                      fail_after_tier="1m")
    # raw + 1m appended, upper tiers not
    cat = TierCatalog(out)
    appended = {(r["tier"], r["partition"]) for r in cat.metrics()
                if r.get("status") == "append" and r.get("batch_id") == "crash1"}
    assert any(t == "raw" for t, _ in appended)
    assert not any(t == "1h" for t, _ in appended)

    # replay the SAME batch: skip_existing must not mistake the crashed
    # attempt's own raw appends for pre-existing docs, and no (tier,
    # source) pair may be appended twice
    res = ingest_append(spark, corpus["late"], out, batch_id="crash1")
    assert res["skipped_existing"] == 0
    keys = [(r["tier"], r["partition"]) for r in cat.metrics()
            if r.get("status") == "append" and r.get("batch_id") == "crash1"]
    assert len(keys) == len(set(keys))
    _assert_catalogs_equivalent(spark, out, ref_catalog)


def test_skip_existing_drops_redelivered_docs(spark, corpus, ref_catalog, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, corpus["base"], out, with_blocks=False, **ALL_FAMS)
    # upstream re-delivers an overlapping batch: last 40 base docs + late
    overlap = str(tmp_path / "overlap.parquet")
    t = pq.read_table(corpus["full"])
    pq.write_table(t.slice(200, 140), overlap)
    res = ingest_append(spark, overlap, out, batch_id="redeliver")
    assert res["docs"] == 100 and res["skipped_existing"] == 40
    _assert_catalogs_equivalent(spark, out, ref_catalog)


def test_ingest_respects_retention_horizon(spark, corpus, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, corpus["base"], out, with_blocks=False)
    base_max = (
        spark.read.parquet(corpus["base"])
        .agg(F.max(F.col("ts0") + F.col("n_tok"))).collect()[0][0]
    )
    # expire everything older than ~the last hour of base event time
    now = int(base_max)
    policy = {"raw": 3600, "1m": 3600, "1h": None, "1d": None}
    apply_retention(spark, out, now, policy)

    res = ingest_append(spark, corpus["late"], out, batch_id="old")
    cat = TierCatalog(out)
    horizon = now - 3600
    for tier, col in (("raw", "ts0"), ("1m", "bucket_ts")):
        below = cat.read_tier(spark, tier).where(F.col(col) < horizon).count()
        assert below == 0, f"{tier} resurrected expired event time"
    # the late batch straddles the horizon: some rows must have been dropped
    # AND counted, some appended (generate_sequences spreads ts0 widely)
    assert res["expired"].get("raw", 0) > 0
    assert res["tiers"]["1h"] > 0  # un-retained tier takes everything


def test_probe_membership_and_estimate_counts_merge_partials(spark):
    """Split delta filters/counters (APPEND shape) must not flip a Bloom
    maybe to a FALSE NEGATIVE or drag a count-min estimate UNDER truth."""
    from tersets_spark.bloom import bloom_words, probe_membership
    from tersets_spark.cms import cms_counters, estimate_counts

    schema = "source string, bucket_ts long, v long"
    half_a = spark.createDataFrame([("s", 0, 7), ("s", 0, 7)], schema)
    half_b = spark.createDataFrame([("s", 0, 7), ("s", 0, 11)], schema)
    probes = spark.createDataFrame([(7,), (11,)], "probe long")

    words = bloom_words(half_a, ["source", "bucket_ts"], "v").unionByName(
        bloom_words(half_b, ["source", "bucket_ts"], "v")
    )
    got = {r["probe"]: r["maybe"]
           for r in probe_membership(words, ["source", "bucket_ts"], probes).collect()}
    assert got[7] and got[11], "present values must stay maybe=True over partials"

    counters = cms_counters(half_a, ["source", "bucket_ts"], "v").unionByName(
        cms_counters(half_b, ["source", "bucket_ts"], "v")
    )
    est = {r["probe"]: r["est"]
           for r in estimate_counts(counters, ["source", "bucket_ts"], probes).collect()}
    assert est[7] >= 3 and est[11] >= 1, "count-min must stay one-sided over partials"


def test_ingest_validation_errors(spark, corpus, tmp_path):
    out = str(tmp_path / "cat")
    os.makedirs(out)
    with pytest.raises(ValueError, match="batch_id"):
        ingest_append(spark, corpus["late"], out, batch_id="")


def test_maintain_folds_appends_and_preserves_serving(spark, corpus, ref_catalog, tmp_path):
    """One maintenance pass (jobs.maintain): retention -> compaction ->
    vacuum. After two append batches, every partition folds to one run,
    superseded dirs are physically gone, serving is unchanged, and the
    manifest carries the pass summary."""
    from tersets_spark.jobs import maintain

    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, corpus["base"], out, with_blocks=False, **ALL_FAMS)
    t = pq.read_table(corpus["late"])
    late_a, late_b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t.slice(0, 50), late_a)
    pq.write_table(t.slice(50, 50), late_b)
    ingest_append(spark, late_a, out, batch_id="m-a")
    ingest_append(spark, late_b, out, batch_id="m-b")

    cat = TierCatalog(out, superseded_grace_sec=0.0)
    assert any(len(r) > 1 for r in cat.current_run_lists("1m").values())
    res = maintain(spark, out, superseded_grace_sec=0.0)
    assert sum(res["compacted"].values()) > 0
    # sketch fold: the two batches' delta rows merged back to 1 row/key —
    # physical row counts equal the single-cascade reference again
    assert sum(res["folded"].values()) > 0
    for tier in ("psk_1m", "hll_1h", "blm_1m", "cms_1d"):
        assert (
            cat.read_tier(spark, tier).count()
            == TierCatalog(ref_catalog).read_tier(spark, tier).count()
        ), tier
    for tier in ("raw", "1m", "1h", "1d", "psk_1m", "blm_1d", "cms_1h"):
        assert all(
            len(runs) == 1 for runs in cat.current_run_lists(tier).values()
        ), tier
        # vacuum physically removed everything the manifest no longer serves
        live = {
            os.path.join(out, tier, rel)
            for runs in cat.current_run_lists(tier).values() for rel in runs
        }
        on_disk = {
            os.path.join(out, tier, d, r)
            for d in os.listdir(os.path.join(out, tier))
            for r in os.listdir(os.path.join(out, tier, d))
        }
        assert on_disk == live, tier
    _assert_catalogs_equivalent(spark, out, ref_catalog)
    assert any(r["tier"] == "maintain" for r in cat.metrics())


def test_serve_router_dispatches_to_each_strategy(spark, corpus, tmp_path):
    """jobs.serve: one entry point; each shape equals its direct call."""
    from tersets_spark.jobs import (
        overview_from_catalog,
        range_aggregate_from_catalog,
        range_gapfill_from_catalog,
        read_doc_range,
        serve,
    )

    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, corpus["full"], out, with_blocks=False)
    seq = spark.read.parquet(corpus["full"])
    lo, hi = seq.agg(F.min("ts0"), F.max(F.col("ts0") + F.col("n_tok"))).collect()[0]
    start = (int(lo) // 3600) * 3600 + 3600
    end = start + 6 * 3600
    some_docs = [r["doc_id"] for r in seq.limit(3).collect()]

    pairs = [
        (serve(spark, out, start, end),
         range_aggregate_from_catalog(spark, out, start, end)),
        (serve(spark, out, start, end, step=3600),
         range_gapfill_from_catalog(spark, out, start, end, 3600)),
        (serve(spark, out, start, end, k=16),
         overview_from_catalog(spark, out, start, end, 16)),
        (serve(spark, out, start, end, doc_ids=some_docs),
         read_doc_range(spark, out, start, end, some_docs)),
    ]
    for got, want in pairs:
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    with pytest.raises(ValueError, match="mutually exclusive"):
        serve(spark, out, start, end, step=3600, k=16)


def test_validate_ingest_is_churn_bounded(spark, corpus, tmp_path):
    """validate_ingest audits ONLY post-snapshot appends: the late batch's
    rows check exactly; a tampered appended run is caught; a tampered
    pre-snapshot run is out of scope (validate_tiers' job)."""
    import shutil

    from tersets_spark.jobs import validate_ingest

    out = str(tmp_path / "cat")
    os.makedirs(out)
    run_cascade(spark, corpus["base"], out, with_blocks=False, **ALL_FAMS)
    cat = TierCatalog(out)
    s0 = cat.snapshot()

    def _tamper(rel):
        run_dir = os.path.join(out, "1h", rel)
        df = spark.read.parquet(run_dir)
        tmp = str(tmp_path / f"tamper_{rel.replace('/', '_')}")
        (df.withColumn("sum", F.col("sum") + 1)
           .coalesce(1).write.mode("overwrite").parquet(tmp))
        shutil.rmtree(run_dir)
        os.rename(tmp, run_dir)

    # tamper a PRE-snapshot 1h run first: incremental audit must not see it
    base_rel = next(r["path"] for r in cat.metrics()
                    if r["tier"] == "1h" and r.get("path"))
    _tamper(base_rel)

    ingest_append(spark, corpus["late"], out, batch_id="vi")
    rep = validate_ingest(spark, corpus["full"], out, since=s0)
    assert rep and all(v["mismatches"] == 0 for v in rep.values()), rep
    assert rep["raw"]["checked"] == 100  # exactly the appended docs
    assert 0 < rep["1m"]["checked"] < cat.read_tier(spark, "1m").count()
    assert "psk_1h" in rep and "cms_1d" in rep and "blm_1m" in rep

    # tamper an APPENDED 1h run: caught
    app_rel = next(r["path"] for r in cat.metrics()
                   if r["tier"] == "1h" and r.get("status") == "append"
                   and r.get("path"))
    _tamper(app_rel)
    rep2 = validate_ingest(spark, corpus["full"], out, since=s0)
    assert rep2["1h"]["mismatches"] > 0

    # nothing appended after `since` -> empty report, zero Spark work
    assert validate_ingest(spark, corpus["full"], out, since=cat.snapshot()) == {}

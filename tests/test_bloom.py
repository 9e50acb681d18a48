"""Bloom membership tiers: Python-twin parity, no false negatives,
exact re-aggregability, dict-hash path identity, cascade/validate/serve
integration."""

from __future__ import annotations

import collections

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.bloom import (
    K,
    M,
    W,
    WORD_BITS,
    bloom_positions_py,
    bloom_words,
    merge_words,
    probe_membership,
)
from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import (
    BLOOM_TIER_NAMES,
    run_cascade,
    validate_tiers,
    windows_maybe_containing,
)
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bloomseq") / "seq.parquet")
    pq.write_table(generate_sequences(200, seed=11), path)
    return path


def _py_words(pairs) -> dict:
    """Python replica of bloom_words over (key, value) pairs."""
    words: dict = collections.defaultdict(int)
    for k, v in pairs:
        for p in bloom_positions_py(v):
            words[(k, p // WORD_BITS)] |= 1 << (p % WORD_BITS)
    return dict(words)


def test_spark_words_match_python_replica(spark):
    pairs = [("s1", v) for v in range(0, 400, 7)] + [("s2", v) for v in range(3, 90, 5)]
    df = spark.createDataFrame(pairs, "k string, v long")
    got = {
        (r["k"], r["widx"]): r["word"]
        for r in bloom_words(df, ["k"], "v").collect()
    }
    assert got == _py_words(pairs)
    # dict-hash fast path is bit-identical
    got_dict = {
        (r["k"], r["widx"]): r["word"]
        for r in bloom_words(df, ["k"], "v", dict_hash=True).collect()
    }
    assert got_dict == got


def test_null_values_ignored_both_paths(spark):
    df = spark.createDataFrame(
        [("s1", 5), ("s1", None), ("s1", 9)], "k string, v long"
    )
    want = _py_words([("s1", 5), ("s1", 9)])
    for dh in (False, True):
        got = {
            (r["k"], r["widx"]): r["word"]
            for r in bloom_words(df, ["k"], "v", dict_hash=dh).collect()
        }
        assert got == want, f"dict_hash={dh}"


def test_no_false_negatives_and_fp_rate(spark):
    """Every present (key, value) probes maybe=True; absent probes are
    mostly False at low fill (n=60 per key, m=12288, k=4 -> expected FP
    ~ (1 - e^(-4*60/12288))^4 ~ 1.3e-7)."""
    present = {f"s{i}": [1000 * i + j for j in range(60)] for i in range(3)}
    rows = [(k, v) for k, vs in present.items() for v in vs]
    df = spark.createDataFrame(rows, "k string, v long")
    words = bloom_words(df, ["k"], "v").localCheckpoint()

    present_probes = spark.createDataFrame(
        [(v,) for v in present["s1"]], "probe long"
    )
    res = {
        (r["k"], r["probe"]): r["maybe"]
        for r in probe_membership(words, ["k"], present_probes).collect()
    }
    for v in present["s1"]:
        assert res[("s1", v)], f"false negative for present value {v}"

    absent = spark.createDataFrame([(10_000_000 + i,) for i in range(200)], "probe long")
    fp = sum(
        1
        for r in probe_membership(words, ["k"], absent).collect()
        if r["maybe"]
    )
    assert fp <= 3, f"false-positive count {fp}/600 far above design rate"


def test_merge_is_exact_reaggregation(spark):
    rows = [(f"s{i % 2}", i * 31 % 997) for i in range(300)]
    df = spark.createDataFrame(rows, "k string, v long")
    full = {
        (r["k"], r["widx"]): r["word"]
        for r in bloom_words(df, ["k"], "v").collect()
    }
    parts = [
        bloom_words(df.where(F.col("v") % 3 == i), ["k"], "v") for i in range(3)
    ]
    merged = merge_words(parts[0].union(parts[1]).union(parts[2]), ["k"])
    got = {(r["k"], r["widx"]): r["word"] for r in merged.collect()}
    assert got == full


def test_missing_word_rows_mean_definitely_absent(spark):
    """A key whose filter has no row at some widx must probe False for a
    value needing bits there (left-join NULL word coalesces to 0, never
    silently passes)."""
    df = spark.createDataFrame([("s1", 1)], "k string, v long")
    words = bloom_words(df, ["k"], "v")
    assert words.count() <= K  # at most K word rows exist
    probes = spark.createDataFrame([(99999,)], "probe long")
    [r] = probe_membership(words, ["k"], probes).collect()
    assert r["maybe"] is False


def test_cascade_bloom_tiers_commit_validate_and_serve(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    dirs = run_cascade(spark, seq_path, out, with_blooms=True)
    for t in BLOOM_TIER_NAMES:
        assert t in dirs
    cat = TierCatalog(out)
    for t in BLOOM_TIER_NAMES:
        df = cat.read_tier(spark, t)
        assert df.columns == ["source", "bucket_ts", "widx", "word"] or sorted(
            df.columns
        ) == sorted(["source", "bucket_ts", "widx", "word"])
        assert df.count() > 0
        # bounded: at most W word rows per (source, bucket)
        mx = (
            df.groupBy("source", "bucket_ts").count().agg(F.max("count")).head()[0]
        )
        assert mx <= W

    # upper tiers audit as exact merges of the tier below
    rep = validate_tiers(spark, seq_path, out)
    for t in ("blm_1h", "blm_1d"):
        assert rep[t]["mismatches"] == 0 and rep[t]["checked"] > 0

    # serving: maybe-windows is a superset of the exact truth per tier
    seq = spark.read.parquet(seq_path)
    probe = int(seq.selectExpr("tokens[5]").head()[0])
    truth = {
        (r["source"], r["bucket_ts"])
        for r in seq.select(
            "source", F.posexplode("tokens").alias("pos", "v"), "ts0"
        )
        .where(F.col("v") == probe)
        .select(
            "source",
            ((F.col("ts0") + F.col("pos")) / 60).cast("long").alias("b"),
        )
        .select("source", (F.col("b") * 60).alias("bucket_ts"))
        .distinct()
        .collect()
    }
    maybe = {
        (r["source"], r["bucket_ts"])
        for r in windows_maybe_containing(spark, out, [probe]).collect()
    }
    assert truth <= maybe, "bloom routing lost a true window (false negative)"

    # time-scoped routing: [start, end) bounds the probed filters exactly
    lo, hi = 1_700_030_000, 1_700_060_000
    scoped = {
        (r["source"], r["bucket_ts"])
        for r in windows_maybe_containing(spark, out, [probe],
                                          start=lo, end=hi).collect()
    }
    assert scoped == {k for k in maybe if lo <= k[1] < hi}
    assert {k for k in truth if lo <= k[1] < hi} <= scoped

    # resume: nothing pending on a second run (no duplicate commits)
    before = len(cat.metrics())
    run_cascade(spark, seq_path, out, with_blooms=True)
    assert len(cat.metrics()) == before


def test_gram_keyed_bloom_routes_contamination_rescans(spark):
    """The filters are value-generic: keyed by token n-gram strings
    (concat_ws — portable to a SQL replay), a per-window bloom answers
    'which windows might contain this benchmark gram' — the targeted-
    rescan form of 13-gram decontamination. Every window truly containing
    the gram must probe maybe (no false negatives)."""
    n = 3
    rows = [
        # (window, tokens): window w2 and w4 contain the gram (7, 8, 9)
        ("w1", [1, 2, 3, 4, 5]),
        ("w2", [6, 7, 8, 9, 10]),
        ("w3", [11, 12, 13, 14]),
        ("w4", [7, 8, 9]),
    ]
    df = spark.createDataFrame(rows, "w string, tokens array<int>")
    grams = df.select(
        "w",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tokens") - n + 1),
                lambda i: F.slice(F.col("tokens"), i, n),
            )
        ).alias("gram"),
    ).select("w", F.concat_ws(",", "gram").alias("gram_key"))
    words = bloom_words(grams, ["w"], "gram_key")
    probes = spark.createDataFrame([("7,8,9",), ("1,2,99",)], "probe string")
    res = {
        (r["w"], r["probe"]): r["maybe"]
        for r in probe_membership(words, ["w"], probes).collect()
    }
    assert res[("w2", "7,8,9")] and res[("w4", "7,8,9")]
    assert not res[("w1", "7,8,9")] and not res[("w3", "7,8,9")]
    assert not any(res[(w, "1,2,99")] for w in ("w1", "w2", "w3", "w4"))


def test_retention_and_audit_on_bloom_tiers(spark, seq_path, tmp_path):
    """Bloom tiers participate in row-level retention (they carry
    bucket_ts) and the retention-aware audit bound keeps a trimmed family
    auditing clean — same contract as the psk/hll families."""
    from tersets_spark.jobs import apply_retention
    from tersets_spark.tables import EPOCH

    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out, with_blooms=True)
    cat = TierCatalog(out, superseded_grace_sec=0.0)
    m1 = cat.read_tier(spark, "blm_1m")
    lo, hi = m1.agg(F.min("bucket_ts"), F.max("bucket_ts")).collect()[0]
    cut = (lo + hi) // 2
    now = EPOCH + 10 * 86400
    before = m1.count()
    expected = m1.filter(F.col("bucket_ts") < cut).count()
    assert 0 < expected < before

    policy = {t: None for t in ("raw", "1m", "1h", "1d", *BLOOM_TIER_NAMES)}
    policy["blm_1m"] = now - cut
    dropped = apply_retention(spark, out, now, policy=policy,
                              superseded_grace_sec=0.0)
    assert dropped["blm_1m"] == expected

    report = validate_tiers(spark, seq_path, out, sample_frac=1.0)
    assert report["blm_1h"]["mismatches"] == 0, report["blm_1h"]
    assert report["blm_1h"]["checked"] > 0


def test_cascade_bloom_resume_after_injected_crash(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    with pytest.raises(RuntimeError, match="injected failure after blm_1m"):
        run_cascade(spark, seq_path, out, with_blooms=True, fail_after_tier="blm_1m")
    cat = TierCatalog(out)
    assert cat.completed("blm_1m") and not cat.completed("blm_1h")
    run_cascade(spark, seq_path, out, with_blooms=True)
    keys = [(m["tier"], m["partition"]) for m in cat.metrics()]
    assert len(keys) == len(set(keys)), "duplicate partition commits after resume"
    rep = validate_tiers(spark, seq_path, out)
    for t in ("blm_1h", "blm_1d"):
        assert rep[t]["mismatches"] == 0

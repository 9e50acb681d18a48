"""Sequence-level training-data ops (seqops): known-answer and differential
tests for the JVM-side fold/digest/gram machinery the contract queries use."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _max_run_py(toks: list[int]) -> int:
    best = run = 0
    prev = None
    for t in toks:
        run = run + 1 if t == prev else 1
        best = max(best, run)
        prev = t
    return best


def test_max_run_col_matches_python_reference(spark):
    from tersets_spark.seqops import max_run_col

    rng = np.random.default_rng(3)
    rows = [
        [1],
        [7, 7, 7, 7],
        [1, 2, 3, 4],
        [5, 5, 1, 5, 5, 5],
        rng.integers(0, 3, 200).tolist(),  # many short runs
        ([9] * 50 + [1] + [9] * 49),
    ]
    df = spark.createDataFrame([(i, r) for i, r in enumerate(rows)], "i long, toks array<int>")
    got = {
        r["i"]: r["mr"]
        for r in df.select("i", max_run_col(F.col("toks")).alias("mr")).collect()
    }
    for i, r in enumerate(rows):
        assert got[i] == _max_run_py(r), f"row {i}"


def test_exact_seq_dedup_counts_duplicates(spark):
    from tersets_spark.seqops import exact_seq_dedup_stats

    df = spark.createDataFrame(
        [
            ("a", [1, 2, 3], 3, "s1"),
            ("b", [1, 2, 3], 3, "s1"),  # dup of a
            ("c", [1, 2, 4], 3, "s1"),
            ("d", [1, 2, 3], 3, "s2"),  # same tokens, other source: not a dup there
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = {r["source"]: r.asDict() for r in exact_seq_dedup_stats(df).collect()}
    assert out["s1"]["docs"] == 3 and out["s1"]["distinct_seqs"] == 2
    assert out["s1"]["dup_docs"] == 1
    assert out["s2"]["dup_docs"] == 0


def test_ngram_contamination_flags_shared_grams(spark):
    from tersets_spark.seqops import ngram_contamination

    bench = list(range(100, 120))
    clean = list(range(500, 540))
    dirty = clean[:10] + bench[3:16] + clean[10:20]  # contains a bench 13-gram
    df = spark.createDataFrame(
        [
            ("b0", bench, len(bench), "bench"),
            ("x0", dirty, len(dirty), "s1"),
            ("x1", clean, len(clean), "s1"),
            ("y0", clean, len(clean), "s2"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = {r["source"]: r.asDict() for r in ngram_contamination(df, "bench", n=13).collect()}
    assert out["s1"]["docs"] == 2 and out["s1"]["contaminated_docs"] == 1
    assert out["s2"]["contaminated_docs"] == 0


def test_ngram_contamination_doc_shorter_than_n(spark):
    """Docs shorter than n must contribute zero grams — the unguarded
    sequence(1, n_tok - n + 1) would DESCEND to [1, 0] and slice(tokens, 0,
    n) is a Spark runtime error (regression guard for the n_tok < n path)."""
    from tersets_spark.seqops import ngram_contamination

    bench = list(range(100, 120))
    short = bench[:5]  # 5 < 13: no full 13-gram, must not error or match
    df = spark.createDataFrame(
        [
            ("b0", bench, len(bench), "bench"),
            ("s0", short, len(short), "s1"),
            ("s1", bench[:13], 13, "s1"),  # exactly n: one gram, contaminated
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = {r["source"]: r.asDict() for r in ngram_contamination(df, "bench", n=13).collect()}
    assert out["s1"]["docs"] == 2 and out["s1"]["contaminated_docs"] == 1


def test_sequence_offsets_null_key_raises_and_drops_internals(spark):
    """A NULL order key must fail fast (a null would silently vanish from
    the bucket equi-join, dropping the doc and shifting every later
    offset), and the output must carry no _so_* working columns."""
    import pytest as _pytest

    from tersets_spark.seqops import sequence_offsets

    ok = spark.createDataFrame(
        [("doc_1", [1, 2], 2, "s"), ("doc_2", [3], 1, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = sequence_offsets(ok, F.col("n_tok"))
    assert sorted(out.columns) == sorted(ok.columns + ["pack_start"])
    got = {r["doc_id"]: r["pack_start"] for r in out.collect()}
    assert got == {"doc_1": 0, "doc_2": 2}

    bad = spark.createDataFrame(
        [("doc_1", [1, 2], 2, "s"), ("docX", [3], 1, "s")],  # no trailing digits
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    with _pytest.raises(Exception, match="NULL order_key"):
        sequence_offsets(bad, F.col("n_tok")).collect()


def test_repetition_stats_threshold(spark):
    from tersets_spark.seqops import repetition_stats

    df = spark.createDataFrame(
        [
            ("a", [1] * 20, 20, "s1"),           # run 20 -> repetitive
            ("b", [1, 2] * 10, 20, "s1"),        # run 1
            ("c", list(range(20)), 20, "s2"),    # run 1, all distinct
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = {r["source"]: r.asDict() for r in repetition_stats(df, run_threshold=16).collect()}
    assert out["s1"]["repetitive_docs"] == 1 and out["s1"]["max_run"] == 20
    assert out["s1"]["sum_distinct"] == 1 + 2
    assert out["s2"]["repetitive_docs"] == 0 and out["s2"]["sum_distinct"] == 20


def test_split_assign_deterministic_and_salted(spark):
    """split_assign must be a pure function of (salt, id): stable across
    runs, fractions roughly honored, new salt draws an independent
    assignment, and the thresholds replicate in plain Python md5."""
    import hashlib

    from tersets_spark.seqops import split_assign, split_thresholds

    n = 4000
    df = spark.createDataFrame(
        [(f"doc_{i:012d}", [1, 2], 2, "s0") for i in range(n)],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {r["doc_id"]: r["split"] for r in split_assign(df, fr).collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(df, fr).collect()}
    assert a == b, "assignment must be deterministic"

    # python replica of the same CASE
    pairs = split_thresholds(fr)
    for doc, got in list(a.items())[:500]:
        h = hashlib.md5(f"split-v1:{doc}".encode()).hexdigest()[:8]
        want = next((name for name, thr in pairs[:-1] if h < thr), pairs[-1][0])
        assert got == want, doc

    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / n - 0.9) < 0.03
    assert abs(c["val"] / n - 0.05) < 0.02
    assert abs(c["test"] / n - 0.05) < 0.02

    # a different salt reassigns a nontrivial share
    c2 = {r["doc_id"]: r["split"] for r in split_assign(df, fr, salt="v2").collect()}
    moved = sum(1 for d in a if a[d] != c2[d])
    assert moved > 0.05 * n


def test_split_thresholds_validation():
    import pytest as _pytest

    from tersets_spark.seqops import split_thresholds

    with _pytest.raises(ValueError, match="sum to 1"):
        split_thresholds({"a": 0.5, "b": 0.2})
    with _pytest.raises(ValueError, match="sum to 1"):
        split_thresholds({})


def test_split_thresholds_full_fraction_sentinel(spark):
    """A non-final cumulative fraction that rounds to 1.0 must NOT emit a
    9-hex-digit threshold (it would sort below most 8-digit md5 prefixes
    and silently send ~15/16 of documents to the wrong split): it emits the
    'g' sentinel, which sorts after every hex digit in Spark, DuckDB and
    Python alike, so every document lands in that split."""
    from tersets_spark.seqops import split_assign, split_thresholds

    pairs = split_thresholds({"a": 1.0, "b": 0.0})
    assert pairs == [("a", "g"), ("b", None)]
    # near-1.0 middle fraction rounds up at 2^-32 granularity
    pairs2 = split_thresholds({"train": 1 - 1e-11, "val": 1e-11})
    assert pairs2[0][1] == "g"

    df = spark.createDataFrame(
        [(f"doc_{i:012d}", [1], 1, "s0") for i in range(256)],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {r["split"] for r in split_assign(df, {"a": 1.0, "b": 0.0}).collect()}
    assert got == {"a"}


def test_length_gate_by_sketch_matches_python_replica(spark):
    """Threshold == the HDR-sketch p99 replicated in Python (bit-length
    bucket math), and the gate counts follow exactly."""
    from tersets_spark.seqops import length_gate_by_sketch

    rng = np.random.default_rng(23)
    lens = rng.integers(1, 2000, 600).tolist() + [50_000] * 4  # outliers
    rows = [
        (f"doc_{i:012d}", [1], int(n), f"s{i % 2}") for i, n in enumerate(lens)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    got = {r["source"]: r.asDict() for r in length_gate_by_sketch(df, pct=99).collect()}

    def bucket(v: int) -> int:
        bl = max(v.bit_length(), 1)
        return bl * 32 + (v >> max(bl - 5, 0))

    def lower(b: int) -> int:
        return (b & 31) << max((b >> 5) - 5, 0)

    for src in ("s0", "s1"):
        vals = [int(n) for (_, _, n, s) in rows if s == src]
        from collections import Counter

        sk = Counter(bucket(v) for v in vals)
        total, cum, thr_bucket = sum(sk.values()), 0, None
        for b in sorted(sk):
            cum += sk[b]
            if cum * 100 >= 99 * total:
                thr_bucket = b
                break
        p_est = lower(thr_bucket)
        kept = [v for v in vals if v <= p_est]
        assert got[src]["p_est"] == p_est
        assert got[src]["kept_docs"] == len(kept)
        assert got[src]["dropped_docs"] == len(vals) - len(kept)
        assert got[src]["kept_tokens"] == sum(kept)
        assert got[src]["dropped_tokens"] == sum(vals) - sum(kept)
        # the whole point: the outliers are dropped
        assert got[src]["dropped_docs"] >= 1


# ---------------------------------------------------------------------------
# span-level dedup (content-defined sampled window fingerprints)
# ---------------------------------------------------------------------------


def _span_dedup_py(rows, span: int, sel_hex_digits: int):
    """Python replica of seqops.span_dedup_stats."""
    import hashlib
    from collections import Counter, defaultdict

    prefix = "0" * sel_hex_digits
    sel = []  # (source, doc_id, dig)
    per_src = defaultdict(lambda: {"docs": 0, "windows": 0})
    for doc_id, toks, n_tok, src in rows:
        per_src[src]["docs"] += 1
        per_src[src]["windows"] += max(n_tok - span + 1, 0)
        for i in range(max(n_tok - span + 1, 0)):
            dig = hashlib.md5(
                ",".join(str(t) for t in toks[i : i + span]).encode()
            ).hexdigest()
            if dig.startswith(prefix):
                sel.append((src, doc_id, dig))
    npos = Counter(d for _, _, d in sel)
    per_doc = defaultdict(lambda: [0, 0])  # (src, doc) -> [sel_w, dup_w]
    for src, doc, dig in sel:
        per_doc[(src, doc)][0] += 1
        per_doc[(src, doc)][1] += int(npos[dig] >= 2)
    out = {}
    for src, t in per_src.items():
        docs_here = [v for (s, _), v in per_doc.items() if s == src]
        out[src] = dict(
            docs=t["docs"],
            windows=t["windows"],
            sel_windows=sum(v[0] for v in docs_here),
            dup_windows=sum(v[1] for v in docs_here),
            span_dup_docs=sum(1 for v in docs_here if v[1] > 0),
        )
    return out


def test_span_dedup_matches_python_replica(spark):
    """Differential vs the hashlib replica on data with cross-doc shared
    spans, an in-doc repeated span (token run), and short docs."""
    from tersets_spark.seqops import span_dedup_stats

    rng = np.random.default_rng(7)
    shared = rng.integers(0, 1000, 12).tolist()
    rows = [
        # a and b share a 12-token span embedded at different offsets
        ("a", rng.integers(0, 1000, 5).tolist() + shared + rng.integers(0, 1000, 9).tolist(), 26, "s0"),
        ("b", rng.integers(0, 1000, 17).tolist() + shared, 29, "s1"),
        # c repeats one token 40x: 29 identical windows inside one doc
        ("c", [5] * 40, 40, "s0"),
        # d is shorter than the span: zero windows
        ("d", [1, 2, 3], 3, "s1"),
        # e: random, no duplicates expected
        ("e", rng.integers(0, 1000, 60).tolist(), 60, "s0"),
    ]
    rows = [(d, t, len(t), s) for d, t, _, s in rows]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    # sel_hex_digits=0 selects everything -> the in-doc run and the shared
    # span MUST be counted; then the sampled variant must match the replica
    for d in (0, 1):
        got = {
            r["source"]: r.asDict()
            for r in span_dedup_stats(df, span=12, sel_hex_digits=d).collect()
        }
        want = _span_dedup_py(rows, span=12, sel_hex_digits=d)
        for src in want:
            assert got[src] == {"source": src, **want[src]}, (d, src)
    exact = _span_dedup_py(rows, span=12, sel_hex_digits=0)
    assert exact["s0"]["dup_windows"] >= 29  # the [5]*40 run
    assert exact["s1"]["span_dup_docs"] >= 1  # b's shared span


def test_span_dedup_selection_is_content_defined(spark):
    """Identical window content is co-selected regardless of document or
    offset: with duplicates present, every duplicated digest either
    appears in BOTH docs' selected sets or in neither."""
    import hashlib

    from pyspark.sql import functions as F

    from tersets_spark.seqops import span_digests

    span = 8
    shared = list(range(100, 100 + 30))  # 23 windows of shared content
    rows = [
        ("x", [1] * 7 + shared),
        ("y", shared + [2] * 13),
    ]
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows], "doc_id string, tokens array<int>, n_tok int"
    )
    out = {
        r["doc_id"]: set(r["digs"])
        for r in df.select(
            "doc_id",
            span_digests(F.col("tokens"), F.col("n_tok"), span, 1).alias("digs"),
        ).collect()
    }
    shared_digs = {
        hashlib.md5(
            ",".join(str(t) for t in shared[i : i + span]).encode()
        ).hexdigest()
        for i in range(len(shared) - span + 1)
    }
    selected_shared = {d for d in shared_digs if d.startswith("0")}
    assert selected_shared, "fixture must select at least one shared window"
    for doc in ("x", "y"):
        assert selected_shared <= out[doc]
        assert not (shared_digs - selected_shared) & out[doc]


def test_span_digests_rejects_bad_selectivity(spark):
    from pyspark.sql import functions as F

    from tersets_spark.seqops import span_digests

    with pytest.raises(ValueError):
        span_digests(F.col("t"), F.col("n"), 4, -1)
    with pytest.raises(ValueError):
        span_digests(F.col("t"), F.col("n"), 4, 9)


# ---------------------------------------------------------------------------
# source divergence (exact total-variation distance)
# ---------------------------------------------------------------------------


def test_source_divergence_matches_fraction_replica(spark):
    """tv_num is the exact integer numerator and tv_dist equals the exact
    Fraction TV distance to double rounding."""
    from fractions import Fraction

    from tersets_spark.seqops import source_divergence

    rows = [
        ("a", [1, 1, 2, 3], "s0"),
        ("b", [1, 2, 2, 2, 4], "s0"),
        ("c", [5, 5, 5, 5, 1], "s1"),
        ("d", [1, 2, 3, 4, 5, 6], "s1"),
        ("e", [7], "s2"),  # source with a private token
    ]
    df = spark.createDataFrame(
        [(d, t, len(t), s) for d, t, s in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {r["source"]: r.asDict() for r in source_divergence(df).collect()}

    from collections import Counter

    corpus = Counter()
    per_src: dict[str, Counter] = {}
    for _, toks, src in rows:
        per_src.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    n = sum(corpus.values())
    for src, cnt in per_src.items():
        ns = sum(cnt.values())
        tv_num = sum(abs(cnt.get(t, 0) * n - ct * ns) for t, ct in corpus.items())
        tv = Fraction(tv_num, 2 * ns * n)
        assert got[src]["toks"] == ns
        assert got[src]["vocab"] == len(cnt)
        assert got[src]["corpus_toks"] == n
        assert got[src]["tv_num"] == float(tv_num)
        assert abs(got[src]["tv_dist"] - float(tv)) < 1e-15
        assert 0.0 <= got[src]["tv_dist"] <= 1.0
    # sanity: s2 (disjoint-ish distribution) diverges more than s0
    assert got["s2"]["tv_dist"] > got["s0"]["tv_dist"]


def test_source_divergence_identical_sources_have_zero_tv(spark):
    from tersets_spark.seqops import source_divergence

    rows = [("a", [1, 2, 3], "s0"), ("b", [1, 2, 3], "s1")]
    df = spark.createDataFrame(
        [(d, t, len(t), s) for d, t, s in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    for r in source_divergence(df).collect():
        assert r["tv_num"] == 0.0 and r["tv_dist"] == 0.0

"""Context packing + token stats: known-answer tests against a plain-Python
reference packer, plus invariants that pin the two-level prefix sum (small
bucket_docs forces the multi-bucket path)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _mk_seq(spark, n_toks, seed=11):
    """Tiny sequences df with the production schema and doc_%012d ids."""
    rng = np.random.default_rng(seed)
    rows = []
    for i, n in enumerate(n_toks):
        rows.append(
            (
                f"doc_{i:012d}",
                rng.integers(0, 100, n).astype(int).tolist(),
                int(n),
                f"src_{i % 3:02d}",
            )
        )
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def _pack_py(docs, ctx, sep):
    """Reference: concatenate in doc order (+sep after each), chunk by ctx."""
    stream, starts = [], []
    for toks in docs:
        starts.append(len(stream))
        stream.extend(toks)
        if sep is not None:
            stream.append(sep)
    blocks = {}
    for b in range(0, (len(stream) + ctx - 1) // ctx):
        blocks[b] = stream[b * ctx : (b + 1) * ctx]
    n_starts = {b: 0 for b in blocks}
    n_docs = {b: 0 for b in blocks}
    cost = [(s, s + len(d) + (1 if sep is not None else 0)) for s, d in zip(starts, docs)]
    for s, e in cost:
        for b in range(s // ctx, (e - 1) // ctx + 1):
            n_docs[b] += 1
        n_starts[s // ctx] += 1
    return blocks, n_docs, n_starts


@pytest.mark.parametrize("sep", [None, 99])
@pytest.mark.parametrize("bucket_docs", [65536, 2])
def test_pack_matches_python_reference(spark, sep, bucket_docs):
    from tersets_spark.seqops import pack_sequences

    n_toks = [5, 13, 1, 8, 25, 3, 7]
    seq = _mk_seq(spark, n_toks)
    docs = [r["tokens"] for r in seq.orderBy("doc_id").collect()]
    ctx = 8
    got = {
        r["block_id"]: r
        for r in pack_sequences(
            seq, ctx=ctx, sep_token=sep, bucket_docs=bucket_docs
        ).collect()
    }
    blocks, n_docs, n_starts = _pack_py(docs, ctx, sep)
    assert set(got) == set(blocks)
    for b in blocks:
        assert got[b]["tokens"] == blocks[b], f"block {b}"
        assert got[b]["n_tokens"] == len(blocks[b])
        assert got[b]["n_docs"] == n_docs[b]
        assert got[b]["n_starts"] == n_starts[b]


def test_pack_block_invariants(spark):
    from tersets_spark.seqops import pack_sequences

    rng = np.random.default_rng(5)
    n_toks = rng.integers(1, 40, 60).tolist()
    seq = _mk_seq(spark, n_toks, seed=6)
    ctx = 16
    out = pack_sequences(seq, ctx=ctx, sep_token=0, bucket_docs=4).collect()
    total = sum(n + 1 for n in n_toks)
    assert sum(r["n_tokens"] for r in out) == total
    last = max(r["block_id"] for r in out)
    for r in out:
        assert r["n_tokens"] == (ctx if r["block_id"] != last else total - last * ctx)
    # reassembled stream == concatenation of docs (+sep) in id order
    stream = []
    for r in sorted(out, key=lambda r: r["block_id"]):
        stream.extend(r["tokens"])
    ref = []
    for row in seq.orderBy("doc_id").collect():
        ref.extend(row["tokens"])
        ref.append(0)
    assert stream == ref
    assert sum(r["n_starts"] for r in out) == len(n_toks)


def test_sequence_offsets_two_level_equals_naive(spark):
    from tersets_spark.seqops import sequence_offsets

    seq = _mk_seq(spark, [3, 10, 1, 7, 2, 9, 4], seed=9)
    naive = {}
    acc = 0
    for r in seq.orderBy("doc_id").collect():
        naive[r["doc_id"]] = acc
        acc += r["n_tok"]
    for bucket_docs in (1, 2, 65536):
        got = {
            r["doc_id"]: r["pack_start"]
            for r in sequence_offsets(
                seq, F.col("n_tok"), bucket_docs=bucket_docs
            ).collect()
        }
        assert got == naive, f"bucket_docs={bucket_docs}"


def _hash_keyed_seq(spark, n_docs=80, seed=13):
    """Sequences whose order keys are HASH-SHAPED (sparse 48-bit values):
    the DIV-bucketing fast path would create ~one bucket per doc."""
    import hashlib

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        key = int(hashlib.md5(f"k{i}".encode()).hexdigest()[:12], 16)  # 48-bit
        n = int(rng.integers(1, 30))
        rows.append(
            (f"doc_{i:012d}", key, rng.integers(0, 100, n).astype(int).tolist(),
             n, f"src_{i % 3:02d}")
        )
    return spark.createDataFrame(
        rows, "doc_id string, sort_key long, tokens array<int>, n_tok int, source string"
    )


def test_sequence_offsets_sparse_keys_match_duckdb_cumsum(spark):
    """Hash-shaped keys: the auto dense-probe must fall back to the rank
    pre-pass and still produce the exact exclusive running sum — replayed
    by a DuckDB window cumsum over the same (key, cost) pairs."""
    import duckdb

    from tersets_spark.seqops import sequence_offsets

    seq = _hash_keyed_seq(spark)
    pdf = seq.select("doc_id", "sort_key", "n_tok").toPandas()
    oracle = duckdb.sql(
        """
        SELECT doc_id,
               COALESCE(SUM(n_tok) OVER (
                   ORDER BY sort_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pack_start
        FROM pdf
        """
    ).df()
    want = dict(zip(oracle["doc_id"], oracle["pack_start"].astype(int)))

    # small bucket_docs: the fast path would need ~2^48/4 bucket offsets
    got_df = sequence_offsets(seq, F.col("n_tok"), order_key=F.col("sort_key"),
                              bucket_docs=4)
    got = {r["doc_id"]: r["pack_start"] for r in got_df.collect()}
    assert got == want

    # forcing the dense path off/on explicitly agrees too
    forced = sequence_offsets(seq, F.col("n_tok"), order_key=F.col("sort_key"),
                              bucket_docs=4, dense_keys=False)
    assert {r["doc_id"]: r["pack_start"] for r in forced.collect()} == want


def test_sparse_keys_duplicate_order_key_fails_fast(spark):
    """Duplicate order keys on the rank pre-pass path would cross-join in
    the rank equi-join (each duplicated doc emitted once per occurrence,
    silently duplicating tokens in the packed corpus) — the densify pass
    must raise instead."""
    import pytest as _pytest

    from tersets_spark.seqops import sequence_offsets

    seq = _hash_keyed_seq(spark, n_docs=20)
    # two docs sharing an epoch-millis-style timestamp key
    dup = seq.limit(1).withColumn("doc_id", F.lit("doc_dup_000000"))
    with _pytest.raises(Exception, match="duplicate"):
        sequence_offsets(
            seq.union(dup), F.col("n_tok"), order_key=F.col("sort_key"),
            bucket_docs=4, dense_keys=False,
        ).collect()


def test_pack_sparse_keys_matches_python_reference(spark):
    """Full pack over hash-shaped keys == the plain-Python packer run in
    key order (seq_pack_blocks' dense-key behavior is untouched — this is
    the new fallback path end-to-end)."""
    from tersets_spark.seqops import pack_sequences

    seq = _hash_keyed_seq(spark, n_docs=40, seed=21)
    docs = [r["tokens"] for r in seq.orderBy("sort_key").collect()]
    ctx = 16
    got = {
        r["block_id"]: r
        for r in pack_sequences(
            seq, ctx=ctx, sep_token=None, order_key=F.col("sort_key"), bucket_docs=4
        ).collect()
    }
    blocks, n_docs_b, n_starts = _pack_py(docs, ctx, None)
    assert set(got) == set(blocks)
    for b in blocks:
        assert got[b]["tokens"] == blocks[b], f"block {b}"
        assert got[b]["n_docs"] == n_docs_b[b]
        assert got[b]["n_starts"] == n_starts[b]


def test_dense_probe_keeps_fast_path_for_monotone_ids(spark):
    """Dense ingest ids must NOT trigger the rank pre-pass: the plan stays
    free of a second range-exchange + join (plan-shape regression)."""
    from tersets_spark.seqops import sequence_offsets

    seq = _mk_seq(spark, [3, 5, 2, 8])
    plan = sequence_offsets(seq, F.col("n_tok"))._jdf.queryExecution().optimizedPlan().toString()
    assert "_so_rank" not in plan


def test_token_stats_known_answer(spark):
    from tersets_spark.seqops import token_stats

    seq = spark.createDataFrame(
        [
            ("doc_000000000000", [1, 1, 2, 3], 4, "src_00"),
            ("doc_000000000001", [2, 2, 2, 4], 4, "src_00"),
            ("doc_000000000002", [9, 9, 8], 3, "src_01"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    rows = {(r["source"], r["rank"]): r for r in token_stats(seq, top_k=2).collect()}
    r = rows[("src_00", 1)]
    assert (r["token"], r["cnt"], r["source_tokens"], r["source_vocab"]) == (2, 4, 8, 4)
    # tie between 1 (x2) and nothing else at cnt=2 -> token 1 is rank 2
    r = rows[("src_00", 2)]
    assert (r["token"], r["cnt"]) == (1, 2)
    r = rows[("src_01", 1)]
    assert (r["token"], r["cnt"], r["source_vocab"]) == (9, 2, 2)
    assert ("src_01", 3) not in rows


def test_pack_plan_has_no_global_table_window(spark):
    """The offsets must come from the two-level prefix sum: every Window in
    the optimized plan is either partitioned by the bucket key (bounded at
    bucket_docs rows) or runs over the tiny per-bucket totals — never an
    unpartitioned window over the document table; and the bucket offsets
    come back via a broadcast join, not a shuffle."""
    from tersets_spark.seqops import pack_sequences

    seq = _mk_seq(spark, [5, 9, 3, 7])
    plan = pack_sequences(seq, ctx=8, sep_token=0)._jdf.queryExecution().optimizedPlan().toString()
    win_specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert win_specs, "expected the two prefix-sum windows"
    unpartitioned = [ln for ln in win_specs if "_bucket#" not in ln]
    # the only _bucket-free window is the per-bucket-totals exclusive
    # prefix, which must consume the aggregated _btot column, not raw rows
    for ln in unpartitioned:
        assert "_btot#" in ln, f"global window over the document table: {ln}"
    assert "ResolvedHint" in plan or "broadcast" in plan.lower()

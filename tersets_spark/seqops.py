"""Sequence-level training-data operators over the primary table
(doc_id, tokens: array<int32>, n_tok, source) — the ops a pretraining
pipeline runs on pre-tokenized corpora (north_star input_hint), all
JVM-side (no Python in any plan here).

* :func:`exact_seq_dedup_stats` — exact duplicate SEQUENCES (token-array
  equality) per source, via a canonical digest, never a shuffle of the
  raw token payload.
* :func:`repetition_stats` — repetition/diversity quality metrics: the
  max same-token run is computed with a single JVM ``aggregate`` fold
  over the array (struct state), not posexplode + window — O(n) per row,
  zero shuffle, zero Python.
* :func:`ngram_contamination` — benchmark decontamination: flag sequences
  sharing any token ``n``-gram with a held-out source, gram join against
  the broadcast benchmark gram set.

Scale notes (10^12 sequences): dedup groups by a 16-byte digest + length
(the token arrays themselves never shuffle); repetition metrics are
map-only; contamination joins grams against a broadcast benchmark set —
if the benchmark outgrows broadcast, the same plan works as a shuffled
semi-join on the gram digest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seq_digest(tokens: Column) -> Column:
    """Canonical 128-bit digest of a token array: md5 of the comma-joined
    decimal rendering. Engine-portable (DuckDB renders the same string),
    and 16 bytes shuffle instead of the token payload. Collisions are
    2^-64-scale; an exact verify join can be added where that matters."""
    return F.md5(F.concat_ws(",", tokens.cast("array<string>")))


def exact_seq_dedup_stats(seq: DataFrame) -> DataFrame:
    """Per-source exact-duplicate-sequence stats.

    Output: (source, docs, distinct_seqs, dup_docs) — dup_docs = rows whose
    token array equals an earlier row's. Two-stage: group by (source,
    digest, n_tok) then combine — the wide token column is dropped before
    the shuffle."""
    groups = (
        seq.select("source", F.col("n_tok"), _seq_digest(F.col("tokens")).alias("dig"))
        .groupBy("source", "dig", "n_tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return groups.groupBy("source").agg(
        F.sum("n").cast("long").alias("docs"),
        F.count(F.lit(1)).cast("long").alias("distinct_seqs"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("dup_docs"),
    )


def max_run_col(tokens: Column) -> Column:
    """Longest run of one repeated token, as a single JVM ``aggregate``
    fold: state = (prev_token, current_run, best_run). O(n) per row inside
    codegen — the posexplode+window formulation would shuffle every token."""
    init = F.struct(
        F.lit(None).cast("int").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(tokens, init, step, lambda acc: acc["best"])


def repetition_stats(seq: DataFrame, run_threshold: int = 16) -> DataFrame:
    """Per-source repetition/diversity metrics (exact integers only).

    Output: (source, docs, sum_n_tok, sum_distinct, max_run,
    repetitive_docs) — repetitive_docs counts sequences whose longest
    same-token run reaches ``run_threshold`` (boilerplate/looping text in
    token space). Diversity ratio = sum_distinct / sum_n_tok is left to the
    reader so the row stays integer-exact."""
    per_doc = seq.select(
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct"),
        max_run_col(F.col("tokens")).alias("max_run"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("n_tok").cast("long").alias("sum_n_tok"),
        F.sum("n_distinct").cast("long").alias("sum_distinct"),
        F.max("max_run").cast("long").alias("max_run"),
        F.sum((F.col("max_run") >= run_threshold).cast("long")).cast("long").alias(
            "repetitive_docs"
        ),
    )


def ngram_contamination(
    seq: DataFrame, benchmark_source: str, n: int = 13
) -> DataFrame:
    """Benchmark decontamination sweep: per source, how many sequences share
    at least one token ``n``-gram with ``benchmark_source`` (the held-out
    set). The standard pretraining hygiene check (13-gram overlap).

    Plan: grams are built JVM-side (transform over an index sequence →
    slice), the benchmark's distinct gram set is broadcast, and candidates
    are counted with a semi-join — no Python, one small shuffle for the
    final per-source count."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.col("n_tok") - n + 1, F.lit(0))),
        lambda i: F.slice(F.col("tokens"), i, n),
    )
    with_grams = seq.select("doc_id", "source", F.explode(grams).alias("gram"))
    bench = F.broadcast(
        with_grams.filter(F.col("source") == benchmark_source).select("gram").distinct()
    )
    contaminated = (
        with_grams.filter(F.col("source") != benchmark_source)
        .join(bench, "gram", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    totals = seq.filter(F.col("source") != benchmark_source).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs")
    )
    hits = contaminated.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("contaminated_docs")
    )
    return (
        totals.join(hits, "source", "left")
        .select(
            "source",
            "docs",
            F.coalesce("contaminated_docs", F.lit(0)).cast("long").alias("contaminated_docs"),
        )
    )

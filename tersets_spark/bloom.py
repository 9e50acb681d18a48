"""Deterministic, re-aggregable Bloom membership sketch over tiers —
serve-time "could window W of source S contain value v?" with NO false
negatives, from a bounded per-(source, bucket) bit table a SQL oracle can
replay bit-for-bit.

Bloom, "Space/time trade-offs in hash coding with allowable errors",
CACM 1970.

Reference parity note: the reference engine (TerseTS) has no membership
sketch — like sketch.py (HDR percentiles) and hll.py (distinct), this
extends the tier cascade the way TimescaleDB extensions add approximate
continuous aggregates. The training-pipeline use is decontamination /
targeted-audit ROUTING at corpus scale: "which (source, window)
partitions might contain this token (or gram-hash)" answers from a tier
whose size is O(windows), not O(tokens), so only the maybe-windows are
rescanned — the same reason Iceberg keeps per-file Bloom filters, lifted
to retention windows.

Why not Parquet's built-in Bloom filters or a JVM library sketch: their
hash functions (xxHash/Murmur) are not reproducible in a SQL oracle, so
results could only ever be rows-only-checked. Everything here derives
from ``md5`` (byte-identical in Spark and DuckDB) and integer ops:

* ``K`` = 4 bit positions per value, each 8 hex digits (32 bits) of the
  md5 of the value's string form, reduced ``% M`` — with 32-bit slices
  the modulo bias is ~1 part in 2^32/M (~350k), so the false-positive
  formula below holds to well under a percent (a 16-bit slice would
  skew low positions by 20%);
* the filter is ``W`` 48-bit words per key — ``(keys..., widx, word)``
  rows, at most ``W`` per key. 48 bits per word keeps every
  ``shiftleft`` result strictly positive in both engines (no two's-
  complement edge at bit 63, same trick as hll.py's 2^49 harmonic);
* merge = ``bit_or`` — associative/commutative/idempotent, so per-tier
  word tables re-aggregate to coarser keys/tiers EXACTLY, the same
  combine contract as the sum/cnt/min/max tier columns (rollup.py).
  Upper tiers densify (more set bits -> higher false-positive rate),
  which is the correct semantics: a day-window "maybe" routes the
  consumer to the hour tier below, then 1m, then the raw partition.

False-positive rate at fill n distinct values per key:
``(1 - exp(-K*n/M))^K`` — M = 12288 bits gives ~0.6% at n = 1000 and
~28% at n = 5000; size W/K per use case. False negatives are impossible
(every insert ORs its bits in; probes check all K).

Plan shape: one posexplode of K positions per value -> one hash
aggregate (map-side partial ``bit_or`` bounds every shuffle at W rows
per key). JVM-only expressions throughout; no Python in any path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the portable instr-based hex-digit decoder is shared with the HLL sketch
from .hll import _hex_val

#: words per key; total filter size M = W * WORD_BITS bits.
W = 256
#: bits used per 64-bit word (<= 48 keeps every shifted bit positive —
#: portable two's-complement-free bit_or in Spark AND DuckDB).
WORD_BITS = 48
M = W * WORD_BITS
#: hash functions (md5 hex slices) per value.
K = 4

#: hex digits per hash slice; 8 digits = 32 bits, so the % M reduction's
#: bias is negligible (see module docstring). K * SLICE_HEX = 32 uses the
#: whole md5.
SLICE_HEX = 8


def _hexn(h: Column, start: int, n: int = SLICE_HEX) -> Column:
    """Integer value of ``n`` hex digits of ``h`` at 1-based ``start``."""
    v = _hex_val(F.substring(h, start, 1))
    for i in range(1, n):
        v = v * 16 + _hex_val(F.substring(h, start + i, 1))
    return v


def bloom_positions(value: Column) -> list[Column]:
    """K bit positions (0..M-1) for a value — 8-hex-digit md5 slices % M."""
    h = F.md5(value.cast("string").cast("binary"))
    return [_hexn(h, 1 + SLICE_HEX * j) % F.lit(M) for j in range(K)]


def bloom_positions_py(value) -> list[int]:
    """Python twin of :func:`bloom_positions` (tests + driver-side probes)."""
    h = hashlib.md5(str(value).encode()).hexdigest()
    return [
        int(h[SLICE_HEX * j : SLICE_HEX * (j + 1)], 16) % M for j in range(K)
    ]


def bloom_words(
    df: DataFrame, keys: list[str], value_col: str, dict_hash: bool = False
) -> DataFrame:
    """Bloom word table ``(keys..., widx, word)`` — at most W rows per key.

    ``dict_hash=True`` is the bounded-domain fast path (token ids, same
    trade-off as hll.hll_registers): compute the K positions only for the
    DISTINCT values and broadcast-join them back — an int-key hash probe
    per point instead of an md5 + 16 substring/instr chain per point.
    Identical output (pinned by tests); leave False when the value domain
    is unbounded (the position dictionary must fit in a broadcast).

    NULL values are ignored on both paths (a NULL is not a member of any
    set; without the filter its positions would be NULL and the explode
    would emit rows that bit_or as NULL words — the dict path's inner
    join drops them the same way).

    A Bloom filter is a SET: duplicate (key, value) pairs OR the same
    bits, so the build first reduces to distinct pairs (one narrow
    partial-aggregated shuffle) before the Kx position explode feeds the
    word aggregation — on token streams where a window revisits values
    heavily this shrinks the heavy aggregation's input by the repeat
    factor. Output is bit-identical with or without the distinct.
    """
    df = df.where(F.col(value_col).isNotNull()).select(*keys, value_col).distinct()
    if dict_hash:
        vals = df.select(F.col(value_col).alias("_v")).distinct()
        pos = F.explode(F.array(*bloom_positions(F.col("_v")))).alias("_pos")
        lut = vals.select("_v", pos)
        exploded = df.join(
            F.broadcast(lut), F.col(value_col) == F.col("_v")
        ).select(*keys, "_pos")
    else:
        pos = F.explode(F.array(*bloom_positions(F.col(value_col)))).alias("_pos")
        exploded = df.select(*keys, pos)
    return exploded.groupBy(
        *keys, (F.col("_pos") / WORD_BITS).cast("long").alias("widx")
    ).agg(
        F.bit_or(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("_pos") % WORD_BITS).cast("int"),
            )
        ).alias("word")
    )


def merge_words(words: DataFrame, keys: list[str]) -> DataFrame:
    """Merge word tables down to coarser keys (bit_or is re-aggregable)."""
    return words.groupBy(*keys, "widx").agg(F.bit_or("word").alias("word"))


def _probe_masks(probes: DataFrame, probe_col: str) -> DataFrame:
    """(probe, widx, mask) rows — a probe's K positions grouped per word
    (two hash slices can land in one word; the mask ORs them so the probe
    checks `(word & mask) == mask` once per distinct word)."""
    pos = F.explode(F.array(*bloom_positions(F.col(probe_col)))).alias("_pos")
    return (
        probes.select(F.col(probe_col).alias("probe"), pos)
        .groupBy("probe", (F.col("_pos") / WORD_BITS).cast("long").alias("widx"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("_pos") % WORD_BITS).cast("int"),
                )
            ).alias("mask")
        )
    )


def probe_membership(
    words: DataFrame, keys: list[str], probes: DataFrame, probe_col: str = "probe"
) -> DataFrame:
    """(keys..., probe, maybe) — Bloom membership of each probe value in
    each key's filter. ``maybe`` is False ONLY when the value definitely
    never appeared (no false negatives).

    Plan: the probe set is small by contract (a decontamination list, an
    audit batch) — its (probe, widx, mask) rows broadcast; the key
    universe comes from the word table itself (bounded: it is the
    GROUP BY result). A word row missing for some (key, widx) means those
    bits are zero, hence ``maybe = false`` — the left join's NULL word
    coalesces to 0 so the mask check fails, never silently passes.

    Duplicate (keys, widx) rows — APPEND-committed delta filters from
    :func:`tersets_spark.jobs.ingest_append` or streamed partials — are
    bit_or-merged first: probing each partial word alone would let a bit
    set only in the other partial fail the mask check, i.e. a FALSE
    NEGATIVE, the one error class a Bloom filter must never make. The
    merge is a groupBy over the bounded word table (identity when keys
    are already unique)."""
    words = merge_words(words, keys)
    masks = _probe_masks(probes, probe_col)
    grid = words.select(*keys).distinct().crossJoin(F.broadcast(masks))
    j = grid.join(words, [*keys, "widx"], "left")
    hit = F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) == F.col("mask")
    return j.groupBy(*keys, "probe").agg(F.bool_and(hit).alias("maybe"))

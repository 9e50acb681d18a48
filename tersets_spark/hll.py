"""Deterministic, re-aggregable HyperLogLog distinct sketch over tiers
(Spark ``approx_count_distinct`` analog that a SQL oracle can replay).

Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007.

Reference parity note: the reference engine (TerseTS) has no distinct
sketch — like sketch.py this extends the tier cascade the way TimescaleDB's
``hyperloglog``/``approx_count_distinct`` extends continuous aggregates.

Why not ``F.approx_count_distinct``: its HLL++ registers hash with a JVM
Murmur3 variant no SQL engine reproduces, so results can only ever be
rows-only-checked. This sketch derives everything from ``md5`` (available
and byte-identical in Spark and DuckDB) and integer/string ops:

* bucket (m = 256) = first two hex digits;
* rho = leading zero BITS of the next 48 hash bits + 1 (string-stripped
  leading '0' hex digits * 4, plus ``4 - bit_length`` of the first
  non-zero digit — no float anywhere);
* register table = ``(keys..., bucket, rho=max)`` — max is re-aggregable,
  so per-tier registers merge to coarser keys/tiers exactly, the same
  combine contract as the sum/cnt/min/max tier columns (rollup.py);
* the summary keeps the harmonic sum as the EXACT INTEGER
  ``sum(2^(49-rho))`` (empty buckets contribute 2^49), and the raw HLL
  estimate ``alpha_m * m^2 / harmonic`` is derived from it with only
  IEEE-exactly-rounded ops (* and /), so even the float column is
  bit-identical across engines.

The raw estimate (no small-range linear-counting correction — that needs
``ln``, whose last-ulp rounding is libm-specific) has stddev ~1.04/sqrt(m)
= ~6.5% at m = 256; tests pin <= 3 sigma. Plan shape: one hash aggregate
(map-side partial max bounds every shuffle at m rows per key), then a tiny
summary aggregate. JVM-only expressions throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^M_BITS buckets; raw-estimate stddev ~= 1.04 / sqrt(2^M_BITS).
M_BITS = 8
M = 1 << M_BITS
#: hex digits of the md5 tail used for rho (48 bits; rho in 1..49).
RHO_HEX = 12
#: harmonic terms are stored scaled by 2^49 so they are exact integers.
RHO_SCALE = 1 << (4 * RHO_HEX + 1)

_HEX = "0123456789abcdef"


def _hex_val(c: Column) -> Column:
    """0..15 value of one lowercase hex-digit column (portable: instr)."""
    return (F.call_function("instr", F.lit(_HEX), c) - 1).cast("long")


def hll_bucket_rho(value: Column) -> tuple[Column, Column]:
    """(bucket, rho) columns for a value, from md5 of its string form."""
    h = F.md5(value.cast("string").cast("binary"))
    bucket = _hex_val(F.substring(h, 1, 1)) * 16 + _hex_val(F.substring(h, 2, 1))
    tail = F.substring(h, 3, RHO_HEX)
    stripped = F.regexp_replace(tail, "^0+", "")
    zero_bits = (F.length(tail) - F.length(stripped)) * 4
    first = _hex_val(F.substring(stripped, 1, 1))
    within = F.lit(4) - F.length(F.bin(first))
    rho = (
        F.when(F.length(stripped) == 0, F.lit(4 * RHO_HEX + 1))
        .otherwise(zero_bits + within + 1)
        .cast("long")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame, keys: list[str], value_col: str, dict_hash: bool = False
) -> DataFrame:
    """Register table ``(keys..., bucket, rho)`` — at most m rows per key.

    ``dict_hash=True`` is the bounded-domain fast path (token ids): hash only
    the DISTINCT values (a vocab-sized dictionary, built with one map-side-
    bounded distinct) and broadcast-join (bucket, rho) back onto the points —
    an int-key hash probe per point instead of a string-cast + md5 + substring
    chain per point. Identical output (pinned by tests); leave False when the
    value domain is unbounded (the dictionary must fit in a broadcast).

    NULL values are ignored on BOTH paths (SQL COUNT DISTINCT semantics) —
    without the explicit filter the default path would emit a NULL register
    row that ``hll_summary`` counts in ``_present``, silently deflating
    ``empty_buckets``, while the dict path's inner join drops the row.
    """
    df = df.where(F.col(value_col).isNotNull())
    if dict_hash:
        vals = df.select(F.col(value_col).alias("_v")).distinct()
        b, r = hll_bucket_rho(F.col("_v"))
        lut = vals.select("_v", b.alias("bucket"), r.alias("_rho"))
        joined = df.join(F.broadcast(lut), F.col(value_col) == F.col("_v"))
        return joined.groupBy(*keys, "bucket").agg(F.max("_rho").alias("rho"))
    bucket, rho = hll_bucket_rho(F.col(value_col))
    return (
        df.groupBy(*keys, bucket.alias("bucket"))
        .agg(F.max(rho).alias("rho"))
    )


def merge_registers(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Merge register tables down to coarser keys (max is re-aggregable)."""
    return registers.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def hll_summary(registers: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., empty_buckets, harmonic_scaled, estimate) per key.

    ``harmonic_scaled`` = exact integer ``sum_buckets 2^(49-rho)`` with the
    ``m - |present|`` empty buckets contributing 2^49 each. ``estimate`` is
    the raw HLL formula evaluated with * and / only, in a FIXED operation
    order mirrored verbatim by the SQL oracle — bit-identical doubles.
    """
    present = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                (F.lit(4 * RHO_HEX + 1) - F.col("rho")).cast("int"),
            )
        ).alias("_h_present"),
    )
    empty = (F.lit(M) - F.col("_present")).cast("long")
    harmonic = (F.col("_h_present") + empty * F.lit(RHO_SCALE)).cast("long")
    # alpha_256 * m * m * 2^49 / harmonic_scaled — keep this exact op order
    # in any oracle: every step is an IEEE exactly-rounded * or /.
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(M)))
    est = (
        alpha * F.lit(float(M)) * F.lit(float(M)) * F.lit(float(RHO_SCALE))
        / harmonic.cast("double")
    )
    return present.select(
        *keys,
        empty.alias("empty_buckets"),
        harmonic.alias("harmonic_scaled"),
        est.alias("estimate"),
    )

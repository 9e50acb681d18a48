"""Re-aggregable percentile sketch over token tiers (TimescaleDB
``percentile_agg``-style continuous-aggregate companion).

The sketch is an HDR-histogram-style log-bucket count table: each
non-negative integer value lands in a bucket keyed by its bit length and
the top ``sub_bits`` bits. With ``sub_bits = 5`` the bucket's value span
is <= 2^-5 of its magnitude, so any percentile estimate read off the
sketch has <= ~3.1% relative error — while the sketch itself is at most
``32 * 2^sub_bits`` rows per key regardless of how many points it absorbs.

Design constraints (why bit-length, not log):

* **Integer-exact and engine-portable.** The bucket id is computed from
  ``length(bin(v))`` plus integer shifts — available, and bit-identical,
  in both Spark SQL and DuckDB. A ``floor(log2(v))`` formulation would
  hinge on each engine's libm rounding (Spark computes ``log2`` as
  ``log(x)/log(2)``), which breaks hash-matched oracles.
* **Re-aggregable.** A sketch is plain rows ``(keys..., bucket_id, cnt)``;
  merging tiers = ``groupBy(keys, bucket_id).sum(cnt)`` — the same
  exact-integer combine contract as the sum/cnt/min/max tier columns
  (rollup.py), so sketches cascade raw -> 1m -> 1h -> 1d losslessly
  (tests/test_sketch.py pins merge-vs-direct equality).
* **JVM-only plan.** Bucketing is ``bin``/``length``/``shiftrightunsigned``
  column expressions; building a sketch is one hash aggregate; percentile
  extraction is one window cumsum over the (tiny) sketch. No Python in
  the data path, whole-stage codegen throughout.

Reference parity note: the reference engine (TerseTS) has no sketch
operator — this extends the tier cascade the way TimescaleDB's
``percentile_agg``/UDDSketch extends continuous aggregates (Masson,
Rim & Lee, "DDSketch", VLDB 2019 is the log-bucket ancestor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: top bits kept per bucket; relative value error <= 2^-SUB_BITS.
SUB_BITS = 5


def hdr_bucket(value: Column, sub_bits: int = SUB_BITS) -> Column:
    """Monotone integer bucket id for a non-negative integer column.

    ``bucket_id = bitlen * 2^sub_bits + (v >> max(bitlen - sub_bits, 0))``
    where ``bitlen = length(bin(v))`` (so v=0 -> bitlen 1, sub 0). Ids are
    strictly increasing in the bucket's lower bound, so ordering by id is
    ordering by value range. Pure JVM expressions.
    """
    v = value.cast("long")
    # fail fast on negatives (bin() of a negative long is its 64-bit two's
    # complement in Spark but engine-specific elsewhere — a silent pass
    # would mis-bucket AND break oracle parity) and on NULLs (callers like
    # sketch() filter them out first; a bare NULL reaching this expression
    # is a caller bug, not data to swallow)
    v = F.when(v >= 0, v).otherwise(
        F.raise_error("hdr_bucket: negative or NULL value (domain is v >= 0)")
    )
    bitlen = F.length(F.bin(v)).cast("long")
    shift = F.greatest(bitlen - F.lit(sub_bits), F.lit(0)).cast("int")
    # call_function: the Python shiftrightunsigned wrapper only takes an int
    # literal for numBits; the SQL builtin itself accepts a column.
    sub = F.call_function("shiftrightunsigned", v, shift)
    return (bitlen * F.lit(1 << sub_bits) + sub).cast("long")


def bucket_lower(bucket_id: Column, sub_bits: int = SUB_BITS) -> Column:
    """Inclusive lower bound of a bucket (the sketch's value estimate)."""
    bitlen = F.shiftrightunsigned(bucket_id, sub_bits)
    sub = bucket_id.bitwiseAND(F.lit((1 << sub_bits) - 1))
    shift = F.greatest(bitlen - F.lit(sub_bits), F.lit(0)).cast("int")
    return F.call_function("shiftleft", sub, shift).cast("long")


def sketch(
    df: DataFrame, keys: list[str], value_col: str, sub_bits: int = SUB_BITS
) -> DataFrame:
    """Build a sketch: one hash-aggregate pass over the points.

    Returns ``(keys..., bucket_id, cnt)`` — at most ``32 * 2^sub_bits``
    rows per key. Values must be non-negative integers (token ids are);
    NULL values are ignored (SQL aggregate semantics), negatives fail fast.
    """
    pts = df.where(F.col(value_col).isNotNull())
    return (
        pts.groupBy(*keys, hdr_bucket(F.col(value_col), sub_bits).alias("bucket_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_sketch(sketch_df: DataFrame, keys: list[str]) -> DataFrame:
    """Merge sketches down to coarser keys (exact integer combine)."""
    return sketch_df.groupBy(*keys, "bucket_id").agg(F.sum("cnt").alias("cnt"))


def percentiles(
    sketch_df: DataFrame,
    keys: list[str],
    pcts: list[int],
    sub_bits: int = SUB_BITS,
) -> DataFrame:
    """Read percentile estimates off a sketch.

    For each integer percent ``p`` the estimate is the lower bound of the
    first bucket (in id order) whose cumulative count reaches ``p%`` of the
    total — the comparison is ``100 * cum >= p * total`` in exact integer
    arithmetic, so Spark and any SQL oracle agree bit-for-bit. One window
    over the sketch (tiny: bounded rows per key), then a min-aggregate.
    """
    w_cum = Window.partitionBy(*keys).orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy(*keys)
    cum = sketch_df.select(
        *keys,
        "bucket_id",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    pct_col = F.explode(F.array(*[F.lit(int(p)) for p in pcts])).alias("pct")
    hits = cum.select(*keys, "bucket_id", "cum", "total", pct_col).filter(
        F.col("cum") * 100 >= F.col("pct") * F.col("total")
    )
    out = hits.groupBy(*keys, "pct").agg(F.min("bucket_id").alias("bucket_id"))
    return out.select(
        *keys, "pct", bucket_lower(F.col("bucket_id"), sub_bits).alias("estimate")
    )


def bucket_id_of(value: int, sub_bits: int = SUB_BITS) -> int:
    """Python twin of :func:`hdr_bucket` for literal split points —
    ``bitlen * 2^sub_bits + (v >> max(bitlen - sub_bits, 0))`` with
    ``bitlen = max(v.bit_length(), 1)`` (v=0 -> bitlen 1, matching
    ``length(bin(0)) = 1``). Lets callers precompute a split's bucket
    threshold driver-side and embed it as a plan literal in BOTH the
    Spark read and any SQL oracle."""
    v = int(value)
    if v < 0:
        raise ValueError("bucket_id_of: domain is v >= 0")
    bitlen = max(v.bit_length(), 1)
    return bitlen * (1 << sub_bits) + (v >> max(bitlen - sub_bits, 0))


def cdf(
    sketch_df: DataFrame,
    keys: list[str],
    splits: list[int],
    sub_bits: int = SUB_BITS,
) -> DataFrame:
    """CDF read off a sketch: for each integer split point ``s``,
    ``P(v <= s)`` at sketch resolution — the count in buckets whose id
    is at or below ``s``'s own bucket, over the total (the DDSketch CDF
    contract: exact at bucket granularity, <= 2^-sub_bits relative blur
    at the split itself; a split on a bucket boundary is exact).

    Split thresholds are precomputed driver-side (:func:`bucket_id_of`)
    and land in the plan as literals; the read is one explode of the
    |splits|-row constant array against the (bounded) sketch rows and
    one hash aggregate — ``n_le`` and ``total`` exact int64, ``cdf``
    the single division. Pure JVM.

    Output: (keys..., split, n_le, total, cdf).
    """
    if not splits:
        raise ValueError("cdf: splits must be non-empty")
    pairs = F.array(
        *[
            F.struct(
                F.lit(int(s)).cast("long").alias("split"),
                F.lit(bucket_id_of(s, sub_bits)).cast("long").alias("thr"),
            )
            for s in splits
        ]
    )
    exploded = sketch_df.select(
        *keys, "bucket_id", "cnt", F.explode(pairs).alias("_sp")
    )
    return (
        exploded.groupBy(*keys, F.col("_sp.split").alias("split"))
        .agg(
            F.sum(
                F.when(F.col("bucket_id") <= F.col("_sp.thr"), F.col("cnt"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_le"),
            F.sum("cnt").cast("long").alias("total"),
        )
        .withColumn(
            "cdf", F.col("n_le").cast("double") / F.col("total")
        )
    )


def histogram(
    sketch_df: DataFrame,
    keys: list[str],
    sub_bits: int = SUB_BITS,
) -> DataFrame:
    """Materialized value-HISTOGRAM read: each sketch bucket with its
    inclusive ``[lo, hi]`` value bounds, count, and fraction of the
    key's total — the Grafana heatmap / distribution-panel read served
    straight from the committed sketch rows (bounded:
    <= 32 * 2^sub_bits rows per key), never raw points.

    Bounds from the id alone: ``shift = max(bitlen - sub_bits, 0)``,
    ``lo = sub << shift``, ``hi = lo + 2^shift - 1`` — exact int64, the
    same arithmetic any SQL engine replays. ``frac`` is the one
    division per row.

    Output: (keys..., bucket_id, lo, hi, cnt, frac).
    """
    w_all = Window.partitionBy(*keys)
    bid = F.col("bucket_id")
    bitlen = F.shiftrightunsigned(bid, sub_bits)
    shift = F.greatest(bitlen - F.lit(sub_bits), F.lit(0)).cast("int")
    lo = bucket_lower(bid, sub_bits)
    hi = lo + F.call_function("shiftleft", F.lit(1).cast("long"), shift) - 1
    return sketch_df.select(
        *keys,
        bid.cast("long").alias("bucket_id"),
        lo.cast("long").alias("lo"),
        hi.cast("long").alias("hi"),
        F.col("cnt").cast("long").alias("cnt"),
        (
            F.col("cnt").cast("double") / F.sum("cnt").over(w_all)
        ).alias("frac"),
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``      — flagship retention-cascade query on sf0.001.
``queries()``         — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()``      — DuckDB-equivalent SQL per query (sf0.01 fixtures).

The engine's primary table (BASELINE.json input_hint) is synthesized
deterministically per scale factor by tersets_spark.tables (seed 42, cached
under /root/repo/data/); oracle SQL reads the *same* parquet file, so Spark
and DuckDB compare on identical input. All float-valued result columns are
derived from exact integer aggregates (sum/cnt) so both engines produce
bit-identical values regardless of aggregation order.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tersets_spark import Method
from tersets_spark.kernels import compress_udf, decompress_tokens_udf
from tersets_spark.rollup import TIERS, gap_fill, rollup_raw, rollup_up, with_mean
from tersets_spark.shipping import ensure_shipped
from tersets_spark.tables import ensure_sequences, sf_name_from_dir

_LOSSLESS_METHODS = [
    Method.PoorMansCompressionMidrange,
    Method.PoorMansCompressionMean,
    Method.GorillaXOR,
    Method.DeltaOfDelta,
]


def _sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)  # workers need the package regardless of driver cwd
    return spark.read.parquet(ensure_sequences(sf_name_from_dir(sf_dir)))


def _seq_path_sql() -> str:
    """Path the oracle reads — the driver compares at sf0.01."""
    return ensure_sequences("sf0.01")


def _epoch_seconds() -> F.Column:
    """TZ-independent wall-clock epoch seconds for the events NTZ timestamps.

    Matches DuckDB's floor(epoch(ts)); plain cast-to-long is banned for
    TIMESTAMP_NTZ in Spark 4 and unix_timestamp() is session-TZ-dependent.
    """
    return F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full 1m rollup (vectorized kernel) on sf0.001 sequences."""
    ensure_shipped(spark)
    seq = spark.read.parquet(ensure_sequences("sf0.001"))
    return with_mean(rollup_raw(seq, TIERS["1m"]))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = _sequences(spark, sf_dir).filter(F.col("source").isin("src_02", "src_03"))
    return with_mean(rollup_raw(seq, TIERS["1m"])).select(
        "doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last", "mean"
    )


def _q_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = _sequences(spark, sf_dir)
    m1 = rollup_raw(seq, TIERS["1m"])
    return with_mean(rollup_up(m1, TIERS["1h"])).select(
        "doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last", "mean"
    )


def _q_rollup_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = _sequences(spark, sf_dir)
    m1 = rollup_raw(seq, TIERS["1m"])
    return with_mean(rollup_up(rollup_up(m1, TIERS["1h"]), TIERS["1d"])).select(
        "doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last", "mean"
    )


def _q_roundtrip_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row token-array-equality invariant (input_hint), per codec."""
    seq = _sequences(spark, sf_dir).select("tokens")
    parts = []
    for m in _LOSSLESS_METHODS:
        rt = decompress_tokens_udf(compress_udf(m, 0.0)(F.col("tokens")))
        parts.append(
            seq.agg(
                F.lit(m.name).alias("method"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum((rt == F.col("tokens")).cast("long")).alias("n_exact"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _q_pmc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMC-MR blob structure check: segments == value runs at eb=0."""
    seq = _sequences(spark, sf_dir)
    blob = compress_udf(Method.PoorMansCompressionMidrange, 0.0)(F.col("tokens"))
    return (
        seq.select("source", "n_tok", ((F.octet_length(blob) - 1) / 16).cast("long").alias("segs"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tok").cast("long").alias("tokens"),
            F.sum("segs").alias("segments"),
        )
    )


def _q_gapfill_events_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute LOCF gap-fill of per-user mean event value (cents-exact)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    per_min = (
        ev.filter(F.col("user_id") < 40)
        .groupBy(
            "user_id",
            ((F.floor(_epoch_seconds() / 60)) * 60).alias("bucket_ts"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
             F.count(F.lit(1)).alias("cnt"))
    )
    filled = gap_fill(per_min, ["user_id"], "bucket_ts", 60, ["cents", "cnt"], strategy="locf")
    return filled.select(
        "user_id", "bucket_ts",
        F.col("cents").cast("long").alias("cents"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("gap_filled").cast("int").alias("gap_filled"),
    )


def _q_events_rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic time-bucket rollup over the events stream table."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.groupBy(
            "event_type",
            ((F.floor(_epoch_seconds() / 60)) * 60).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        )
    )


def _q_top_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-ranking demo: top-10 users by total event value."""
    from pyspark.sql import Window

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    totals = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy(F.desc("total_cents"), F.asc("user_id"))
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("rank", "user_id", "total_cents", "n_events")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m": _q_rollup_1m,
        "rollup_1h": _q_rollup_1h,
        "rollup_1d": _q_rollup_1d,
        "roundtrip_lossless": _q_roundtrip_lossless,
        "pmc_segments": _q_pmc_segments,
        "gapfill_events_locf": _q_gapfill_events_locf,
        "events_rollup_1m": _q_events_rollup_1m,
        "top_users_by_value": _q_top_users_by_value,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB, sf0.01 views pre-registered by the driver)
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    seq = _seq_path_sql()
    pts = f"""
        SELECT doc_id, source,
               ts0 + unnest(generate_series(0, n_tok - 1)) AS ts,
               unnest(tokens) AS v
        FROM read_parquet('{seq}')
    """
    rollup = """
        SELECT doc_id, source, (ts // {d}) * {d} AS bucket_ts,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(v) AS BIGINT) AS sum,
               CAST(MIN(v) AS BIGINT) AS vmin,
               CAST(MAX(v) AS BIGINT) AS vmax,
               CAST(FIRST(v ORDER BY ts) AS BIGINT) AS first,
               CAST(LAST(v ORDER BY ts) AS BIGINT) AS last,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean
        FROM pts {where} GROUP BY 1, 2, 3
    """
    methods_values = ", ".join(f"('{m.name}')" for m in _LOSSLESS_METHODS)
    return {
        "rollup_1m": f"WITH pts AS ({pts}) "
        + rollup.format(d=60, where="WHERE source IN ('src_02','src_03')"),
        "rollup_1h": f"WITH pts AS ({pts}) " + rollup.format(d=3600, where=""),
        "rollup_1d": f"WITH pts AS ({pts}) " + rollup.format(d=86400, where=""),
        # lossless round-trip: every row must round-trip exactly, per codec
        "roundtrip_lossless": f"""
            SELECT m.method,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM read_parquet('{seq}')) AS n_rows,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM read_parquet('{seq}')) AS n_exact
            FROM (VALUES {methods_values}) AS m(method)
        """,
        # PMC-MR at eb=0 emits exactly one segment per run of equal values
        "pmc_segments": f"""
            WITH pts AS ({pts}),
            runs AS (
                SELECT doc_id, source,
                       CASE WHEN v IS DISTINCT FROM LAG(v) OVER (PARTITION BY doc_id ORDER BY ts)
                            THEN 1 ELSE 0 END AS is_new_run
                FROM pts
            )
            SELECT source,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs,
                   CAST(COUNT(*) AS BIGINT) AS tokens,
                   CAST(SUM(is_new_run) AS BIGINT) AS segments
            FROM runs GROUP BY source
        """,
        "gapfill_events_locf": """
            WITH per_min AS (
                SELECT user_id,
                       (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS bucket_ts,
                       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
                       CAST(COUNT(*) AS BIGINT) AS cnt
                FROM events WHERE user_id < 40 GROUP BY 1, 2
            ),
            bounds AS (
                SELECT user_id, MIN(bucket_ts) AS t0, MAX(bucket_ts) AS t1
                FROM per_min GROUP BY user_id
            ),
            grid AS (
                SELECT user_id, unnest(generate_series(t0, t1, 60)) AS bucket_ts
                FROM bounds
            )
            SELECT g.user_id, g.bucket_ts,
                   LAST_VALUE(p.cents IGNORE NULLS)
                       OVER (PARTITION BY g.user_id ORDER BY g.bucket_ts) AS cents,
                   LAST_VALUE(p.cnt IGNORE NULLS)
                       OVER (PARTITION BY g.user_id ORDER BY g.bucket_ts) AS cnt,
                   CAST(p.cents IS NULL AS INT) AS gap_filled
            FROM grid g LEFT JOIN per_min p
              ON g.user_id = p.user_id AND g.bucket_ts = p.bucket_ts
        """,
        "events_rollup_1m": """
            SELECT event_type,
                   (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS bucket_ts,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                   CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
                   CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
            FROM events GROUP BY 1, 2
        """,
        "top_users_by_value": """
            WITH totals AS (
                SELECT user_id,
                       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                       CAST(COUNT(*) AS BIGINT) AS n_events
                FROM events GROUP BY user_id
            )
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY total_cents DESC, user_id ASC) AS INT) AS rank,
                   user_id, total_cents, n_events
            FROM totals
            ORDER BY rank LIMIT 10
        """,
    }

"""As-of and range joins — the two timeseries joins Spark lacks natively.

Both are expressed as pure DataFrame ops (no Python in the plan):

* :func:`asof_join` uses the union + running-window trick: tag both sides,
  union on the ``by`` keys, and carry the most recent right-side row
  forward with a RUNNING ``last(ignorenulls)`` frame (never the
  unbounded-FOLLOWING ``first`` frame, which Spark executes as an O(n^2)
  per-partition rescan). One shuffle on the ``by`` keys + one sort —
  the same shape a dedicated merge-asof would need, so it scales with the
  key cardinality, not pair counts.
* :func:`range_join` equi-joins on overlapping time BUCKETS first and
  filters the exact range predicate after, so Catalyst runs a shuffled
  hash join over O(matches) candidate rows instead of the
  BroadcastNestedLoopJoin a raw inequality join degenerates to.

Oracles: DuckDB's native ``ASOF JOIN`` and a plain inequality join verify
both operators row-for-row (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    tolerance: int | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the nearest preceding (``backward``) or
    following (``forward``) right row per ``by`` group on time column
    ``on`` (numeric, e.g. epoch seconds). Unmatched rows keep NULLs —
    left-join semantics, like pandas ``merge_asof``.

    ``value_cols`` are the right-side columns to attach (emitted with
    ``suffix``); ``{on}{suffix}`` carries the matched right timestamp.
    ``tolerance`` (same unit as ``on``) voids matches farther than that.

    Ties on ``on``: a right row AT the left timestamp matches (backward
    and forward), as in pandas ``merge_asof(allow_exact_matches=True)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = F.struct(F.col(on).alias("__t"), *[F.col(c) for c in value_cols])
    l_cols = left.columns
    tagged_left = left.select(
        *l_cols, F.lit(1).alias("__is_left"), F.lit(None).cast(
            right.select(payload).schema[0].dataType
        ).alias("__payload")
    )
    l_types = dict(left.dtypes)
    tagged_right = right.select(
        *[
            F.col(c) if c in by or c == on else F.lit(None).cast(l_types[c]).alias(c)
            for c in l_cols
        ],
        F.lit(0).alias("__is_left"),
        payload.alias("__payload"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts -> exact matches hit
        order = [F.col(on).asc(), F.col("__is_left").asc()]
    else:
        order = [F.col(on).desc(), F.col("__is_left").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        gap = (
            (F.col(on) - F.col("__match.__t"))
            if direction == "backward"
            else (F.col("__match.__t") - F.col(on))
        )
        matched = matched.withColumn(
            "__match", F.when(gap <= F.lit(tolerance), F.col("__match"))
        )
    out_cols = [F.col(c) for c in l_cols]
    out_cols.append(F.col("__match.__t").alias(f"{on}{suffix}"))
    out_cols += [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in value_cols]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    lower: int,
    upper: int,
    bucket: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """All (left, right) pairs within the same ``by`` group with
    ``left.on + lower <= right.on < left.on + upper`` (half-open window).

    The range predicate is rewritten as an equi-join on coarse time
    buckets (each left row explodes to the few buckets its window spans,
    ``bucket`` defaults to the window width) + an exact filter — the
    standard bucketed range-join decomposition, so the join stays a
    shuffled hash join sized by true matches, never a nested-loop scan.
    """
    if upper <= lower:
        raise ValueError("upper must be > lower")
    if bucket is None:
        bucket = upper - lower
    lo_b = F.floor((F.col(on) + F.lit(lower)) / F.lit(bucket))
    hi_b = F.floor((F.col(on) + F.lit(upper) - 1) / F.lit(bucket))
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.explode(F.sequence(lo_b, hi_b)).alias("__bucket"),
    )
    rhs = right.select(
        *[F.col(c).alias(c if c in by else f"{c}{suffix}") for c in right.columns],
        F.floor(F.col(on) / F.lit(bucket)).alias("__bucket"),
    )
    r_on = f"{on}{suffix}"
    return (
        lhs.join(rhs, on=[*by, "__bucket"])
        .filter(
            (F.col(r_on) >= F.col(on) + F.lit(lower))
            & (F.col(r_on) < F.col(on) + F.lit(upper))
        )
        .drop("__bucket")
    )

"""Deterministic, re-aggregable Count-Min frequency sketch over tiers —
serve-time "about how often did value v appear in window W of source S?"
from a bounded per-(source, bucket) counter table a SQL oracle can replay
bit-for-bit, with a hard ONE-SIDED guarantee: estimate >= true count,
always.

Cormode & Muthukrishnan, "An improved data stream summary: the count-min
sketch and its applications", J. Algorithms 55 (2005).

Reference parity note: the reference engine (TerseTS) has no frequency
sketch — like sketch.py (HDR percentiles), hll.py (distinct) and
bloom.py (membership), this extends the tier cascade the way TimescaleDB
extensions add approximate continuous aggregates. The training-pipeline
use is per-window FREQUENCY auditing at corpus scale: "how often does
this contamination gram / probe token occur in each retention window"
answers from a tier whose size is O(windows x D x WIDTH), not O(tokens),
so frequency drift, over-represented-token screens and contamination
weight estimates never rescan raw. Bloom answers "could it be there"
(routing); count-min answers "roughly how much" (weighting) — the two
families share the md5-position machinery.

Why not a library sketch (DataSketches, Spark's CountMinSketch): their
hash functions are not reproducible in a SQL oracle, so results could
only ever be rows-only-checked. Everything here derives from ``md5``
(byte-identical in Spark and DuckDB) and exact integer ops:

* ``D`` = 4 hash rows; row ``j``'s position is 8 hex digits (32 bits) of
  the md5 of the value's string form, reduced ``% WIDTH`` — the same
  slicing as bloom.py (the four slices are independent, which is all
  count-min's analysis needs), with the same negligible modulo bias;
* the sketch is a ``D x WIDTH`` counter grid per key, stored sparsely as
  ``(keys..., ridx, cidx, cnt)`` rows — at most ``D * WIDTH`` per key
  (absent cells are zero), and only ``D * distinct`` before saturation;
* merge = ``sum`` per cell — associative/commutative, so per-tier
  counter tables re-aggregate to coarser keys/tiers EXACTLY, the same
  combine contract as the core tiers' sum/cnt columns (rollup.py). An
  upper tier's estimate equals the estimate the sketch of the union
  would give: count-min is closed under addition.

Guarantees (exact integer arithmetic, no probabilistic caveat on the
first): ``estimate(v) >= true(v)`` always — every occurrence increments
all D of its cells, and ``min`` over D cells can only be inflated by
collisions, never deflated. Overestimate: ``estimate(v) <= true(v) +
2N/WIDTH`` with probability ``1 - (1/2)^D`` per the standard Markov
argument (N = total insertions under the key). WIDTH = 512, D = 4 puts
the typical overshoot well under 0.4% of a window's token count.

Plan shape: one per-(key, value) pre-aggregation (narrow shuffle bounded
by per-window vocab — occurrences collapse to weighted distinct pairs
BEFORE the D-way explode), then one hash aggregate whose map-side
partial ``sum`` bounds every shuffle at ``D * WIDTH`` rows per key.
JVM-only expressions throughout; no Python in any path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 hex-slice machinery shared with the Bloom family
from .bloom import SLICE_HEX, _hexn

#: hash rows per sketch.
D = 4
#: counters per row; estimate error ~ 2N/WIDTH at confidence 1-2^-D.
WIDTH = 512


def cms_positions(value: Column) -> list[Column]:
    """D column positions (0..WIDTH-1) for a value — row j uses hex
    digits [8j, 8j+8) of md5(value), reduced % WIDTH (bloom.py slicing)."""
    h = F.md5(value.cast("string").cast("binary"))
    return [_hexn(h, 1 + SLICE_HEX * j) % F.lit(WIDTH) for j in range(D)]


def cms_positions_py(value) -> list[int]:
    """Python twin of :func:`cms_positions` (tests + kernel LUT)."""
    h = hashlib.md5(str(value).encode()).hexdigest()
    return [
        int(h[SLICE_HEX * j : SLICE_HEX * (j + 1)], 16) % WIDTH for j in range(D)
    ]


def cms_counters(
    df: DataFrame, keys: list[str], value_col: str, dict_hash: bool = False
) -> DataFrame:
    """Count-min counter table ``(keys..., ridx, cidx, cnt)`` — at most
    ``D * WIDTH`` rows per key; ``cnt`` sums the OCCURRENCES of every
    value hashing into the cell.

    The build first collapses occurrences to weighted distinct
    ``(keys, value) -> cnt`` pairs (one narrow partial-aggregated
    shuffle — on token streams a window revisits values heavily, so the
    D-way position explode below runs on the per-window vocab, not the
    token stream), then explodes each pair's D cells with its weight and
    sums per cell.

    ``dict_hash=True`` is the bounded-domain fast path (token ids, same
    trade-off as bloom_words/hll_registers): compute the D positions only
    for the DISTINCT values and broadcast-join them back — an int-key
    hash probe per pair instead of an md5 + 32 substring/instr chain.
    Identical output (pinned by tests); leave False when the value domain
    is unbounded (the position dictionary must fit in a broadcast).

    NULL values are ignored on both paths (a NULL contributes no counts;
    the dict path's inner join drops them the same way the filter does).
    """
    pairs = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("_w"))
    )
    if dict_hash:
        vals = pairs.select(F.col(value_col).alias("_v")).distinct()
        lut = vals.select(
            "_v",
            F.posexplode(F.array(*cms_positions(F.col("_v")))).alias("ridx", "cidx"),
        )
        exploded = pairs.join(
            F.broadcast(lut), F.col(value_col) == F.col("_v")
        ).select(*keys, "ridx", "cidx", "_w")
    else:
        exploded = pairs.select(
            *keys,
            F.posexplode(F.array(*cms_positions(F.col(value_col)))).alias(
                "ridx", "cidx"
            ),
            "_w",
        )
    # ridx (posexplode ordinal) is int, cidx (md5 arithmetic) is bigint —
    # pin both to int so the tier schema is identical across the
    # expression path, the fused kernel path and the DuckDB oracle
    return exploded.groupBy(
        *keys,
        F.col("ridx").cast("int").alias("ridx"),
        F.col("cidx").cast("int").alias("cidx"),
    ).agg(F.sum("_w").alias("cnt"))


def merge_counters(counters: DataFrame, keys: list[str]) -> DataFrame:
    """Merge counter tables down to coarser keys (cell-wise sum is the
    exact re-aggregation: count-min is closed under addition)."""
    return counters.groupBy(*keys, "ridx", "cidx").agg(F.sum("cnt").alias("cnt"))


def _probe_cells(probes: DataFrame, probe_col: str) -> DataFrame:
    """(probe, ridx, cidx) rows — exactly D per probe."""
    rc = F.posexplode(F.array(*cms_positions(F.col(probe_col))))
    return probes.select(
        F.col(probe_col).alias("probe"), rc.alias("ridx", "cidx")
    ).select(
        "probe",
        F.col("ridx").cast("int").alias("ridx"),
        F.col("cidx").cast("int").alias("cidx"),
    )


def estimate_counts(
    counters: DataFrame,
    keys: list[str],
    probes: DataFrame,
    probe_col: str = "probe",
) -> DataFrame:
    """(keys..., probe, est) — count-min frequency estimate of each probe
    value under each key. ``est >= true`` always (one-sided), and
    ``est = 0`` proves absence (all D cells empty).

    Plan: the probe set is small by contract (a contamination list, an
    audit batch) — its D cells broadcast; the key universe comes from the
    counter table itself (bounded: it is the GROUP BY result). A counter
    row missing for some (key, ridx, cidx) means the cell is zero — the
    left join's NULL coalesces to 0 so the min sees it, never skips it.

    Duplicate (keys, ridx, cidx) rows — APPEND-committed delta grids from
    :func:`tersets_spark.jobs.ingest_append` or streamed partials — are
    sum-merged first: feeding partial cell counts straight into the min
    would UNDER-estimate (est < true), breaking count-min's one-sided
    guarantee. The merge is a groupBy over the bounded counter table
    (identity when keys are already unique).
    """
    counters = merge_counters(counters, keys)
    cells = _probe_cells(probes, probe_col)
    grid = counters.select(*keys).distinct().crossJoin(F.broadcast(cells))
    j = grid.join(counters, [*keys, "ridx", "cidx"], "left")
    return j.groupBy(*keys, "probe").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )

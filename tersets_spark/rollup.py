"""Rollup / downsample / gap-fill operators (Spark-first, JVM-side).

The retention cascade is raw -> 1m -> 1h -> 1d ("continuous aggregates",
north_rule). Only raw->first-tier touches Python (the vectorized kernel in
kernels.py); every higher tier is a pure DataFrame aggregation over exact
integer partial aggregates — whole-stage-codegen, order-insensitive, and
re-aggregable (sum/cnt/min/max compose; first/last carried via min/max over
(bucket_ts, value) structs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .kernels import ROLLUP_BLOCKS_SCHEMA, ROLLUP_SCHEMA, rollup_map_in_pandas
from .methods import Method

TIERS = {"1m": 60, "1h": 3600, "1d": 86400}
TIER_ORDER = ["1m", "1h", "1d"]


def rollup_raw(
    sequences: DataFrame,
    tier_seconds: int = 60,
    with_blocks: bool = False,
    block_method: Method = Method.DeltaOfDelta,
) -> DataFrame:
    """raw sequences (doc_id, tokens, n_tok, source, ts0) -> first-tier buckets."""
    from .kernels import rollup_map_in_arrow

    schema = ROLLUP_BLOCKS_SCHEMA if with_blocks else ROLLUP_SCHEMA
    cols = sequences.select("doc_id", "tokens", "source", "ts0")
    return cols.mapInArrow(
        rollup_map_in_arrow(tier_seconds, with_blocks, block_method), schema=schema
    )


def rollup_raw_from_blobs(
    raw_tier: DataFrame,
    tier_seconds: int = 60,
    with_blocks: bool = False,
    block_method: Method = Method.DeltaOfDelta,
) -> DataFrame:
    """COMMITTED raw tier (doc_id, source, ts0, n_tok, blob) -> first-tier
    buckets, decoding the codec blobs instead of rescanning the input.
    Bit-identical rows to :func:`rollup_raw` over the original sequences
    (lossless raw-tier codecs round-trip exactly); the single-source-scan
    cascade path — see kernels.rollup_blobs_map_in_arrow."""
    from .kernels import rollup_blobs_map_in_arrow

    schema = ROLLUP_BLOCKS_SCHEMA if with_blocks else ROLLUP_SCHEMA
    cols = raw_tier.select("doc_id", "blob", "source", "ts0")
    return cols.mapInArrow(
        rollup_blobs_map_in_arrow(tier_seconds, with_blocks, block_method),
        schema=schema,
    )


def rollup_up(
    tier_df: DataFrame,
    tier_seconds: int,
    with_blocks: bool = False,
    block_method: Method = Method.DeltaOfDelta,
) -> DataFrame:
    """Aggregate a finer tier into coarser buckets (exact integer combine).

    ``with_blocks=True`` additionally stores each coarse bucket's CHILD
    SUM SERIES (the finer tier's per-bucket sums, time order) as a codec
    ``block`` — the north-star "each tier stored as compressed
    Gorilla/delta blocks" applied ABOVE the finest tier: the upper tier
    remains exactly drill-down-able to its children without re-reading
    the tier below (lossless codec, exact longs). The child pairs ride
    the SAME shuffle the aggregate needs — no extra pass."""
    bucket = (F.floor(F.col("bucket_ts") / tier_seconds) * tier_seconds).cast("long")
    aggs = [
        F.sum("cnt").alias("cnt"),
        F.sum("sum").alias("sum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.min(F.struct("bucket_ts", "first")).getField("first").alias("first"),
        F.max(F.struct("bucket_ts", "last")).getField("last").alias("last"),
    ]
    if with_blocks:
        aggs.append(
            F.sort_array(F.collect_list(F.struct("bucket_ts", "sum"))).alias("_child")
        )
    out = tier_df.groupBy("doc_id", "source", bucket.alias("bucket_ts")).agg(*aggs)
    if with_blocks:
        from .kernels import compress_udf

        child_sums = F.transform(F.col("_child"), lambda p: p.getField("sum"))
        out = (
            out.withColumn("block", compress_udf(block_method, 0.0)(child_sums))
            .withColumn("n_child", F.size(F.col("_child")).cast("long"))
            .drop("_child")
        )
    return out


def with_mean(df: DataFrame) -> DataFrame:
    """Derived mean = sum/cnt (exact integers in, deterministic double out)."""
    return df.withColumn("mean", F.col("sum") / F.col("cnt"))


def cascade(sequences: DataFrame, with_blocks: bool = False) -> dict[str, DataFrame]:
    """Full retention cascade; each tier derives from the one below."""
    tiers: dict[str, DataFrame] = {}
    tiers["1m"] = rollup_raw(sequences, TIERS["1m"], with_blocks=with_blocks)
    base = tiers["1m"].drop("block") if with_blocks else tiers["1m"]
    tiers["1h"] = rollup_up(base, TIERS["1h"])
    tiers["1d"] = rollup_up(tiers["1h"], TIERS["1d"])
    return tiers


# ---------------------------------------------------------------------------
# gap-fill
# ---------------------------------------------------------------------------


def gap_fill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    step: int,
    value_cols: list[str],
    strategy: str = "locf",
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Densify a per-series time grid and fill missing values.

    Emits one row per ``step`` between each series' min and max ``ts_col``
    — or, with ``bounds=(t0, t1)``, over the FIXED inclusive grid
    ``t0..t1`` for every series present (the serving shape: the caller
    asked for a range, not for each series' own extent).
    ``strategy``: 'null' (grid only), 'locf' (last observation carried
    forward), or 'linear' (interpolate between surrounding anchors; falls
    back to LOCF after the last anchor). Adds boolean ``gap_filled``.

    Plan shape: bounds agg + sequence/explode grid + left join co-partitioned
    on (keys, ts) + one window per direction — all JVM-side built-ins
    (SURVEY.md §2.13 gap-fill row).
    """
    if strategy not in ("null", "locf", "linear"):
        raise ValueError(f"unknown gap-fill strategy {strategy!r}")
    if bounds is None:
        bdf = df.groupBy(*keys).agg(F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1"))
    else:
        bdf = df.select(*keys).distinct().select(
            *keys,
            F.lit(int(bounds[0])).cast("long").alias("_t0"),
            F.lit(int(bounds[1])).cast("long").alias("_t1"),
        )
    grid = bdf.select(
        *keys, F.explode(F.sequence("_t0", "_t1", F.lit(step))).alias(ts_col)
    )
    joined = grid.join(df, on=[*keys, ts_col], how="left")
    return _fill_grid(joined, keys, ts_col, value_cols, strategy)


def _fill_grid(
    joined: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    strategy: str,
) -> DataFrame:
    """Fill logic shared by :func:`gap_fill` and
    :func:`range_gapfill_many`: ``joined`` is an already-built grid
    left-joined to the data rows; windows partition by ``keys``."""
    marker = value_cols[0]
    out = joined.withColumn("gap_filled", F.col(marker).isNull())
    if strategy == "null":
        return out

    w_back = (
        Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    )
    if strategy == "locf":
        for c in value_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w_back))
        return out

    # "next anchor" = running last over the REVERSED order: an O(n) running
    # frame. (first/ignorenulls over an unbounded-FOLLOWING frame makes Spark
    # rescan the tail per row — O(n^2) per partition, minutes at 1M rows.)
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.desc(ts_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    anchor_ts = F.when(~F.col("gap_filled"), F.col(ts_col))
    out = (
        out.withColumn("_pt", F.last(anchor_ts, ignorenulls=True).over(w_back))
        .withColumn("_nt", F.last(anchor_ts, ignorenulls=True).over(w_fwd))
    )
    for c in value_cols:
        prev_v = F.last(c, ignorenulls=True).over(w_back)
        next_v = F.last(c, ignorenulls=True).over(w_fwd)
        frac = (F.col(ts_col) - F.col("_pt")) / (F.col("_nt") - F.col("_pt"))
        interp = prev_v + (next_v - prev_v) * frac
        out = out.withColumn(
            c,
            F.when(~F.col("gap_filled"), F.col(c))
            .when(F.col("_nt").isNull(), prev_v)  # trailing gap -> LOCF
            .when(F.col("_pt").isNull(), next_v)  # leading gap -> NOCB
            .otherwise(interp),
        )
    return out.drop("_pt", "_nt")


def salted_source_stats(tier_df: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Per-source tier stats via an explicit two-phase SALTED aggregation.

    ``source`` is zipf-skewed (~40% of rows in one key at generation
    settings), so a naive groupBy("source") funnels nearly half the table
    through one reducer. Phase 1 aggregates on (source, hash(doc_id)%salt) —
    the hot key fans out over ``salt_buckets`` reducers — and phase 2 combines
    the tiny per-salt partials. All aggregates used are re-aggregable
    (sum/count/min/max), so the two-phase result is exact.
    """
    salt = F.pmod(F.hash(F.col("doc_id")), F.lit(salt_buckets)).alias("_salt")
    partial = (
        tier_df.groupBy("source", salt)
        .agg(
            F.count(F.lit(1)).alias("_rows"),
            F.sum("cnt").alias("_points"),
            F.sum("sum").alias("_sum"),
            F.min("vmin").alias("_vmin"),
            F.max("vmax").alias("_vmax"),
        )
    )
    return (
        partial.groupBy("source")
        .agg(
            F.sum("_rows").alias("buckets"),
            F.sum("_points").alias("points"),
            F.sum("_sum").alias("sum"),
            F.min("_vmin").alias("vmin"),
            F.max("_vmax").alias("vmax"),
        )
    )


def salted_repartition(df: DataFrame, num_partitions: int, *cols: str, salt_buckets: int = 16,
                       salt_source: str = "doc_id") -> DataFrame:
    """Explicit skew defusal (north_rule): repartition by cols + hash salt.

    groupBy(source) with zipfian sources would put ~40% of rows in one
    shuffle partition; salting by a stable hash of ``salt_source`` spreads
    each hot key over ``salt_buckets`` partitions. Downstream per-series
    kernels are keyed by doc_id, so salting never splits a series.
    """
    salt: Column = F.pmod(F.hash(F.col(salt_source)), F.lit(salt_buckets))
    return df.repartition(num_partitions, *[F.col(c) for c in cols], salt)


# ---------------------------------------------------------------------------
# tier-stitched range serving
# ---------------------------------------------------------------------------

#: Serving tiers coarse -> fine. The finest entry sets the alignment
#: granularity a range's endpoints must satisfy.
STITCH_TIERS: list[tuple[str, int]] = [("1d", 86400), ("1h", 3600), ("1m", 60)]


def stitch_segments(
    start: int, end: int, tiers: list[tuple[str, int]] | None = None
) -> list[tuple[str, int, int]]:
    """Decompose ``[start, end)`` into the minimal aligned segments, each
    served by the COARSEST tier whose buckets fit inside it — the classic
    TSDB continuous-aggregate serving plan (TimescaleDB/Druid style): a
    month-long query reads ~30 1d rows + a few 1h/1m edge rows per series
    instead of rescanning minutes.

    Pure driver-side integer arithmetic. Returns ``(tier, seg_start,
    seg_end)`` sorted by ``seg_start``; segments partition ``[start, end)``
    exactly (no overlap, no gap), so re-aggregating them is exact for every
    decomposable aggregate (sum/cnt/min/max). Endpoints must align to the
    finest tier; raising beats silently including a partial bucket.
    """
    tiers = STITCH_TIERS if tiers is None else tiers
    if start >= end:
        raise ValueError(f"empty range [{start}, {end})")
    finest = tiers[-1][1]
    if start % finest or end % finest:
        raise ValueError(
            f"range endpoints must align to the finest tier ({finest}s); "
            f"got [{start}, {end})"
        )
    segs: list[tuple[str, int, int]] = []

    def cover(s: int, e: int, idx: int) -> None:
        if s >= e:
            return
        name, t = tiers[idx]
        if idx == len(tiers) - 1:
            segs.append((name, s, e))
            return
        a = -(-s // t) * t  # ceil to tier alignment
        b = (e // t) * t  # floor
        if a < b:
            cover(s, a, idx + 1)
            segs.append((name, a, b))
            cover(b, e, idx + 1)
        else:
            cover(s, e, idx + 1)

    cover(start, end, 0)
    return sorted(segs, key=lambda x: x[1])


def stitched_rows(
    tier_dfs: dict[str, DataFrame],
    start: int,
    end: int,
    tiers: list[tuple[str, int]] | None = None,
    raw_df: DataFrame | None = None,
    edge_rows=None,
    max_doc_seconds: int | None = None,
) -> DataFrame:
    """Union of each tier's rows inside its stitched segments — the
    generic serving primitive under :func:`range_aggregate` and the
    range-scoped sketch reads: ONE scan per tier, that tier's segment
    predicates OR-combined on ``bucket_ts`` and pushed to the scan. Rows
    must carry ``bucket_ts``; column sets must match across tiers (they
    do for the core and sketch tier families).

    ``raw_df`` + ``edge_rows`` extend to SECOND-resolution endpoints:
    each sub-minute remainder decodes only the overlapping raw documents
    (:func:`_raw_edge_points`) and ``edge_rows(points_df)`` turns those
    ``(source, bucket_ts, v)`` points (``bucket_ts`` = the segment
    start) into rows matching the tier columns — a bucket aggregate for
    the core family, a sketch/register build for the sketch families."""
    stitch = tiers
    if raw_df is not None:
        if edge_rows is None:
            raise ValueError("stitched_rows: raw_df requires edge_rows")
        stitch = (STITCH_TIERS if tiers is None else tiers) + [("raw", 1)]
    by_tier: dict[str, list[tuple[int, int]]] = {}
    for name, s, e in stitch_segments(start, end, stitch):
        by_tier.setdefault(name, []).append((s, e))
    if "raw" in by_tier and max_doc_seconds is None:
        max_doc_seconds = _resolve_max_doc_seconds(raw_df, None)
    parts: list[DataFrame] = []
    for name, ranges in by_tier.items():
        if name == "raw":
            for s, e in ranges:
                pts = _raw_edge_points(raw_df, s, e, max_doc_seconds).withColumn(
                    "bucket_ts", F.lit(s).cast("long")
                )
                parts.append(edge_rows(pts))
            continue
        if name not in tier_dfs:
            raise KeyError(f"stitched_rows: tier {name!r} not provided")
        pred = None
        for s, e in ranges:
            p = (F.col("bucket_ts") >= s) & (F.col("bucket_ts") < e)
            pred = p if pred is None else (pred | p)
        parts.append(tier_dfs[name].where(pred))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p, allowMissingColumns=False)
    return u


def _footer_stat_max(df: DataFrame, column: str) -> int | None:
    """Max of ``column`` over the parquet FOOTER statistics of the files
    ``df`` scans — a driver-side metadata read, NOT a Spark job. Returns
    None when the DataFrame is not file-backed (in-memory test frames) or
    any file lacks usable stats for the column.

    Soundness for a prune bound: ``df.inputFiles()`` lists every file the
    plan can read; filters only REMOVE rows, so the footer max is >= the
    DataFrame's true max — an over-estimate only ever widens the pruned
    window. The contract is that ``column`` reaches ``df`` unmodified
    from the scanned files (true for n_tok on every raw-tier producer).
    This is the plain-parquet analog of the per-file column stats an
    Iceberg manifest carries: the corpus-wide ``max(n_tok)`` a serving
    read needs is metadata, never worth a 100 TB scan job."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    import pyarrow.parquet as pq

    best: int | None = None
    for f in files:
        path = f[len("file:"):] if f.startswith("file:") else f
        try:
            md = pq.ParquetFile(path).metadata
        except Exception:
            return None
        schema_names = md.schema.names
        if column not in schema_names:
            return None
        ci = schema_names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            v = int(st.max)
            best = v if best is None or v > best else best
    return best


def _resolve_max_doc_seconds(raw_df: DataFrame, max_doc_seconds: int | None) -> int:
    """Caller-supplied bound, else parquet footer statistics (zero jobs),
    else ONE narrow-column aggregate — the last resort only fires for
    non-file-backed inputs (tiny test frames), never on a committed
    catalog read."""
    if max_doc_seconds is not None:
        return int(max_doc_seconds)
    stat = _footer_stat_max(raw_df, "n_tok")
    if stat is not None:
        return stat
    return int(raw_df.agg(F.max("n_tok")).head()[0] or 0)


def _raw_edge_points(
    raw_df: DataFrame, s: int, e: int, max_doc_seconds: int | None = None
) -> DataFrame:
    """(source, v) points of the committed RAW tier falling in a
    sub-minute edge ``[s, e)`` — decompress-then-aggregate in serving
    form: only documents OVERLAPPING the edge are decoded, and each
    decoded array is sliced to the in-range positions before exploding.

    Pushdown: ``ts0 < e`` alone would scan ALL history below the edge
    (the exact overlap test ``ts0 + n_tok > s`` is an expression, not a
    pushable predicate), so a ``ts0 > s - max_doc_seconds`` lower bound
    is always added — from the caller's contract bound if given, else
    the parquet footer statistics of the scanned files (driver-side
    metadata, zero jobs; see :func:`_resolve_max_doc_seconds`). Both
    bounds then prune row groups on the committed parquet.

    Decode + slice happen INSIDE one mapInArrow kernel
    (kernels.edge_points_map_in_arrow): only the in-edge values cross the
    Arrow boundary — the previous decode-UDF + JVM-slice shape shipped
    every overlapping document's full decoded array."""
    from .kernels import edge_points_map_in_arrow

    if max_doc_seconds is None:
        max_doc_seconds = _resolve_max_doc_seconds(raw_df, None)
    cand = raw_df.where(
        (F.col("ts0") < e)
        & (F.col("ts0") > s - max_doc_seconds)
        & (F.col("ts0") + F.col("n_tok") > s)
    )
    return cand.select("source", "ts0", "n_tok", "blob").mapInArrow(
        edge_points_map_in_arrow(s, e), "source string, v long"
    )


def range_aggregate(
    tier_dfs: dict[str, DataFrame],
    start: int,
    end: int,
    tiers: list[tuple[str, int]] | None = None,
    raw_df: DataFrame | None = None,
    max_doc_seconds: int | None = None,
) -> DataFrame:
    """Exact per-source aggregate over ``[start, end)`` served from the
    retention tiers via :func:`stitch_segments` — the payoff of exact
    re-aggregability: the answer is bitwise what a raw-token scan would
    produce, while reading only O(edge) fine rows + O(range/86400) coarse
    rows per series.

    Plan shape: ONE scan per tier (all of a tier's segments OR-combine
    into a single ``bucket_ts`` range predicate, pushed to the tier scan
    for row-group pruning on committed parquet), a union of the bounded
    segment row sets, then one hash aggregate on ``source``. Output:
    (source, cnt, sum, vmin, vmax, mean) with mean = sum/cnt — exact
    integers in, one exactly-rounded division out.

    ``raw_df`` (the committed raw tier, with ``blob``) extends serving to
    SECOND resolution: endpoints no longer need minute alignment — the
    sub-minute remainders (at most one per end, < 60 points each per
    overlapping series) are answered by decoding ONLY the documents that
    overlap the edge (:func:`_raw_edge_points`), then re-aggregated with
    the tier rows. Decompress-then-aggregate as a serving primitive: the
    edge answer is bitwise the raw-token answer because the raw codecs
    are lossless.
    """
    cols = ["source", "bucket_ts", "cnt", "sum", "vmin", "vmax"]
    narrow = {}
    for name, _secs in tiers if tiers is not None else STITCH_TIERS:
        if name in tier_dfs:
            narrow[name] = tier_dfs[name].select(*cols)
        # absent tiers still fail fast inside stitched_rows when a segment
        # actually needs them
    edge = lambda pts: pts.groupBy("source", "bucket_ts").agg(  # noqa: E731
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("v").cast("long").alias("sum"),
        F.min("v").cast("long").alias("vmin"),
        F.max("v").cast("long").alias("vmax"),
    )
    u = stitched_rows(
        narrow, start, end, tiers=tiers, raw_df=raw_df,
        edge_rows=edge if raw_df is not None else None,
        max_doc_seconds=max_doc_seconds,
    )
    return u.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("cnt"),
        F.sum("sum").cast("long").alias("sum"),
        F.min("vmin").cast("long").alias("vmin"),
        F.max("vmax").cast("long").alias("vmax"),
        (F.sum("sum").cast("double") / F.sum("cnt")).alias("mean"),
    )


def stitched_rows_many(
    tier_dfs: dict[str, DataFrame],
    ranges: list[tuple[int, int]],
    tiers: list[tuple[str, int]] | None = None,
    select_cols: list[str] | None = None,
) -> DataFrame:
    """Batch :func:`stitched_rows`: the tier rows inside every range's
    stitched segments, tagged with ``range_id``, with ONE scan per tier
    TOTAL — all ranges' segment predicates OR-combine into each tier's
    single pushed filter, and rows attribute to their containing ranges
    via a codegen when-array + ``array_compact`` + ``explode``
    (overlapping ranges duplicate only the shared rows, never the scan).

    Serves the batch aggregate (:func:`range_aggregate_many`) and the
    batch sketch reads (jobs.percentiles_in_range_many): any family
    whose rows carry ``bucket_ts`` and whose combine is decomposable
    over the segment partition. Minute-aligned ranges only (sub-minute
    endpoints are the single-range ``raw_df`` path).
    """
    if not ranges:
        raise ValueError("ranges must be non-empty")
    by_tier: dict[str, list[tuple[int, int, int]]] = {}
    for rid, (start, end) in enumerate(ranges):
        for name, s, e in stitch_segments(int(start), int(end), tiers):
            by_tier.setdefault(name, []).append((rid, s, e))
    parts: list[DataFrame] = []
    for name, segs in by_tier.items():
        if name not in tier_dfs:
            raise KeyError(f"stitched_rows_many: tier {name!r} not provided")
        scan_pred = None
        whens = []
        for rid, s, e in segs:
            p = (F.col("bucket_ts") >= s) & (F.col("bucket_ts") < e)
            scan_pred = p if scan_pred is None else (scan_pred | p)
            whens.append(F.when(p, F.lit(rid)))
        df = tier_dfs[name]
        if select_cols is not None:
            df = df.select(*select_cols)
        parts.append(
            df.where(scan_pred).withColumn(
                "range_id", F.explode(F.array_compact(F.array(*whens)))
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def range_aggregate_many(
    tier_dfs: dict[str, DataFrame],
    ranges: list[tuple[int, int]],
    tiers: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """BATCH range serving: exact per-source aggregates for MANY
    ``[start, end)`` ranges — the "N-panel dashboard" read — with ONE
    scan per tier TOTAL, not per range.

    Each range stitches into coarsest-aligned segments exactly as
    :func:`range_aggregate`; per tier, every range's segment predicates
    OR-combine into the single pushed scan filter, and each surviving
    row is attributed to the ranges whose segments contain it by a
    codegen ``array(when(seg_pred, rid)...)`` + ``array_compact`` +
    ``explode`` — overlapping panels duplicate only the shared rows,
    never the scan. The whole plan is JVM built-ins: scan → explode →
    one hash aggregate on (range_id, source).

    Ranges must align to the finest tier (stitch_segments' contract;
    sub-minute endpoints are the single-range :func:`range_aggregate`'s
    ``raw_df`` path — a batch of dashboard panels is bucket-aligned).
    Scale shape: the per-tier predicate is the union of bounded segment
    windows, so the scan reads O(sum of segment rows); the explode
    multiplies rows only by their containing-panel count.

    Output: (range_id, start, end, source, cnt, sum, vmin, vmax, mean),
    range_id = index into ``ranges``.
    """
    u = stitched_rows_many(
        tier_dfs, ranges, tiers,
        select_cols=["source", "bucket_ts", "cnt", "sum", "vmin", "vmax"],
    )
    bounds = {rid: (int(s), int(e)) for rid, (s, e) in enumerate(ranges)}
    start_col = F.element_at(
        F.create_map(
            *[F.lit(x) for rid, (s, e) in bounds.items() for x in (rid, s)]
        ),
        F.col("range_id").cast("int"),
    )
    end_col = F.element_at(
        F.create_map(
            *[F.lit(x) for rid, (s, e) in bounds.items() for x in (rid, e)]
        ),
        F.col("range_id").cast("int"),
    )
    return (
        u.groupBy("range_id", "source")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("sum").cast("long").alias("sum"),
            F.min("vmin").cast("long").alias("vmin"),
            F.max("vmax").cast("long").alias("vmax"),
            (F.sum("sum").cast("double") / F.sum("cnt")).alias("mean"),
        )
        .select(
            F.col("range_id").cast("long").alias("range_id"),
            start_col.cast("long").alias("start"),
            end_col.cast("long").alias("end"),
            "source", "cnt", "sum", "vmin", "vmax", "mean",
        )
    )


def overview_tier_for_range(
    start: int, end: int, k: int, tiers: list[tuple[str, int]] | None = None
) -> tuple[str, int]:
    """Coarsest tier giving at least ``max(4k, k+2)`` buckets over the
    range — enough resolution that a k-point LTTB pass has real triangles
    to choose from; falls back to the finest tier for short ranges. Bounds
    the per-series state a k-point overview reads: at most
    ``4k x (ratio to the next coarser tier)`` rows (240k for 1m-vs-1h),
    independent of range length — a year-long overview reads the 1d/1h
    tier, never 525k minute rows."""
    want = max(4 * k, k + 2)
    ts = tiers if tiers is not None else STITCH_TIERS
    for name, secs in ts:  # coarse -> fine
        if (end - start) // secs >= want:
            return name, secs
    return ts[-1]


def overview_points(
    tier_dfs: dict[str, DataFrame],
    start: int,
    end: int,
    k: int,
    tiers: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """k-point LTTB OVERVIEW of ``[start, end)`` per source — the
    dashboard-serving read: pick the coarsest tier with enough resolution
    (:func:`overview_tier_for_range`), ONE pruned scan of it, exact
    per-(source, bucket) mean, then Largest-Triangle-Three-Buckets over
    the bounded mean series. Output (source, ts, v): ts is the selected
    bucket's start, v its exact mean; first/last buckets are always kept
    (LTTB contract).

    Plan: bucket_ts range predicate pushed to the tier scan; one bounded
    hash agg to (source, bucket); one ``applyInPandas`` per source over
    the tier-bounded series (never raw points)."""
    if end <= start:
        raise ValueError("empty range")
    if k < 3:
        raise ValueError("k must be >= 3 (LTTB keeps both endpoints)")
    name, _secs = overview_tier_for_range(start, end, k, tiers)
    if name not in tier_dfs:
        raise KeyError(f"overview_points: tier {name!r} not provided")
    agg = (
        tier_dfs[name]
        .where((F.col("bucket_ts") >= start) & (F.col("bucket_ts") < end))
        .groupBy("source", "bucket_ts")
        .agg(F.sum("cnt").cast("long").alias("cnt"),
             F.sum("sum").cast("long").alias("sum"))
    )

    def _select(pdf):
        import pandas as pd

        from .downsample import lttb_indices

        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        mean = pdf["sum"].to_numpy(dtype="float64") / pdf["cnt"].to_numpy(dtype="float64")
        idx = lttb_indices(mean, k)
        return pd.DataFrame({
            "source": pdf["source"].iloc[idx].to_numpy(),
            "ts": pdf["bucket_ts"].iloc[idx].to_numpy(),
            "v": mean[idx],
        })

    return agg.groupBy("source").applyInPandas(_select, "source string, ts long, v double")


def doc_points(
    raw_df: DataFrame,
    start: int,
    end: int,
    doc_ids: list[str] | None = None,
    max_doc_seconds: int | None = None,
) -> DataFrame:
    """Per-document POINT READ from the raw tier: (doc_id, source, ts, v)
    for the requested documents restricted to ``[start, end)`` — the
    "show me series X over this window" query every time-series store
    serves. ``doc_ids=None`` exports the whole window (every overlapping
    document's in-range points).

    Plan: the ``doc_id IN (...)`` filter and the ``ts0`` bounds push to
    the committed raw scan (time-clustered files prune on ts0 row-group
    stats; the unpushable ``ts0 + n_tok > start`` overlap test needs a
    lower bound, supplied like :func:`_raw_edge_points`), then ONE
    mapInArrow pass decodes and slices each blob in-kernel — only the
    in-window values cross the Arrow boundary, never the whole document.
    """
    if end <= start:
        raise ValueError("empty range")
    from .kernels import edge_points_map_in_arrow

    cand = raw_df
    if doc_ids is not None:
        if not doc_ids:
            raise ValueError("doc_ids must be None (whole window) or non-empty")
        cand = cand.where(F.col("doc_id").isin(list(doc_ids)))
    if max_doc_seconds is None:
        max_doc_seconds = _resolve_max_doc_seconds(cand, None)
    cand = cand.where(
        (F.col("ts0") < end)
        & (F.col("ts0") > start - max_doc_seconds)
        & (F.col("ts0") + F.col("n_tok") > start)
    ).select("doc_id", "source", "ts0", "n_tok", "blob")
    return cand.mapInArrow(
        edge_points_map_in_arrow(
            start, end, keys=("doc_id", "source"), with_ts=True
        ),
        "doc_id string, source string, ts long, v long",
    )


def threshold_candidates(
    m1_df: DataFrame,
    threshold: int,
    start: int | None = None,
    end: int | None = None,
    mode: str = ">=",
    tier_seconds: int = 60,
) -> DataFrame:
    """Per-document candidate windows for a value-threshold scan, read
    off the 1m tier's per-(doc, minute) vmin/vmax ZONE MAPS: one row
    (doc_id, w_lo, w_hi) per document owning at least one minute bucket
    whose [vmin, vmax] admits the predicate, where ``[w_lo, w_hi)`` spans
    the doc's first..last candidate minute clamped to ``[start, end)``.

    This is the tier-as-index read: the zone-map filter and the
    bucket_ts range both push to the committed 1m scan (time-clustered
    files prune bucket_ts on row-group stats), and the aggregate output
    is one narrow row per candidate DOCUMENT — at most |candidate docs|
    rows regardless of corpus size."""
    if mode not in (">=", "<="):
        raise ValueError(f"mode must be '>=' or '<=', got {mode!r}")
    zmap = (
        F.col("vmax") >= int(threshold)
        if mode == ">="
        else F.col("vmin") <= int(threshold)
    )
    cand = m1_df.where(zmap)
    if end is not None:
        cand = cand.where(F.col("bucket_ts") < int(end))
    if start is not None:
        cand = cand.where(F.col("bucket_ts") > int(start) - tier_seconds)
    w_lo = F.min("bucket_ts")
    w_hi = F.max("bucket_ts") + tier_seconds
    if start is not None:
        w_lo = F.greatest(w_lo, F.lit(int(start)))
    if end is not None:
        w_hi = F.least(w_hi, F.lit(int(end)))
    return cand.groupBy("doc_id").agg(
        w_lo.cast("long").alias("w_lo"), w_hi.cast("long").alias("w_hi")
    )


def threshold_points(
    raw_df: DataFrame,
    m1_df: DataFrame,
    threshold: int,
    start: int | None = None,
    end: int | None = None,
    mode: str = ">=",
    max_doc_seconds: int | None = None,
    push_limit: int | None = None,
) -> DataFrame:
    """VALUE-THRESHOLD scan ("every point where v >= X", the
    spike/outlier export): (doc_id, source, ts, v) points satisfying the
    predicate, optionally restricted to event-time ``[start, end)`` —
    answered WITHOUT decoding the corpus by using the 1m tier's
    vmin/vmax as zone maps over the raw blobs.

    Plan (tier-as-index): :func:`threshold_candidates` reduces the 1m
    tier to one (doc_id, w_lo, w_hi) row per document with a qualifying
    minute. When the candidate set is small — which a selective
    threshold makes it, and is the premise of using an index at all —
    the candidates are collected (bounded by ``push_limit``, which
    DEFAULTS to the session's
    ``spark.sql.parquet.pushdown.inFilterThreshold`` — the static path
    only triggers when the IN list actually converts to a parquet
    predicate) and pushed into the raw scan as a STATIC ``doc_id IN
    (...)`` plus ts0 bounds derived from the candidate windows: only a
    static predicate can reach the raw tier's adaptive doc_id bloom
    filters and time-clustered row-group stats (a dynamic broadcast
    join prunes nothing at the scan), and the engine session raises
    ``inFilterThreshold`` to 1024 so candidate-sized IN lists push
    (Spark's default stops at 10 values). At sf1.6/local the walls are footer- and
    worker-startup-bound either way (pushed ~5.0 s, join ~4.2 s, brute
    token scan ~1.9 s from page cache, same window) — the scale
    argument is 230 of 1,600,000 documents decoded and blob bytes vs
    token bytes, with the bloom mechanism itself measured on the
    point-read path (PLANS.md). Above ``push_limit`` the dynamic
    broadcast-join path is kept — with that many candidates the scan is
    amortized by real decode work, and a driver collect would be the
    anti-pattern. Either way ONE mapInArrow pass decodes each surviving
    blob, slices it to the doc's candidate window, and applies the
    value mask in-kernel — only qualifying points ever cross the Arrow
    boundary. Measured sf0.01 (v >= 18000): 15 of 20,000 documents
    decoded, 99 of 264,634 minute buckets candidate (0.04%).

    Exactness does not depend on the zone maps: interior non-candidate
    minutes inside a doc's window are removed by the value mask itself
    (their vmax excludes the predicate), and lossless blobs decode to
    the ingested tokens verbatim."""
    from .kernels import threshold_points_map_in_arrow

    if start is not None and end is not None and end <= start:
        raise ValueError("empty range")
    if push_limit is None:
        # The static IN(...) path only prunes when the predicate actually
        # converts to a parquet filter, which Spark caps at
        # inFilterThreshold values — so the default collect bound IS that
        # session setting (one shared knob, raised in session.get_spark).
        # A larger candidate set would pay the driver collect and a
        # literal-heavy plan while the IN list silently stops pushing.
        push_limit = int(
            raw_df.sparkSession.conf.get(
                "spark.sql.parquet.pushdown.inFilterThreshold", "10"
            )
        )
    cand = threshold_candidates(m1_df, threshold, start, end, mode)
    scan = raw_df
    if end is not None:
        scan = scan.where(F.col("ts0") < int(end))
    if start is not None:
        if max_doc_seconds is None:
            max_doc_seconds = _resolve_max_doc_seconds(scan, None)
        scan = scan.where(
            (F.col("ts0") > int(start) - max_doc_seconds)
            & (F.col("ts0") + F.col("n_tok") > int(start))
        )
    if push_limit and push_limit > 0:
        rows = cand.limit(int(push_limit) + 1).collect()
        if len(rows) <= int(push_limit):
            if not rows:
                return scan.sparkSession.createDataFrame(
                    [], "doc_id string, source string, ts long, v long"
                )
            cand = scan.sparkSession.createDataFrame(
                [(r["doc_id"], r["w_lo"], r["w_hi"]) for r in rows],
                "doc_id string, w_lo long, w_hi long",
            )
            lo = min(r["w_lo"] for r in rows)
            hi = max(r["w_hi"] for r in rows)
            if max_doc_seconds is None:
                max_doc_seconds = _resolve_max_doc_seconds(raw_df, None)
            scan = scan.where(
                F.col("doc_id").isin([r["doc_id"] for r in rows])
                & (F.col("ts0") < hi)
                & (F.col("ts0") > lo - max_doc_seconds)
                & (F.col("ts0") + F.col("n_tok") > lo)
            )
    joined = scan.select("doc_id", "source", "ts0", "n_tok", "blob").join(
        F.broadcast(cand), "doc_id"
    )
    return joined.mapInArrow(
        threshold_points_map_in_arrow(threshold, mode),
        "doc_id string, source string, ts long, v long",
    )


def serving_tier_for_step(
    step: int, tiers: list[tuple[str, int]] | None = None
) -> tuple[str, int]:
    """Coarsest tier whose bucket length divides ``step`` — the tier a
    ``step``-resolution serving read should scan (a 1d grid reads the 1d
    tier: 1440x fewer rows than answering it from 1m)."""
    for name, secs in tiers if tiers is not None else STITCH_TIERS:
        if secs <= step and step % secs == 0:
            return name, secs
    raise ValueError(f"no tier divides step={step}s")


def range_gapfill(
    tier_dfs: dict[str, DataFrame],
    start: int,
    end: int,
    step: int,
    strategy: str = "locf",
    tiers: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Gap-filled per-source series at ``step``-second resolution over
    ``[start, end)``, served from the committed rollup tiers — the
    TimescaleDB ``time_bucket_gapfill`` serving shape on top of the
    cascade. ``start``/``end`` must be step-aligned (the caller asked for
    a grid; a ragged range is a :func:`range_aggregate` question).

    Plan: ONE scan of the coarsest dividing tier
    (:func:`serving_tier_for_step`) with the ``bucket_ts`` range predicate
    pushed down (row-group pruning on the time-clustered committed
    parquet), exact integer re-bucketing to ``step``, then :func:`gap_fill`
    over the fixed requested grid. Output: (source, bucket_ts, cnt, mean,
    gap_filled) with cnt = 0 on gap rows and mean filled per ``strategy``.
    """
    if start % step or end % step:
        raise ValueError(f"range [{start},{end}) is not {step}s-aligned")
    if end <= start:
        raise ValueError("empty range")
    name, _secs = serving_tier_for_step(step, tiers)
    if name not in tier_dfs:
        raise KeyError(f"range_gapfill: tier {name!r} not provided")
    tier = tier_dfs[name].where(
        (F.col("bucket_ts") >= start) & (F.col("bucket_ts") < end)
    )
    agg = tier.groupBy(
        "source", (F.floor(F.col("bucket_ts") / step) * step).cast("long").alias("bucket_ts")
    ).agg(
        F.sum("cnt").cast("long").alias("cnt"),
        (F.sum("sum").cast("double") / F.sum("cnt")).alias("mean"),
    )
    filled = gap_fill(
        agg, ["source"], "bucket_ts", step, ["mean"],
        strategy=strategy, bounds=(start, end - step),
    )
    return filled.select(
        "source", "bucket_ts",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        "mean", "gap_filled",
    )


def range_gapfill_many(
    tier_dfs: dict[str, DataFrame],
    ranges: list[tuple[int, int]],
    step: int,
    strategy: str = "locf",
    tiers: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """BATCH gap-filled serving: the :func:`range_gapfill` grid for MANY
    ``[start, end)`` panels sharing one ``step``, with ONE scan of the
    serving tier total. Per panel the rows are bitwise the single-range
    path's.

    Plan: one pushed scan (all panels' bucket ranges OR-combined), one
    range-agnostic (source, step-bucket) aggregate computed ONCE even
    where panels overlap, panel attribution via a codegen when-array
    explode of the aggregate (only to find which sources appear in which
    panel — single-range semantics grid only the sources with data in
    the range), a per-(panel, source) exploded fixed grid, one left join
    back to the shared aggregate, and the same :func:`_fill_grid`
    windows partitioned by (range_id, source).

    Output: (range_id, source, bucket_ts, cnt, mean, gap_filled).
    """
    if not ranges:
        raise ValueError("ranges must be non-empty")
    for start, end in ranges:
        if start % step or end % step:
            raise ValueError(f"range [{start},{end}) is not {step}s-aligned")
        if end <= start:
            raise ValueError(f"empty range [{start},{end})")
    name, _secs = serving_tier_for_step(step, tiers)
    if name not in tier_dfs:
        raise KeyError(f"range_gapfill_many: tier {name!r} not provided")
    scan_pred = None
    whens = []
    for rid, (s, e) in enumerate(ranges):
        p = (F.col("bucket_ts") >= int(s)) & (F.col("bucket_ts") < int(e))
        scan_pred = p if scan_pred is None else (scan_pred | p)
        whens.append(F.when(p, F.lit(rid)))
    tier = tier_dfs[name].where(scan_pred)
    agg = tier.groupBy(
        "source",
        (F.floor(F.col("bucket_ts") / step) * step).cast("long").alias(
            "bucket_ts"
        ),
    ).agg(
        F.sum("cnt").cast("long").alias("cnt"),
        (F.sum("sum").cast("double") / F.sum("cnt")).alias("mean"),
    )
    rid_sources = (
        agg.withColumn(
            "range_id", F.explode(F.array_compact(F.array(*whens)))
        )
        .select("range_id", "source")
        .distinct()
    )
    pairs = [x for rid, (s, e) in enumerate(ranges) for x in (rid, int(s))]
    start_map = F.create_map(*[F.lit(x) for x in pairs])
    pairs = [
        x for rid, (s, e) in enumerate(ranges) for x in (rid, int(e) - step)
    ]
    last_map = F.create_map(*[F.lit(x) for x in pairs])
    grid = rid_sources.select(
        "range_id",
        "source",
        F.explode(
            F.sequence(
                F.element_at(start_map, F.col("range_id")).cast("long"),
                F.element_at(last_map, F.col("range_id")).cast("long"),
                F.lit(step),
            )
        ).alias("bucket_ts"),
    )
    joined = grid.join(agg, ["source", "bucket_ts"], "left")
    filled = _fill_grid(
        joined, ["range_id", "source"], "bucket_ts", ["mean"], strategy
    )
    return filled.select(
        F.col("range_id").cast("long").alias("range_id"),
        "source",
        "bucket_ts",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        "mean",
        "gap_filled",
    )


# ---------------------------------------------------------------------------
# counter rate / increase (PromQL rate() / TimescaleDB counter_agg analog)
# ---------------------------------------------------------------------------


def counter_rate(
    tier_df: DataFrame,
    value_col: str = "last",
    keys: tuple[str, ...] = ("doc_id", "source"),
    ts_col: str = "bucket_ts",
    reset_correction: bool = True,
) -> DataFrame:
    """Per-series delta / increase / rate over a tier's bucket series —
    the PromQL ``rate()`` / TimescaleDB ``counter_agg`` serving read,
    expressed over the cascade's committed tiers instead of raw samples.

    Semantics (PromQL counter contract): consecutive buckets of one series
    (``keys`` order ``ts_col``) yield

    * ``delta``    = v - prev_v                      (gauge difference)
    * ``increase`` = v - prev_v, or v when v < prev_v (counter RESET: the
      counter restarted from ~0, so the whole new reading is the increase
      — exactly PromQL's reset correction) when ``reset_correction``,
      else = delta
    * ``elapsed``  = ts - prev_ts (buckets may be SPARSE; a series with a
      gap gets the true elapsed seconds, not the tier step)
    * ``rate``     = increase / elapsed (per-second, exact-long division
      to double — bit-stable across engines)

    The first bucket of each series has no predecessor and is dropped
    (PromQL needs >= 2 points in range for rate()).

    Scale: ONE window over (keys) — the shuffle key is the tier's own
    layout key (doc_id, source), and the input is tier rows (60-86400x
    smaller than raw), so serving rate over a month of 1h buckets touches
    ~720 rows per series. Pure JVM lag() — whole-stage codegen, no Python.
    """
    _require_integer_value_col(tier_df, value_col, "counter_rate")
    w = Window.partitionBy(*keys).orderBy(ts_col)
    v = F.col(value_col).cast("long")
    prev_v = F.lag(v).over(w)
    prev_t = F.lag(F.col(ts_col)).over(w)
    delta = (v - prev_v).alias("delta")
    if reset_correction:
        increase = F.when(v >= prev_v, v - prev_v).otherwise(v)
    else:
        increase = v - prev_v
    elapsed = (F.col(ts_col) - prev_t).cast("long")
    return (
        tier_df.select(
            *keys,
            F.col(ts_col),
            v.alias("value"),
            delta,
            increase.cast("long").alias("increase"),
            elapsed.alias("elapsed"),
        )
        .where(F.col("delta").isNotNull())
        .withColumn("rate", F.col("increase") / F.col("elapsed"))
    )


def _require_integer_value_col(df: DataFrame, col: str, op: str) -> None:
    """Integer-value contract (token series are integers): casting a
    fractional gauge to long would silently TRUNCATE — fail fast instead,
    the m4_points rule applied to every exact-integer serving read."""
    from pyspark.sql import types as T

    vt = df.schema[col].dataType
    if isinstance(vt, (T.FloatType, T.DoubleType)) or (
        isinstance(vt, T.DecimalType) and vt.scale > 0
    ):
        raise TypeError(
            f"{op}: value_col {col!r} is fractional ({vt.simpleString()}); "
            "this read uses exact integer math — pre-scale the series to "
            "integers (e.g. fixed-point) first"
        )


def rate_grid(
    tier_df: DataFrame,
    start: int,
    end: int,
    step: int,
    value_col: str = "last",
    keys: tuple[str, ...] = ("doc_id", "source"),
    ts_col: str = "bucket_ts",
    reset_correction: bool = True,
) -> DataFrame:
    """Gridded counter rate: the PromQL ``rate()`` dashboard panel — per
    series, the reset-corrected increase and per-second rate for every
    ``step``-aligned cell of ``[start, end)``, served from a committed
    tier. Each consecutive bucket pair contributes its increase to the
    cell containing the LATER bucket (the increase accrued in that
    interval); a pair spanning a gap contributes its true elapsed
    seconds, so ``rate = increase / elapsed`` stays honest on sparse
    series. Cells with no pair are absent (PromQL returns no sample,
    not zero). ``n_resets`` counts counter restarts (value < previous) in
    the cell — the PromQL ``resets()`` read for free off the same pairs.
    Output: (keys, grid_ts, n_pairs, n_resets, increase, elapsed, rate).

    Scale: the range predicate pushes into the time-clustered scan, ONE
    window keyed by the tier's own layout key computes lags, then the
    grid groupBy (keys + cell) aggregates map-side-partial; shuffled rows
    are tier buckets in range, never raw points.
    """
    if end <= start:
        raise ValueError("rate_grid: end must be > start")
    if step <= 0:
        raise ValueError("rate_grid: step must be > 0")
    _require_integer_value_col(tier_df, value_col, "rate_grid")
    scan = tier_df.where((F.col(ts_col) >= start) & (F.col(ts_col) < end))
    per = counter_rate(
        scan,
        value_col=value_col,
        keys=keys,
        ts_col=ts_col,
        reset_correction=reset_correction,
    )
    cell = (
        F.lit(int(start))
        + ((F.col(ts_col) - F.lit(int(start))) / F.lit(int(step))).cast("long")
        * F.lit(int(step))
    ).cast("long")
    return (
        per.groupBy(*keys, cell.alias("grid_ts"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_resets"),
            F.sum("increase").cast("long").alias("increase"),
            F.sum("elapsed").cast("long").alias("elapsed"),
        )
        .withColumn(
            "rate",
            F.col("increase").cast("double") / F.col("elapsed").cast("double"),
        )
    )


def instant_read(
    tier_df: DataFrame,
    at_ts: int,
    lookback: int,
    value_col: str = "last",
    keys: tuple[str, ...] = ("doc_id", "source"),
    ts_col: str = "bucket_ts",
    reset_correction: bool = True,
) -> DataFrame:
    """PromQL instant-vector read: each series' most recent sample at or
    before ``at_ts``, within the staleness ``lookback`` window
    ``(at_ts - lookback, at_ts]`` — plus ``irate``/``idelta`` from the last
    TWO in-window buckets (PromQL ``irate()``/``idelta()``: the
    instantaneous rate uses only the final pair of points, with the same
    counter reset correction as :func:`counter_rate`).

    Output per series: ``sample_ts`` (latest bucket), ``value``,
    ``staleness`` = at_ts - sample_ts, and ``prev_ts`` / ``idelta`` /
    ``irate`` (NULL when the window holds a single bucket — PromQL needs
    two points for irate). Series with no bucket in the window are absent,
    exactly PromQL staleness semantics.

    Scale: the ``ts_col`` range predicate is pushed into the
    time-clustered tier scan (the scan is bounded by lookback, not
    history), then ONE window keyed by the tier's own layout key ranks the
    ≤ lookback/step in-window buckets per series and a conditional
    aggregate pivots rank 1/2 into one row — no self-join, no second scan.
    """
    _require_integer_value_col(tier_df, value_col, "instant_read")
    v = F.col(value_col).cast("long")
    scan = tier_df.where(
        (F.col(ts_col) > at_ts - lookback) & (F.col(ts_col) <= at_ts)
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(ts_col))
    ranked = (
        scan.select(*keys, F.col(ts_col), v.alias("_v"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 2)
    )
    top = ranked.groupBy(*keys).agg(
        F.max(F.when(F.col("_rn") == 1, F.col(ts_col))).alias("sample_ts"),
        F.max(F.when(F.col("_rn") == 1, F.col("_v"))).alias("value"),
        F.max(F.when(F.col("_rn") == 2, F.col(ts_col))).alias("prev_ts"),
        F.max(F.when(F.col("_rn") == 2, F.col("_v"))).alias("prev_v"),
    )
    value, prev_v = F.col("value"), F.col("prev_v")
    if reset_correction:
        increase = F.when(value >= prev_v, value - prev_v).otherwise(value)
    else:
        increase = value - prev_v
    elapsed = (F.col("sample_ts") - F.col("prev_ts")).cast("long")
    return top.select(
        *keys,
        "sample_ts",
        "value",
        (F.lit(at_ts) - F.col("sample_ts")).cast("long").alias("staleness"),
        "prev_ts",
        (value - prev_v).cast("long").alias("idelta"),
        (increase.cast("double") / elapsed.cast("double")).alias("irate"),
    )


def instant_read_many(
    tier_df: DataFrame,
    panels: list[tuple[int, int]],
    value_col: str = "last",
    keys: tuple[str, ...] = ("doc_id", "source"),
    ts_col: str = "bucket_ts",
    reset_correction: bool = True,
) -> DataFrame:
    """Batch instant-vector read: N dashboard panels' instant samples from
    ONE tier scan — the ``stitched_rows_many`` idiom applied to
    :func:`instant_read`. ``panels`` is a list of ``(at_ts, lookback)``
    pairs; output rows carry ``panel_id`` (the list index) plus the same
    columns as the single read.

    Scale: the scan predicate is the OR-envelope of all panel windows
    (pushed to the time-clustered files once), panel attribution is a
    codegen filter over a literal panel array + explode (a row joins only
    the panels whose staleness window contains it — overlapping panels
    duplicate only the bounded in-window tier rows), then the identical
    rank-1/2 pivot runs per (panel, series) in one window — N panels cost
    one scan and one shuffle, not N jobs.
    """
    if not panels:
        raise ValueError("instant_read_many: at least one panel required")
    _require_integer_value_col(tier_df, value_col, "instant_read_many")
    lo = min(at - lb for at, lb in panels)
    hi = max(at for at, _ in panels)
    v = F.col(value_col).cast("long")
    scan = tier_df.where((F.col(ts_col) > lo) & (F.col(ts_col) <= hi))
    panel_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("pid"),
                F.lit(int(at)).cast("long").alias("at"),
                F.lit(int(lb)).cast("long").alias("lb"),
            )
            for i, (at, lb) in enumerate(panels)
        ]
    )
    ts = F.col(ts_col)
    matched = F.filter(
        panel_arr, lambda p: (ts > p["at"] - p["lb"]) & (ts <= p["at"])
    )
    exploded = (
        scan.select(*keys, ts, v.alias("_v"), matched.alias("_ps"))
        .where(F.size("_ps") > 0)
        .select(*keys, ts, "_v", F.explode("_ps").alias("_p"))
        .select(
            F.col("_p.pid").alias("panel_id"),
            F.col("_p.at").alias("_at"),
            *keys,
            ts,
            "_v",
        )
    )
    w = Window.partitionBy("panel_id", *keys).orderBy(F.desc(ts_col))
    ranked = exploded.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= 2
    )
    top = ranked.groupBy("panel_id", *keys).agg(
        F.max("_at").alias("_at"),
        F.max(F.when(F.col("_rn") == 1, F.col(ts_col))).alias("sample_ts"),
        F.max(F.when(F.col("_rn") == 1, F.col("_v"))).alias("value"),
        F.max(F.when(F.col("_rn") == 2, F.col(ts_col))).alias("prev_ts"),
        F.max(F.when(F.col("_rn") == 2, F.col("_v"))).alias("prev_v"),
    )
    value, prev_v = F.col("value"), F.col("prev_v")
    if reset_correction:
        increase = F.when(value >= prev_v, value - prev_v).otherwise(value)
    else:
        increase = value - prev_v
    elapsed = (F.col("sample_ts") - F.col("prev_ts")).cast("long")
    return top.select(
        "panel_id",
        *keys,
        "sample_ts",
        "value",
        (F.col("_at") - F.col("sample_ts")).cast("long").alias("staleness"),
        "prev_ts",
        (value - prev_v).cast("long").alias("idelta"),
        (increase.cast("double") / elapsed.cast("double")).alias("irate"),
    )


def linear_predict(
    tier_df: DataFrame,
    start: int,
    end: int,
    horizon: int,
    value_col: str = "sum",
    keys: tuple[str, ...] = ("doc_id", "source"),
    ts_col: str = "bucket_ts",
    min_points: int = 2,
) -> DataFrame:
    """PromQL ``deriv()`` / ``predict_linear()``: per-series simple least
    squares of value on time over the range ``[start, end)``, plus the
    extrapolated value ``horizon`` seconds past the range end — the
    capacity-planning read ("at this trend, where is the series in 4h?")
    served from a committed tier, never raw points.

    Semantics: with t centered at ``start`` (t = ts - start, exact small
    ints), slope = (n·Σtv − Σt·Σv) / (n·Σt² − (Σt)²) per second,
    intercept = value at ``start``, ``predicted`` = intercept +
    slope·(end − start + horizon). Series with fewer than ``min_points``
    buckets or a degenerate time spread (all buckets identical — den 0)
    are dropped, matching PromQL's two-point minimum for deriv().

    Cross-engine determinism (the source_correlation argument): every
    accumulator — n, Σt, Σv, Σtv, Σt² — and the derived num/den are exact
    decimal(38,0) integers (HUGEINT in the DuckDB oracle, converted via
    VARCHAR there to dodge DuckDB's double-rounding HUGEINT→DOUBLE cast),
    so aggregation order cannot perturb anything; floats appear only in
    the final slope = num/den division and the intercept/predict chain —
    a fixed sequence of IEEE ops, bit-identical in any IEEE engine.

    Scale: the ``ts_col`` range predicate is pushed into the
    time-clustered tier scan (bounded by the window, not history), then
    ONE groupBy on the tier's own layout key computes the five sums
    map-side-partial — no window function, no self-join, output one row
    per series.
    """
    if end <= start:
        raise ValueError("linear_predict: end must be > start")
    if min_points < 2:
        raise ValueError("linear_predict: min_points must be >= 2")
    _require_integer_value_col(tier_df, value_col, "linear_predict")
    dec = "decimal(38,0)"
    scan = tier_df.where((F.col(ts_col) >= start) & (F.col(ts_col) < end))
    t = (F.col(ts_col) - F.lit(int(start))).cast("long").cast(dec)
    v = F.col(value_col).cast("long").cast(dec)
    sums = scan.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(t).alias("st"),
        F.sum(v).alias("sv"),
        F.sum(t * v).alias("stv"),
        F.sum(t * t).alias("stt"),
    )
    n = F.col("n").cast(dec)
    num = n * F.col("stv") - F.col("st") * F.col("sv")
    den = n * F.col("stt") - F.col("st") * F.col("st")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("sv").cast("double") - F.col("_slope") * F.col("st").cast("double")
    ) / F.col("n").cast("double")
    t_pred = float(int(end) - int(start) + int(horizon))
    return (
        sums.where((F.col("n") >= min_points) & (den > 0))
        .withColumn("_slope", slope)
        .select(
            *keys,
            "n",
            F.col("_slope").alias("slope"),
            intercept.alias("intercept"),
            (intercept + F.col("_slope") * F.lit(t_pred)).alias("predicted"),
        )
    )


def alert_intervals(
    tier_df: DataFrame,
    threshold: int,
    step: int,
    min_duration: int,
    value_col: str = "sum",
    keys: tuple[str, ...] = ("source",),
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Alert-rule evaluation with PromQL ``for:`` duration semantics over
    a committed tier: per series, maximal runs of CONSECUTIVE buckets
    (spacing exactly ``step``) whose value exceeds ``threshold``, kept
    only when the run lasts at least ``min_duration`` seconds — i.e. the
    condition held continuously for the ``for:`` window, so the alert
    FIRES. Output one row per firing interval: (keys, start_ts, end_ts,
    n_buckets, duration, peak, total) with end_ts exclusive
    (start_ts + n_buckets·step).

    A missing bucket breaks the run (on the tier grid "no data" is not
    "condition true" — the conservative reading; gap-fill the tier first
    for LOCF semantics). Classic gaps-and-islands: island id =
    ts − step·row_number() over the condition-filtered series, constant
    exactly while buckets are consecutive.

    Scale: the threshold predicate prunes the scan BEFORE the shuffle
    (only breaching buckets move), one window + one groupBy both keyed by
    the series key, output bounded by the number of breaches. Pure JVM —
    codegen window + agg, no Python.
    """
    if step <= 0 or min_duration <= 0:
        raise ValueError("alert_intervals: step and min_duration must be > 0")
    _require_integer_value_col(tier_df, value_col, "alert_intervals")
    v = F.col(value_col).cast("long")
    breaching = tier_df.where(v > threshold).select(
        *keys, F.col(ts_col).cast("long").alias("_ts"), v.alias("_v")
    )
    w = Window.partitionBy(*keys).orderBy("_ts")
    islands = breaching.withColumn(
        "_island", F.col("_ts") - F.lit(int(step)) * F.row_number().over(w)
    )
    runs = islands.groupBy(*keys, "_island").agg(
        F.min("_ts").alias("start_ts"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("_v").alias("peak"),
        F.sum("_v").cast("long").alias("total"),
    )
    duration = F.col("n_buckets") * F.lit(int(step))
    return runs.where(duration >= min_duration).select(
        *keys,
        "start_ts",
        (F.col("start_ts") + duration).alias("end_ts"),
        "n_buckets",
        duration.alias("duration"),
        "peak",
        "total",
    )


def exp_smooth(
    tier_df: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    keys: tuple[str, ...] = ("doc_id", "source"),
    ts_col: str = "bucket_ts",
    value_col: str = "last",
) -> DataFrame:
    """Exponential smoothing over each series' bucket sequence — the
    PromQL ``holt_winters()`` serving read (single-exponential EWMA plus
    Holt double-exponential level+trend), computed as JVM-side
    higher-order-function folds, no Python in the plan.

    Recursions (seeded by the first bucket, PromQL-style):

    * EWMA:  ``e_1 = v_1``;  ``e_i = alpha*v_i + (1-alpha)*e_{i-1}``
    * Holt:  ``s_1 = v_1, b_1 = 0``;
      ``s_i = alpha*v_i + (1-alpha)*(s_{i-1} + b_{i-1})``;
      ``b_i = beta*(s_i - s_{i-1}) + (1-beta)*b_{i-1}``

    Output per series: ``n_buckets``, ``v_last`` (raw final value),
    ``ewma``, ``holt_level``/``holt_trend`` (final s/b) and
    ``holt_forecast`` = level + trend (the one-step-ahead read an
    alerting rule compares against). Single-bucket series yield
    ewma = level = forecast = v_1 and trend 0.

    Scale: ONE shuffle on ``keys`` collects each series' in-range buckets
    into an array (bounded by range/step — a serving contract, same as
    the gap-fill grid), then ``F.aggregate`` folds it inside codegen.
    A smoothing recursion is inherently sequential per series; keeping it
    as an array fold makes the cross-series parallelism explicit and the
    per-series state O(1).
    """
    a, na = float(alpha), 1.0 - float(alpha)
    bt, nb = float(beta), 1.0 - float(beta)
    v = F.col(value_col).cast("double")
    pts = F.sort_array(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), v.alias("v")))
    )
    g = tier_df.groupBy(*keys).agg(pts.alias("_pts"))
    vs = F.transform(F.col("_pts"), lambda p: p["v"])
    rest = F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0)))
    ewma = F.aggregate(
        rest,
        F.element_at(vs, 1),
        lambda acc, x: F.lit(a) * x + F.lit(na) * acc,
    )

    def _holt_step(acc, x):
        s_new = F.lit(a) * x + F.lit(na) * (acc["s"] + acc["b"])
        return F.struct(
            s_new.alias("s"),
            (F.lit(bt) * (s_new - acc["s"]) + F.lit(nb) * acc["b"]).alias("b"),
        )

    holt = F.aggregate(
        rest,
        F.struct(
            F.element_at(vs, 1).alias("s"),
            F.lit(0.0).cast("double").alias("b"),
        ),
        _holt_step,
    )
    return g.select(
        *keys,
        F.size(vs).cast("long").alias("n_buckets"),
        F.element_at(vs, -1).cast("long").alias("v_last"),
        ewma.alias("ewma"),
        holt["s"].alias("holt_level"),
        holt["b"].alias("holt_trend"),
        (holt["s"] + holt["b"]).alias("holt_forecast"),
    )


# ---------------------------------------------------------------------------
# time-weighted average (TimescaleDB time_weight('LOCF') analog)
# ---------------------------------------------------------------------------


def time_weighted_avg(
    tier_df: DataFrame,
    value_col: str = "last",
    keys: tuple[str, ...] = ("doc_id", "source"),
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Time-weighted average of an IRREGULAR gauge series — the TimescaleDB
    ``average(time_weight('LOCF', ts, value))`` analog, served from the
    cascade's committed tiers instead of raw samples.

    Semantics (TimescaleDB LOCF contract): each observation holds until the
    next one, so point i contributes ``value_i * (ts_{i+1} - ts_i)`` to the
    integral over ``[t_first, t_last]``; the last point bounds the integral
    and carries NO weight. Series with a single point have a zero-length
    integral and are dropped (TimescaleDB returns NULL there). A plain
    ``AVG`` over sparse buckets over-weights dense stretches; this is the
    correct average for sparse/ragged series.

    All arithmetic is exact int64 (value x elapsed-seconds products summed)
    until the single final long/long -> double division, so the result is
    bit-stable across engines (the DuckDB oracle replays the identical
    window + aggregation).

    Output: one row per series with >= 2 points:
    (keys..., points, t_first, t_last, weighted_sum, total_elapsed, twa).

    Scale: ONE window + ONE aggregation, both keyed by the tier's own
    layout key — no shuffle beyond the tier's (doc_id, source) hash, input
    is tier rows (60-86400x smaller than raw). Pure JVM lag/lead + hash
    agg, whole-stage codegen end to end.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    ts = F.col(ts_col).cast("long")
    v = F.col(value_col).cast("long")
    step = tier_df.select(
        *keys,
        ts.alias("_ts"),
        (v * (F.lead(ts).over(w) - ts)).alias("_wv"),
    )
    agg = step.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("points"),
        F.min("_ts").alias("t_first"),
        F.max("_ts").alias("t_last"),
        F.sum("_wv").cast("long").alias("weighted_sum"),
    )
    return agg.where(F.col("points") >= 2).select(
        *keys,
        "points",
        "t_first",
        "t_last",
        "weighted_sum",
        (F.col("t_last") - F.col("t_first")).cast("long").alias("total_elapsed"),
        (
            F.col("weighted_sum")
            / (F.col("t_last") - F.col("t_first")).cast("double")
        ).alias("twa"),
    )


# ---------------------------------------------------------------------------
# rolling z-score anomaly detection (integer-exact variance)
# ---------------------------------------------------------------------------


def rolling_zscore(
    series_df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    val_col: str,
    window: int = 24,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection over a bucket series: each point is
    standardized against the PRECEDING ``window`` points of its own series
    (the trailing baseline never includes the point being judged, so an
    anomaly cannot mask itself).

    Cross-engine determinism: built-in windowed stddev is NOT bit-stable
    across engines (Welford vs sum-of-squares, different accumulation
    order), so the z-score is derived from exact int64 frame sums instead:
    with s = SUM(v), q = SUM(v*v), W = window over the frame,

        z = (W*v - s) / sqrt(W*q - s*s)

    which is algebraically (v - mean)/stddev_pop but touches floating point
    only in one correctly-rounded sqrt and one division — bit-identical in
    any IEEE engine. Rows without a full W-point trailing frame are dropped
    (no partial baselines).

    Zero-variance frames (flat baseline) cannot be standardized: ``z`` is
    NULL there, and ``is_anomaly`` falls back to "any change from the flat
    baseline" (W*v != s) — a step after a constant run IS an anomaly.

    Output: (keys..., ts, v, frame_sum, frame_sumsq, z, is_anomaly).

    Scale: ONE window keyed by the series key (a ROWS frame, so Spark
    keeps a running frame — O(n) per series, no re-scan per row). Pure JVM,
    whole-stage codegen; input is tier rows, not raw samples.
    """
    if window < 2:
        raise ValueError("rolling_zscore: window must be >= 2")
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-window, -1)
    )
    v = F.col(val_col).cast("long")
    out = series_df.select(
        *keys,
        F.col(ts_col).cast("long").alias("ts"),
        v.alias("v"),
        F.count(F.lit(1)).over(w).alias("_n"),
        F.sum(v).over(w).cast("long").alias("frame_sum"),
        F.sum(v * v).over(w).cast("long").alias("frame_sumsq"),
    ).where(F.col("_n") == window)
    num = F.lit(window) * F.col("v") - F.col("frame_sum")
    var_num = (
        F.lit(window) * F.col("frame_sumsq")
        - F.col("frame_sum") * F.col("frame_sum")
    )
    z = F.when(
        var_num > 0, num.cast("double") / F.sqrt(var_num.cast("double"))
    )
    return out.select(
        *keys,
        "ts",
        "v",
        "frame_sum",
        "frame_sumsq",
        z.alias("z"),
        F.when(var_num > 0, F.abs(z) > F.lit(float(threshold)))
        .otherwise(num != 0)
        .alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# cross-series correlation
# ---------------------------------------------------------------------------


def source_correlation(
    tier_df: DataFrame,
    sources: list[str] | None = None,
    max_sources: int = 1_000,
) -> DataFrame:
    """Pairwise Pearson correlation between per-source tier series — the
    "which sources move together" read (cross-series analytics over the
    continuous aggregates, never raw points).

    Series: x_s(bucket) = SUM(sum) of source ``s``'s tier rows in that
    bucket. Pairs correlate over their SHARED buckets only (inner join on
    bucket_ts; a bucket one side lacks is missing data, not zero).

    Cross-engine determinism (the rolling_zscore argument, scaled up):
    every accumulator — n, Σx, Σy, Σxy, Σx², Σy² — is an exact
    decimal(38,0) integer (HUGEINT in the DuckDB oracle), as are the
    derived num = n·Σxy − Σx·Σy and den d_i = n·Σx_i² − (Σx_i)², so
    aggregation order cannot perturb anything. Floats appear only in the
    final ``corr = num / (sqrt(d1) · sqrt(d2))``: three exactly-rounded
    integer→double conversions, two correctly-rounded sqrts, one multiply,
    one divide — bit-identical in any IEEE engine. Constant series
    (d_i = 0) get corr NULL. (Engine caveat found while oracling this:
    DuckDB's direct HUGEINT→DOUBLE cast computes upper·2⁶⁴ + lower in
    doubles — two roundings, one ulp off on >53-bit values — so the
    oracle converts via VARCHAR, which parses correctly rounded; Spark's
    BigDecimal conversion is correctly rounded natively.)

    Scale shape: the tier collapses to one (source, bucket) row per
    bucket BEFORE pairing (map-side partial agg), so the self-join input
    is |sources| × buckets narrow rows and the join itself is a
    bucket_ts-keyed shuffle producing ≤ |sources|²/2 × buckets rows —
    independent of corpus size but inherently QUADRATIC in |sources|.
    Pass ``sources=`` to restrict the cohort (pushed into the tier scan
    before the collapse); without one, a cheap |sources|-row count-
    distinct guards the pair grid and FAILS FAST above ``max_sources``
    (10³ sources is already a 5×10⁵-pair grid per bucket) rather than
    silently launching a 10⁸-pair shuffle.

    Output: (s1, s2, n, num, d1, d2, corr) with s1 < s2.
    """
    if sources is not None:
        if len(sources) < 2:
            raise ValueError("source_correlation: cohort needs >= 2 sources")
        if len(sources) > max_sources:
            raise ValueError(
                f"source_correlation: cohort of {len(sources)} sources exceeds "
                f"max_sources={max_sources} — the pair grid is quadratic"
            )
        tier_df = tier_df.where(F.col("source").isin(list(sources)))
    else:
        n_src = tier_df.select("source").distinct().count()
        if n_src > max_sources:
            raise ValueError(
                f"source_correlation: {n_src} sources exceeds "
                f"max_sources={max_sources}; pass sources=<cohort> (the pair "
                f"grid is quadratic in |sources|) or raise max_sources "
                f"explicitly"
            )
    dec = "decimal(38,0)"
    per = tier_df.groupBy("source", "bucket_ts").agg(
        F.sum("sum").cast("long").alias("x")
    )
    a, b = per.alias("a"), per.alias("b")
    ax, bx = F.col("a.x").cast(dec), F.col("b.x").cast(dec)
    pairs = (
        a.join(
            b,
            (F.col("a.bucket_ts") == F.col("b.bucket_ts"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(ax).alias("sx"),
            F.sum(bx).alias("sy"),
            F.sum(ax * bx).alias("sxy"),
            F.sum(ax * ax).alias("sxx"),
            F.sum(bx * bx).alias("syy"),
        )
    )
    n = F.col("n").cast(dec)
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = n * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (d1 > 0) & (d2 > 0),
        num.cast("double")
        / (F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double"))),
    )
    return pairs.select(
        "s1",
        "s2",
        "n",
        num.cast("double").alias("num"),
        d1.cast("double").alias("d1"),
        d2.cast("double").alias("d2"),
        corr.alias("corr"),
    )


# ---------------------------------------------------------------------------
# data-completeness / coverage audit
# ---------------------------------------------------------------------------


def coverage_by_window(
    tier_df: DataFrame,
    tier_seconds: int = 60,
    window_seconds: int = 86400,
) -> DataFrame:
    """Per-(source, window) DATA-COMPLETENESS audit over a committed tier —
    the "is this feed healthy" / SLO read: how many of the tier buckets a
    source SHOULD have in each window are actually present, and how long
    its longest silent stretch was.

    Expected buckets are clamped to the source's global active span
    [first bucket, last bucket + tier] — a source that starts mid-window
    or retires is not penalized for time it never claimed to cover.
    ``longest_gap`` is the longest missing stretch in seconds within the
    window: the max of the lead-in gap (window/span start → first present
    bucket), every intra-window gap between consecutive present buckets,
    and the tail gap (last present bucket end → window/span end).

    Fully-silent windows inside the span surface as coverage 0 rows (the
    point of the audit), via a per-source window grid exploded from the
    |sources|-row span aggregate — never from the data, which is absent.

    Exactness: everything is integer arithmetic on bucket timestamps
    except the single ``coverage = present/expected`` division. Scale
    shape: the tier collapses to DISTINCT (source, bucket) rows first
    (map-side partial), the span aggregate is |sources| rows broadcast
    back, and the lag window runs per (source, window) partitions of at
    most window/tier rows. Pure JVM end to end.

    Output: (source, window_ts, expected, present, coverage, longest_gap).
    """
    t = int(tier_seconds)
    w = int(window_seconds)
    if w % t != 0:
        raise ValueError(f"window {w}s must be a multiple of tier {t}s")
    buckets = tier_df.select("source", "bucket_ts").distinct()
    span = buckets.groupBy("source").agg(
        F.min("bucket_ts").alias("_s0"),
        (F.max("bucket_ts") + t).alias("_s1"),
    )
    win = (F.floor(F.col("bucket_ts") / w) * w).cast("long")
    lagged = buckets.select(
        "source",
        win.alias("window_ts"),
        "bucket_ts",
        F.lag("bucket_ts")
        .over(Window.partitionBy("source", win).orderBy("bucket_ts"))
        .alias("_prev"),
    )
    per = lagged.groupBy("source", "window_ts").agg(
        F.count(F.lit(1)).cast("long").alias("present"),
        F.min("bucket_ts").alias("_first"),
        F.max("bucket_ts").alias("_last"),
        F.max(F.col("bucket_ts") - F.col("_prev") - t).alias("_intra"),
    )
    # densify: a fully-silent window inside the active span must surface
    # as coverage 0, not as a missing row (the whole point of the audit)
    grid = span.select(
        "source", "_s0", "_s1",
        F.explode(
            F.sequence(
                (F.floor(F.col("_s0") / w) * w).cast("long"),
                (F.floor((F.col("_s1") - 1) / w) * w).cast("long"),
                F.lit(w),
            )
        ).alias("window_ts"),
    )
    j = grid.join(per, ["source", "window_ts"], "left")
    w_lo = F.greatest(F.col("window_ts"), F.col("_s0"))
    w_hi = F.least(F.col("window_ts") + w, F.col("_s1"))
    expected = ((w_hi - w_lo) / t).cast("long")
    present = F.coalesce(F.col("present"), F.lit(0)).cast("long")
    gap = F.greatest(
        F.coalesce(F.col("_first"), w_hi) - w_lo,        # lead-in / all-silent
        F.coalesce(F.col("_intra"), F.lit(0)),           # between present buckets
        w_hi - (F.coalesce(F.col("_last"), w_lo - t) + t),  # tail / all-silent
        F.lit(0),
    )
    return j.select(
        "source",
        "window_ts",
        expected.alias("expected"),
        present.alias("present"),
        (present.cast("double") / expected.cast("double")).alias("coverage"),
        gap.cast("long").alias("longest_gap"),
    )


def top_series(
    tier_df: DataFrame,
    k: int = 5,
    window_seconds: int = 86400,
) -> DataFrame:
    """TOP-K series per (source, window) by total tokens — the "top
    talkers" read ("which documents dominated this source today"),
    answered from a committed tier's per-doc rows, never raw points.

    Deterministic total order: rank by (total DESC, doc_id ASC), exact
    int64 totals. Scale shape: one partial-aggregated groupBy collapses
    the tier to (source, window, doc) totals, then the rank window runs
    per (source, window) groups — bounded by that window's distinct
    docs, and only rank <= k rows survive. Pure JVM.

    Output: (source, window_ts, rank, doc_id, total).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = int(window_seconds)
    win = (F.floor(F.col("bucket_ts") / w) * w).cast("long")
    totals = tier_df.groupBy(
        "source", win.alias("window_ts"), "doc_id"
    ).agg(F.sum("sum").cast("long").alias("total"))
    rank = F.row_number().over(
        Window.partitionBy("source", "window_ts").orderBy(
            F.col("total").desc(), F.col("doc_id").asc()
        )
    )
    return (
        totals.withColumn("rank", rank.cast("long"))
        .where(F.col("rank") <= int(k))
        .select("source", "window_ts", "rank", "doc_id", "total")
    )


def top_movers(
    tier_df: DataFrame,
    k: int = 5,
    window_seconds: int = 3600,
) -> DataFrame:
    """TOP-K MOVERS: per window, the sources whose total changed most
    versus their own previous window — the "what just changed" triage
    read (PromQL `topk(k, delta(...))` shape), answered from tier rows.

    delta = total - prev_total over each source's consecutive present
    windows (a source's first window has no baseline and is excluded;
    a missing window makes the NEXT present window compare against the
    last present one — deltas are change-since-last-seen, the PromQL
    delta() convention for sparse series). Rank within each window by
    (|delta| DESC, source ASC) — exact int64 arithmetic end to end.

    Scale shape: one partial-aggregated groupBy to (source, window)
    totals, one lag window per source (O(windows) rows), one rank
    window per window (≤ |sources| rows). Pure JVM.

    Output: (window_ts, rank, source, total, prev_total, delta).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = int(window_seconds)
    win = (F.floor(F.col("bucket_ts") / w) * w).cast("long")
    totals = tier_df.groupBy("source", win.alias("window_ts")).agg(
        F.sum("sum").cast("long").alias("total")
    )
    lagw = Window.partitionBy("source").orderBy("window_ts")
    with_prev = totals.select(
        "source",
        "window_ts",
        "total",
        F.lag("total").over(lagw).alias("prev_total"),
    ).where(F.col("prev_total").isNotNull())
    delta = (F.col("total") - F.col("prev_total")).alias("delta")
    rank = F.row_number().over(
        Window.partitionBy("window_ts").orderBy(
            F.abs(F.col("total") - F.col("prev_total")).desc(),
            F.col("source").asc(),
        )
    )
    return (
        with_prev.select(
            "window_ts", "source", "total", "prev_total", delta
        )
        .withColumn("rank", rank.cast("long"))
        .where(F.col("rank") <= int(k))
        .select("window_ts", "rank", "source", "total", "prev_total", "delta")
    )


def seasonal_profile(
    tier_df: DataFrame,
    period_seconds: int = 86400,
    tier_seconds: int = 3600,
) -> DataFrame:
    """SEASONAL baseline: per (source, phase-of-period) exact statistics
    of a tier's bucket totals — the hour-of-day / day-of-week profile an
    anomaly judgment compares against ("is 3am always this quiet?").

    phase = bucket_ts mod period (e.g. hour-of-day for a 1h tier and a
    1-day period). Exact int64 sums/extremes over each phase's bucket
    totals; mean is the single sum/cnt division. One partial-aggregated
    groupBy to (source, phase-bucket) totals, then one |sources|·phases
    aggregate — pure JVM, two bounded shuffles.

    Output: (source, phase, n_buckets, total, mean, tmin, tmax).
    """
    p = int(period_seconds)
    t = int(tier_seconds)
    if p % t != 0:
        raise ValueError(f"period {p}s must be a multiple of tier {t}s")
    per = tier_df.groupBy("source", "bucket_ts").agg(
        F.sum("sum").cast("long").alias("x")
    )
    phase = F.pmod(F.col("bucket_ts"), F.lit(p)).cast("long")
    return per.groupBy("source", phase.alias("phase")).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("x").cast("long").alias("total"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mean"),
        F.min("x").cast("long").alias("tmin"),
        F.max("x").cast("long").alias("tmax"),
    )


# ---------------------------------------------------------------------------
# label-grouped aggregation (PromQL `sum by (group)` with a dim table)
# ---------------------------------------------------------------------------


def group_aggregate(
    tier_df: DataFrame,
    mapping: DataFrame,
    default_group: str = "other",
) -> DataFrame:
    """Per-(group, bucket) exact tier totals under a source→group LABEL
    MAPPING — the PromQL ``sum by (team)`` / Prometheus-relabel read: a
    fleet groups thousands of sources into a handful of teams/regions
    and dashboards aggregate at the group level.

    ``mapping`` is a dim frame ``(source, grp)``; it is BROADCAST (a
    label map is small by construction — one row per source, and the
    whole point of grouping is |groups| ≪ |sources|), so the tier scan
    never shuffles for the join: the map-side hash join rewrites each
    row's key, and the single shuffle is the (grp, bucket_ts) aggregate
    — bounded by |groups| × buckets, not by the tier. Sources absent
    from the mapping fall into ``default_group`` (PromQL's unlabeled
    catch-all) rather than silently dropping data.

    All outputs are exact int64 combines of the tier's partial
    aggregates (sum/cnt/min/max re-aggregate losslessly; mean is the
    one sum/cnt division) — order-insensitive, so Spark and any SQL
    replay agree bitwise.

    Output: (grp, bucket_ts, n_series, cnt, sum, vmin, vmax, mean).
    """
    m = F.broadcast(mapping.select("source", "grp"))
    j = tier_df.join(m, "source", "left").withColumn(
        "grp", F.coalesce(F.col("grp"), F.lit(default_group))
    )
    return j.groupBy("grp", "bucket_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_series"),
        F.sum("cnt").cast("long").alias("cnt"),
        F.sum("sum").cast("long").alias("sum"),
        F.min("vmin").cast("long").alias("vmin"),
        F.max("vmax").cast("long").alias("vmax"),
        (F.sum("sum").cast("double") / F.sum("cnt")).alias("mean"),
    )


# ---------------------------------------------------------------------------
# trailing-window grid (PromQL subquery: max_over_time(...[w])[range:step])
# ---------------------------------------------------------------------------


def moving_window(
    tier_df: DataFrame,
    window_seconds: int = 21600,
    tier_seconds: int = 3600,
) -> DataFrame:
    """TRAILING-window aggregates per series step — the PromQL subquery
    shape ``max_over_time(metric[6h])`` evaluated at every tier bucket:
    for each (source, bucket) the sum/min/max/avg over the trailing
    ``window_seconds`` of that source's buckets, served from a committed
    tier, never raw points.

    Sparse-series semantics come free from the RANGE frame: the frame is
    over the *bucket_ts value domain* (``RANGE BETWEEN w-t PRECEDING AND
    CURRENT ROW``), so a gap in the series shrinks the trailing set
    instead of silently reaching further back (the ROWS-frame bug).
    ``w_cnt`` counts the buckets actually present, so a consumer can
    distinguish "low trailing max" from "thin data".

    Exactness: the tier first collapses to one (source, bucket) int64
    total per bucket (map-side partial agg), the frame aggregates are
    exact int64, and the one float is ``w_avg = w_sum / w_cnt`` — a
    single division both engines round identically.

    Scale shape: ONE shuffle on ``source`` (the window partition key);
    each partition sorts its own O(range/step) bucket rows, and the
    frame is computed in a single pass. Pure JVM.

    Output: (source, bucket_ts, x, w_cnt, w_sum, w_min, w_max, w_avg).
    """
    w, t = int(window_seconds), int(tier_seconds)
    if w % t != 0 or w < t:
        raise ValueError(f"window {w}s must be a positive multiple of tier {t}s")
    per = tier_df.groupBy("source", "bucket_ts").agg(
        F.sum("sum").cast("long").alias("x")
    )
    frame = (
        Window.partitionBy("source")
        .orderBy(F.col("bucket_ts").cast("long"))
        .rangeBetween(-(w - t), Window.currentRow)
    )
    return per.select(
        "source",
        "bucket_ts",
        "x",
        F.count(F.lit(1)).over(frame).cast("long").alias("w_cnt"),
        F.sum("x").over(frame).cast("long").alias("w_sum"),
        F.min("x").over(frame).cast("long").alias("w_min"),
        F.max("x").over(frame).cast("long").alias("w_max"),
        (
            F.sum("x").over(frame).cast("double")
            / F.count(F.lit(1)).over(frame)
        ).alias("w_avg"),
    )


# ---------------------------------------------------------------------------
# series binary op (PromQL vector matching: a / b, a - b)
# ---------------------------------------------------------------------------


def series_ratio(
    tier_df: DataFrame,
    num_source: str,
    den_source: str,
) -> DataFrame:
    """BINARY OP between two series — the PromQL vector-matching read
    (``errors / requests``, ``cache_hits - cache_misses``): per bucket,
    the numerator source's tier total against the denominator source's,
    with inner matching (a bucket either side lacks yields no sample —
    PromQL drops unmatched vector elements rather than inventing zeros).

    One scan: the two-source predicate pushes into the tier read
    (partition/row-group pruning on ``source`` where clustered), and a
    single conditional-aggregation pivot builds both sides in the same
    (bucket_ts) groupBy — no self-join, no second scan. num/den/diff
    are exact int64; ``ratio`` is the one num/den division (NULL when
    den = 0, PromQL's division guard).

    Output: (bucket_ts, num, den, diff, ratio).
    """
    if num_source == den_source:
        raise ValueError("series_ratio: numerator and denominator must differ")
    f = tier_df.where(F.col("source").isin([num_source, den_source]))
    per = f.groupBy("bucket_ts").agg(
        F.sum(F.when(F.col("source") == num_source, F.col("sum")))
        .cast("long")
        .alias("num"),
        F.sum(F.when(F.col("source") == den_source, F.col("sum")))
        .cast("long")
        .alias("den"),
    )
    matched = per.where(F.col("num").isNotNull() & F.col("den").isNotNull())
    ratio = F.when(
        F.col("den") != 0, F.col("num").cast("double") / F.col("den")
    )
    return matched.select(
        "bucket_ts",
        "num",
        "den",
        (F.col("num") - F.col("den")).cast("long").alias("diff"),
        ratio.alias("ratio"),
    )


# ---------------------------------------------------------------------------
# absent/staleness detection (PromQL absent_over_time / stale-feed audit)
# ---------------------------------------------------------------------------


def absent_series(
    tier_df: DataFrame,
    start: int,
    end: int,
    step_seconds: int = 3600,
    expected: list[str] | None = None,
) -> DataFrame:
    """STALE-FEED detection — the PromQL ``absent_over_time`` /
    dead-man's-switch read: which expected sources produced NO data in
    each step cell of ``[start, end)``, and when each was last seen.

    ``expected`` names the watchlist; ``None`` derives it from the
    sources present anywhere in the (already range-bounded) tier slice —
    the "went quiet mid-window" audit. The absent grid is (expected ×
    cells): both factors are serving-bounded (a watchlist and a
    dashboard range), so the cross join is a broadcast of a constant
    cell frame — the gap-fill idiom, never a data-sized shuffle.

    ``last_seen`` is the source's latest present bucket BEFORE OR IN the
    cell within [start, end) (NULL if silent since ``start``): because
    presence timestamps only grow along the cell axis, LOCF is a RUNNING
    MAX over the per-cell maxima — a plain cumulative window, no
    ignore-nulls machinery, identical in any SQL engine.

    Output (absent cells only): (source, window_ts, last_seen,
    stale_seconds = window_end - (last_seen + step < window_end ?
    ... )) — concretely ``window_ts + step - coalesce(last_seen + tier
    bucket length, start)`` is left to the caller; the emitted column is
    ``silent_for = window_ts + step - coalesce(last_seen, start)``
    measured from bucket starts, exact int64.
    """
    s, e, step = int(start), int(end), int(step_seconds)
    if e <= s or (e - s) % step != 0:
        raise ValueError("absent_series: [start,end) must be a multiple of step")
    sliced = tier_df.where(
        (F.col("bucket_ts") >= s) & (F.col("bucket_ts") < e)
    )
    cell = (F.floor((F.col("bucket_ts") - s) / step) * step + s).cast("long")
    present = sliced.groupBy(
        "source", cell.alias("window_ts")
    ).agg(F.max("bucket_ts").cast("long").alias("seen_max"))
    spark = tier_df.sparkSession
    if expected is None:
        srcs = present.select("source").distinct()
    else:
        srcs = spark.createDataFrame([(x,) for x in expected], "source string")
    n_cells = (e - s) // step
    cells = spark.range(n_cells).select(
        (F.col("id") * step + s).cast("long").alias("window_ts")
    )
    grid = srcs.crossJoin(F.broadcast(cells))
    j = grid.join(present, ["source", "window_ts"], "left")
    locf = (
        Window.partitionBy("source")
        .orderBy("window_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_seen = j.select(
        "source",
        "window_ts",
        F.max("seen_max").over(locf).alias("last_seen"),
        F.col("seen_max").isNull().alias("_absent"),
    )
    return (
        with_seen.where(F.col("_absent"))
        .select(
            "source",
            "window_ts",
            F.col("last_seen").cast("long").alias("last_seen"),
            (
                F.col("window_ts")
                + F.lit(step)
                - F.coalesce(F.col("last_seen"), F.lit(s))
            )
            .cast("long")
            .alias("silent_for"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (drift alarms over tier series)
# ---------------------------------------------------------------------------


def cusum_changepoints(
    tier_df: DataFrame,
    slack: int = 0,
    threshold_ratio: int = 8,
) -> DataFrame:
    """CUSUM drift detection per source series — the "this feed's level
    shifted" changepoint read (Page 1954), served from tier bucket
    totals with EXACT integer arithmetic end to end.

    Classic recursions against the series' own mean level:

    * up:   ``S⁺_i = max(0, S⁺_{i-1} + (x_i - target - slack))``
    * down: ``S⁻_i = max(0, S⁻_{i-1} + (target - x_i - slack))``

    computed in CLOSED FORM instead of a sequential fold: with
    ``P_i = Σ_{j≤i} (x_j - target - slack)`` (prefix sum, P_0 = 0),
    ``S⁺_i = P_i - min(P_0..P_i)`` — a cumulative sum minus a running
    min, two plain window aggregates any engine evaluates identically
    on int64 (and symmetrically for S⁻). No higher-order fold, no
    Python, no per-row recursion.

    ``target = total div n_buckets`` (exact integer division of exact
    int64 sums — both engines truncate identically on non-negatives)
    and the alarm bar is ``h = threshold_ratio × target`` — scale-free
    across sources of very different volumes while staying in exact
    integers. A cell alarms upward when S⁺ > h (level ran persistently
    above target), downward when S⁻ > h.

    Scale shape: one map-side-partial groupBy to (source, bucket)
    totals, then ONE shuffle on ``source``; each series' windows are a
    single sorted pass over O(buckets-per-source) narrow rows. Output
    only alarm cells — bounded by flagged buckets.

    Output: (source, bucket_ts, x, target, cusum_up, cusum_dn,
    direction).
    """
    k = int(slack)
    r = int(threshold_ratio)
    if k < 0 or r < 1:
        raise ValueError("cusum_changepoints: slack >= 0, threshold_ratio >= 1")
    per = tier_df.groupBy("source", "bucket_ts").agg(
        F.sum("sum").cast("long").alias("x")
    )
    run = (
        Window.partitionBy("source")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    target = F.expr(
        "sum(x) over (partition by source) div count(1) over (partition by source)"
    ).cast("long")
    per = per.withColumn("target", target)
    d_up = F.col("x") - F.col("target") - F.lit(k)
    d_dn = F.col("target") - F.col("x") - F.lit(k)
    # Two selects because window functions don't nest in one projection;
    # both specs share the (source) partitioning + bucket_ts sort, so
    # Catalyst plans ONE exchange + sort for the whole chain.
    prefixed = per.select(
        "source",
        "bucket_ts",
        "x",
        "target",
        F.sum(d_up).over(run).cast("long").alias("_p_up"),
        F.sum(d_dn).over(run).cast("long").alias("_p_dn"),
    )
    s_up = F.col("_p_up") - F.least(
        F.lit(0).cast("long"), F.min("_p_up").over(run)
    )
    s_dn = F.col("_p_dn") - F.least(
        F.lit(0).cast("long"), F.min("_p_dn").over(run)
    )
    h = (F.col("target") * r).cast("long")
    scored = prefixed.select(
        "source",
        "bucket_ts",
        "x",
        "target",
        s_up.cast("long").alias("cusum_up"),
        s_dn.cast("long").alias("cusum_dn"),
        h.alias("_h"),
    )
    return (
        scored.where(
            (F.col("cusum_up") > F.col("_h"))
            | (F.col("cusum_dn") > F.col("_h"))
        )
        .select(
            "source",
            "bucket_ts",
            "x",
            "target",
            "cusum_up",
            "cusum_dn",
            F.when(F.col("cusum_up") > F.col("_h"), F.lit("up"))
            .otherwise(F.lit("down"))
            .alias("direction"),
        )
    )

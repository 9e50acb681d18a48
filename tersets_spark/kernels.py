"""Arrow-vectorized Spark kernels for the codec + rollup layer.

Everything here follows the input_hint contract: pandas/Arrow UDFs only (no
row-at-a-time Python UDFs). The rollup kernel is vectorized *across* the whole
Arrow batch — one flat int64 buffer and ``np.ufunc.reduceat`` per aggregate —
so per-row Python work is limited to the inherently-sequential codecs.

Exactness note (BASELINE.md "rolled-up-point exact-match"): bucket sums are
computed in int64 over integer tokens, so every aggregate (cnt/sum/min/max/
first/last) is exact and order-independent; means are derived as sum/cnt at
query time. This is what makes Spark output == DuckDB oracle == NumPy oracle
bitwise, with no float-summation-order hazards (SURVEY.md §4.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import codecs
from .methods import Method

# ---------------------------------------------------------------------------
# codec column kernels
# ---------------------------------------------------------------------------


def compress_udf(method: Method, error_bound: float = 0.0):
    """pandas UDF: array<int32|double> column -> binary codec blob."""
    method = Method(method)

    if method == Method.DeltaOfDelta and error_bound == 0.0:
        # Batched whole-batch encoder (byte-identical to the scalar path).
        @F.pandas_udf(BinaryType())
        def _compress_dod(tokens: pd.Series) -> pd.Series:
            from .codecs import delta_of_delta

            arrs = [np.asarray(a, dtype=np.int64) for a in tokens]
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
            offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            flat = np.concatenate(arrs) if arrs else np.zeros(0, dtype=np.int64)
            tail = bytes([int(Method.DeltaOfDelta)])
            blobs = delta_of_delta.compress_blocks(flat, offsets[:-1], offsets[1:])
            return pd.Series([b + tail for b in blobs], dtype=object)

        return _compress_dod

    @F.pandas_udf(BinaryType())
    def _compress(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda arr: codecs.compress(np.asarray(arr, dtype=np.float64), method, error_bound)
        )

    return _compress


@F.pandas_udf(ArrayType(DoubleType()))
def decompress_udf(blobs: pd.Series) -> pd.Series:
    """pandas UDF: binary blob -> array<double> (method from trailing byte)."""
    return blobs.map(lambda b: codecs.decompress(bytes(b)))


@F.pandas_udf(ArrayType(IntegerType()))
def decompress_tokens_udf(blobs: pd.Series) -> pd.Series:
    """Blob -> array<int32> token round-trip (lossless codecs only)."""
    return blobs.map(lambda b: np.round(codecs.decompress(bytes(b))).astype(np.int32))


@F.pandas_udf(ArrayType(IntegerType()))
def safe_decompress_tokens_udf(blobs: pd.Series) -> pd.Series:
    """Like decompress_tokens_udf, but null on ANY decode failure — for the
    post-load integrity audit, where a corrupt blob must count as a
    mismatch rather than kill the job (jobs.validate_tiers)."""

    def one(b):
        try:
            return np.round(codecs.decompress(bytes(b))).astype(np.int32)
        except Exception:
            return None

    return blobs.map(one)


# ---------------------------------------------------------------------------
# fused bucket rollup (raw tokens -> per-bucket aggregates), mapInPandas
# ---------------------------------------------------------------------------

ROLLUP_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("cnt", LongType()),
        StructField("sum", LongType()),
        StructField("vmin", LongType()),
        StructField("vmax", LongType()),
        StructField("first", LongType()),
        StructField("last", LongType()),
    ]
)

ROLLUP_BLOCKS_SCHEMA = StructType(
    ROLLUP_SCHEMA.fields + [StructField("block", BinaryType())]
)


def _flatten_batch(tokens_col: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a Series of int arrays into (flat int64 values, row offsets)."""
    arrs = [np.asarray(a, dtype=np.int64) for a in tokens_col]
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.concatenate(arrs) if arrs else np.zeros(0, dtype=np.int64)
    return flat, offsets


def bucket_rollup_pdf(
    pdf: pd.DataFrame, tier_seconds: int, with_blocks: bool = False, block_method: Method = Method.DeltaOfDelta
) -> pd.DataFrame:
    """Vectorized per-batch rollup: one reduceat per aggregate.

    Point ``j`` of row ``i`` carries timestamp ``ts0_i + j`` (implicit index
    time axis, FIXTURES.md §1); buckets are ``tier_seconds``-aligned epochs.
    """
    if len(pdf) == 0:
        return pd.DataFrame(
            {f.name: pd.Series(dtype="object" if f.name in ("doc_id", "source", "block") else "int64")
             for f in (ROLLUP_BLOCKS_SCHEMA if with_blocks else ROLLUP_SCHEMA).fields}
        )
    delta = np.int64(tier_seconds)
    flat, offsets = _flatten_batch(pdf["tokens"])
    lens = np.diff(offsets)
    ts0 = pdf["ts0"].to_numpy(dtype=np.int64)

    # first in-row index j >= 1 where (ts0 + j) % delta == 0
    j0 = delta - (ts0 % delta)  # in [1, delta]
    n_internal = np.maximum(0, (lens - j0 + delta - 1) // delta)
    counts = 1 + n_internal  # segments per row (first segment starts at j=0)

    nseg = int(counts.sum())
    row_of_seg = np.repeat(np.arange(len(pdf), dtype=np.int64), counts)
    seg_base = np.zeros(len(pdf), dtype=np.int64)
    np.cumsum(counts[:-1], out=seg_base[1:])
    seg_rank = np.arange(nseg, dtype=np.int64) - seg_base[row_of_seg]
    in_row_start = np.where(seg_rank == 0, 0, j0[row_of_seg] + (seg_rank - 1) * delta)
    starts = offsets[row_of_seg] + in_row_start

    sums = np.add.reduceat(flat, starts)
    vmin = np.minimum.reduceat(flat, starts)
    vmax = np.maximum.reduceat(flat, starts)
    cnt = np.diff(starts, append=offsets[-1])
    first = flat[starts]
    last = flat[starts + cnt - 1]
    bucket_ts = ((ts0[row_of_seg] + in_row_start) // delta) * delta

    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy()[row_of_seg],
            "source": pdf["source"].to_numpy()[row_of_seg],
            "bucket_ts": bucket_ts,
            "cnt": cnt,
            "sum": sums,
            "vmin": vmin,
            "vmax": vmax,
            "first": first,
            "last": last,
        }
    )
    if with_blocks:
        ends = starts + cnt
        if block_method == Method.DeltaOfDelta:
            # Batched multi-block encoder: byte-identical blobs, one global
            # NumPy pass instead of ~100 us of per-block overhead.
            from .codecs import delta_of_delta

            tail = bytes([int(Method.DeltaOfDelta)])
            out["block"] = [
                b + tail for b in delta_of_delta.compress_blocks(flat, starts, ends)
            ]
        else:
            out["block"] = [
                codecs.compress(flat[s:e].astype(np.float64), block_method, 0.0)
                for s, e in zip(starts, ends)
            ]
    return out


def rollup_map_in_pandas(tier_seconds: int, with_blocks: bool = False,
                         block_method: Method = Method.DeltaOfDelta):
    """mapInPandas generator for the raw->tier rollup."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield bucket_rollup_pdf(pdf, tier_seconds, with_blocks, block_method)

    return _gen


# ---------------------------------------------------------------------------
# Arrow-native kernels (mapInArrow): zero-copy token access
# ---------------------------------------------------------------------------
#
# The pandas path materializes one numpy object PER ROW for the token array
# (Arrow list -> ndarray copy -> int64 widen -> concatenate): ~3 passes over
# the token payload plus 100k object allocations per batch. The Arrow path
# reads the ListArray's flat values buffer directly (one widen to int64 is
# the only copy), which roughly triples end-to-end cascade throughput.


def _list_column_flat(batch, name: str) -> tuple[np.ndarray, np.ndarray]:
    """(flat int64 values, int64 offsets) of a list<int*> column, zero-copy."""
    import pyarrow as pa

    col = batch.column(batch.schema.get_field_index(name))
    if isinstance(col, pa.ChunkedArray):  # pragma: no cover - batches are flat
        col = col.combine_chunks()
    # Slice offsets honor the array's own offset; values are the child array.
    offsets = np.asarray(col.offsets, dtype=np.int64)
    values = np.asarray(col.values, dtype=np.int64)
    base = offsets[0]
    if base != 0:
        offsets = offsets - base
        values = values[base:]
    return values[: offsets[-1]], offsets


def compress_map_in_arrow(method: Method, out_col: str = "blob", drop_tokens: bool = True):
    """mapInArrow transform: add a binary codec-blob column for `tokens`.

    DeltaOfDelta and GorillaXOR use their batched multi-block encoders over
    the ListArray's flat buffer (one set of global NumPy passes per batch);
    other methods fall back to per-row kernel calls.
    """
    import pyarrow as pa

    method = Method(method)

    def _gen(batches):
        for batch in batches:
            flat, offsets = _list_column_flat(batch, "tokens")
            blobs = _encode_blobs(flat, offsets, method)
            keep = [n for n in batch.schema.names if n != "tokens" or not drop_tokens]
            arrays = [batch.column(batch.schema.get_field_index(n)) for n in keep]
            arrays.append(pa.array(blobs, type=pa.binary()))
            yield pa.RecordBatch.from_arrays(arrays, names=keep + [out_col])

    return _gen


def _encode_blob_segments(
    flat: np.ndarray, starts: np.ndarray, ends: np.ndarray, method: Method
) -> list[bytes]:
    """Per-segment codec blobs (method byte appended) over a flat token
    buffer — batched multi-block encoders for DoD/Gorilla, per-segment
    dispatch else. Segments may be any (start, end) ranges, not just the
    contiguous row offsets (the 1m rollup's per-bucket blocks use this)."""
    from .codecs import delta_of_delta, gorilla

    tail = bytes([int(method)])
    if method == Method.DeltaOfDelta:
        return [b + tail for b in delta_of_delta.compress_blocks(flat, starts, ends)]
    if method == Method.GorillaXOR:
        return [b + tail for b in gorilla.compress_blocks(flat, starts, ends)]
    return [
        codecs.compress(flat[s:e].astype(np.float64), method, 0.0)
        for s, e in zip(starts, ends)
    ]


def _encode_blobs(flat: np.ndarray, offsets: np.ndarray, method: Method) -> list[bytes]:
    """Per-row codec blobs over a flat token buffer (rows = offset ranges)."""
    return _encode_blob_segments(flat, offsets[:-1], offsets[1:], method)


#: tagged-union schema of the fused raw+1m pass (see
#: compress_rollup_map_in_arrow): family 'r' rows carry the raw-tier
#: columns, family 'm' rows the 1m rollup columns; the others are null.
RAW_M1_UNION_SCHEMA = StructType(
    [
        StructField("family", StringType()),
        StructField("doc_id", StringType()),
        StructField("source", StringType()),
        StructField("ts0", LongType()),
        StructField("n_tok", IntegerType()),
        StructField("blob", BinaryType()),
        StructField("bucket_ts", LongType()),
        StructField("cnt", LongType()),
        StructField("sum", LongType()),
        StructField("vmin", LongType()),
        StructField("vmax", LongType()),
        StructField("first", LongType()),
        StructField("last", LongType()),
        StructField("block", BinaryType()),
    ]
)

_UNION_NAMES = [f.name for f in RAW_M1_UNION_SCHEMA.fields]
_UNION_ROLLUP = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]


def compress_rollup_map_in_arrow(
    method: Method,
    tier_seconds: int = 60,
    with_blocks: bool = True,
    block_method: Method | None = None,
):
    """FUSED raw-compress + 1m-rollup pass: ONE zero-copy scan of the token
    payload emits both the raw tier's codec blobs and the 1m tier's bucket
    rollup rows as a tagged union (same staging pattern as the fused sketch
    kernel). The cascade then commits each tier from the staged union —
    the original corpus is scanned exactly once, and the 1m build costs
    neither a second input scan (the ``"input"`` path) nor a blob decode
    (the ``"raw"`` path): the flat buffer is already in memory from the
    compress step, so the rollup adds only the reduceat aggregation.

    Rows are bit-identical to the unfused kernels' (same _encode_blobs,
    same _rollup_emit)."""
    import pyarrow as pa

    method = Method(method)
    block_method = Method(method if block_method is None else block_method)

    pa_types = {
        "family": pa.string(), "doc_id": pa.string(), "source": pa.string(),
        "ts0": pa.int64(), "n_tok": pa.int32(), "blob": pa.binary(),
        "bucket_ts": pa.int64(), "cnt": pa.int64(), "sum": pa.int64(),
        "vmin": pa.int64(), "vmax": pa.int64(), "first": pa.int64(),
        "last": pa.int64(), "block": pa.binary(),
    }

    def _nulls(n, name):
        return pa.nulls(n, type=pa_types[name])

    def _gen(batches):
        delta = np.int64(tier_seconds)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            flat, offsets = _list_column_flat(batch, "tokens")

            n = batch.num_rows
            blobs = _encode_blobs(flat, offsets, method)
            raw_cols = {
                "family": pa.array(["r"] * n, type=pa.string()),
                "doc_id": batch.column(batch.schema.get_field_index("doc_id")),
                "source": batch.column(batch.schema.get_field_index("source")),
                "ts0": batch.column(batch.schema.get_field_index("ts0")),
                "n_tok": batch.column(batch.schema.get_field_index("n_tok")),
                "blob": pa.array(blobs, type=pa.binary()),
            }
            yield pa.RecordBatch.from_arrays(
                [raw_cols.get(nm, _nulls(n, nm)) for nm in _UNION_NAMES],
                names=_UNION_NAMES,
            )

            roll = _rollup_emit(batch, flat, offsets, delta, with_blocks, block_method)
            m = roll.num_rows
            m_cols = {
                nm: roll.column(roll.schema.get_field_index(nm)) for nm in _UNION_ROLLUP
            }
            m_cols["family"] = pa.array(["m"] * m, type=pa.string())
            if with_blocks:
                m_cols["block"] = roll.column(roll.schema.get_field_index("block"))
            yield pa.RecordBatch.from_arrays(
                [m_cols.get(nm, _nulls(m, nm)) for nm in _UNION_NAMES],
                names=_UNION_NAMES,
            )

    return _gen


def _rollup_emit(batch, flat, offsets, delta, with_blocks, block_method):
    """Shared raw->tier aggregation body: reduceat aggregates + batched
    blocks over a flat token buffer (however it was obtained). Same math as
    bucket_rollup_pdf; doc_id/source replication via Arrow `take`."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lens = np.diff(offsets)
    ts0 = np.asarray(batch.column(batch.schema.get_field_index("ts0")), dtype=np.int64)

    j0 = delta - (ts0 % delta)
    n_internal = np.maximum(0, (lens - j0 + delta - 1) // delta)
    counts = 1 + n_internal
    nseg = int(counts.sum())
    row_of_seg = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
    seg_base = np.zeros(batch.num_rows, dtype=np.int64)
    np.cumsum(counts[:-1], out=seg_base[1:])
    seg_rank = np.arange(nseg, dtype=np.int64) - seg_base[row_of_seg]
    in_row_start = np.where(seg_rank == 0, 0, j0[row_of_seg] + (seg_rank - 1) * delta)
    starts = offsets[row_of_seg] + in_row_start

    sums = np.add.reduceat(flat, starts)
    vmin = np.minimum.reduceat(flat, starts)
    vmax = np.maximum.reduceat(flat, starts)
    cnt = np.diff(starts, append=offsets[-1])
    first = flat[starts]
    last = flat[starts + cnt - 1]
    bucket_ts = ((ts0[row_of_seg] + in_row_start) // delta) * delta

    idx = pa.array(row_of_seg)
    doc_id = pc.take(batch.column(batch.schema.get_field_index("doc_id")), idx)
    source = pc.take(batch.column(batch.schema.get_field_index("source")), idx)
    arrays = [
        doc_id,
        source,
        pa.array(bucket_ts),
        pa.array(cnt),
        pa.array(sums),
        pa.array(vmin),
        pa.array(vmax),
        pa.array(first),
        pa.array(last),
    ]
    names = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]
    if with_blocks:
        blobs = _encode_blob_segments(flat, starts, starts + cnt, block_method)
        arrays.append(pa.array(blobs, type=pa.binary()))
        names.append("block")
    return pa.RecordBatch.from_arrays(arrays, names=names)


def rollup_map_in_arrow(
    tier_seconds: int,
    with_blocks: bool = False,
    block_method: Method = Method.DeltaOfDelta,
):
    """mapInArrow raw->tier rollup: reduceat aggregates + batched blocks.

    Same math as bucket_rollup_pdf, but doc_id/source replication happens
    with Arrow `take` (C++, no Python objects) and token access is zero-copy.
    """

    def _gen(batches):
        delta = np.int64(tier_seconds)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            flat, offsets = _list_column_flat(batch, "tokens")
            yield _rollup_emit(batch, flat, offsets, delta, with_blocks, block_method)

    return _gen


def rollup_blobs_map_in_arrow(
    tier_seconds: int,
    with_blocks: bool = False,
    block_method: Method = Method.DeltaOfDelta,
):
    """mapInArrow RAW-TIER -> 1m rollup: decode the committed codec blobs
    instead of rescanning the input table.

    This is the single-source-scan cascade shape: with
    ``run_cascade(m1_source="raw")`` the original corpus is scanned exactly
    ONCE (the raw compress pass); every other tier derives from the tier
    below it — 1m from the raw tier's blobs (typically a fraction of the
    input bytes), 1h from 1m, 1d from 1h. At 100 TB the second full input
    scan is the single largest avoidable cost in the default cascade.

    Decode is per-blob (each call is a vectorized NumPy decode of a whole
    document); values round-trip exactly for the lossless raw-tier codecs,
    so the emitted tier rows are BIT-IDENTICAL to the input-scan kernel's
    (the rollup_from_blobs contract query pins exactly this equality).
    """
    import pyarrow as pa

    def _gen(batches):
        delta = np.int64(tier_seconds)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            blob_idx = batch.schema.get_field_index("blob")
            toks = [
                np.round(codecs.decompress(b.as_py())).astype(np.int64)
                for b in batch.column(blob_idx)
            ]
            offsets = np.zeros(len(toks) + 1, dtype=np.int64)
            np.cumsum(np.fromiter((len(t) for t in toks), np.int64, len(toks)),
                      out=offsets[1:])
            flat = (
                np.concatenate(toks) if toks else np.zeros(0, dtype=np.int64)
            )
            yield _rollup_emit(batch, flat, offsets, delta, with_blocks, block_method)

    return _gen


# ---------------------------------------------------------------------------
# fused sketch partials (both families, one zero-copy pass) — mapInArrow
# ---------------------------------------------------------------------------
#
# The expression path for the sketch tiers (jobs._sketch_points -> sketch.py /
# hll.py) costs one posexplode scan of the token payload PER FAMILY; profiled
# at sf0.1 the explode is ~4 s of each ~5-6 s build. This kernel reads the
# ListArray flat buffer once (same zero-copy idiom as rollup_map_in_arrow)
# and emits per-batch partials for BOTH families, tagged by a `family`
# column: 'p' rows are (bucket_id, count) HDR-percentile partials, 'h' rows
# are (register, rho-max) HLL partials. Partials combine exactly downstream
# (groupBy sum / max), so the result is bit-identical to the expression path
# (pinned by tests/test_sketch_kernel.py).

SKETCH_PARTIALS_SCHEMA = StructType(
    [
        StructField("family", StringType()),
        StructField("source", StringType()),
        StructField("bucket_ts", LongType()),
        StructField("bucket", LongType()),
        StructField("val", LongType()),
    ]
)

#: value -> (hll register, rho) cache; vocab-bounded, worker-process lifetime.
_HLL_VALUE_LUT: dict[int, tuple[int, int]] = {}


def _hll_lut_arrays(uniq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) for each unique value — md5-derived, identical to
    hll.hll_bucket_rho (same hex-digit math), memoized across batches."""
    import hashlib

    bkt = np.empty(len(uniq), dtype=np.int64)
    rho = np.empty(len(uniq), dtype=np.int64)
    for i, v in enumerate(uniq.tolist()):
        hit = _HLL_VALUE_LUT.get(v)
        if hit is None:
            h = hashlib.md5(str(v).encode()).hexdigest()
            bits = bin(int(h[2:14], 16))[2:].zfill(48)
            hit = (int(h[:2], 16), (len(bits) - len(bits.lstrip("0"))) + 1)
            # cap: memoization is a vocab-sized win for token ids; an
            # unbounded value domain must not leak worker memory forever
            if len(_HLL_VALUE_LUT) < 1_000_000:
                _HLL_VALUE_LUT[v] = hit
        bkt[i], rho[i] = hit
    return bkt, rho


#: cross-batch accumulator compaction threshold (rows per family per task);
#: bounds worker memory at ~2 arrays x 8 B x this per family.
_ACC_COMPACT_ROWS = 2_000_000

#: value -> K bloom bit positions; vocab-bounded, worker-process lifetime.
_BLOOM_VALUE_LUT: dict[int, tuple[int, ...]] = {}


def _bloom_lut_arrays(uniq: np.ndarray) -> np.ndarray:
    """(len(uniq), K) bit positions — md5-derived, identical to
    bloom.bloom_positions_py, memoized across batches (same vocab-sized
    cap rationale as _hll_lut_arrays)."""
    from .bloom import K, bloom_positions_py

    out = np.empty((len(uniq), K), dtype=np.int64)
    for i, v in enumerate(uniq.tolist()):
        hit = _BLOOM_VALUE_LUT.get(v)
        if hit is None:
            hit = tuple(bloom_positions_py(v))
            if len(_BLOOM_VALUE_LUT) < 1_000_000:
                _BLOOM_VALUE_LUT[v] = hit
        out[i] = hit
    return out


#: value -> D count-min cell columns; vocab-bounded, worker-process lifetime.
_CMS_VALUE_LUT: dict[int, tuple[int, ...]] = {}


def _cms_lut_arrays(uniq: np.ndarray) -> np.ndarray:
    """(len(uniq), D) column positions — md5-derived, identical to
    cms.cms_positions_py, memoized across batches (same vocab-sized cap
    rationale as the bloom/hll LUTs)."""
    from .cms import D, cms_positions_py

    out = np.empty((len(uniq), D), dtype=np.int64)
    for i, v in enumerate(uniq.tolist()):
        hit = _CMS_VALUE_LUT.get(v)
        if hit is None:
            hit = tuple(cms_positions_py(v))
            if len(_CMS_VALUE_LUT) < 1_000_000:
                _CMS_VALUE_LUT[v] = hit
        out[i] = hit
    return out


def sketch_partials_map_in_arrow(
    tier_seconds: int = 60, families: tuple[str, ...] = ("p", "h")
):
    """mapInArrow generator: sequences -> tagged sketch partials.

    ``families`` selects which sketch families the single zero-copy pass
    emits: "p" (HDR percentile counts), "h" (HLL max-rho registers), "b"
    (Bloom words: per-(source, bucket) distinct values' K md5 positions
    OR-ed into 48-bit words — the partial rows reuse the shared schema
    with bucket = widx and val = word), "c" (Count-Min cells: per-pair
    occurrence counts scatter-added into D md5-derived cells; bucket =
    ridx*WIDTH + cidx — at D=4, WIDTH=512 exactly the key's 11-bit bucket
    field — and val = cnt). All requested families come from ONE scan of
    the token payload.

    Bit-length comes from ``np.frexp`` (exact for integer doubles: the
    exponent of v in [2^(k-1), 2^k) is k — tokens are < 2^31, far inside
    float64 exactness), matching ``length(bin(v))`` of the expression path;
    negatives fail fast like sketch.hdr_bucket. NULL token elements are not
    supported (same contract as the rollup kernels).
    """
    import pyarrow as pa

    delta = np.int64(tier_seconds)

    class _Acc:
        """Capped cross-batch map-side combine: batch partials accumulate
        per TASK and compact (sort + reduceat on the packed int64 key)
        whenever the buffer passes _ACC_COMPACT_ROWS, so the staged
        partials carry one row per distinct key per task instead of one
        per key per BATCH. Measured at sf0.1 the per-batch emission
        carried 19.3x (bloom) / 7.5x (hll) / 5.4x (psk) duplicate keys —
        all of it staged, shuffled and re-aggregated downstream. Memory
        stays bounded by the cap; a task whose keys never repeat simply
        compacts to itself."""

        __slots__ = ("keys", "vals", "n", "combine")

        def __init__(self, combine):
            self.keys, self.vals, self.n, self.combine = [], [], 0, combine

        def add(self, k, v):
            self.keys.append(k)
            self.vals.append(v)
            self.n += len(k)
            if self.n > _ACC_COMPACT_ROWS:
                self.compact()

        def compact(self):
            k = np.concatenate(self.keys)
            v = np.concatenate(self.vals)
            order = np.argsort(k, kind="stable")
            k, v = k[order], v[order]
            starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
            self.keys = [k[starts]]
            self.vals = [self.combine.reduceat(v, starts)]
            self.n = len(self.keys[0])

        def drain(self):
            if not self.keys:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            self.compact()
            return self.keys[0], self.vals[0]

    def _gen(batches):
        combine_of = {"p": np.add, "h": np.maximum, "b": np.bitwise_or, "c": np.add}
        accs = {f: _Acc(combine_of[f]) for f in families}
        src_code: dict = {}
        src_list: list = []
        for batch in batches:
            if batch.num_rows == 0:
                continue
            flat, offsets = _list_column_flat(batch, "tokens")
            if flat.size == 0:
                continue
            if flat.min() < 0:
                raise ValueError("sketch kernel: negative token value")
            if flat.max() >= (1 << 53):
                # frexp-based bit length goes through float64, whose rounding
                # can change the computed exponent at >= 2^53 and silently
                # mis-bucket vs the expression path's length(bin(v)) — fail
                # fast, mirroring the negative-value guard
                raise ValueError("sketch kernel: token value >= 2^53")
            lens = np.diff(offsets)
            ts0 = np.asarray(
                batch.column(batch.schema.get_field_index("ts0")), dtype=np.int64
            )
            src_col = batch.column(batch.schema.get_field_index("source"))
            codes_batch, src_uniques = pd.factorize(
                pd.Series(src_col.to_pylist()), sort=False
            )
            # task-stable source codes (cross-batch accumulation needs one
            # code space per task, not per batch)
            remap = np.empty(len(src_uniques), dtype=np.int64)
            for i, sname in enumerate(src_uniques):
                c = src_code.get(sname)
                if c is None:
                    c = len(src_list)
                    if c > 255:
                        raise ValueError("sketch kernel: >256 sources per task")
                    src_code[sname] = c
                    src_list.append(sname)
                remap[i] = c
            src_codes_row = remap[codes_batch]

            row_of_tok = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
            pos = np.arange(flat.size, dtype=np.int64) - np.repeat(offsets[:-1], lens)
            # ABSOLUTE minute index (cross-batch keys must agree; epoch
            # timestamps / 60 sit far inside 31 bits)
            minute_idx = (ts0[row_of_tok] + pos) // delta
            if minute_idx.max() >= (1 << 31) or minute_idx.min() < 0:
                raise ValueError("sketch kernel: bucket index outside 31-bit key range")
            src_tok = src_codes_row[row_of_tok].astype(np.int64)
            key_base = (src_tok << 42) | (minute_idx << 11)

            uniq, inv = np.unique(flat, return_inverse=True)
            if "p" in families:
                # psk family: HDR bucket id = bitlen*32 + top-5-bits
                _, exp = np.frexp(flat.astype(np.float64))
                bitlen = np.where(flat == 0, 1, exp).astype(np.int64)
                shift = np.maximum(bitlen - 5, 0)
                bucket_id = bitlen * 32 + (flat >> shift)
                pk, pc_ = np.unique(key_base | bucket_id, return_counts=True)

            if "h" in families:
                # hll family: md5 LUT over batch-unique values, then max-rho
                lut_bkt, lut_rho = _hll_lut_arrays(uniq)
                hkey = key_base | lut_bkt[inv]
                hk, hinv = np.unique(hkey, return_inverse=True)
                hrho = np.zeros(len(hk), dtype=np.int64)
                np.maximum.at(hrho, hinv, lut_rho[inv])

            if "b" in families or "c" in families:
                # bloom and count-min both work per (src-minute, value)
                # PAIR — bloom because a filter is a SET, count-min because
                # the D-way cell scatter runs per pair with the pair's
                # occurrence count as weight. Pair packing is
                # (km * n_uniq + value_idx) — guard the int64 headroom.
                km_all = key_base >> np.int64(11)
                n_uniq = np.int64(len(uniq))
                if (int(km_all.max()) + 1) * int(n_uniq) >= (1 << 62):
                    raise ValueError("sketch kernel: pair key overflow")
                pair, pair_cnt = np.unique(
                    km_all * n_uniq + inv, return_counts=True
                )
                km = pair // n_uniq
                vi = (pair % n_uniq).astype(np.intp)

            if "b" in families:
                from .bloom import WORD_BITS as _BWB

                lut_pos = _bloom_lut_arrays(uniq)  # (n_uniq, K)
                bpos = lut_pos[vi]  # (n_pairs, K)
                widx = bpos // _BWB
                bitmask = np.int64(1) << (bpos % _BWB).astype(np.int64)
                bkey_all = ((km[:, None] << np.int64(11)) | widx).ravel()
                # group-OR via sort + reduceat (bitwise_or.at's per-element
                # dispatch is the slow path — same idiom as
                # _bitpack.or_scatter_monotone)
                order = np.argsort(bkey_all, kind="stable")
                sorted_keys = bkey_all[order]
                group_starts = np.flatnonzero(
                    np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]
                )
                bk = sorted_keys[group_starts]
                bwords = np.bitwise_or.reduceat(
                    bitmask.ravel()[order], group_starts
                )

            if "c" in families:
                # count-min family: each pair adds its occurrence count to
                # its D cells; the cell packs as ridx*WIDTH + cidx (< 2^11,
                # exactly the key's bucket field). Duplicate cell keys
                # within the batch combine in the accumulator (np.add).
                from .cms import D as _CD, WIDTH as _CW

                lut_c = _cms_lut_arrays(uniq)  # (n_uniq, D)
                cell = (
                    np.arange(_CD, dtype=np.int64) * np.int64(_CW) + lut_c[vi]
                )  # (n_pairs, D)
                ckey_all = ((km[:, None] << np.int64(11)) | cell).ravel()
                cvals = np.repeat(pair_cnt.astype(np.int64), _CD)

            if "p" in families:
                accs["p"].add(pk, pc_)
            if "h" in families:
                accs["h"].add(hk, hrho)
            if "b" in families:
                accs["b"].add(bk, bwords)
            if "c" in families:
                accs["c"].add(ckey_all, cvals)

        src_strings = np.asarray(src_list, dtype=object)
        for fam in families:
            keys, vals = accs[fam].drain()
            if len(keys) == 0:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([fam] * len(keys), type=pa.string()),
                    pa.array(src_strings[(keys >> 42).astype(np.intp)], type=pa.string()),
                    pa.array(((keys >> 11) & ((1 << 31) - 1)) * delta),
                    pa.array(keys & ((1 << 11) - 1)),
                    pa.array(vals),
                ],
                names=["family", "source", "bucket_ts", "bucket", "val"],
            )

    return _gen


def edge_points_map_in_arrow(start: int, end: int, keys: tuple[str, ...] = ("source",),
                             with_ts: bool = False):
    """mapInArrow RAW-TIER slice decode: (*keys, ts0, n_tok, blob) ->
    (*keys[, ts], v) points with point-ts in ``[start, end)`` — decode AND
    slice inside the batch, so only the in-range values (< 60 per document
    for a sub-minute edge) ever cross the Arrow boundary. The previous
    shape (pandas-UDF decode -> JVM slice/explode) shipped every decoded
    document whole: ~100M values for a 2-edge sf1.6 range whose answer
    needs a few thousand.

    Serves both the range-stitch edges (``keys=("source",)``) and the
    per-document point-read path (``keys=("doc_id", "source"),
    with_ts=True``).

    Bit-identical to ``slice(decompress(blob), lo+1, hi-lo)``: same
    decode, same [max(0, start-ts0), min(n_tok, end-ts0)) positions.
    """
    import pyarrow as pa

    def _gen(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ts0 = batch.column(batch.schema.get_field_index("ts0")).to_numpy()
            ntk = batch.column(batch.schema.get_field_index("n_tok")).to_numpy()
            key_cols = [batch.column(batch.schema.get_field_index(k)) for k in keys]
            blob_col = batch.column(batch.schema.get_field_index("blob"))
            vals: list[np.ndarray] = []
            tss: list[np.ndarray] = []
            idxs: list[np.ndarray] = []
            for i, b in enumerate(blob_col):
                lo = max(0, int(start - ts0[i]))
                hi = min(int(ntk[i]), int(end - ts0[i]))
                if hi <= lo:
                    continue
                t = np.round(codecs.decompress(b.as_py())).astype(np.int64)[lo:hi]
                vals.append(t)
                if with_ts:
                    tss.append(np.arange(ts0[i] + lo, ts0[i] + hi, dtype=np.int64))
                idxs.append(np.full(len(t), i, dtype=np.int64))
            if not vals:
                continue
            flat = np.concatenate(vals)
            take = pa.array(np.concatenate(idxs))
            arrays = [c.take(take) for c in key_cols]
            names = list(keys)
            if with_ts:
                arrays.append(pa.array(np.concatenate(tss), type=pa.int64()))
                names.append("ts")
            arrays.append(pa.array(flat, type=pa.int64()))
            names.append("v")
            yield pa.RecordBatch.from_arrays(arrays, names)

    return _gen


def threshold_points_map_in_arrow(threshold: int, mode: str = ">="):
    """mapInArrow VALUE-THRESHOLD decode: (doc_id, source, ts0, n_tok,
    blob, w_lo, w_hi) -> (doc_id, source, ts, v) points with
    ``v >= threshold`` (mode ``">="``) or ``v <= threshold`` (``"<="``)
    and point-ts in the row's candidate window ``[w_lo, w_hi)``.

    The candidate window comes from the 1m tier's per-(doc, minute)
    vmin/vmax zone maps (rollup.threshold_points): only documents with at
    least one qualifying minute reach this kernel, and each decode is
    sliced to the doc's first..last candidate minute before the value
    mask — so the values that cross the Arrow boundary are (a subset of
    minutes already known to contain a hit) x (the mask), never the
    corpus.

    Bit-exact contract: decode is the codec's own (lossless blobs give
    the ingested tokens verbatim); the mask is integer comparison.
    """
    import pyarrow as pa

    if mode not in (">=", "<="):
        raise ValueError(f"mode must be '>=' or '<=', got {mode!r}")
    thr = np.int64(threshold)
    want_ge = mode == ">="

    def _gen(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ts0 = batch.column(batch.schema.get_field_index("ts0")).to_numpy()
            ntk = batch.column(batch.schema.get_field_index("n_tok")).to_numpy()
            wlo = batch.column(batch.schema.get_field_index("w_lo")).to_numpy()
            whi = batch.column(batch.schema.get_field_index("w_hi")).to_numpy()
            doc_col = batch.column(batch.schema.get_field_index("doc_id"))
            src_col = batch.column(batch.schema.get_field_index("source"))
            blob_col = batch.column(batch.schema.get_field_index("blob"))
            vals: list[np.ndarray] = []
            tss: list[np.ndarray] = []
            idxs: list[np.ndarray] = []
            for i, b in enumerate(blob_col):
                lo = max(0, int(wlo[i] - ts0[i]))
                hi = min(int(ntk[i]), int(whi[i] - ts0[i]))
                if hi <= lo:
                    continue
                t = np.round(codecs.decompress(b.as_py())).astype(np.int64)[lo:hi]
                mask = t >= thr if want_ge else t <= thr
                if not mask.any():
                    continue
                pos = np.flatnonzero(mask)
                vals.append(t[pos])
                tss.append(ts0[i] + lo + pos.astype(np.int64))
                idxs.append(np.full(len(pos), i, dtype=np.int64))
            if not vals:
                continue
            take = pa.array(np.concatenate(idxs))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_col.take(take),
                    src_col.take(take),
                    pa.array(np.concatenate(tss), type=pa.int64()),
                    pa.array(np.concatenate(vals), type=pa.int64()),
                ],
                ["doc_id", "source", "ts", "v"],
            )

    return _gen

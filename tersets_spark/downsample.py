"""Visual/statistical downsampling of per-series token signals.

LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013) — the standard
perceptual downsampler for time series dashboards: keep first and last
points, split the interior into ``threshold - 2`` equal buckets, and from
each bucket keep the point forming the largest triangle with the
previously kept point and the next bucket's centroid.

Runs as an Arrow-batched pandas UDF over the ``tokens`` array column.  The
hot path flattens the whole batch into one values buffer + offsets and
makes a SINGLE call into the C kernel (``codecs/_lttb_native.c``) — no
per-document Python, no per-bucket NumPy dispatch.  The pure-NumPy
``lttb`` below is the reference semantics and the fallback when no C
compiler is available; the two are bit-identical on integer-valued input
(tokens), pinned by tests/test_native_lttb.py.

Structural invariants (SQL-checkable, used by the ``lttb_downsample``
oracle): output length == min(n, threshold) for n > 2, and the first/last
input points are always kept verbatim.
"""

from __future__ import annotations

import ctypes

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from .codecs._native import load_lttb_kernel

#: resolved once per Python worker; None -> pure-NumPy fallback.
_NATIVE = load_lttb_kernel()


def lttb(values: np.ndarray, threshold: int) -> np.ndarray:
    """Downsample ``values`` (implicit unit-spaced time axis) to at most
    ``threshold`` points; returns the SELECTED VALUES in time order."""
    n = len(values)
    if threshold >= n or threshold < 3:
        return np.asarray(values, dtype=np.float64)
    return np.asarray(values, dtype=np.float64)[lttb_indices(values, threshold)]


def lttb_indices(values: np.ndarray, threshold: int) -> np.ndarray:
    """The SELECTED INDICES of :func:`lttb` (same triangle selection) —
    callers that carry a real time axis (overview serving) map them back
    to timestamps."""
    n = len(values)
    if threshold >= n or threshold < 3:
        return np.arange(n, dtype=np.int64)
    v = np.asarray(values, dtype=np.float64)
    t = np.arange(n, dtype=np.float64)
    # interior bucket boundaries (canonical LTTB split)
    every = (n - 2) / (threshold - 2)
    bounds = (np.floor(np.arange(threshold - 1) * every) + 1).astype(np.int64)
    bounds = np.append(bounds, n - 1)
    out_idx = np.empty(threshold, dtype=np.int64)
    out_idx[0] = 0
    prev = 0
    for i in range(threshold - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = bounds[i + 1], (bounds[i + 2] if i + 2 < len(bounds) else n)
        if i == threshold - 3:
            nhi = n  # last bucket's "next" includes the final point
        avg_t = t[nlo:nhi].mean() if nhi > nlo else t[n - 1]
        avg_v = v[nlo:nhi].mean() if nhi > nlo else v[n - 1]
        # triangle areas: |(t_prev - avg_t)*(v_bucket - v_prev)
        #                  - (t_prev - t_bucket)*(avg_v - v_prev)| / 2
        tb, vb = t[lo:hi], v[lo:hi]
        areas = np.abs(
            (t[prev] - avg_t) * (vb - v[prev]) - (t[prev] - tb) * (avg_v - v[prev])
        )
        prev = lo + int(np.argmax(areas))
        out_idx[i + 1] = prev
    out_idx[-1] = n - 1
    return out_idx


def lttb_batch(arrays: list, threshold: int) -> list | None:
    """Downsample a whole batch of float64 arrays with ONE kernel call.

    Returns a list of np.ndarray (same order), or None when the native
    kernel is unavailable — callers fall back to per-array :func:`lttb`.
    """
    if _NATIVE is None:
        return None
    ndocs = len(arrays)
    if ndocs == 0:
        return []
    lens = np.fromiter((a.size for a in arrays), dtype=np.int64, count=ndocs)
    offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.ascontiguousarray(
        np.concatenate(arrays) if offsets[-1] else np.empty(0), dtype=np.float64
    )
    # mirror lttb()'s passthrough rule: copy when threshold >= n or < 3
    out_lens = np.where((lens <= threshold) | (threshold < 3), lens, threshold)
    out_offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_offsets[1:])
    out = np.empty(out_offsets[-1], dtype=np.float64)
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_lp = ctypes.POINTER(ctypes.c_long)
    rc = _NATIVE(
        flat.ctypes.data_as(c_dp),
        offsets.ctypes.data_as(c_lp),
        ndocs,
        threshold,
        out.ctypes.data_as(c_dp),
        out_offsets.ctypes.data_as(c_lp),
    )
    if rc < 0:  # pragma: no cover - layout mismatch means a wrapper bug
        return None
    return [out[s:e] for s, e in zip(out_offsets[:-1], out_offsets[1:])]


def lttb_udf(threshold: int):
    @F.pandas_udf(ArrayType(DoubleType()))
    def _lttb(token_lists: pd.Series) -> pd.Series:
        arrays = [
            np.asarray(t, dtype=np.float64) if t is not None else np.empty(0)
            for t in token_lists
        ]
        batched = lttb_batch(arrays, threshold)
        if batched is not None:
            return pd.Series([a.tolist() for a in batched])
        return pd.Series([lttb(a, threshold).tolist() for a in arrays])

    return _lttb


# ---------------------------------------------------------------------------
# M4 (pixel-bucket min/max/first/last — Jugel et al., VLDB 2014)
# ---------------------------------------------------------------------------


def m4_points(
    df,
    keys: list[str],
    ts_col: str,
    val_col: str,
    start: int,
    end: int,
    k: int,
):
    """M4 downsampling: split ``[start, end)`` into ``k`` equal pixel
    buckets per series and keep each bucket's FIRST, LAST, MIN and MAX
    points — the four extrema that make a line chart over <= 4k points
    pixel-identical to the full-resolution rendering (Jugel et al., "M4: A
    Visualization-Oriented Time Series Data Aggregation", VLDB 2014).
    Complements LTTB above: M4 is error-free per pixel column and — unlike
    LTTB's sequential triangle sweep — is a PLAIN HASH AGGREGATION, so it
    parallelizes over any partitioning with map-side partial combine.

    Tie-breaks are total and engine-portable: min/max points compare the
    (value, ts) STRUCT lexicographically (equal values -> earlier ts wins
    min, later ts wins max), first/last compare (ts, value). All integer
    math: pixel = (ts - start) * k DIV (end - start).

    Output: one row per non-empty (keys, pxl) bucket with
    (t_first, v_first, t_min, v_min, t_max, v_max, t_last, v_last).

    Scale: ONE shuffle keyed (keys, pxl) — k bounds output at |series| * 4k
    points no matter the input size; partial aggregation means each map
    task contributes at most k rows per series. Pure JVM, no Python.
    """
    if end <= start:
        raise ValueError("m4_points: empty range")
    if k <= 0:
        raise ValueError("m4_points: k must be positive")
    # Integer-value contract (token series are integers): casting a
    # fractional gauge to long would silently TRUNCATE and change which
    # points win min/max/first/last — fail fast instead of mis-selecting.
    from pyspark.sql import types as T

    vt = df.schema[val_col].dataType
    if isinstance(vt, (T.FloatType, T.DoubleType)) or (
        isinstance(vt, T.DecimalType) and vt.scale > 0
    ):
        raise TypeError(
            f"m4_points: val_col {val_col!r} is fractional ({vt.simpleString()}); "
            "M4 extrema here use exact integer math — pre-scale the series to "
            "integers (e.g. fixed-point) before downsampling"
        )
    span = end - start
    ts = F.col(ts_col).cast("long")
    v = F.col(val_col).cast("long")
    pxl = ((ts - F.lit(start)) * k - ((ts - F.lit(start)) * k) % span) / span
    rows = df.where((ts >= start) & (ts < end)).select(
        *keys,
        pxl.cast("long").alias("pxl"),
        ts.alias("_ts"),
        v.alias("_v"),
    )
    agg = rows.groupBy(*keys, "pxl").agg(
        F.min(F.struct(F.col("_ts"), F.col("_v"))).alias("_first"),
        F.max(F.struct(F.col("_ts"), F.col("_v"))).alias("_last"),
        F.min(F.struct(F.col("_v"), F.col("_ts"))).alias("_min"),
        F.max(F.struct(F.col("_v"), F.col("_ts"))).alias("_max"),
    )
    return agg.select(
        *keys,
        "pxl",
        F.col("_first._ts").alias("t_first"),
        F.col("_first._v").alias("v_first"),
        F.col("_min._ts").alias("t_min"),
        F.col("_min._v").alias("v_min"),
        F.col("_max._ts").alias("t_max"),
        F.col("_max._v").alias("v_max"),
        F.col("_last._ts").alias("t_last"),
        F.col("_last._v").alias("v_last"),
    )

"""Visual/statistical downsampling of per-series token signals.

LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013) — the standard
perceptual downsampler for time series dashboards: keep first and last
points, split the interior into ``threshold - 2`` equal buckets, and from
each bucket keep the point forming the largest triangle with the
previously kept point and the next bucket's centroid.

Runs as an Arrow-batched pandas UDF over the ``tokens`` array column: the
outer loop is over the ``threshold`` buckets (small), the per-bucket area
computation is vectorized NumPy — no per-point Python.

Structural invariants (SQL-checkable, used by the ``lttb_downsample``
oracle): output length == min(n, threshold) for n > 2, and the first/last
input points are always kept verbatim.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def lttb(values: np.ndarray, threshold: int) -> np.ndarray:
    """Downsample ``values`` (implicit unit-spaced time axis) to at most
    ``threshold`` points; returns the SELECTED VALUES in time order."""
    n = len(values)
    if threshold >= n or threshold < 3:
        return np.asarray(values, dtype=np.float64)
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
    return v[out_idx]


def lttb_udf(threshold: int):
    @F.pandas_udf(ArrayType(DoubleType()))
    def _lttb(token_lists: pd.Series) -> pd.Series:
        return token_lists.map(
            lambda toks: lttb(
                np.asarray(toks, dtype=np.float64) if toks is not None else np.empty(0),
                threshold,
            ).tolist()
        )

    return _lttb

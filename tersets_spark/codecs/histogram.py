"""Piecewise Constant / Linear Histogram (methods 6/7) — semantics-parity
reimplementation (NOT a translation) of
``/root/reference/src/functional/histogram_compression.zig``.

Paper: Buragohain, Shrivastava & Suri, "Space Efficient Streaming Algorithms
for the Maximum Error Histogram", IEEE ICDE 2006 (Min-Merge).

Semantics trap (zig :63-71): here ``error_bound`` is reinterpreted as the
MAXIMUM NUMBER OF BUCKETS (``max_buckets = floor(error_bound)``, must be
> 1 else ``UnsupportedErrorBoundError``) — a compression-ratio knob, not an
error knob. ``max_buckets`` is also exposed directly for clarity.

Min-Merge: every arriving point opens a singleton bucket; once the bucket
count exceeds ``max_buckets``, the adjacent pair with the minimal merged
error is merged (zig :352-373, :426-471). Merge error is ``(max-min)/2`` for
the constant variant and the MABR line's hull max-error for the linear
variant (zig :388-420).

Reference quirks reproduced faithfully (they shape the observable output):

* PWCH emits each bucket's ``computeConstantApproximation()`` which returns
  the HALF-SPREAD ``(max-min)/2`` (zig :260-262, :82-89) — not the midrange
  ``(max+min)/2`` that would minimize the L-inf error. We replicate the
  reference's output; the likely-intended midrange is noted here for the
  record.
* PWLH stores ``end_value + 1`` for multi-point buckets (zig :134) — a
  latent off-by-one in the reference, replicated for parity.
* Updated merge errors never re-sift the heap because the comparator treats
  same-index entries as equal (zig :293-297 with hashed_priority_queue.zig
  :154-158); stale heap order is part of the observable merge sequence.
* ``updateAllIndex`` logically removes entries by renaming them to the
  sentinel index ``max_buckets + 10`` with error 1e16 (zig :502-511); dead
  entries stay in the heap.
"""

from __future__ import annotations

import ctypes
import math
import struct

import numpy as np

from ..errors import UnsupportedErrorBoundError, UnsupportedInputError
from ._geometry import ConvexHull
from ._heap import HashedHeap
from ._native import load_histogram_kernel

CONSTANT, LINEAR = 0, 1

#: C fast path (None -> pure-Python). Same observable output bit-for-bit —
#: differential suite in tests/test_native_histogram.py.
_NATIVE = load_histogram_kernel()


class _Bucket:
    __slots__ = ("begin", "end", "min_val", "max_val", "hull")

    def __init__(self, begin, end, min_val, max_val):
        self.begin = begin
        self.end = end
        self.min_val = min_val
        self.max_val = max_val
        self.hull = ConvexHull()


class _MergeError:
    __slots__ = ("index", "merge_error")

    def __init__(self, index, merge_error):
        self.index = index
        self.merge_error = merge_error


def _compare(a: _MergeError, b: _MergeError) -> int:
    """compareMergeError (zig :293-297): same index -> equal, else by error."""
    if a.index == b.index:
        return 0
    return (a.merge_error > b.merge_error) - (a.merge_error < b.merge_error)


class _Histogram:
    """Min-Merge histogram (zig :303-515)."""

    def __init__(self, max_buckets: int, approximation: int):
        self.approximation = approximation
        self.max_buckets = max_buckets
        self.buckets: list[_Bucket] = []
        self.queue = HashedHeap(_compare, key=lambda e: e.index)

    def insert(self, index: int, value: float) -> None:
        bucket = _Bucket(index, index, value, value)
        bucket.hull.add((index, value))
        self.buckets.append(bucket)
        if len(self.buckets) > 1:
            last = len(self.buckets) - 1
            self.queue.add(_MergeError(last - 1, self._merge_error(last - 1)))
        if len(self.buckets) > self.max_buckets:
            self._min_merge()

    def _merge_error(self, index: int) -> float:
        if self.approximation == CONSTANT:
            one, two = self.buckets[index], self.buckets[index + 1]
            return (max(one.max_val, two.max_val) - min(one.min_val, two.min_val)) / 2.0
        merged = ConvexHull()
        self.buckets[index].hull.merge(self.buckets[index + 1].hull, merged)
        return merged.mabr_max_error()

    def _min_merge(self) -> None:
        min_merge = self.queue.pop()
        index = min_merge.index
        one = self.buckets[index]
        two = self.buckets[index + 1]
        one.end = two.end
        one.min_val = min(one.min_val, two.min_val)
        one.max_val = max(one.max_val, two.max_val)
        if self.approximation == LINEAR:
            one.hull.merge(two.hull, None)
        del self.buckets[index + 1]

        if index < len(self.buckets) - 1:
            self.queue.add(_MergeError(index, self._merge_error(index)))
            if index > 0:
                # In-place error refresh; never re-sifts (same-index eq quirk).
                self.queue.update(
                    _MergeError(index - 1, -1.0),
                    _MergeError(index - 1, self._merge_error(index - 1)),
                )
            self._update_all_index(index + 1)

    def _update_all_index(self, index: int) -> None:
        """Shift pair indices left after a merge (zig :491-514)."""
        for i in range(index, len(self.buckets)):
            pos = self.queue.get_index(_MergeError(i, 0.0))
            old = self.queue.get(pos)
            if i == index:
                new = _MergeError(self.max_buckets + 10, 1e16)  # logical removal
            else:
                new = _MergeError(old.index - 1, old.merge_error)
            self.queue.update(old, new)


def _max_buckets_for(error_bound: float) -> int:
    if np.float32(error_bound) <= 1.0:
        raise UnsupportedErrorBoundError(
            "histogram methods take the max bucket count (> 1) as error_bound"
        )
    return int(math.floor(np.float32(error_bound)))


def _check_and_buckets(values: np.ndarray, error_bound: float, approximation: int):
    max_buckets = _max_buckets_for(error_bound)
    histogram = _Histogram(max_buckets, approximation)
    for index, value in enumerate(values):
        value = float(value)
        if not math.isfinite(value):
            raise UnsupportedInputError("non-finite input")
        histogram.insert(index, value)
    return histogram.buckets


def _buckets_native(values: np.ndarray, max_buckets: int, approximation: int):
    """Run the C Min-Merge kernel; returns (n, begin, end, minv, maxv,
    slope, intercept) arrays or None when the kernel is unavailable."""
    if _NATIVE is None:
        return None
    vals = np.ascontiguousarray(values, dtype=np.float64)
    n = vals.shape[0]
    begin = np.empty(max_buckets + 2, dtype=np.int64)
    end = np.empty(max_buckets + 2, dtype=np.int64)
    minv = np.empty(max_buckets + 2, dtype=np.float64)
    maxv = np.empty(max_buckets + 2, dtype=np.float64)
    slope = np.empty(max_buckets + 2, dtype=np.float64)
    intercept = np.empty(max_buckets + 2, dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lp = ctypes.POINTER(ctypes.c_long)
    rc = _NATIVE(
        vals.ctypes.data_as(dp), n, max_buckets, approximation,
        begin.ctypes.data_as(lp), end.ctypes.data_as(lp),
        minv.ctypes.data_as(dp), maxv.ctypes.data_as(dp),
        slope.ctypes.data_as(dp), intercept.ctypes.data_as(dp),
    )
    if rc == -2:
        raise UnsupportedInputError("non-finite input")
    if rc < 0:  # allocation/internal failure: fall back to Python
        return None
    return int(rc), begin, end, minv, maxv, slope, intercept


def compress_pwch(values: np.ndarray, error_bound: float) -> bytes:
    """PWCH (zig :57-90): (half_spread f64, end_exclusive u64) pairs."""
    max_buckets = _max_buckets_for(error_bound)
    native = _buckets_native(values, max_buckets, CONSTANT)
    out = bytearray()
    if native is not None:
        nb, _begin, end, minv, maxv, _s, _i = native
        for i in range(nb):
            out += struct.pack("<dQ", (maxv[i] - minv[i]) / 2.0, int(end[i]) + 1)
        return bytes(out)
    for bucket in _check_and_buckets(values, error_bound, CONSTANT):
        out += struct.pack("<dQ", (bucket.max_val - bucket.min_val) / 2.0, bucket.end + 1)
    return bytes(out)


def compress_pwlh(values: np.ndarray, error_bound: float) -> bytes:
    """PWLH (zig :95-142): (begin_value, end_value + 1, end_exclusive) triplets."""
    max_buckets = _max_buckets_for(error_bound)
    native = _buckets_native(values, max_buckets, LINEAR)
    out = bytearray()
    if native is not None:
        nb, begin, end, _minv, _maxv, slopes, intercepts = native
        for i in range(nb):
            b, e = int(begin[i]), int(end[i])
            if e - b > 1:
                slope, intercept = float(slopes[i]), float(intercepts[i])
                begin_value = slope * float(b) + intercept
                end_value = slope * float(e) + intercept
                out += struct.pack("<dd", begin_value, end_value + 1)  # zig :134
            else:
                out += struct.pack("<dd", float(values[b]), float(values[e]))
            out += struct.pack("<Q", e + 1)
        return bytes(out)
    for bucket in _check_and_buckets(values, error_bound, LINEAR):
        slope, intercept = bucket.hull.compute_mabr_linear_function()
        if bucket.end - bucket.begin > 1:
            begin_value = slope * float(bucket.begin) + intercept
            end_value = slope * float(bucket.end) + intercept
            out += struct.pack("<dd", begin_value, end_value + 1)  # zig :134 off-by-one
        else:
            out += struct.pack("<dd", float(values[bucket.begin]), float(values[bucket.end]))
        out += struct.pack("<Q", bucket.end + 1)
    return bytes(out)


def decompress_pwch(blob: bytes) -> np.ndarray:
    """Run-length expansion of (value, end_exclusive) pairs (zig :146-166)."""
    if len(blob) % 16 != 0:
        raise UnsupportedInputError("PWCH blob length must be a multiple of 16")
    pairs = np.frombuffer(blob, dtype="<f8").reshape(-1, 2)
    vals = pairs[:, 0].copy()
    ends = pairs.view("<u8")[:, 1].astype(np.int64)
    starts = np.concatenate(([0], ends[:-1]))
    counts = ends - starts
    if np.any(counts < 0):
        raise UnsupportedInputError("non-monotonic bucket ends")
    return np.repeat(vals, counts)


def decompress_pwlh(blob: bytes) -> np.ndarray:
    """Triplet interpolation (zig :170-220), same family as decompressSlideFilter."""
    if len(blob) % 24 != 0:
        raise UnsupportedInputError("PWLH blob length must be a multiple of 24")
    words = np.frombuffer(blob, dtype="<f8")
    ends = words.view("<u8")
    chunks: list[np.ndarray] = []
    first_t = 0
    index = 0
    while index < len(words):
        start_v = float(words[index])
        end_t = int(ends[index + 2]) - 1
        end_v = float(words[index + 1])
        if first_t < end_t:
            duration = float(end_t - first_t)
            slope = (end_v - start_v) / duration
            intercept = start_v - slope * float(first_t)
            seg = np.empty(end_t - first_t + 1, dtype=np.float64)
            seg[0] = start_v
            # same IEEE ops per interior point as the scalar loop
            seg[1:-1] = slope * np.arange(first_t + 1, end_t, dtype=np.float64) + intercept
            seg[-1] = end_v
            chunks.append(seg)
            first_t = end_t + 1
        else:
            chunks.append(np.array([start_v], dtype=np.float64))
            first_t += 1
        index += 3
    if not chunks:
        return np.empty(0, dtype=np.float64)
    return np.concatenate(chunks)

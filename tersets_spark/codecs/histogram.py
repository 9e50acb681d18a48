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

import math
import struct

import numpy as np

from ..errors import UnsupportedErrorBoundError, UnsupportedInputError
from ._geometry import ConvexHull
from ._heap import HashedHeap

CONSTANT, LINEAR = 0, 1


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
        slope, intercept = merged.compute_mabr_linear_function()
        return merged.compute_max_error(slope, intercept)

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


def _check_and_buckets(values: np.ndarray, error_bound: float, approximation: int):
    if np.float32(error_bound) <= 1.0:
        raise UnsupportedErrorBoundError(
            "histogram methods take the max bucket count (> 1) as error_bound"
        )
    max_buckets = int(math.floor(np.float32(error_bound)))
    histogram = _Histogram(max_buckets, approximation)
    for index, value in enumerate(values):
        value = float(value)
        if not math.isfinite(value):
            raise UnsupportedInputError("non-finite input")
        histogram.insert(index, value)
    return histogram.buckets


def compress_pwch(values: np.ndarray, error_bound: float) -> bytes:
    """PWCH (zig :57-90): (half_spread f64, end_exclusive u64) pairs."""
    buckets = _check_and_buckets(values, error_bound, CONSTANT)
    out = bytearray()
    for bucket in buckets:
        out += struct.pack("<dQ", (bucket.max_val - bucket.min_val) / 2.0, bucket.end + 1)
    return bytes(out)


def compress_pwlh(values: np.ndarray, error_bound: float) -> bytes:
    """PWLH (zig :95-142): (begin_value, end_value + 1, end_exclusive) triplets."""
    buckets = _check_and_buckets(values, error_bound, LINEAR)
    out = bytearray()
    for bucket in buckets:
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
    out: list[float] = []
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
            out.append(start_v)
            for t in range(first_t + 1, end_t):
                out.append(slope * float(t) + intercept)
            out.append(end_v)
            first_t = end_t + 1
        else:
            out.append(start_v)
            first_t += 1
        index += 3
    return np.asarray(out, dtype=np.float64)

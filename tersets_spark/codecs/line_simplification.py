"""Line-simplification codecs: Visvalingam-Whyatt (method 9), Sliding Window
(method 10) and Bottom-Up (method 11) — semantics-parity reimplementations
(NOT translations) of ``/root/reference/src/line_simplification/``.

Papers: Visvalingam & Whyatt, The Cartographic Journal 30(1), 1993; Keogh,
Chu, Hart & Pazzani, "An online algorithm for segmenting time series", IEEE
ICDM 2001 (both Keogh-family methods use RMSE as the cost function).

Visvalingam-Whyatt (visvalingam_whyatt.zig):
* remove the point with the smallest triangle effective area until the
  minimum area >= error_bound (note: AREA threshold, not L-inf; eb=0 keeps
  every point -> lossless); endpoints pinned at +inf area (zig :75-102);
* blob: ``first_value f64`` then ``(index u64, value f64)`` pairs of the
  kept points; decompression interpolates linearly between kept points;
* quirk reproduced: neighbor areas are recomputed only when the neighbor's
  left index is > 0 AND its right index < n (zig :294) — triangles anchored
  at the first point keep their stale area;
* <= 2 points are stored raw BEFORE the negative-bound check (zig :52-61),
  and a negative bound raises UnsupportedInput (not UnsupportedErrorBound).

Sliding Window (sliding_window.zig):
* grow each window while the RMSE of the endpoint-interpolation line is
  strictly below the bound (zig :57-73); emit ``(start_value, end_index,
  end_value)`` triplets; a trailing lone point is emitted as a single-point
  segment (zig :82-86); at eb=0 every segment is a raw 2-point pair ->
  lossless;
* divergence (documented): the reference dispatch passes the method byte to
  this decoder making its length check always fail (tersets.zig:226 vs
  sliding_window.zig:94); we pass the stripped blob like every other method.

Bottom-Up (bottom_up.zig):
* start from 2-point segments, repeatedly merge the adjacent pair with the
  minimal merged RMSE while that cost <= bound AND more than two segments
  remain (zig :97-159); emit the surviving segments as triplets;
* RMSE sums squared errors SEQUENTIALLY in f64 (zig :358-376) — reproduced
  with a scalar loop, never NumPy pairwise summation.

Divergence (documented): length-1 inputs raise ``UnsupportedInputError``
where the reference reads out of bounds (vw zig :56, bottom_up zig :66).
"""

from __future__ import annotations

import ctypes
import math
import struct

import numpy as np

from ..errors import UnsupportedErrorBoundError, UnsupportedInputError
from ._heap import HashedHeap
from ._native import load_linesimp_kernels

_INF = math.inf

#: C fast paths (None -> pure-Python). Bit-identical output — differential
#: suite in tests/test_native_linesimp.py.
_NATIVE = load_linesimp_kernels()


def _run_native(name: str, values: np.ndarray, eb: float) -> bytes | None:
    if _NATIVE is None:
        return None
    vals = np.ascontiguousarray(values, dtype=np.float64)
    out = np.empty(24 * len(vals) + 32, dtype=np.uint8)
    rc = _NATIVE[name](
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(vals),
        eb,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc < 0:
        return None  # allocation failure: python path serves
    return out[:rc].tobytes()


# ---------------------------------------------------------------------------
# Visvalingam-Whyatt
# ---------------------------------------------------------------------------


class _PointArea:
    __slots__ = ("index", "area", "left_point", "right_point")

    def __init__(self, index, area, left_point, right_point):
        self.index = index
        self.area = area
        self.left_point = left_point
        self.right_point = right_point


def _compare_area(a: _PointArea, b: _PointArea) -> int:
    if a.area == b.area:
        return 0
    return (a.area > b.area) - (a.area < b.area)


def _triangle_area(x1, y1, x2, y2, x3, y3) -> float:
    """Absolute triangle area (visvalingam_whyatt.zig :259-268)."""
    return abs((x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2)) / 2.0)


def compress_vw(values: np.ndarray, error_bound: float) -> bytes:
    if len(values) < 2:
        raise UnsupportedInputError("visvalingam-whyatt needs >= 2 values")
    v = values
    if len(v) <= 2:
        return struct.pack("<dQd", float(v[0]), 1, float(v[1]))
    if np.float32(error_bound) < 0:
        raise UnsupportedInputError("negative error bound")  # zig :60-62
    eb = float(np.float32(error_bound))
    native = _run_native("tersets_vw", v, eb)
    if native is not None:
        return native

    heap = HashedHeap(_compare_area, key=lambda p: p.index)
    n = len(v)
    heap.add(_PointArea(0, _INF, 0, 1))
    for i in range(1, n - 1):
        area = _triangle_area(
            float(i - 1), float(v[i - 1]), float(i), float(v[i]), float(i + 1), float(v[i + 1])
        )
        heap.add(_PointArea(i, area, i - 1, i + 1))
    heap.add(_PointArea(n - 1, _INF, n - 2, n))

    probe = _PointArea(0, 0.0, 0, 0)
    while True:  # zig :113 compares against backing capacity — effectively while-true
        min_point = heap.peek()
        if min_point.area >= eb:
            break
        heap.pop()

        probe.index = min_point.left_point
        left = heap.get(heap.get_index(probe))
        left = _PointArea(left.index, left.area, left.left_point, min_point.right_point)

        probe.index = min_point.right_point
        right = heap.get(heap.get_index(probe))
        right = _PointArea(right.index, right.area, min_point.left_point, right.right_point)

        for neighbor in (left, right):
            new_area = neighbor.area
            if neighbor.left_point > 0 and neighbor.right_point < n:  # zig :294 quirk
                new_area = _triangle_area(
                    float(neighbor.left_point),
                    float(v[neighbor.left_point]),
                    float(neighbor.index),
                    float(v[neighbor.index]),
                    float(neighbor.right_point),
                    float(v[neighbor.right_point]),
                )
            heap.update(
                neighbor,
                _PointArea(neighbor.index, new_area, neighbor.left_point, neighbor.right_point),
            )

    kept = sorted(heap.items, key=lambda p: p.index)
    out = bytearray(struct.pack("<d", float(v[0])))
    for point in kept[1:]:
        out += struct.pack("<Qd", point.index, float(v[point.index]))
    return bytes(out)


def decompress_vw(blob: bytes) -> np.ndarray:
    """First value + (index, value) pairs, linear interpolation (zig :169-212)."""
    if (len(blob) - 8) % 16 != 0:
        raise UnsupportedInputError("VW blob length must be 8 + 16k")
    words = np.frombuffer(blob, dtype="<f8")
    indices = words.view("<u8")
    v0 = float(words[0])
    et = indices[1::2].astype(np.int64)
    ev = words[2::2]
    if len(et) == 0:
        return np.array([v0])
    starts = np.concatenate(([0], et[:-1]))
    if np.any(et <= starts):
        return _decompress_vw_scalar(words, indices)
    # kept knots tile (0, et[-1]]: one repeat + one fused line evaluation;
    # same per-element slope*t + intercept ops as the scalar loop, knots
    # stored verbatim
    sv = np.concatenate(([v0], ev[:-1]))
    slopes = (ev - sv) / (et - starts).astype(np.float64)
    intercepts = sv - slopes * starts.astype(np.float64)
    n = int(et[-1]) + 1
    out = np.empty(n, dtype=np.float64)
    out[0] = v0
    t = np.arange(1, n, dtype=np.float64)
    widths = et - starts
    out[1:] = np.repeat(slopes, widths) * t + np.repeat(intercepts, widths)
    out[et] = ev
    return out


def _decompress_vw_scalar(words, indices) -> np.ndarray:
    out = [float(words[0])]
    start_t, start_v = 0, float(words[0])
    index = 0
    while index < len(words) - 1:
        end_t = int(indices[index + 1])
        end_v = float(words[index + 2])
        if start_t + 1 < end_t:
            slope = (end_v - start_v) / float(end_t - start_t)
            intercept = start_v - slope * float(start_t)
            for t in range(start_t + 1, end_t):
                out.append(slope * float(t) + intercept)
        out.append(end_v)
        start_t, start_v = end_t, end_v
        index += 2
    return np.asarray(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# Sliding Window
# ---------------------------------------------------------------------------


def _rmse(v: np.ndarray, seg_start: int, seg_end: int) -> float:
    """Sequential-sum RMSE of the endpoint interpolation (sliding_window.zig :142-160)."""
    seg_len = float(seg_end - seg_start + 1)
    if seg_len <= 1:
        return 0.0
    v_start = float(v[seg_start])
    slope = (float(v[seg_end]) - v_start) / (seg_len - 1)
    intercept = v_start - slope * float(seg_start)
    sse = 0.0
    for i in range(seg_start, seg_end + 1):
        diff = float(v[i]) - (slope * float(i) + intercept)
        sse += diff * diff
    return math.sqrt(sse / seg_len)


def compress_sliding_window(values: np.ndarray, error_bound: float) -> bytes:
    if np.float32(error_bound) < 0:
        raise UnsupportedErrorBoundError("negative error bound")
    eb = float(np.float32(error_bound))
    v = values
    native = _run_native("tersets_sliding_window", v, eb)
    if native is not None:
        return native
    n = len(v)
    out = bytearray()
    seg_start = 0
    while seg_start < n - 1:
        seg_end = seg_start + 2  # the next point always has zero error
        while seg_end < n and _rmse(v, seg_start, seg_end) < eb:
            seg_end += 1
        out += struct.pack("<dQd", float(v[seg_start]), seg_end - 1, float(v[seg_end - 1]))
        seg_start = seg_end
    if seg_start == n - 1:
        out += struct.pack("<dQd", float(v[seg_start]), seg_start, float(v[seg_start]))
    return bytes(out)


def _decompress_keogh(blob: bytes) -> np.ndarray:
    """(start_value, end_index, end_value) triplets with interpolation.

    Shared by SlidingWindow (zig :91-137) and BottomUp (zig :179-228); a
    segment whose end index equals its start marks the trailing lone point
    and is emitted once.
    """
    if len(blob) % 24 != 0:
        raise UnsupportedInputError("blob length must be a multiple of 24")
    words = np.frombuffer(blob, dtype="<f8")
    ends = words.view("<u8")
    if len(words) == 0:
        return np.empty(0, dtype=np.float64)
    sv = words[0::3]
    et = ends[1::3].astype(np.int64)
    ev = words[2::3]
    firsts = np.concatenate(([0], et[:-1] + 1))
    widths = et - firsts + 1
    if np.any(widths < 1) or np.any(widths[:-1] == 1):
        # a lone-point (width-1) segment is only ever the trailing one; a
        # mid-blob lone marker means an arbitrary blob -> scalar semantics
        return _decompress_keogh_scalar(words, ends)
    # disjoint triplets tile [0, et[-1]] (same vectorization as
    # decompress_slide; per-element ops identical to the scalar loop)
    denom = (et - firsts).astype(np.float64)
    multi = widths > 1
    slopes = np.zeros(len(sv), dtype=np.float64)
    np.divide(ev - sv, denom, out=slopes, where=multi)
    intercepts = sv - slopes * firsts.astype(np.float64)
    n = int(et[-1]) + 1
    out = np.repeat(slopes, widths) * np.arange(n, dtype=np.float64) + np.repeat(
        intercepts, widths
    )
    out[firsts] = sv
    out[et[multi]] = ev[multi]
    return out


def _decompress_keogh_scalar(words, ends) -> np.ndarray:
    out: list[float] = []
    first_t = 0
    index = 0
    while index < len(words):
        start_v = float(words[index])
        end_t = int(ends[index + 1])
        end_v = float(words[index + 2])
        if first_t + 1 < end_t:
            slope = (end_v - start_v) / float(end_t - first_t)
            intercept = start_v - slope * float(first_t)
            out.append(start_v)
            for t in range(first_t + 1, end_t):
                out.append(slope * float(t) + intercept)
            out.append(end_v)
            first_t = end_t + 1
        else:
            out.append(start_v)
            if first_t != end_t:
                out.append(end_v)
            first_t += 2
        index += 3
    return np.asarray(out, dtype=np.float64)


def decompress_sliding_window(blob: bytes) -> np.ndarray:
    return _decompress_keogh(blob)


# ---------------------------------------------------------------------------
# Bottom-Up
# ---------------------------------------------------------------------------


class _SegmentCost:
    __slots__ = ("index", "cost", "left_seg", "right_seg", "seg_start", "seg_end")

    def __init__(self, index, cost, left_seg, right_seg, seg_start, seg_end):
        self.index = index
        self.cost = cost
        self.left_seg = left_seg
        self.right_seg = right_seg
        self.seg_start = seg_start
        self.seg_end = seg_end

    def replace(self, **kw) -> "_SegmentCost":
        new = _SegmentCost(
            self.index, self.cost, self.left_seg, self.right_seg, self.seg_start, self.seg_end
        )
        for name, value in kw.items():
            setattr(new, name, value)
        return new


def _compare_cost(a: _SegmentCost, b: _SegmentCost) -> int:
    if a.cost == b.cost:
        return 0
    return (a.cost > b.cost) - (a.cost < b.cost)


def _merge_cost(v: np.ndarray, one: _SegmentCost, two: _SegmentCost) -> float:
    return _rmse(v, min(one.seg_start, two.seg_start), max(one.seg_end, two.seg_end))


def compress_bottom_up(values: np.ndarray, error_bound: float) -> bytes:
    if np.float32(error_bound) < 0:
        raise UnsupportedErrorBoundError("negative error bound")
    if len(values) < 2:
        raise UnsupportedInputError("bottom-up needs >= 2 values")
    v = values
    n = len(v)
    if n <= 2:
        return struct.pack("<dQd", float(v[0]), 1, float(v[1]))
    eb = float(np.float32(error_bound))
    native = _run_native("tersets_bottom_up", v, eb)
    if native is not None:
        return native

    heap = HashedHeap(_compare_cost, key=lambda s: s.index)

    # Initial pairwise segmentation (bottom_up.zig :281-346).
    seg_id = 1
    seg_start = 2
    previous = _SegmentCost(0, _INF, 0, 1, 0, 1)
    while seg_start < n:
        seg_end = seg_start + 1 if seg_start + 1 < n else seg_start
        current = _SegmentCost(seg_id, _INF, seg_id - 1, seg_id + 1, seg_start, seg_end)
        previous.cost = _merge_cost(v, previous, current)
        heap.add(previous)
        seg_id += 1
        previous = current
        seg_start += 2
    heap.add(previous)  # last segment, cost stays inf

    probe = _SegmentCost(0, 0.0, 0, 0, 0, 0)
    while len(heap) > 2:
        min_segment = heap.peek()
        if min_segment.cost > eb:
            break
        heap.pop()

        probe.index = min_segment.right_seg
        right = heap.get(heap.get_index(probe)).replace(seg_start=min_segment.seg_start)

        if min_segment.seg_start != 0:
            probe.index = min_segment.left_seg
            left = heap.get(heap.get_index(probe))
            right.left_seg = left.index
            left = left.replace(right_seg=right.index)
            left.cost = _merge_cost(v, left, right)
            heap.update(left, left)

        if right.seg_end != n - 1:
            probe.index = right.right_seg
            right_to_right = heap.get(heap.get_index(probe))
            right.cost = _merge_cost(v, right, right_to_right)
        heap.update(right, right)

    kept = sorted(heap.items, key=lambda s: s.index)
    out = bytearray()
    for segment in kept:
        out += struct.pack(
            "<dQd", float(v[segment.seg_start]), segment.seg_end, float(v[segment.seg_end])
        )
    return bytes(out)


def decompress_bottom_up(blob: bytes) -> np.ndarray:
    return _decompress_keogh(blob)

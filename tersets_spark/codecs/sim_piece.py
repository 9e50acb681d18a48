"""Sim-Piece (method 5) — semantics-parity reimplementation (NOT a
translation) of ``/root/reference/src/functional/sim_piece.zig``.

Paper: Kitsios et al., "Sim-Piece: Highly Accurate Piecewise Linear
Approximation through Similar Segment Merging", PVLDB 16(8), 2023.

Four phases (zig :42-92):

1. greedy PLA with the intercept quantized to ``floor(v/eb)*eb`` plus the f32
   margin 1e-7 (zig :165-253);
2. merge segments that share a quantized intercept and whose slope intervals
   intersect, after sorting by lower-bound slope (zig :258-366);
3. group into intercept -> slope -> [start_times], slope = midpoint of the
   final bounds (zig :372-398);
4. serialize ``[b_i, N_i, (a_ij, M_ij, dt...)...]`` with per-slope
   delta-encoded start times (zig :400-439), then the input length (zig :91).

Requires ``error_bound > 0`` (zig :48-50); rejects non-finite inputs and
``|x| > 1e15`` (zig :178,194).

Determinism note (SURVEY.md §2.6): the reference iterates Zig hash maps in
phases 2-4, so its compressed *bytes* are not canonical — parity with the
reference is defined on decompressed output. This implementation uses
insertion-ordered dicts and a stable sort, so OUR bytes are canonical and
deterministic; decompression sorts segments by start time (zig :134-139)
making the decompressed output independent of serialization order.
"""

from __future__ import annotations

import ctypes
import math
import struct

import numpy as np

from ..errors import UnsupportedErrorBoundError, UnsupportedInputError
from ._native import load_piece_kernels

_MARGIN = float(np.float32(1e-7))  # shared_structs.zig:23, promoted to f64

#: C fast paths (None -> pure-Python). Bit-identical output — differential
#: suite in tests/test_native_piece.py.
_NATIVE = load_piece_kernels()


def run_piece_native(name: str, values: np.ndarray, error_bound: float) -> bytes | None:
    """Shared Sim/Mix-Piece kernel invocation (f32 bound math stays here)."""
    if _NATIVE is None:
        return None
    eb32 = np.float32(error_bound)
    adjusted = float(eb32 - np.float32(1e-7))
    eb = float(eb32)
    vals = np.ascontiguousarray(values, dtype=np.float64)
    buf = np.empty(48 * len(vals) + 96, dtype=np.uint8)
    rc = _NATIVE[name](
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(vals),
        eb,
        adjusted,
        _MARGIN,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc == -2:
        raise UnsupportedInputError("non-finite or out-of-range input")
    if rc < 0:
        return None
    return buf[:rc].tobytes()
_F64_MAX = float(np.finfo(np.float64).max)


def _quantize(value: float, eb: float) -> float:
    """floor-quantize to the error-bound grid (zig :444-449)."""
    if eb != 0:
        return math.floor(value / eb) * eb
    return value


def compute_segments_metadata(values: np.ndarray, error_bound: float) -> list:
    """Phase 1 (zig :165-253). Returns [(start_time, intercept, lower, upper)]."""
    eb32 = np.float32(error_bound)
    adjusted = float(eb32 - np.float32(1e-7))  # f32 subtraction (zig :171)
    eb = float(eb32)

    v0 = float(values[0])
    if not math.isfinite(v0) or abs(v0) > 1e15:
        raise UnsupportedInputError("non-finite or out-of-range input")

    upper = _F64_MAX
    lower = -_F64_MAX
    start_t = 0
    intercept = _quantize(v0, eb) + _MARGIN
    out = []

    n = len(values)
    for ct in range(1, n):
        value = float(values[ct])
        if not math.isfinite(value) or abs(value) > 1e15:
            raise UnsupportedInputError("non-finite or out-of-range input")
        segment_size = float(ct - start_t)
        upper_limit = upper * segment_size + intercept
        lower_limit = lower * segment_size + intercept
        if upper_limit < value - adjusted or lower_limit > value + adjusted:
            out.append((start_t, intercept, lower, upper))
            start_t = ct
            intercept = _quantize(value, eb) + _MARGIN
            upper = _F64_MAX
            lower = -_F64_MAX
        else:
            new_upper = (value + adjusted - intercept) / segment_size
            new_lower = (value - adjusted - intercept) / segment_size
            if value + adjusted < upper_limit:
                upper = max(new_upper, lower)
            if value - adjusted > lower_limit:
                lower = min(new_lower, upper)

    if n - start_t == 1:
        upper = 0.0
        lower = 0.0
    out.append((start_t, intercept, lower, upper))
    return out


def merge_segments_metadata(segments: list) -> list:
    """Phase 2 (zig :258-366): per-intercept interval-intersection merging."""
    by_intercept: dict[float, list] = {}
    for seg in segments:
        by_intercept.setdefault(seg[1], []).append(seg)

    merged = []
    for intercept, group in by_intercept.items():
        group.sort(key=lambda s: s[2])  # by lower bound slope (Alg 2 line 5)
        lower, upper = group[0][2], group[0][3]
        timestamps = [group[0][0]]
        for seg in group[1:]:
            if seg[2] <= upper and seg[3] >= lower:
                timestamps.append(seg[0])
                lower = max(lower, seg[2])
                upper = min(upper, seg[3])
            else:
                merged.extend((t, intercept, lower, upper) for t in timestamps)
                timestamps = [seg[0]]
                lower, upper = seg[2], seg[3]
        merged.extend((t, intercept, lower, upper) for t in timestamps)
    merged.sort(key=lambda s: s[0])
    return merged


def group_segments(merged: list) -> dict:
    """Phase 3 (zig :372-398): intercept -> slope -> [start_times]."""
    outer: dict[float, dict[float, list[int]]] = {}
    for start_t, intercept, lower, upper in merged:
        slope = (lower + upper) / 2
        outer.setdefault(intercept, {}).setdefault(slope, []).append(start_t)
    return outer


def serialize_groups(outer: dict, out: bytearray) -> None:
    """Phase 4 layout (zig :408-439); shared with Mix-Piece part 1."""
    for intercept, slopes in outer.items():
        out += struct.pack("<dQ", intercept, len(slopes))
        for slope, timestamps in slopes.items():
            out += struct.pack("<dQ", slope, len(timestamps))
            prev = 0
            for t in timestamps:
                out += struct.pack("<Q", t - prev)
                prev = t
    return None


def compress(values: np.ndarray, error_bound: float) -> bytes:
    if np.float32(error_bound) <= 0.0:
        raise UnsupportedErrorBoundError("sim-piece requires error_bound > 0")
    native = run_piece_native("tersets_sim_piece", values, error_bound)
    if native is not None:
        return native
    segments = compute_segments_metadata(values, error_bound)
    merged = merge_segments_metadata(segments)
    outer = group_segments(merged)
    out = bytearray()
    serialize_groups(outer, out)
    out += struct.pack("<Q", len(values))
    return bytes(out)


def decompress_segments_to_values(segments: list, last_timestamp: int) -> np.ndarray:
    """Shared tail of Sim/Mix-Piece decompression (zig :134-161).

    ``segments`` is [(start_time, intercept, slope)]; sorted by start time,
    each segment generates ``slope*(t - start) + intercept`` until the next
    segment's start (zig decompressSegment :502-514). Vectorized across
    segments (same per-element ops as the scalar loop); falls back to the
    scalar walk for non-monotonic boundaries in arbitrary blobs.
    """
    segments.sort(key=lambda s: s[0])
    if not segments:
        return np.empty(0, dtype=np.float64)
    starts = np.fromiter((s[0] for s in segments), np.int64, len(segments))
    intercepts = np.fromiter((s[1] for s in segments), np.float64, len(segments))
    slopes = np.fromiter((s[2] for s in segments), np.float64, len(segments))
    bounds = np.concatenate((starts[1:], [last_timestamp]))
    currents = np.concatenate(([0], bounds[:-1]))
    widths = bounds - currents
    if np.any(widths < 0) or last_timestamp < 0:
        return _decompress_segments_scalar(segments, last_timestamp)
    t_all = np.arange(int(last_timestamp), dtype=np.int64)
    offsets = (t_all - np.repeat(starts, widths)).astype(np.float64)
    return np.repeat(slopes, widths) * offsets + np.repeat(intercepts, widths)


def _decompress_segments_scalar(segments: list, last_timestamp: int) -> np.ndarray:
    out: list[float] = []
    current_t = 0
    for i, (seg_start, intercept, slope) in enumerate(segments):
        end_t = segments[i + 1][0] if i + 1 < len(segments) else last_timestamp
        for t in range(current_t, end_t):
            out.append(slope * float(t - seg_start) + intercept)
        current_t = end_t
    return np.asarray(out, dtype=np.float64)


def decompress(blob: bytes) -> np.ndarray:
    words = np.frombuffer(blob, dtype="<f8")
    counts = words.view("<u8")
    segments = []
    index = 0
    while index < len(words) - 1:
        intercept = float(words[index])
        slopes_count = int(counts[index + 1])
        index += 2
        for _ in range(slopes_count):
            slope = float(words[index])
            ts_count = int(counts[index + 1])
            index += 2
            timestamp = 0
            for _ in range(ts_count):
                timestamp += int(counts[index])
                segments.append((timestamp, intercept, slope))
                index += 1
    last_timestamp = int(counts[index])
    return decompress_segments_to_values(segments, last_timestamp)

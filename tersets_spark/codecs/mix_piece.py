"""Mix-Piece (method 12) — semantics-parity reimplementation (NOT a
translation) of ``/root/reference/src/functional/mix_piece.zig``.

Paper: Kitsios et al., "Flexible grouping of linear segments for highly
accurate lossy compression of time series data", VLDB Journal, 2024.

Differences from Sim-Piece, reproduced exactly:

* Phase 1 (zig :359-569) tracks floor- AND ceil-quantized intercept fits
  simultaneously; when both fail, the track that stayed valid longer wins
  (floor wins ties, zig :474); at end-of-input a still-valid track wins, and
  if both are valid the track whose quantization is closer to the original
  value wins via the ``round == ceil`` test (zig :542);
* Phase 2 (zig :577-834) produces three outputs: same-intercept groups
  (>= 2 members), cross-intercept groups (leftover singletons re-grouped by
  slope-interval intersection across intercepts), and ungrouped singletons;
* Phase 4 header is ``(part1_count, part2_count, part3_count)`` as three u64
  (zig :134-152), then part 1 in Sim-Piece layout, part 2 as
  ``[a_j, k_j, (b_ji, dt_ji)...]``, part 3 as ``[a_i, b_i, dt_i]...``, then
  the input length.

Requires ``error_bound > 0`` (zig :50-52); rejects non-finite inputs and
``|x| > 1e15`` (zig :377,404). As with Sim-Piece, reference-parity is defined
on decompressed output (hash-map iteration order); our serialization is
canonical (insertion-ordered dicts over start-time-sorted groups).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..errors import UnsupportedErrorBoundError, UnsupportedInputError
from .sim_piece import (
    decompress_segments_to_values,
    run_piece_native,
    serialize_groups,
)

_MARGIN = float(np.float32(1e-7))
_F64_MAX = float(np.finfo(np.float64).max)


def _quantize_floor(value: float, eb: float) -> float:
    return math.floor(value / eb) * eb if eb != 0 else value


def _quantize_ceil(value: float, eb: float) -> float:
    return math.ceil(value / eb) * eb if eb != 0 else value


def _round_half_away(x: float) -> float:
    """Zig ``@round`` — round half away from zero (Python's round is half-even)."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def compute_segments_metadata(values: np.ndarray, error_bound: float) -> list:
    """Phase 1 dual-quantization PLA (zig :359-569)."""
    eb32 = np.float32(error_bound)
    adjusted = float(eb32 - np.float32(1e-7))
    eb = float(eb32)

    v0 = float(values[0])
    if not math.isfinite(v0) or abs(v0) > 1e15:
        raise UnsupportedInputError("non-finite or out-of-range input")

    out = []
    start_t, start_v = 0, v0
    up_f, lo_f = _F64_MAX, -_F64_MAX
    up_c, lo_c = _F64_MAX, -_F64_MAX
    int_f = _quantize_floor(v0, eb) + _MARGIN
    int_c = _quantize_ceil(v0, eb) + _MARGIN
    floor_valid = True
    # DOCUMENTED DIVERGENCE from the reference: mix_piece.zig:385-389 adds
    # ErrorBoundMargin to the CEIL intercept without re-checking the
    # segment's first point, so a value infinitesimally above a bucket
    # boundary (e.g. a positive subnormal with any eb) decompresses up to
    # ~eb+margin away — beyond the reference's own strict isWithinErrorBound
    # (tersets.zig:251). We start the ceil track invalid whenever its
    # intercept already misses the first value by more than the bound;
    # everywhere else the phase-1 walk is bit-identical to the reference
    # (and to the C kernel — differential suite tests/test_native_piece.py).
    ceil_valid = (int_c - v0) <= eb
    last_valid_floor = last_valid_ceil = 0

    n = len(values)
    for ct in range(1, n):
        value = float(values[ct])
        if not math.isfinite(value) or abs(value) > 1e15:
            raise UnsupportedInputError("non-finite or out-of-range input")
        segment_size = float(ct - start_t)

        if floor_valid:
            upper_limit = up_f * segment_size + int_f
            lower_limit = lo_f * segment_size + int_f
            if upper_limit < value - adjusted or lower_limit > value + adjusted:
                floor_valid = False
                last_valid_floor = ct - 1
            else:
                new_up = (value + adjusted - int_f) / segment_size
                new_lo = (value - adjusted - int_f) / segment_size
                if value + adjusted < upper_limit:
                    up_f = max(new_up, lo_f)
                if value - adjusted > lower_limit:
                    lo_f = min(new_lo, up_f)

        if ceil_valid:
            upper_limit = up_c * segment_size + int_c
            lower_limit = lo_c * segment_size + int_c
            if upper_limit < value - adjusted or lower_limit > value + adjusted:
                ceil_valid = False
                last_valid_ceil = ct - 1
            else:
                new_up = (value + adjusted - int_c) / segment_size
                new_lo = (value - adjusted - int_c) / segment_size
                if value + adjusted < upper_limit:
                    up_c = max(new_up, lo_c)
                if value - adjusted > lower_limit:
                    lo_c = min(new_lo, up_c)

        if not floor_valid and not ceil_valid:
            if last_valid_floor >= last_valid_ceil:
                out.append((start_t, int_f, lo_f, up_f))
            else:
                out.append((start_t, int_c, lo_c, up_c))
            start_t, start_v = ct, value
            int_f = _quantize_floor(value, eb) + _MARGIN
            int_c = _quantize_ceil(value, eb) + _MARGIN
            up_f, lo_f = _F64_MAX, -_F64_MAX
            up_c, lo_c = _F64_MAX, -_F64_MAX
            floor_valid = True
            ceil_valid = (int_c - value) <= eb  # same start-validity guard
            last_valid_floor = last_valid_ceil = ct

    segment_size = n - start_t
    if segment_size > 0:
        if floor_valid and not ceil_valid:
            if segment_size == 1:
                up_f = lo_f = 0.0
            out.append((start_t, int_f, lo_f, up_f))
        elif ceil_valid and not floor_valid:
            if segment_size == 1:
                up_c = lo_c = 0.0
            out.append((start_t, int_c, lo_c, up_c))
        else:
            # Both tracks valid (or both invalid): pick the closer quantization
            # via the round-vs-ceil test on the segment's first value (zig :542).
            original = start_v
            if _round_half_away(original / eb) == math.ceil(original / eb):
                if segment_size == 1:
                    up_c = lo_c = 0.0
                out.append((start_t, int_c, lo_c, up_c))
            else:
                if segment_size == 1:
                    up_f = lo_f = 0.0
                out.append((start_t, int_f, lo_f, up_f))
    return out


def merge_segments_metadata(segments: list):
    """Phase 2 three-way grouping (zig :577-834).

    Returns (same_intercept_groups, cross_intercept_groups, ungrouped), each a
    start-time-sorted list of (start_time, intercept, lower, upper).
    """
    by_intercept: dict[float, list] = {}
    for seg in segments:
        by_intercept.setdefault(seg[1], []).append(seg)

    same_groups: list = []
    singles: list = []
    for intercept, group in by_intercept.items():
        group.sort(key=lambda s: s[2])
        lower, upper = group[0][2], group[0][3]
        timestamps = [group[0][0]]
        for seg in group[1:]:
            if seg[2] <= upper and seg[3] >= lower:
                timestamps.append(seg[0])
                lower = max(lower, seg[2])
                upper = min(upper, seg[3])
            else:
                if len(timestamps) > 1:
                    same_groups.extend((t, intercept, lower, upper) for t in timestamps)
                else:
                    singles.append((timestamps[0], intercept, lower, upper))
                timestamps = [seg[0]]
                lower, upper = seg[2], seg[3]
        if len(timestamps) > 1:
            same_groups.extend((t, intercept, lower, upper) for t in timestamps)
        else:
            singles.append((timestamps[0], intercept, lower, upper))

    # Part 2: re-group the leftover singletons across intercepts by slope.
    singles.sort(key=lambda s: s[2])
    cross_groups: list = []
    ungrouped: list = []
    if singles:
        lower, upper = singles[0][2], singles[0][3]
        members = [(singles[0][0], singles[0][1])]  # (start_time, intercept)
        for seg in singles[1:]:
            if seg[2] <= upper and seg[3] >= lower:
                lower = max(lower, seg[2])
                upper = min(upper, seg[3])
                members.append((seg[0], seg[1]))
            else:
                target = cross_groups if len(members) > 1 else ungrouped
                target.extend((t, b, lower, upper) for t, b in members)
                lower, upper = seg[2], seg[3]
                members = [(seg[0], seg[1])]
        target = cross_groups if len(members) > 1 else ungrouped
        target.extend((t, b, lower, upper) for t, b in members)

    same_groups.sort(key=lambda s: s[0])
    cross_groups.sort(key=lambda s: s[0])
    ungrouped.sort(key=lambda s: s[0])
    return same_groups, cross_groups, ungrouped


def compress(values: np.ndarray, error_bound: float) -> bytes:
    if np.float32(error_bound) <= 0.0:
        raise UnsupportedErrorBoundError("mix-piece requires error_bound > 0")
    native = run_piece_native("tersets_mix_piece", values, error_bound)
    if native is not None:
        return native
    segments = compute_segments_metadata(values, error_bound)
    same_groups, cross_groups, ungrouped = merge_segments_metadata(segments)

    # Phase 3.1: intercept -> slope -> [timestamps] (zig :840-866).
    outer: dict[float, dict[float, list[int]]] = {}
    for start_t, intercept, lower, upper in same_groups:
        slope = (lower + upper) / 2
        outer.setdefault(intercept, {}).setdefault(slope, []).append(start_t)

    # Phase 3.2: slope -> [(intercept, timestamp)] (zig :874-898).
    by_slope: dict[float, list] = {}
    for start_t, intercept, lower, upper in cross_groups:
        slope = (lower + upper) / 2
        by_slope.setdefault(slope, []).append((intercept, start_t))

    # Phase 3.3: flat [(slope, intercept, timestamp)] (zig :903-922).
    flat = [((lo + up) / 2.0, b, t) for t, b, lo, up in ungrouped]

    out = bytearray()
    out += struct.pack("<QQQ", len(outer), len(by_slope), len(flat))
    serialize_groups(outer, out)
    for slope, pairs in by_slope.items():
        out += struct.pack("<dQ", slope, len(pairs))
        prev = 0
        for intercept, t in pairs:
            out += struct.pack("<dQ", intercept, t - prev)
            prev = t
    prev = 0
    for slope, intercept, t in flat:
        out += struct.pack("<ddQ", slope, intercept, t - prev)
        prev = t
    out += struct.pack("<Q", len(values))
    return bytes(out)


def decompress(blob: bytes) -> np.ndarray:
    words = np.frombuffer(blob, dtype="<f8")
    counts = words.view("<u8")
    part1, part2, part3 = int(counts[0]), int(counts[1]), int(counts[2])
    index = 3
    segments = []
    for _ in range(part1):
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
    for _ in range(part2):
        slope = float(words[index])
        pair_count = int(counts[index + 1])
        index += 2
        timestamp = 0
        for _ in range(pair_count):
            intercept = float(words[index])
            timestamp += int(counts[index + 1])
            segments.append((timestamp, intercept, slope))
            index += 2
    timestamp = 0
    for _ in range(part3):
        slope = float(words[index])
        intercept = float(words[index + 1])
        timestamp += int(counts[index + 2])
        segments.append((timestamp, intercept, slope))
        index += 3
    last_timestamp = int(counts[index])
    return decompress_segments_to_values(segments, last_timestamp)

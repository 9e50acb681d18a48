"""Swing Filter (method 2), Swing Filter Disconnected (method 3) and Slide
Filter (method 4) — semantics-parity reimplementation (NOT a translation) of
``/root/reference/src/functional/swing_slide_filter.zig``.

Paper: Elmeleegy et al., "Online piece-wise linear approximation of numerical
streams with precision guarantees", PVLDB 2(1), 2009 — with the reference's
two documented deviations (zig :20-33): the recorded slope averages/clamps the
bound slopes instead of the paper's exact least-squares slope, and all Slide
segments are kept disjoint (Lemma 4.4 is not applied).

Semantics reproduced exactly:

* error bound is an f32; for positive bounds the reference subtracts the f32
  margin 1e-7 in f32 arithmetic (zig :65-68) — reproduced by rounding through
  ``np.float32``;
* Swing blob: ``first_value f64`` then repeated ``(end_value f64, end_time
  u64)`` pairs (zig :94,138-147); Disconnected/Slide blob: repeated
  ``(start_value f64, end_value f64, end_time u64)`` triplets;
* segments of <= 2 points store raw values for losslessness (zig :139-145,
  :352-358, :543-548);
* Swing's optimal recorded slope is ``clamp(slope_derivate / sum_square)``
  into [lower.slope, upper.slope] (Eq. (5)/(6), zig :116-138) with the exact
  integer ``n(n+1)(2n+1)/6`` denominator;
* Slide maintains bound lines over the convex hull of the open segment
  (Lemma 4.3 scan, zig :397-423) and records the average-slope line through
  the bounds' interception point (zig :323-332).

Divergence (documented): inputs of length 1 raise ``UnsupportedInputError``
where the reference would trap on an out-of-bounds read (zig :78 indexes
``uncompressed_values[1]`` unconditionally).

Known shared edge (reference-faithful): at eb=0, a 3+-point segment whose
interior point matches the fp-evaluated bound line exactly while differing
from ``(v1-v0)+v0`` by an absorbed tiny term (subnormal between larger
endpoints) reconstructs to the line value, not the original — losslessness
at eb=0 is unconditional only for inputs where line evaluations are exact
(e.g. integral token values, the engine's input_hint contract).
"""

from __future__ import annotations

import ctypes
import math
import struct

import numpy as np

from ..errors import UnsupportedInputError
from ._geometry import ConvexHull
from ._native import load_swing_kernel

_MARGIN32 = np.float32(1e-7)  # shared_structs.zig:23

#: C fast path (None -> pure-Python). Bit-identical output — differential
#: suite in tests/test_native_histogram.py.
_NATIVE = load_swing_kernel()


def _compress_native(values: np.ndarray, error_bound: float, variant: int) -> bytes | None:
    """Run the C kernel; None when unavailable (Python path serves)."""
    if _NATIVE is None:
        return None
    if len(values) < 2:
        raise UnsupportedInputError("swing/slide filter needs >= 2 values")
    vals = np.ascontiguousarray(values, dtype=np.float64)
    out = np.empty(24 * len(vals) + 16, dtype=np.uint8)
    rc = _NATIVE(
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(vals),
        _adjusted_bound(error_bound),
        variant,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc == -2:
        raise UnsupportedInputError("non-finite input")
    if rc < 0:  # allocation failure: fall back to Python
        return None
    return out[:rc].tobytes()


def _adjusted_bound(error_bound: float) -> float:
    eb32 = np.float32(error_bound)
    if eb32 > 0:
        return float(eb32 - _MARGIN32)  # f32 subtraction, as in zig :65-68
    return float(eb32)


def _swing_line(start_t, start_v, end_t, end_v, bound):
    """Line through (start) and (end + bound) — updateSwingLinearFunction (zig :775-790)."""
    if end_t != start_t:
        slope = (end_v + bound - start_v) / float(end_t - start_t)
        return slope, start_v - slope * float(start_t)
    return 0.0, start_v


def _slide_line(start_t, start_v, end_t, end_v, bound):
    """Line through (start - bound) and (end + bound) — updateSlideLinearFunction (zig :832-847)."""
    if end_t != start_t:
        slope = (end_v + 2 * bound - start_v) / float(end_t - start_t)
        return slope, start_v - bound - slope * float(start_t)
    return 0.0, start_v


def _eval(slope: float, intercept: float, t: int) -> float:
    return slope * float(t) + intercept


def _optimal_swing_slope(slope_derivate, segment_size, upper_slope, lower_slope):
    """Eq. (5)/(6) clamped slope (zig :116-125); exact integer denominator."""
    sum_square = float(segment_size * (segment_size + 1) * (2 * segment_size + 1) // 6)
    return max(min(slope_derivate / sum_square, upper_slope), lower_slope)


def compress_swing(values: np.ndarray, error_bound: float) -> bytes:
    native = _compress_native(values, error_bound, 0)
    if native is not None:
        return native
    if len(values) < 2:
        raise UnsupportedInputError("swing filter needs >= 2 values")
    adj = _adjusted_bound(error_bound)
    v = values
    if not (math.isfinite(v[0]) and math.isfinite(v[1])):
        raise UnsupportedInputError("non-finite input")

    out = bytearray(struct.pack("<d", v[0]))
    start_t, start_v = 0, float(v[0])
    end_t, end_v = 1, float(v[1])
    slope_derivate = (end_v - start_v) * float(end_t - start_t)
    ub = _swing_line(start_t, start_v, end_t, end_v, adj)
    lb = _swing_line(start_t, start_v, end_t, end_v, -adj)

    n = len(v)
    ct = 2
    while ct < n:
        upper_limit = _eval(ub[0], ub[1], ct)
        lower_limit = _eval(lb[0], lb[1], ct)
        value = float(v[ct])
        if not math.isfinite(value):
            raise UnsupportedInputError("non-finite input")
        if (
            not math.isfinite(upper_limit + lower_limit)
            or upper_limit < value - adj
            or lower_limit > value + adj
        ):
            # Recording mechanism (zig :113-167).
            segment_size = ct - start_t - 1
            if segment_size > 1:
                slope = _optimal_swing_slope(slope_derivate, segment_size, ub[0], lb[0])
                intercept = start_v - slope * float(start_t)
                rec_value = _eval(slope, intercept, ct - 1)
            else:
                rec_value = end_v
            out += struct.pack("<dQ", rec_value, ct)

            start_t, start_v = ct - 1, rec_value
            end_t, end_v = ct, value
            ub = _swing_line(start_t, start_v, end_t, end_v, adj)
            lb = _swing_line(start_t, start_v, end_t, end_v, -adj)
            slope_derivate = (end_v - start_v) * float(end_t - start_t)
        else:
            # Filtering mechanism (zig :168-200).
            end_t, end_v = ct, value
            new_ub = _swing_line(start_t, start_v, end_t, end_v, adj)
            new_lb = _swing_line(start_t, start_v, end_t, end_v, -adj)
            if upper_limit > _eval(new_ub[0], new_ub[1], ct):
                ub = new_ub  # swing down
            if lower_limit < _eval(new_lb[0], new_lb[1], ct):
                lb = new_lb  # swing up
            slope_derivate += (end_v - start_v) * float(end_t - start_t)
        ct += 1

    # Final flush (zig :203-239).
    segment_size = ct - start_t - 1
    if segment_size > 1:
        slope = _optimal_swing_slope(slope_derivate, segment_size, ub[0], lb[0])
        intercept = start_v - slope * float(start_t)
        out += struct.pack("<d", _eval(slope, intercept, ct - 1))
    else:
        out += struct.pack("<d", end_v)
    out += struct.pack("<Q", ct)
    return bytes(out)


def compress_swing_disconnected(values: np.ndarray, error_bound: float) -> bytes:
    native = _compress_native(values, error_bound, 1)
    if native is not None:
        return native
    if len(values) < 2:
        raise UnsupportedInputError("swing filter needs >= 2 values")
    adj = _adjusted_bound(error_bound)
    v = values
    if not (math.isfinite(v[0]) and math.isfinite(v[1])):
        raise UnsupportedInputError("non-finite input")

    out = bytearray()
    start_t, start_v = 0, float(v[0])
    end_t, end_v = 1, float(v[1])
    slope_derivate = (end_v - start_v) * float(end_t - start_t)
    ub = _swing_line(start_t, start_v, end_t, end_v, adj)
    lb = _swing_line(start_t, start_v, end_t, end_v, -adj)

    n = len(v)
    ct = 2
    while ct < n:
        upper_limit = _eval(ub[0], ub[1], ct)
        lower_limit = _eval(lb[0], lb[1], ct)
        value = float(v[ct])
        if not math.isfinite(value):
            raise UnsupportedInputError("non-finite input")
        if (
            not math.isfinite(upper_limit + lower_limit)
            or upper_limit < value - adj
            or lower_limit > value + adj
        ):
            # Recording mechanism (zig :517-575): store (start, end, end_time).
            out += struct.pack("<d", start_v)
            segment_size = ct - start_t - 1
            if segment_size > 1:
                slope = _optimal_swing_slope(slope_derivate, segment_size, ub[0], lb[0])
                intercept = start_v - slope * float(start_t)
                out += struct.pack("<d", _eval(slope, intercept, ct - 1))
            else:
                out += struct.pack("<d", end_v)
            out += struct.pack("<Q", ct)

            start_t, start_v = ct, value
            if ct + 1 < n:
                nxt = float(v[ct + 1])
                if not math.isfinite(nxt):
                    raise UnsupportedInputError("non-finite input")
                end_t, end_v = ct + 1, nxt
                ub = _swing_line(start_t, start_v, end_t, end_v, adj)
                lb = _swing_line(start_t, start_v, end_t, end_v, -adj)
                ct += 1
                slope_derivate = (end_v - start_v) * float(end_t - start_t)
            else:
                end_t, end_v = ct, value
        else:
            end_t, end_v = ct, value
            new_ub = _swing_line(start_t, start_v, end_t, end_v, adj)
            new_lb = _swing_line(start_t, start_v, end_t, end_v, -adj)
            if upper_limit > _eval(new_ub[0], new_ub[1], ct):
                ub = new_ub
            if lower_limit < _eval(new_lb[0], new_lb[1], ct):
                lb = new_lb
            slope_derivate += (end_v - start_v) * float(end_t - start_t)
        ct += 1

    # Final flush (zig :612-651).
    segment_size = ct - start_t - 1
    out += struct.pack("<d", start_v)
    if segment_size > 1:
        slope = _optimal_swing_slope(slope_derivate, segment_size, ub[0], lb[0])
        intercept = start_v - slope * float(start_t)
        out += struct.pack("<d", _eval(slope, intercept, ct - 1))
    else:
        out += struct.pack("<d", end_v)
    out += struct.pack("<Q", ct)
    return bytes(out)


def _interception_point(lb, ub):
    """Interception of the two bound lines; y-axis point if parallel (zig :851-866)."""
    if lb[0] != ub[0]:
        t = (ub[1] - lb[1]) / (lb[0] - ub[0])
        return t, lb[0] * t + lb[1]
    return 0.0, lb[1]


def compress_slide(values: np.ndarray, error_bound: float) -> bytes:
    native = _compress_native(values, error_bound, 2)
    if native is not None:
        return native
    if len(values) < 2:
        raise UnsupportedInputError("slide filter needs >= 2 values")
    adj = _adjusted_bound(error_bound)
    v = values
    if not (math.isfinite(v[0]) and math.isfinite(v[1])):
        raise UnsupportedInputError("non-finite input")

    out = bytearray()
    hull = ConvexHull()
    start_t, start_v = 0, float(v[0])
    end_t, end_v = 1, float(v[1])
    hull.add((start_t, start_v))
    hull.add((end_t, end_v))
    ub = _slide_line(start_t, start_v, end_t, end_v, adj)
    lb = _slide_line(start_t, start_v, end_t, end_v, -adj)

    n = len(v)
    ct = 2
    while ct < n:
        upper_limit = _eval(ub[0], ub[1], ct)
        lower_limit = _eval(lb[0], lb[1], ct)
        value = float(v[ct])
        if not math.isfinite(value):
            raise UnsupportedInputError("non-finite input")
        if (
            not math.isfinite(upper_limit + lower_limit)
            or upper_limit < value - adj
            or lower_limit > value + adj
        ):
            # Recording mechanism (zig :321-389).
            it, iv = _interception_point(lb, ub)
            slope = (lb[0] + ub[0]) / 2
            intercept = iv - slope * it
            segment_size = end_t - start_t
            if segment_size > 1:
                out += struct.pack("<d", _eval(slope, intercept, start_t))
                out += struct.pack("<d", _eval(slope, intercept, end_t))
            else:
                out += struct.pack("<d", start_v)
                out += struct.pack("<d", end_v)
            out += struct.pack("<Q", ct)

            start_t, start_v = ct, value
            if ct + 1 < n:
                nxt = float(v[ct + 1])
                if not math.isfinite(nxt):
                    raise UnsupportedInputError("non-finite input")
                end_t, end_v = ct + 1, nxt
                ub = _slide_line(start_t, start_v, end_t, end_v, adj)
                lb = _slide_line(start_t, start_v, end_t, end_v, -adj)
                hull.clean()
                hull.add((start_t, start_v))
                hull.add((end_t, end_v))
                ct += 1
            else:
                end_t, end_v = ct, value
        else:
            # Filtering mechanism: Lemma 4.3 hull scan (zig :390-424).
            end_t, end_v = ct, value
            hull.add((end_t, end_v))
            for ht, hv in hull.upper_except_last():
                new_ub = _slide_line(ht, hv, end_t, end_v, adj)
                if new_ub[0] < ub[0]:
                    ub = new_ub  # slide down
            for ht, hv in hull.lower_except_last():
                new_lb = _slide_line(ht, hv, end_t, end_v, -adj)
                if new_lb[0] > lb[0]:
                    lb = new_lb  # slide up
        ct += 1

    # Final flush (zig :427-459).
    segment_size = ct - start_t - 1
    if segment_size > 1:
        it, iv = _interception_point(lb, ub)
        slope = (lb[0] + ub[0]) / 2
        intercept = iv - slope * it
        out += struct.pack("<d", _eval(slope, intercept, start_t))
        out += struct.pack("<d", _eval(slope, intercept, ct - 1))
    else:
        out += struct.pack("<d", start_v)
        out += struct.pack("<d", end_v)
    out += struct.pack("<Q", ct)
    return bytes(out)


def decompress_swing(blob: bytes) -> np.ndarray:
    """Connected-knot interpolation (decompressSwingFilter, zig :656-710)."""
    if (len(blob) - 8) % 16 != 0:
        raise UnsupportedInputError("swing blob length must be 8 + 16k")
    words = np.frombuffer(blob, dtype="<f8")
    ends = words.view("<u8")
    v0 = float(words[0])
    ev = words[1::2]
    et = ends[2::2].astype(np.int64) - 1
    if len(ev) == 0:
        return np.array([v0])
    starts = np.concatenate(([0], et[:-1]))
    if np.any(et <= starts):
        # degenerate repeated-knot blob: scalar path (never produced by the
        # compressor, kept for arbitrary-blob robustness)
        return _decompress_swing_scalar(words, ends)
    # segments tile (0, et[-1]]: one repeat + one fused line evaluation.
    # slope/intercept per segment are the exact _swing_line(…, 0.0) ops
    # ((end_v + 0.0) == end_v for every float, so ev - sv is identical),
    # and interior values use the same slope*t + intercept per element.
    sv = np.concatenate(([v0], ev[:-1]))
    slopes = (ev - sv) / (et - starts).astype(np.float64)
    intercepts = sv - slopes * starts.astype(np.float64)
    n = int(et[-1]) + 1
    widths = et - starts
    out = np.empty(n, dtype=np.float64)
    out[0] = v0
    t = np.arange(1, n, dtype=np.float64)
    out[1:] = np.repeat(slopes, widths) * t + np.repeat(intercepts, widths)
    out[et] = ev  # knots stored verbatim
    return out


def _decompress_swing_scalar(words, ends) -> np.ndarray:
    out = [float(words[0])]
    start_t, start_v = 0, float(words[0])
    index = 0
    while index < len(words) - 1:
        seg_end_t = int(ends[index + 2]) - 1
        seg_end_v = float(words[index + 1])
        if start_t != seg_end_t:
            slope, intercept = _swing_line(start_t, start_v, seg_end_t, seg_end_v, 0.0)
            for t in range(start_t + 1, seg_end_t):
                out.append(_eval(slope, intercept, t))
            out.append(seg_end_v)
        else:
            out.append(start_v)
        start_t, start_v = seg_end_t, seg_end_v
        index += 2
    return np.asarray(out, dtype=np.float64)


def decompress_slide(blob: bytes) -> np.ndarray:
    """Disjoint-triplet interpolation (decompressSlideFilter, zig :716-764).

    Also decodes SwingFilterDisconnected blobs (same layout, zig :204-206).
    """
    if len(blob) % 24 != 0:
        raise UnsupportedInputError("slide blob length must be 24k")
    words = np.frombuffer(blob, dtype="<f8")
    ends = words.view("<u8")
    if len(words) == 0:
        return np.empty(0, dtype=np.float64)
    sv = words[0::3]
    ev = words[1::3]
    et = ends[2::3].astype(np.int64) - 1
    # disjoint triplets tile [0, et[-1]]: first_t of segment i+1 is always
    # et[i] + 1, for both the multi-point and single-point branches
    firsts = np.concatenate(([0], et[:-1] + 1))
    widths = et - firsts + 1
    if np.any(widths < 1):
        raise UnsupportedInputError("non-monotonic segment ends")
    # per-segment line (exact _swing_line(…, 0.0) ops; (end_v + 0.0) == end_v)
    denom = (et - firsts).astype(np.float64)
    multi = widths > 1
    slopes = np.zeros(len(sv), dtype=np.float64)
    np.divide(ev - sv, denom, out=slopes, where=multi)
    intercepts = sv - slopes * firsts.astype(np.float64)
    n = int(et[-1]) + 1
    out = np.repeat(slopes, widths) * np.arange(n, dtype=np.float64) + np.repeat(
        intercepts, widths
    )
    out[firsts] = sv  # segment starts stored verbatim
    out[et[multi]] = ev[multi]  # multi-point segment ends stored verbatim
    return out

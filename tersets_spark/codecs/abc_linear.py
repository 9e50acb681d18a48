"""ABC Linear Approximation (method 8) — semantics-parity reimplementation
(NOT a translation) of ``/root/reference/src/functional/abc_linear_compression.zig``.

Paper: Dalai & Leonardi, "Approximations of One-Dimensional Digital Signals
Under the L-infinity Norm", IEEE TSP 54(8), 2006.

Per segment: grow a convex hull point by point; after each point, find the
optimal line via the A-B-C triplet walk over hull sides (zig :164-237,
:240-261) — the candidate line is the hull side AB shifted by half the
maximum vertical deviation of the opposite-hull pivot C — and keep extending
while the hull's max error (f80 accumulation) stays within the bound
(zig :70-90). Emit ``(end_index u64, slope f64, intercept f64)`` per segment;
2-point segments store the two raw values in the slope/intercept slots
(zig :96-99); a trailing single point becomes a slope-0 segment (zig :117-125).

Requires >= 2 points (zig :51) and ``error_bound >= 0`` (zig :52); lossless at
``error_bound == 0`` (every segment degenerates to <= 2 points stored raw).

Divergence (documented): the final line evaluation subtracts point times as
``point_c.time - start.time`` in usize (zig :231), which traps when the walk
terminates with an x-external-left pivot; we compute the signed difference.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np

from ..errors import UnsupportedErrorBoundError, UnsupportedInputError
from ._geometry import ConvexHull
from ._native import load_linesimp_kernels

#: C fast path (None -> pure-Python). Bit-identical output — differential
#: suite in tests/test_native_linesimp.py.
_NATIVE = load_linesimp_kernels()


def _deviation(a, b, c) -> float:
    """Vertical deviation of c from line a-b (zig :266-282)."""
    slope = (b[1] - a[1]) / float(b[0] - a[0])
    pred = slope * (float(c[0]) - float(a[0])) + a[1]
    return abs(pred - c[1])


def _find_pivot_c(hull: ConvexHull, a_index: int):
    """Max-deviation vertex v(l_i) for side (a, a+1) (zig :240-261)."""
    a = hull.at(a_index)
    b = hull.at(a_index + 1)
    max_dev = -1.0
    pivot = None
    for c_index in range(len(hull)):
        if c_index != a_index and c_index != a_index + 1:
            dev = _deviation(a, b, hull.at(c_index))
            if dev > max_dev:
                max_dev = dev
                pivot = c_index
    return pivot


def _find_abc_optimal_segment(hull: ConvexHull):
    """A-B-C walk over hull sides (zig :164-237). Returns (slope, intercept)."""
    n = len(hull)
    a_index = 0
    c_index = 0
    finished = False
    visited: set[int] = set()

    while not finished:
        if a_index + 1 >= n:
            break
        a = hull.at(a_index)
        b = hull.at(a_index + 1)
        pivot = _find_pivot_c(hull, a_index)
        if pivot is None:
            # Two-point hull: line through A and B (zig :184-193).
            slope = (b[1] - a[1]) / float(b[0] - a[0])
            return slope, a[1] - slope * float(a[0])
        c_index = pivot
        if a_index in visited:
            break
        visited.add(a_index)
        c = hull.at(c_index)
        if c[0] > b[0]:
            a_index += 1  # x-external right: next side
        elif c[0] < a[0]:
            if a_index == 0:
                finished = True  # cannot move left; accept current side
            else:
                a_index -= 1
        else:
            finished = True  # x-internal: optimal side found

    start = hull.at(a_index)
    end = hull.at(a_index + 1)
    c = hull.at(c_index)
    slope = (end[1] - start[1]) / float(end[0] - start[0])
    pred = slope * float(c[0] - start[0]) + start[1]  # signed diff (see module doc)
    deviation = abs(pred - c[1])
    intercept = start[1] - slope * float(start[0]) + deviation / 2
    return slope, intercept


def compress(values: np.ndarray, error_bound: float) -> bytes:
    if len(values) < 2:
        raise UnsupportedInputError("ABC needs >= 2 values")
    eb32 = np.float32(error_bound)
    if eb32 < 0.0:
        raise UnsupportedErrorBoundError("negative error bound")
    eb = float(eb32)
    if _NATIVE is not None:
        vals = np.ascontiguousarray(values, dtype=np.float64)
        buf = np.empty(24 * len(vals) + 32, dtype=np.uint8)
        rc = _NATIVE["tersets_abc"](
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(vals),
            eb,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if rc >= 0:
            return buf[:rc].tobytes()

    out = bytearray()
    hull = ConvexHull()
    n = len(values)
    seg_start = 0
    while seg_start < n - 1:
        last_valid_line = None
        hull.add((seg_start, float(values[seg_start])))
        last_valid_end = seg_start + 1
        index = seg_start + 1
        while index < n:
            # NOTE: unlike Swing/Slide, the reference does not reject
            # non-finite inputs here; neither do we.
            hull.add((index, float(values[index])))
            line = _find_abc_optimal_segment(hull)
            if hull.compute_max_error(line[0], line[1]) <= eb:
                last_valid_end = index
                last_valid_line = line
            else:
                break
            index += 1

        out += struct.pack("<Q", last_valid_end)
        if last_valid_line is not None and seg_start + 1 != last_valid_end:
            out += struct.pack("<dd", last_valid_line[0], last_valid_line[1])
        else:
            out += struct.pack(
                "<dd", float(values[seg_start]), float(values[last_valid_end])
            )
        seg_start = last_valid_end + 1
        hull.clean()

    if seg_start == n - 1:
        # Trailing single point as a slope-0 segment (zig :117-125).
        out += struct.pack("<Qdd", seg_start, 0.0, float(values[seg_start]))
    return bytes(out)


def decompress(blob: bytes) -> np.ndarray:
    """(end_index, slope, intercept) triplets (zig :130-158)."""
    if len(blob) % 24 != 0:
        raise UnsupportedInputError("ABC blob length must be a multiple of 24")
    words = np.frombuffer(blob, dtype="<f8")
    ends = words.view("<u8")
    if len(words) == 0:
        return np.empty(0, dtype=np.float64)
    et = ends[0::3].astype(np.int64)
    slopes = words[1::3]
    intercepts = words[2::3]
    starts = np.concatenate(([0], et[:-1] + 1))
    widths = et - starts + 1
    if np.any(widths < 1):
        return _decompress_scalar(words, ends)
    # triplets tile [0, et[-1]]: every position evaluates its segment line
    # (same slope*t + intercept op as the scalar loop); width-2 segments
    # carry the two raw values in the slope/intercept slots instead
    n = int(et[-1]) + 1
    out = np.repeat(slopes, widths) * np.arange(n, dtype=np.float64) + np.repeat(
        intercepts, widths
    )
    raw2 = widths == 2
    out[starts[raw2]] = slopes[raw2]
    out[et[raw2]] = intercepts[raw2]
    return out


def _decompress_scalar(words, ends) -> np.ndarray:
    out: list[float] = []
    seg_start = 0
    index = 0
    while index + 2 < len(words):
        seg_end = int(ends[index])
        slope = float(words[index + 1])
        intercept = float(words[index + 2])
        if seg_start + 1 != seg_end:
            for t in range(seg_start, seg_end + 1):
                out.append(slope * float(t) + intercept)
        else:
            out.append(slope)
            out.append(intercept)
        seg_start = seg_end + 1
        index += 3
    return np.asarray(out, dtype=np.float64)

"""Poor Man's Compression — Midrange (method 0) and Mean (method 1).

Semantics-parity reimplementation (NOT a translation) of the reference codec
``/root/reference/src/functional/poor_mans_compression.zig``:

* streaming piecewise-constant approximation; a segment is flushed when the
  running spread exceeds the bound (midrange: ``max-min > 2*eb`` at :46;
  mean: ``max-avg > eb or avg-min > eb`` at :81);
* accumulators are 80-bit extended floats (:39-40, :74) — reproduced here with
  ``np.longdouble`` (true x87 f80 on x86-64 Linux);
* the error bound is an f32 (promotion semantics reproduced by rounding the
  bound through ``np.float32`` before promoting to longdouble);
* blob format: repeated 16-byte pairs ``(value: f64 LE, end_index_exclusive:
  u64 LE)`` (:106-119), final segment always emitted (:58-59, :96).

Engineering differences from the reference (same outputs):

* ``error_bound == 0`` on integral inputs takes a fully-vectorized
  run-length fast path (segments degenerate to runs of equal values);
* the generic midrange path scans with vectorized chunked cummax/cummin
  instead of a scalar loop (min/max of f64 values are exact, so chunking
  cannot change results); the mean path is inherently sequential because of
  the f80 rounding chain of the running mean (:79) and stays a scalar loop.
"""

from __future__ import annotations

import numpy as np

from ..errors import UnsupportedInputError

_CHUNK = 512


def _pack_pairs(values: np.ndarray, ends: np.ndarray) -> bytes:
    """Pack (f64 value, u64 end) pairs little-endian, 16 bytes per segment."""
    out = np.empty((len(values), 2), dtype="<f8")
    out[:, 0] = values
    out.view("<u8")[:, 1] = ends.astype(np.uint64)
    return out.tobytes()


def _integral_fast_path_ok(values: np.ndarray, *, mean: bool) -> bool:
    """True when eb==0 segmentation provably degenerates to exact runs.

    Midrange needs exact min/max only, which holds for any finite values
    without mixed-sign zeros. Mean additionally needs the f80 running-mean
    recurrence ``(avg*len + v)/(len+1)`` to be exact within a constant run,
    which holds for integral values with |v|*(n+1) < 2**62.
    """
    if not np.isfinite(values).all():
        return False
    if np.any((values == 0) & np.signbit(values)):
        return False
    if not mean:
        return True
    if not (values == np.floor(values)).all():
        return False
    amax = float(np.max(np.abs(values))) if len(values) else 0.0
    return amax * (len(values) + 1) < 2.0**62


def _rle_segments(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run-length segmentation: per-run (value, end_index_exclusive)."""
    n = len(values)
    breaks = np.flatnonzero(values[1:] != values[:-1])
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks + 1, [n])).astype(np.uint64)
    return values[starts], ends


def compress_midrange(values: np.ndarray, error_bound: float) -> bytes:
    if len(values) == 0:
        raise UnsupportedInputError("empty input")
    values = np.ascontiguousarray(values, dtype=np.float64)
    eb32 = np.float32(error_bound)
    # reference computes `2 * error_bound` in f32, then promotes (zig :46)
    threshold = np.longdouble(np.float32(2.0) * eb32)

    if eb32 == 0 and _integral_fast_path_ok(values, mean=False):
        vals, ends = _rle_segments(values)
        return _pack_pairs(vals, ends)

    out_vals: list[float] = []
    out_ends: list[int] = []
    n = len(values)
    seg_start = 0
    while seg_start < n:
        # Scan forward in vectorized chunks carrying the running min/max.
        cur_min = np.float64(values[seg_start])
        cur_max = np.float64(values[seg_start])
        pos = seg_start + 1
        brk = -1
        # check the seed itself cannot break (spread 0 > threshold is false)
        while pos < n and brk < 0:
            chunk = values[pos : pos + _CHUNK]
            cmax = np.fmax.accumulate(np.concatenate(([cur_max], chunk)))[1:]
            cmin = np.fmin.accumulate(np.concatenate(([cur_min], chunk)))[1:]
            spread = cmax.astype(np.longdouble) - cmin.astype(np.longdouble)
            hits = np.flatnonzero(spread > threshold)
            if len(hits):
                h = int(hits[0])
                brk = pos + h
                if h > 0:
                    cur_min = cmin[h - 1]
                    cur_max = cmax[h - 1]
            else:
                cur_min = cmin[-1]
                cur_max = cmax[-1]
                pos += len(chunk)
        if brk < 0:
            mid = (np.longdouble(cur_max) + np.longdouble(cur_min)) / 2
            out_vals.append(float(np.float64(mid)))
            out_ends.append(n)
            break
        mid = (np.longdouble(cur_max) + np.longdouble(cur_min)) / 2
        out_vals.append(float(np.float64(mid)))
        out_ends.append(brk)
        seg_start = brk
    return _pack_pairs(np.asarray(out_vals), np.asarray(out_ends, dtype=np.uint64))


def compress_mean(values: np.ndarray, error_bound: float) -> bytes:
    if len(values) == 0:
        raise UnsupportedInputError("empty input")
    values = np.ascontiguousarray(values, dtype=np.float64)
    eb = np.longdouble(np.float32(error_bound))

    if np.float32(error_bound) == 0 and _integral_fast_path_ok(values, mean=True):
        vals, ends = _rle_segments(values)
        return _pack_pairs(vals, ends)

    # Sequential f80 recurrence (zig :69-96): NaN-seeded min/max, running mean.
    minimum = np.longdouble(np.nan)
    maximum = np.longdouble(np.nan)
    length = np.float64(0.0)
    average = np.longdouble(0.0)
    out_vals: list[float] = []
    out_ends: list[int] = []
    for index, value in enumerate(values):
        v = np.longdouble(value)
        next_min = np.fmin(v, minimum)  # @min returns the non-NaN operand
        next_max = np.fmax(v, maximum)
        next_length = length + 1
        next_average = (average * np.longdouble(length) + v) / np.longdouble(next_length)
        if (next_max - next_average > eb) or (next_average - next_min > eb):
            out_vals.append(float(np.float64(average)))
            out_ends.append(index)
            minimum = v
            maximum = v
            length = np.float64(1.0)
            average = v
        else:
            minimum = next_min
            maximum = next_max
            length = next_length
            average = next_average
    out_vals.append(float(np.float64(average)))
    out_ends.append(len(values))
    return _pack_pairs(np.asarray(out_vals), np.asarray(out_ends, dtype=np.uint64))


def decompress(blob: bytes) -> np.ndarray:
    """Run-length expansion of 16-byte (value, end_exclusive) pairs (zig :102-121)."""
    if len(blob) % 16 != 0:
        raise UnsupportedInputError("PMC blob length must be a multiple of 16")
    pairs = np.frombuffer(blob, dtype="<f8").reshape(-1, 2)
    vals = pairs[:, 0].copy()
    ends = pairs.view("<u8")[:, 1].astype(np.int64)
    starts = np.concatenate(([0], ends[:-1]))
    counts = ends - starts
    if np.any(counts < 0):
        raise UnsupportedInputError("non-monotonic segment ends")
    return np.repeat(vals, counts)

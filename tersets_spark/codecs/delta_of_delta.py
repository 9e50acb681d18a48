"""Delta-of-delta integer packing (method 14, engine extension; lossless).

Semantics from Pelkonen et al. (Gorilla, PVLDB 2015) §4.1.1: store the first
value, the first delta, then the second differences (delta-of-delta), each in
the smallest of a few width buckets chosen by a selector.

Columnar layout (same reasoning as gorilla.py — vectorizable both ways):

    u32 n            — point count
    i64 first        — values[0]
    i64 first_delta  — values[1]-values[0] (present iff n >= 2)
    sel 2-bit/entry  — packed selectors for the n-2 delta-of-deltas:
                       0 -> dod == 0 (no payload)
                       1 -> zigzag(dod) in 7 bits
                       2 -> zigzag(dod) in 19 bits
                       3 -> zigzag(dod) in 64 bits
    u64 words[...]   — packed payload bits

Values are interpreted as int64; inputs must be integral f64 or ints (the
token / timestamp path). Round-trip is exact for |values| < 2**62.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import UnsupportedInputError
from ._bitpack import pack_bits, unpack_bits

_WIDTHS = np.array([0, 7, 19, 64], dtype=np.int64)


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))).astype(np.int64)


def compress(values: np.ndarray, error_bound: float = 0.0) -> bytes:
    if len(values) == 0:
        raise UnsupportedInputError("empty input")
    arr = np.asarray(values)
    if arr.dtype.kind == "f":
        iv = arr.astype(np.int64)
        if not np.array_equal(iv.astype(arr.dtype), arr):
            raise UnsupportedInputError("delta-of-delta requires integral values")
    else:
        iv = arr.astype(np.int64)
    n = len(iv)
    header = struct.pack("<Iq", n, int(iv[0]))
    if n == 1:
        return header
    deltas = np.diff(iv)
    header += struct.pack("<q", int(deltas[0]))
    if n == 2:
        return header
    dod = np.diff(deltas)
    zz = _zigzag(dod)
    sel = np.zeros(len(zz), dtype=np.uint64)
    sel[zz > 0] = 1
    sel[zz >= (1 << 7)] = 2
    sel[zz >= (1 << 19)] = 3
    sel_packed, _ = pack_bits(sel, np.full(len(sel), 2, dtype=np.uint64))
    widths = _WIDTHS[sel.astype(np.int64)]
    payload, _ = pack_bits(zz[widths > 0], widths[widths > 0])
    return header + struct.pack("<I", len(sel_packed)) + sel_packed + payload


def compress_blocks(flat: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> list[bytes]:
    """Batched compression of many segments of one flat int64 array.

    Produces byte-identical blobs to ``compress(flat[s:e])`` (without the
    method byte) for each segment, but amortizes all NumPy work across the
    batch: global diff/zigzag/selector passes plus ONE global bit-pack per
    stream (segments padded to word boundaries), then per-segment byte
    slicing. ~10x faster than per-segment calls for small (<100-pt) blocks —
    the rollup-tier hot path.
    """
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    nseg = len(starts)
    if nseg == 0:
        return []
    lens = ends - starts

    d = np.diff(flat) if len(flat) > 1 else np.zeros(0, dtype=np.int64)
    dd = np.diff(d) if len(d) > 1 else np.zeros(0, dtype=np.int64)
    zz_all = _zigzag(dd) if len(dd) else np.zeros(0, dtype=np.uint64)
    sel_all = np.zeros(len(zz_all), dtype=np.uint64)
    sel_all[zz_all > 0] = 1
    sel_all[zz_all >= (1 << 7)] = 2
    sel_all[zz_all >= (1 << 19)] = 3
    widths_all = _WIDTHS[sel_all.astype(np.int64)]

    # Per-segment dod slice [starts, ends-2); empty when len < 3.
    ndod = np.maximum(lens - 2, 0)

    # --- global sel stream: 2 bits per dod, segment-padded to words + 1 pad word
    sel_bits = 2 * ndod
    sel_words = (sel_bits + 63) // 64 + 1  # standalone pack_bits length incl. pad word
    # --- global payload stream per segment
    # gather per-segment dod index ranges into one index vector
    idx = _ranges_concat(starts, starts + ndod)
    seg_of = np.repeat(np.arange(nseg), ndod)
    zz = zz_all[idx]
    sel = sel_all[idx]
    widths = widths_all[idx]

    # payload bit length per segment; a segment with no nonzero-width entries
    # has an EMPTY payload (standalone pack_bits on an empty array -> b"")
    nz = widths > 0
    pay_bits = np.zeros(nseg, dtype=np.int64)
    np.add.at(pay_bits, seg_of, widths)
    nz_count = np.zeros(nseg, dtype=np.int64)
    np.add.at(nz_count, seg_of[nz], 1)
    pay_words = np.where(nz_count > 0, (pay_bits + 63) // 64 + 1, 0)
    sel_words = sel_words * (ndod > 0)

    sel_buf = _segmented_pack(sel, np.full(len(sel), 2, dtype=np.int64), seg_of, sel_words, nseg)
    pay_buf = _segmented_pack(zz[nz], widths[nz], seg_of[nz], pay_words, nseg)

    sel_off = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(sel_words, out=sel_off[1:])
    pay_off = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(pay_words, out=pay_off[1:])

    out: list[bytes] = []
    first_vals = flat[starts]
    for i in range(nseg):
        n = int(lens[i])
        header = struct.pack("<Iq", n, int(first_vals[i]))
        if n == 1:
            out.append(header)
            continue
        header += struct.pack("<q", int(d[starts[i]]))
        if n == 2:
            out.append(header)
            continue
        sel_bytes = sel_buf[sel_off[i] * 8 : sel_off[i + 1] * 8]
        pay_bytes = pay_buf[pay_off[i] * 8 : pay_off[i + 1] * 8]
        out.append(header + struct.pack("<I", len(sel_bytes)) + bytes(sel_bytes) + bytes(pay_bytes))
    return out


def _ranges_concat(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate arange(s, e) for each pair — vectorized."""
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    seg_base = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(lens[:-1], out=seg_base[1:])
    pos = np.arange(total, dtype=np.int64)
    seg = np.repeat(np.arange(len(starts)), lens)
    return starts[seg] + (pos - seg_base[seg])


def _segmented_pack(
    values: np.ndarray,
    lengths: np.ndarray,
    seg_of: np.ndarray,
    seg_words: np.ndarray,
    nseg: int,
) -> np.ndarray:
    """One global bit-pack with each segment starting on a fresh word.

    ``seg_words[i]`` is segment i's word budget (0 = no stream). Returns the
    packed little-endian word buffer as a uint8 view; segment i occupies
    words [cum(seg_words)[i], cum(seg_words)[i+1]) and its content equals a
    standalone ``pack_bits`` buffer (including the trailing zero pad word).
    """
    word_base = np.zeros(nseg, dtype=np.int64)
    np.cumsum(seg_words[:-1], out=word_base[1:])
    total_words = int(seg_words.sum())
    words = np.zeros(total_words, dtype=np.uint64)
    if len(values):
        # bit offset of each entry: segment word base * 64 + running bits within segment
        lengths = lengths.astype(np.uint64)
        within = np.zeros(len(values), dtype=np.uint64)
        np.cumsum(lengths[:-1], out=within[1:])
        # reset the running offset at each segment start
        seg_first = np.zeros(len(values), dtype=bool)
        seg_first[0] = True
        seg_first[1:] = seg_of[1:] != seg_of[:-1]
        seg_start_within = np.zeros(nseg, dtype=np.uint64)
        seg_start_within[seg_of[seg_first]] = within[seg_first]
        within = within - seg_start_within[seg_of]
        offsets = (word_base[seg_of].astype(np.uint64) << np.uint64(6)) + within
        vals = values.astype(np.uint64) & _pack_mask(lengths)
        w = (offsets >> np.uint64(6)).astype(np.int64)
        s = offsets & np.uint64(63)
        # offsets are nondecreasing across segments too (each segment's
        # word budget covers its bits, so the next word_base never backs up)
        from ._bitpack import or_scatter_monotone

        or_scatter_monotone(words, w, vals << s)
        has_hi = s > 0
        if np.any(has_hi):
            hi = vals[has_hi] >> (np.uint64(64) - s[has_hi])
            or_scatter_monotone(words, w[has_hi] + 1, hi)
    return words.astype("<u8").view(np.uint8)


def _pack_mask(lengths: np.ndarray) -> np.ndarray:
    full = lengths >= np.uint64(64)
    m = (np.uint64(1) << np.where(full, np.uint64(0), lengths)) - np.uint64(1)
    return np.where(full, np.uint64(0xFFFFFFFFFFFFFFFF), m)


def decompress(blob: bytes) -> np.ndarray:
    if len(blob) < 12:
        raise UnsupportedInputError("delta-of-delta blob too short")
    n, first = struct.unpack_from("<Iq", blob, 0)
    if n == 1:
        return np.array([first], dtype=np.int64)
    first_delta = struct.unpack_from("<q", blob, 12)[0]
    if n == 2:
        return np.array([first, first + first_delta], dtype=np.int64)
    sel_len = struct.unpack_from("<I", blob, 20)[0]
    off = 24
    sel = unpack_bits(blob[off : off + sel_len], np.full(n - 2, 2, dtype=np.uint64))
    off += sel_len
    widths = _WIDTHS[sel.astype(np.int64)]
    zz = np.zeros(n - 2, dtype=np.uint64)
    nzw = widths > 0
    zz[nzw] = unpack_bits(blob[off:], widths[nzw])
    dod = _unzigzag(zz)
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = first_delta
    np.cumsum(dod, out=deltas[1:])
    deltas[1:] += first_delta
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.cumsum(deltas, out=out[1:])
    out[1:] += first
    return out

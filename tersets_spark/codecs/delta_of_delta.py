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

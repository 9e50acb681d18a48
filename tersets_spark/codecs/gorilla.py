"""Gorilla XOR float encoding (method 13, engine extension; always lossless).

Semantics from Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", PVLDB 8(12), 2015, §4.1.2: each value is XORed with its
predecessor; a zero XOR is one control bit; a non-zero XOR stores
(leading-zero count, meaningful-bit length, meaningful bits).

Layout divergence (deliberate, documented): the paper interleaves a single
sequential bit stream, which cannot be encoded or decoded with vectorized
kernels. This engine uses a *columnar* layout with the identical information
content so both directions are pure NumPy:

    u32 n                      — point count
    u64 first                  — bit pattern of values[0]
    ctrl[ceil((n-1)/8)] bytes  — bit i set iff xor_{i+1} != 0 (little bit order)
    u8  lz[k]                  — leading zeros per non-zero xor (k = popcount)
    u8  ml[k]                  — meaningful bit length (1..64)
    u64 words[...]             — packed meaningful bits (see _bitpack)

The compressed size is within a few control bits of the paper's stream (we
always store lz/ml per non-zero xor instead of reusing the previous window —
that case costs 9 bits/point more at worst, and buys full vectorization).
There is no counterpart in the reference snapshot (/root/reference has no
Gorilla codec); this method exists because BASELINE.json's north_star
requires it.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import UnsupportedInputError
from ._bitpack import clz64, ctz64, pack_bits, unpack_bits


def compress(values: np.ndarray, error_bound: float = 0.0) -> bytes:
    if len(values) == 0:
        raise UnsupportedInputError("empty input")
    values = np.ascontiguousarray(values, dtype=np.float64)
    bits = values.view(np.uint64)
    n = len(values)
    header = struct.pack("<IQ", n, int(bits[0]))
    if n == 1:
        return header
    x = bits[1:] ^ bits[:-1]
    nz = x != 0
    ctrl = np.packbits(nz, bitorder="little").tobytes()
    xs = x[nz]
    lz = clz64(xs)
    tz = ctz64(xs)
    ml = 64 - lz - tz
    meaningful = xs >> tz.astype(np.uint64)
    packed, _ = pack_bits(meaningful, ml)
    return (
        header
        + ctrl
        + lz.astype(np.uint8).tobytes()
        + ml.astype(np.uint8).tobytes()
        + packed
    )


def decompress(blob: bytes) -> np.ndarray:
    if len(blob) < 12:
        raise UnsupportedInputError("gorilla blob too short")
    n, first = struct.unpack_from("<IQ", blob, 0)
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.float64).copy()
    off = 12
    nctrl = (n - 1 + 7) // 8
    ctrl = np.unpackbits(
        np.frombuffer(blob, dtype=np.uint8, count=nctrl, offset=off),
        bitorder="little",
    )[: n - 1].astype(bool)
    off += nctrl
    k = int(ctrl.sum())
    lz = np.frombuffer(blob, dtype=np.uint8, count=k, offset=off).astype(np.int64)
    off += k
    ml = np.frombuffer(blob, dtype=np.uint8, count=k, offset=off).astype(np.int64)
    off += k
    meaningful = unpack_bits(blob[off:], ml)
    tz = (64 - lz - ml).astype(np.uint64)
    xs = meaningful << tz
    x = np.zeros(n, dtype=np.uint64)
    x[0] = first
    x[1:][ctrl] = xs
    bits = np.bitwise_xor.accumulate(x)
    return bits.view(np.float64).copy()

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


def compress_blocks(flat: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> list[bytes]:
    """Batched compression of many segments of one flat int64 token array.

    Byte-identical to ``compress(flat[s:e].astype(float64))`` per segment
    (without the method byte), but amortizes all NumPy work across the
    batch — one float64 widen + one global XOR pass + one global
    clz/ctz/meaningful extraction + ONE global bit-pack per stream
    (segments padded exactly like a standalone ``pack_bits``/``packbits``
    call), then per-segment byte slicing. Same shape as
    ``delta_of_delta.compress_blocks``, whose helpers it reuses — this is
    what keeps Gorilla off the per-row-Python-call slow path in
    ``kernels.compress_map_in_arrow``.
    """
    from .delta_of_delta import _ranges_concat, _segmented_pack

    flat = np.ascontiguousarray(flat, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    nseg = len(starts)
    if nseg == 0:
        return []
    lens = ends - starts
    if np.any(lens <= 0):
        raise UnsupportedInputError("empty input")

    bits = flat.astype(np.float64).view(np.uint64)
    xall = np.zeros(len(bits), dtype=np.uint64)
    if len(bits) > 1:
        xall[1:] = bits[1:] ^ bits[:-1]

    # per-segment xor stream = positions (start, end); empty for n=1 rows
    stream_lens = lens - 1
    idx = _ranges_concat(starts + 1, ends)
    seg_of = np.repeat(np.arange(nseg), stream_lens)
    xs_stream = xall[idx]
    nzmask = xs_stream != 0

    # ctrl stream: per-segment little-bit-order packbits, byte-padded —
    # scatter the nz bits into one global byte-aligned bit canvas, pack once
    ctrl_bytes = (stream_lens + 7) // 8
    ctrl_base_bits = np.zeros(nseg, dtype=np.int64)
    np.cumsum(ctrl_bytes[:-1] * 8, out=ctrl_base_bits[1:])
    stream_base = np.zeros(nseg, dtype=np.int64)
    np.cumsum(stream_lens[:-1], out=stream_base[1:])
    within = np.arange(len(xs_stream), dtype=np.int64) - stream_base[seg_of]
    canvas = np.zeros(int(ctrl_bytes.sum()) * 8, dtype=np.uint8)
    canvas[(ctrl_base_bits[seg_of] + within)[nzmask]] = 1
    ctrl_buf = np.packbits(canvas, bitorder="little").tobytes()
    ctrl_off = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(ctrl_bytes, out=ctrl_off[1:])

    # non-zero xors: lz/ml byte streams + one segmented meaningful-bit pack
    xs = xs_stream[nzmask]
    seg_nz = seg_of[nzmask]
    lz = clz64(xs)
    tz = ctz64(xs)
    ml = 64 - lz - tz
    meaningful = xs >> tz.astype(np.uint64)
    k = np.bincount(seg_nz, minlength=nseg).astype(np.int64)
    k_off = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(k, out=k_off[1:])
    pay_bits = np.zeros(nseg, dtype=np.int64)
    np.add.at(pay_bits, seg_nz, ml)
    pay_words = np.where(k > 0, (pay_bits + 63) // 64 + 1, 0)
    pay_buf = _segmented_pack(meaningful, ml.astype(np.uint64), seg_nz, pay_words, nseg)
    pay_off = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(pay_words, out=pay_off[1:])

    lz8 = lz.astype(np.uint8).tobytes()
    ml8 = ml.astype(np.uint8).tobytes()
    first_bits = bits[starts]
    out: list[bytes] = []
    for i in range(nseg):
        n = int(lens[i])
        header = struct.pack("<IQ", n, int(first_bits[i]))
        if n == 1:
            out.append(header)
            continue
        out.append(
            header
            + ctrl_buf[ctrl_off[i] : ctrl_off[i + 1]]
            + lz8[k_off[i] : k_off[i + 1]]
            + ml8[k_off[i] : k_off[i + 1]]
            + bytes(pay_buf[pay_off[i] * 8 : pay_off[i + 1] * 8])
        )
    return out


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

"""Vectorized variable-width bit packing/unpacking over uint64 words.

These are NumPy-only primitives used by the Gorilla-XOR and delta-of-delta
codecs. Packing scatters each value's low/high word contribution with
``np.bitwise_or.at``; unpacking gathers straddling words and shifts. All
streams are little-endian 64-bit words, bit 0 = LSB of word 0.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_ONE = np.uint64(1)
_SIXTYFOUR = np.uint64(64)


def _bit_length_u64_ref(x: np.ndarray) -> np.ndarray:
    """Reference bit length (6 masked shift passes) — kept for the
    differential test pinning the frexp fast path below."""
    x = x.astype(np.uint64, copy=True)
    bl = np.zeros(x.shape, dtype=np.int64)
    for k in (32, 16, 8, 4, 2, 1):
        m = x >= (_ONE << _U64(k))
        bl[m] += k
        x[m] >>= _U64(k)
    bl[x > 0] += 1
    return bl


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (0 -> 0).

    frexp exponent of an EXACT float64 equals the bit length; a uint64 ->
    float64 conversion rounds above 2^53 (2^k - 1 can round UP to 2^k and
    overstate by one), so split into 32-bit halves — each half is < 2^32,
    far inside float64 exactness. ~3 cheap passes vs the 6 masked
    shift/copy passes of the reference (the Gorilla clz/ctz hot path)."""
    x = np.asarray(x, dtype=np.uint64)
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl_hi = np.frexp(hi)[1]  # 0 -> 0
    bl_lo = np.frexp(lo)[1]
    return np.where(bl_hi > 0, 32 + bl_hi, bl_lo).astype(np.int64)


def clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 -> 64)."""
    return 64 - bit_length_u64(x)


def ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (0 -> 64).

    The isolated lowest set bit is a power of two, and EVERY power of two
    up to 2^63 converts to float64 exactly, so a single frexp gives its
    exponent — one pass instead of a bit-length cascade."""
    x = np.asarray(x, dtype=np.uint64)
    low = x & (np.uint64(0) - x)  # isolate lowest set bit (two's complement)
    out = (np.frexp(low.astype(np.float64))[1] - 1).astype(np.int64)
    out[x == 0] = 64
    return out


def or_scatter_monotone(words: np.ndarray, w: np.ndarray, contrib: np.ndarray) -> None:
    """``words[w] |= contrib`` elementwise-accumulating, REQUIRING ``w``
    nondecreasing (true for every bit-stream scatter here: bit offsets are
    running sums). Groups equal word indices with one ``bitwise_or.
    reduceat`` — orders of magnitude faster than ``np.bitwise_or.at``'s
    per-element dispatch."""
    if len(w) == 0:
        return
    first = np.zeros(len(w), dtype=bool)
    first[0] = True
    first[1:] = w[1:] != w[:-1]
    idx = np.flatnonzero(first)
    words[w[idx]] |= np.bitwise_or.reduceat(contrib, idx)


def _mask(lengths: np.ndarray) -> np.ndarray:
    """Per-entry low-bit mask for lengths in [0, 64]."""
    lengths = lengths.astype(np.uint64)
    full = lengths >= _SIXTYFOUR
    m = (_ONE << np.where(full, _U64(0), lengths)) - _ONE
    return np.where(full, np.uint64(0xFFFFFFFFFFFFFFFF), m)


def pack_bits(values: np.ndarray, lengths: np.ndarray) -> tuple[bytes, int]:
    """Pack ``values[i]``'s low ``lengths[i]`` bits contiguously.

    Returns (little-endian word buffer as bytes, total bit count). The buffer
    includes one trailing pad word so unpack_bits can always gather word+1.
    """
    values = np.asarray(values, dtype=np.uint64)
    lengths = np.asarray(lengths, dtype=np.uint64)
    if len(values) == 0:
        return b"", 0
    offsets = np.zeros(len(values), dtype=np.uint64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    total = int(offsets[-1] + lengths[-1])
    nwords = (total + 63) // 64 + 1
    words = np.zeros(nwords, dtype=np.uint64)
    vals = values & _mask(lengths)
    w = (offsets >> np.uint64(6)).astype(np.int64)
    s = offsets & np.uint64(63)
    or_scatter_monotone(words, w, vals << s)  # offsets are a running sum
    has_hi = s > 0
    if np.any(has_hi):
        hi = vals[has_hi] >> (_SIXTYFOUR - s[has_hi])
        or_scatter_monotone(words, w[has_hi] + 1, hi)
    return words.astype("<u8").tobytes(), total


def unpack_bits(buf: bytes | np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Inverse of pack_bits given the per-entry bit lengths."""
    lengths = np.asarray(lengths, dtype=np.uint64)
    if len(lengths) == 0:
        return np.zeros(0, dtype=np.uint64)
    words = np.frombuffer(buf, dtype="<u8") if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    offsets = np.zeros(len(lengths), dtype=np.uint64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    w = (offsets >> np.uint64(6)).astype(np.int64)
    s = offsets & np.uint64(63)
    lo = words[w] >> s
    out = lo.copy()
    has_hi = s > 0
    if np.any(has_hi):
        out[has_hi] |= words[w[has_hi] + 1] << (_SIXTYFOUR - s[has_hi])
    return out & _mask(lengths)

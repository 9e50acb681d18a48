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


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (0 -> 0)."""
    x = x.astype(np.uint64, copy=True)
    bl = np.zeros(x.shape, dtype=np.int64)
    for k in (32, 16, 8, 4, 2, 1):
        m = x >= (_ONE << _U64(k))
        bl[m] += k
        x[m] >>= _U64(k)
    bl[x > 0] += 1
    return bl


def clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 -> 64)."""
    return 64 - bit_length_u64(x)


def ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (0 -> 64)."""
    x = np.asarray(x, dtype=np.uint64)
    low = x & (np.uint64(0) - x)  # isolate lowest set bit (two's complement)
    out = bit_length_u64(low) - 1
    out[x == 0] = 64
    return out


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
    np.bitwise_or.at(words, w, vals << s)
    has_hi = s > 0
    if np.any(has_hi):
        hi = vals[has_hi] >> (_SIXTYFOUR - s[has_hi])
        np.bitwise_or.at(words, w[has_hi] + 1, hi)
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

"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure NumPy — no external
imaging library.

The decoder handles real-world baseline files: SOI/APPn/COM/DQT/DHT/
SOF0/SOF1/DRI/SOS/EOI marker parsing, 8-bit quantization tables (and
16-bit precision-1 tables), canonical Huffman tables via a 16-bit peek
lookup, byte-unstuffing (FF 00) and restart markers (RST0-7 with DC
predictor reset), interleaved MCUs with sampling factors 1-2 per axis
(4:4:4 / 4:2:2 / 4:2:0), dequantization, zig-zag inverse, 8x8 IDCT as two
matrix products against the orthonormal DCT-II basis, level shift, chroma
box upsampling and the JFIF YCbCr->RGB transform. Progressive (SOF2),
arithmetic coding and 12-bit precision raise ``NotImplementedError``;
structural corruption raises ``ValueError`` (corrupt media fails loudly).

The matching encoder exists for fixture synthesis and differential tests:
forward DCT, quantization with caller-supplied tables, Annex K standard
Huffman tables, byte stuffing, optional restart intervals, grayscale and
4:2:0 / 4:4:4 YCbCr color.

Exactness contract used by the media gate query: an image composed of
constant 8x8 blocks, encoded with an all-ones quantization table, decodes
bit-exactly — the DCT of a constant block is a lone DC coefficient
``8*(c-128)`` (an exact integer; float residue in the AC terms is ~1e-13,
far below the rounding threshold), entropy coding is lossless, and the
IDCT of a DC-only block is exactly flat. So decoded samples equal the
source bytes and a SQL oracle can replay the decode from the text alone.

Spec: ITU-T T.81 (1992); tables K.1-K.5. The reference repo has no media
path — this module exists for the training-data-pipeline surface
(multimodal columns), not codec parity.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg_gray", "encode_jpeg_rgb"]

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

#: zig-zag order: index i of the scan -> position in the row-major 8x8 block.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)  # row-major position -> scan index


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis A: forward = A @ X @ A.T."""
    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_basis()
_AT = _A.T.copy()

# Annex K.3.1 / K.3.2: standard luminance Huffman tables (BITS, HUFFVAL).
_STD_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_LUM_VALS = list(range(12))
_STD_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
# Annex K.3.3 / K.3.4: standard chrominance tables.
_STD_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_STD_DC_CHR_VALS = list(range(12))
_STD_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_STD_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> list[tuple[int, int, int]]:
    """(code, length, value) triples in canonical JPEG order (C.2)."""
    out: list[tuple[int, int, int]] = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """16-bit peek lookup: table[peek16] = (value << 5) | code_length."""

    __slots__ = ("lut",)

    def __init__(self, bits: list[int], vals: list[int]):
        if sum(bits) != len(vals):
            raise ValueError("DHT: BITS total != number of HUFFVAL entries")
        lut = np.zeros(1 << 16, dtype=np.int32)
        for code, length, value in _canonical_codes(bits, vals):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            if hi > (1 << 16):
                raise ValueError("DHT: oversubscribed Huffman table")
            lut[lo:hi] = (value << 5) | length
        self.lut = lut


class _BitReader:
    """MSB-first bit reader over UNSTUFFED entropy-coded bytes.

    Peeks are padded with 1-bits past the end (T.81 F.2.2.5 allows the
    final EOB code to be completed by padding); consuming bits strictly
    beyond the pad allowance raises.
    """

    __slots__ = ("data", "nbits", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.nbits = 8 * len(data)
        self.pos = 0

    def peek16(self) -> int:
        byte = self.pos >> 3
        chunk = self.data[byte : byte + 4]
        v = int.from_bytes(chunk.ljust(4, b"\xff"), "big")
        return (v >> (16 - (self.pos & 7))) & 0xFFFF

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits + 16:
            raise ValueError("JPEG: entropy-coded segment exhausted")
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t raw bits to the signed coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "pred", "blocks", "bw", "bh")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        self.pred = 0


def _u16(b: bytes, off: int) -> int:
    return (b[off] << 8) | b[off + 1]


def _entropy_decode(
    payload: bytes,
) -> tuple[list[_Component], dict[int, np.ndarray], int, int, int, int]:
    """Parse markers and entropy-decode the scan.

    Returns (components, qtables, width, height, hmax, vmax) with each
    component's ``blocks`` holding quantized zig-zag coefficients —
    the exact integers the encoder wrote (entropy coding is lossless),
    which the differential tests pin directly.
    """
    b = bytes(payload)
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")

    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    pos = 2
    scan_segments: list[bytes] = []
    scan_comps: list[_Component] = []

    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at offset {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            continue
        if pos + 2 > len(b):
            raise ValueError("JPEG: truncated marker segment")
        seglen = _u16(b, pos)
        if seglen < 2 or pos + seglen > len(b):
            raise ValueError("JPEG: bad marker segment length")
        seg = b[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq == 0:
                    if off + 64 > len(seg):
                        raise ValueError("JPEG: truncated DQT")
                    q = np.frombuffer(seg[off : off + 64], dtype=np.uint8).astype(np.int64)
                    off += 64
                elif pq == 1:
                    if off + 128 > len(seg):
                        raise ValueError("JPEG: truncated 16-bit DQT")
                    q = np.frombuffer(seg[off : off + 128], dtype=">u2").astype(np.int64)
                    off += 128
                else:
                    raise ValueError(f"JPEG: bad DQT precision {pq}")
                if (q == 0).any():
                    raise ValueError("JPEG: zero quantizer")
                qtables[tq] = q
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                if tc > 1:
                    raise ValueError(f"JPEG: bad DHT class {tc}")
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                if len(vals) < n:
                    raise ValueError("JPEG: truncated DHT")
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            if seg[0] != 8:
                raise NotImplementedError("JPEG: only 8-bit precision supported")
            height, width = _u16(seg, 1), _u16(seg, 3)
            if width == 0 or height == 0:
                raise ValueError("JPEG: zero frame dimension")
            nf = seg[5]
            if nf not in (1, 3):
                raise NotImplementedError(f"JPEG: {nf}-component frames unsupported")
            for i in range(nf):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                h, v = hv >> 4, hv & 0xF
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise NotImplementedError(f"JPEG: sampling factor {h}x{v} unsupported")
                comps.append(_Component(cid, h, v, seg[8 + 3 * i]))
        elif marker == 0xC2:
            raise NotImplementedError("JPEG: progressive (SOF2) unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG: SOF marker {marker:#x} unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = _u16(seg, 0)
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            if ns != len(comps):
                raise NotImplementedError("JPEG: multi-scan files unsupported")
            by_id = {c.cid: c for c in comps}
            scan_comps = []
            for i in range(ns):
                cs = seg[1 + 2 * i]
                if cs not in by_id:
                    raise ValueError(f"JPEG: SOS references unknown component {cs}")
                c = by_id[cs]
                c.td, c.ta = seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF
                scan_comps.append(c)
            # entropy-coded data runs to the next non-RST marker
            start = pos
            segs: list[bytes] = []
            cur = bytearray()
            i = start
            while i < len(b):
                c0 = b[i]
                if c0 != 0xFF:
                    cur.append(c0)
                    i += 1
                    continue
                if i + 1 >= len(b):
                    raise ValueError("JPEG: truncated entropy segment")
                c1 = b[i + 1]
                if c1 == 0x00:  # stuffed FF
                    cur.append(0xFF)
                    i += 2
                elif 0xD0 <= c1 <= 0xD7:  # restart marker: segment boundary
                    segs.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                else:
                    break
            segs.append(bytes(cur))
            scan_segments = segs
            pos = i
        else:
            # APPn, COM, unknown: skip
            continue

    if not comps or not scan_segments:
        raise ValueError("JPEG: missing SOF/SOS")

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    n_mcus = mcux * mcuy
    for c in comps:
        c.bw = mcux * c.h
        c.bh = mcuy * c.v
        c.blocks = np.zeros((c.bh * c.bw, 64), dtype=np.int32)
        if c.tq not in qtables:
            raise ValueError(f"JPEG: missing quantization table {c.tq}")

    # entropy decode, MCU interleaved, restart-aware
    mcu = 0
    for seg_idx, seg_bytes in enumerate(scan_segments):
        reader = _BitReader(seg_bytes)
        for c in comps:
            c.pred = 0
        limit = (
            min(n_mcus, (seg_idx + 1) * restart_interval)
            if restart_interval
            else n_mcus
        )
        if mcu >= limit and mcu < n_mcus:
            raise ValueError("JPEG: empty restart segment before scan completed")
        while mcu < limit:
            my, mx = divmod(mcu, mcux)
            for c in scan_comps:
                dc_lut = htables.get((0, c.td))
                ac_lut = htables.get((1, c.ta))
                if dc_lut is None or ac_lut is None:
                    raise ValueError("JPEG: scan references missing Huffman table")
                dlut, alut = dc_lut.lut, ac_lut.lut
                for by in range(c.v):
                    for bx in range(c.h):
                        coefs = c.blocks[(my * c.v + by) * c.bw + (mx * c.h + bx)]
                        entry = int(dlut[reader.peek16()])
                        if entry == 0:
                            raise ValueError("JPEG: invalid DC Huffman code")
                        t = entry >> 5
                        reader.pos += entry & 31
                        diff = _extend(reader.take(t), t)
                        c.pred += diff
                        coefs[0] = c.pred
                        k = 1
                        while k < 64:
                            entry = int(alut[reader.peek16()])
                            if entry == 0:
                                raise ValueError("JPEG: invalid AC Huffman code")
                            rs = entry >> 5
                            reader.pos += entry & 31
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC run past block end")
                            coefs[k] = _extend(reader.take(s), s)
                            k += 1
            mcu += 1
    if mcu < n_mcus:
        raise ValueError(f"JPEG: scan ended after {mcu}/{n_mcus} MCUs")
    return comps, qtables, width, height, hmax, vmax


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG into a flat uint8 array.

    Grayscale frames return ``height*width`` samples; color frames return
    ``height*width*3`` interleaved RGB. Raises ``ValueError`` for
    structural corruption, ``NotImplementedError`` for progressive /
    arithmetic / 12-bit / >2 sampling factors.
    """
    comps, qtables, width, height, hmax, vmax = _entropy_decode(payload)

    # dequant + IDCT per component, vectorized over all blocks at once
    planes: list[np.ndarray] = []
    for c in comps:
        q = qtables[c.tq]
        deq = (c.blocks * q[None, :]).astype(np.float64)
        spatial = deq[:, _UNZIGZAG].reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _A, spatial, _A, optimize=True)
        pix = np.clip(np.rint(pix + 128.0), 0, 255).astype(np.uint8)
        plane = (
            pix.reshape(c.bh, c.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh * 8, c.bw * 8)
        )
        # crop to this component's true size, then replicate to full frame
        cw = -(-width * c.h // hmax)
        ch = -(-height * c.v // vmax)
        plane = plane[:ch, :cw]
        if c.h != hmax or c.v != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return planes[0].reshape(-1)

    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bch = y + 1.772 * cb
    rgb = np.stack([r, g, bch], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8).reshape(-1)


# ---------------------------------------------------------------------------
# encoder (fixture synthesis + differential tests)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.put((1 << pad) - 1, pad)  # pad with 1-bits (F.1.2.3)


def _enc_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    return {value: (code, length) for code, length, value in _canonical_codes(bits, vals)}


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _put_coef(w: _BitWriter, table: dict[int, tuple[int, int]], rs: int, v: int, s: int) -> None:
    code, length = table[rs]
    w.put(code, length)
    if s:
        w.put(v if v >= 0 else v + (1 << s) - 1, s)


def _encode_blocks(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    """Entropy-encode one block's zig-zag coefficients; returns new DC pred."""
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    _put_coef(w, dc_tab, s, diff, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            _put_coef(w, ac_tab, 0xF0, 0, 0)  # ZRL
            run -= 16
        s = _category(v)
        _put_coef(w, ac_tab, (run << 4) | s, v, s)
        run = 0
    if last_nz < 63:
        _put_coef(w, ac_tab, 0x00, 0, 0)  # EOB
    return dc


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize an (H,W) uint8 plane -> (nblocks, 64) zig-zag."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coefs = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A, optimize=True)
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]
    return np.rint(zz / q[None, :]).astype(np.int32)


def _pad_to_mcu(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    if h == bh and w == bw:
        return plane
    out = np.empty((bh, bw), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :w]  # edge replicate
    out[:, w:] = out[:, w - 1 : w]
    return out


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_seg(tid: int, q: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes(int(x) for x in q))


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def encode_jpeg_gray(
    img: np.ndarray,
    qtable: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H,W) uint8 array as a baseline grayscale JPEG.

    ``qtable`` is 64 zig-zag-ordered quantizer steps (default all-ones —
    near-lossless, exactly lossless for constant 8x8 blocks)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_jpeg_gray: expected (H,W) array")
    h, w = img.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("encode_jpeg_gray: bad dimensions")
    q = np.ones(64, dtype=np.int64) if qtable is None else np.asarray(qtable, dtype=np.int64)
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    zz = _fdct_quant(_pad_to_mcu(img, bh, bw), q)

    dc_tab = _enc_table(_STD_DC_LUM_BITS, _STD_DC_LUM_VALS)
    ac_tab = _enc_table(_STD_AC_LUM_BITS, _STD_AC_LUM_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, q)
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _dht_seg(0, 0, _STD_DC_LUM_BITS, _STD_DC_LUM_VALS)
    out += _dht_seg(1, 0, _STD_AC_LUM_BITS, _STD_AC_LUM_VALS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    # blocks are stored in raster order == MCU order for a 1x1 component
    w_writer = _BitWriter()
    pred = 0
    n = len(zz)
    for i in range(n):
        if restart_interval and i and i % restart_interval == 0:
            w_writer.flush()
            out += w_writer.buf
            w_writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
            pred = 0
        pred = _encode_blocks(w_writer, zz[i], pred, dc_tab, ac_tab)
    w_writer.flush()
    out += w_writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_rgb(
    rgb: np.ndarray,
    qtable_luma: np.ndarray | None = None,
    qtable_chroma: np.ndarray | None = None,
    subsample: bool = True,
) -> bytes:
    """Encode an (H,W,3) uint8 RGB array as baseline YCbCr JPEG
    (4:2:0 when ``subsample`` else 4:4:4)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_jpeg_rgb: expected (H,W,3) array")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("encode_jpeg_rgb: bad dimensions")
    ql = np.ones(64, dtype=np.int64) if qtable_luma is None else np.asarray(qtable_luma, dtype=np.int64)
    qc = np.ones(64, dtype=np.int64) if qtable_chroma is None else np.asarray(qtable_chroma, dtype=np.int64)

    f = rgb.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
    cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
    y, cb, cr = (np.clip(np.rint(p), 0, 255).astype(np.uint8) for p in (y, cb, cr))

    sh, sv = (2, 2) if subsample else (1, 1)
    mcuw, mcuh = 8 * sh, 8 * sv
    fw, fh = -(-w // mcuw) * mcuw, -(-h // mcuh) * mcuh
    y = _pad_to_mcu(y, fh, fw)
    cb = _pad_to_mcu(cb, fh, fw)
    cr = _pad_to_mcu(cr, fh, fw)
    if subsample:  # 2x2 box average
        cb = np.rint(cb.reshape(fh // 2, 2, fw // 2, 2).mean(axis=(1, 3))).astype(np.uint8)
        cr = np.rint(cr.reshape(fh // 2, 2, fw // 2, 2).mean(axis=(1, 3))).astype(np.uint8)

    zzs = [_fdct_quant(y, ql), _fdct_quant(cb, qc), _fdct_quant(cr, qc)]
    bws = [fw // 8, cb.shape[1] // 8, cr.shape[1] // 8]

    dcl = _enc_table(_STD_DC_LUM_BITS, _STD_DC_LUM_VALS)
    acl = _enc_table(_STD_AC_LUM_BITS, _STD_AC_LUM_VALS)
    dcc = _enc_table(_STD_DC_CHR_BITS, _STD_DC_CHR_VALS)
    acc = _enc_table(_STD_AC_CHR_BITS, _STD_AC_CHR_VALS)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, ql) + _dqt_seg(1, qc)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [3, 1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, _STD_DC_LUM_BITS, _STD_DC_LUM_VALS)
    out += _dht_seg(1, 0, _STD_AC_LUM_BITS, _STD_AC_LUM_VALS)
    out += _dht_seg(0, 1, _STD_DC_CHR_BITS, _STD_DC_CHR_VALS)
    out += _dht_seg(1, 1, _STD_AC_CHR_BITS, _STD_AC_CHR_VALS)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    writer = _BitWriter()
    preds = [0, 0, 0]
    tabs = [(dcl, acl), (dcc, acc), (dcc, acc)]
    mcux, mcuy = fw // mcuw, fh // mcuh
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (hs, vs) in enumerate([(sh, sv), (1, 1), (1, 1)]):
            for by in range(vs):
                for bx in range(hs):
                    idx = (my * vs + by) * bws[ci] + (mx * hs + bx)
                    preds[ci] = _encode_blocks(writer, zzs[ci][idx], preds[ci], *tabs[ci])
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"
    return bytes(out)

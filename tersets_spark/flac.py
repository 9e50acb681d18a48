"""FLAC decoder/encoder in pure NumPy + stdlib — no external audio library.

The decoder handles real baseline FLAC streams: fLaC marker + metadata
blocks (STREAMINFO parsed, others skipped), frame headers (sync code,
blocking strategy, coded block size / sample rate, channel assignment
including left-side / right-side / mid-side decorrelation, UTF-8-coded
frame number, CRC-8), subframes (CONSTANT, VERBATIM, FIXED orders 0-4,
LPC with quantized coefficients), wasted bits, Rice-coded residual
partitions (both 4- and 5-bit parameter variants, escape code to
unencoded binary), and the frame CRC-16 — corrupt streams fail loudly
with ``ValueError``. Unsupported-by-construction features raise
``NotImplementedError``.

The matching encoder exists for fixture synthesis and differential
tests: mono/stereo, 8/16-bit, per-frame subframe selection (constant /
verbatim / fixed order 0-2 with Rice residuals), correct CRC-8/CRC-16.

FLAC is LOSSLESS, so unlike JPEG no special fixture shape is needed:
any byte string round-trips exactly, and the media gate oracle replays
decoded feature stats straight from the document text.

Spec: https://xiph.org/flac/format.html (public). The reference repo has
no media path — this module exists for the training-data-pipeline
surface (multimodal columns), not codec parity.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_flac", "encode_flac"]


# ---------------------------------------------------------------------------
# CRCs (FLAC polynomials: CRC-8 x^8+x^2+x+1, CRC-16 x^16+x^15+x^2+1)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = i << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        table[i] = r & mask
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC8_TABLE[crc ^ b])
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = (int(_CRC16_TABLE[(crc >> 8) ^ b]) ^ ((crc << 8) & 0xFFFF)) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# bit I/O (MSB-first)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > 8 * len(self.data):
            raise ValueError("FLAC: bitstream exhausted")
        first = self.pos >> 3
        last = (end - 1) >> 3
        chunk = int.from_bytes(self.data[first : last + 1], "big")
        chunk >>= (8 * (last - first + 1)) - (end - 8 * first)
        self.pos = end
        return chunk & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        # count zero bits until the terminating 1
        q = 0
        while True:
            if self.pos >= 8 * len(self.data):
                raise ValueError("FLAC: bitstream exhausted in unary code")
            byte = self.data[self.pos >> 3]
            rem = 8 - (self.pos & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                q += rem
                self.pos += rem
                continue
            lead = rem - window.bit_length()
            q += lead
            self.pos += lead + 1
            return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.buf.append((self.acc >> (self.nacc - 8)) & 0xFF)
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8_number(r: _BitReader) -> int:
    """FLAC's extended UTF-8 coded frame/sample number."""
    first = r.read(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError("FLAC: bad UTF-8 coded number")
    v = first & (0x3F >> n)
    for _ in range(n):
        c = r.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(r: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("FLAC: partition count does not divide block size")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: residual partition underflow")
        param = r.read(param_bits)
        if param == escape:
            bits = r.read(5)
            for i in range(n):
                out[idx + i] = r.read_signed(bits) if bits else 0
        else:
            for i in range(n):
                q = r.read_unary()
                lo = r.read(param) if param else 0
                zz = (q << param) | lo
                out[idx + i] = (zz >> 1) ^ -(zz & 1)  # zigzag decode
        idx += n
    return out


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")

    if sf_type == 0:  # CONSTANT
        v = r.read_signed(eff)
        samples = np.full(block_size, v, dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        samples = np.array([r.read_signed(eff) for _ in range(block_size)],
                           dtype=np.int64)
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type - 8
        if order > block_size:
            raise ValueError("FLAC: fixed order exceeds block size")
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        samples = np.empty(block_size, dtype=np.int64)
        samples[:order] = warm
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coeffs):
                pred += c * samples[i - 1 - j]
            samples[i] = pred + resid[i - order]
    elif sf_type >= 32:  # LPC order 1-32
        order = sf_type - 31
        if order > block_size:
            raise ValueError("FLAC: LPC order exceeds block size")
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("FLAC: invalid LPC precision escape")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coeffs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        samples = np.empty(block_size, dtype=np.int64)
        samples[:order] = warm
        for i in range(order, block_size):
            pred = 0
            for j in range(order):
                pred += coeffs[j] * int(samples[i - 1 - j])
            samples[i] = (pred >> shift) + resid[i - order]
    else:
        raise ValueError(f"FLAC: reserved subframe type {sf_type}")
    if wasted:
        samples = samples << wasted
    return samples


def decode_flac(payload: bytes) -> np.ndarray:
    """Decode a FLAC stream into a flat uint8 feature array.

    Samples rebias to the uint8 feature space the other decoders use:
    8-bit audio maps ``s + 128``; wider sample sizes map
    ``(s >> (bps-8)) + 128`` (same convention as 16-bit WAV). Stereo
    interleaves channels. CRC-8 (frame header) and CRC-16 (whole frame)
    are verified — corrupt media fails loudly."""
    b = bytes(payload)
    if len(b) < 42 or b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(b):
            raise ValueError("FLAC: truncated metadata block header")
        hdr = int.from_bytes(b[pos : pos + 4], "big")
        last = hdr >> 31
        btype = (hdr >> 24) & 0x7F
        blen = hdr & 0xFFFFFF
        pos += 4
        if pos + blen > len(b):
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:
            streaminfo = b[pos : pos + blen]
        elif btype == 127:
            raise ValueError("FLAC: invalid metadata block type 127")
        pos += blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)  # min frame size
    si.read(24)  # max frame size
    si.read(20)  # sample rate
    n_channels = si.read(3) + 1
    bps_si = si.read(5) + 1
    total_samples = si.read(36)
    if n_channels > 2:
        raise NotImplementedError("FLAC: >2 channels unsupported")

    chunks: list[np.ndarray] = []
    got = 0
    while pos < len(b) and (total_samples == 0 or got < total_samples):
        frame_start = pos
        r = _BitReader(b, 8 * pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: bad frame sync code")
        if r.read(1):
            raise ValueError("FLAC: reserved frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC: reserved frame header bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code 0")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        if ss_code == 0:
            bps = bps_si
        elif ss_code == 3:
            raise ValueError("FLAC: reserved sample size code 3")
        else:
            bps = _SAMPLE_SIZE_TABLE[ss_code]
        header_end_bits = r.pos
        if header_end_bits % 8:
            raise ValueError("FLAC: frame header not byte-aligned before CRC")
        hdr_bytes = b[frame_start : header_end_bits // 8]
        crc8 = r.read(8)
        if crc8 != _crc8(hdr_bytes):
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != n_channels:
                raise ValueError("FLAC: frame/STREAMINFO channel mismatch")
            subs = [_decode_subframe(r, block_size, bps) for _ in range(n_ch)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(r, block_size, bps)
            side = _decode_subframe(r, block_size, bps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(r, block_size, bps + 1)
            right = _decode_subframe(r, block_size, bps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(r, block_size, bps)
            side = _decode_subframe(r, block_size, bps + 1)
            left = ((mid << 1) | (side & 1)) + side
            subs = [left >> 1, (left >> 1) - side]
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        r.align()
        frame_end = r.pos // 8
        crc16 = r.read(16)
        if crc16 != _crc16(b[frame_start:frame_end]):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = r.pos // 8
        frame = np.stack(subs, axis=-1).reshape(-1) if len(subs) > 1 else subs[0]
        chunks.append(frame)
        got += block_size

    if total_samples and got < total_samples:
        raise ValueError(f"FLAC: stream ended after {got}/{total_samples} samples")
    samples = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
    if total_samples:
        samples = samples[: total_samples * n_channels]
    if bps_si > 8:
        samples = samples >> (bps_si - 8)
    return (samples + 128).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixture synthesis + differential tests)
# ---------------------------------------------------------------------------


def _rice_param(resid: np.ndarray) -> int:
    if resid.size == 0:
        return 0
    mean = float(np.mean(np.abs(resid.astype(np.float64)))) + 1.0
    return min(14, max(0, int(np.ceil(np.log2(mean)))))


def _write_residual(w: _BitWriter, resid: np.ndarray, escape: bool = False) -> None:
    w.write(0, 2)  # 4-bit Rice method
    w.write(0, 4)  # partition order 0
    if escape:  # unencoded binary partition (decoder escape path)
        bits = max(2, int(np.max(np.abs(resid))).bit_length() + 1) if resid.size else 2
        w.write(0xF, 4)
        w.write(bits, 5)
        for v in resid:
            w.write(int(v) & ((1 << bits) - 1), bits)
        return
    param = _rice_param(resid)
    w.write(param, 4)
    for v in resid:
        zz = (abs(int(v)) << 1) - (1 if int(v) < 0 else 0)
        w.write_unary(zz >> param)
        if param:
            w.write(zz & ((1 << param) - 1), param)


def _write_subframe(
    w: _BitWriter, samples: np.ndarray, bps: int, kind: str,
    rice_escape: bool = False,
) -> None:
    s = samples.astype(np.int64)
    if kind == "constant":
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(int(s[0]) & ((1 << bps) - 1), bps)
        return
    if kind == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in s:
            w.write(int(v) & ((1 << bps) - 1), bps)
        return
    if kind == "lpc1":
        # order-1 LPC with coeff 4, shift 2: predictor == previous sample
        # (numerically identical to fixed1 but through the LPC decode path)
        if len(s) < 1:
            raise ValueError("encode_flac: empty block for lpc1")
        w.write(0, 1)
        w.write(32, 6)  # LPC subframe type = 31 + order
        w.write(0, 1)
        w.write(int(s[0]) & ((1 << bps) - 1), bps)
        w.write(5 - 1, 4)   # precision 5 bits
        w.write(2, 5)       # shift 2
        w.write(4 & 0x1F, 5)  # coeff +4
        resid = np.diff(s) if len(s) > 1 else np.empty(0, dtype=np.int64)
        _write_residual(w, resid, escape=rice_escape)
        return
    if kind.startswith("fixed"):
        order = int(kind[5:])
        if order > len(s):
            raise ValueError("encode_flac: fixed order exceeds block")
        w.write(0, 1)
        w.write(8 + order, 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write(int(v) & ((1 << bps) - 1), bps)
        coeffs = _FIXED_COEFFS[order]
        resid = np.empty(len(s) - order, dtype=np.int64)
        for i in range(order, len(s)):
            pred = sum(c * int(s[i - 1 - j]) for j, c in enumerate(coeffs))
            resid[i - order] = int(s[i]) - pred
        _write_residual(w, resid, escape=rice_escape)
        return
    raise ValueError(f"encode_flac: unknown subframe kind {kind!r}")


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bps: int = 8,
    block_size: int = 256,
    n_channels: int = 1,
    subframe: str = "auto",
    channel_mode: str = "independent",
    rice_escape: bool = False,
) -> bytes:
    """Encode signed integer samples as a FLAC stream.

    ``samples``: 1-D (mono) or interleaved 1-D for ``n_channels=2``;
    values must fit ``bps`` signed bits. ``subframe``: 'auto' (constant
    where flat, else fixed1), 'constant', 'verbatim', 'fixedN', or
    'lpc1' (identity predictor through the LPC path). ``channel_mode``
    for stereo: 'independent', 'left_side', 'right_side' or 'mid_side'
    (inter-channel decorrelation; the side channel carries bps+1 bits).
    ``rice_escape=True`` writes residual partitions as unencoded binary
    (the Rice escape code path)."""
    s = np.asarray(samples, dtype=np.int64)
    if n_channels == 2:
        if s.size % 2:
            raise ValueError("encode_flac: odd sample count for stereo")
        chans = [s[0::2], s[1::2]]
    else:
        chans = [s]
    n = len(chans[0])
    lim = 1 << (bps - 1)
    if s.size and (s.max() >= lim or s.min() < -lim):
        raise ValueError(f"encode_flac: samples exceed {bps}-bit signed range")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.buf.extend(b"\x00" * 16)  # MD5 unset (spec: 0 = unknown)
    out += (0x80000000 | (0 << 24) | len(si.buf)).to_bytes(4, "big")
    out += si.buf

    for fidx in range(0, max(n, 1), block_size):
        this = min(block_size, n - fidx) if n else 0
        if n == 0:
            break
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # block size: 16-bit at end of header
        w.write(0, 4)  # sample rate: from STREAMINFO
        ch_codes = {"independent": n_channels - 1, "left_side": 8,
                    "right_side": 9, "mid_side": 10}
        if channel_mode != "independent" and n_channels != 2:
            raise ValueError("encode_flac: decorrelation needs stereo")
        w.write(ch_codes[channel_mode], 4)
        w.write(1 if bps == 8 else 4, 3)
        w.write(0, 1)
        frame_no = fidx // block_size
        if frame_no < 0x80:
            w.write(frame_no, 8)
        else:  # 2-byte UTF-8 (fixtures never exceed this)
            w.write(0xC0 | (frame_no >> 6), 8)
            w.write(0x80 | (frame_no & 0x3F), 8)
        w.write(this - 1, 16)
        hdr = bytes(w.buf)
        assert w.nacc == 0
        w.write(_crc8(hdr), 8)
        if channel_mode == "independent":
            blocks = [(ch[fidx : fidx + this], bps) for ch in chans]
        else:
            left = chans[0][fidx : fidx + this]
            right = chans[1][fidx : fidx + this]
            side = left - right
            if channel_mode == "left_side":
                blocks = [(left, bps), (side, bps + 1)]
            elif channel_mode == "right_side":
                blocks = [(side, bps + 1), (right, bps)]
            else:  # mid_side
                blocks = [((left + right) >> 1, bps), (side, bps + 1)]
        for blk, blk_bps in blocks:
            kind = subframe
            if kind == "auto":
                kind = "constant" if np.all(blk == blk[0]) else "fixed1"
            if kind.startswith("fixed") and int(kind[5:]) > len(blk):
                kind = "verbatim"  # short final frame: not enough warmup
            _write_subframe(w, blk, blk_bps, kind, rice_escape=rice_escape)
        w.align()
        frame = bytes(w.buf)
        w.write(_crc16(frame), 16)
        out += w.buf
    return bytes(out)

"""GIF decoder/encoder (87a/89a, non-interlaced), pure stdlib/NumPy —
a real variable-width LZW codec with no external imaging library.

Structure per the public GIF specification: 6-byte signature, logical
screen descriptor (+ global color table), optional 89a extension blocks
(skipped), image descriptor (+ local color table), LZW minimum code size,
entropy data in <=255-byte sub-blocks, 0x3B trailer. The LZW stream is
LSB-first variable-width codes (min+1 .. 12 bits) with CLEAR/END codes;
the code width grows when the dictionary reaches 2^width, and the
dictionary freezes at 4096 entries (the encoder emits CLEAR before the
cap so both sides stay in lock-step).

Decoding returns the palette-mapped RGB byte stream. Structural
corruption — truncated streams, out-of-range codes, pixel-count
mismatch, missing trailer — raises ValueError; interlaced images raise
NotImplementedError (corrupt or unsupported media fails loudly, never
silently fakes).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW core
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """Decode a GIF LZW stream into exactly ``n_pixels`` index bytes."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF: bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    literals = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(literals)
    width = min_code_size + 1
    out: list[bytes] = []
    got = 0
    prev: bytes | None = None
    bitpos, total_bits = 0, len(data) * 8
    while True:
        if bitpos + width > total_bits:
            raise ValueError("GIF: LZW stream truncated before END code")
        b0 = bitpos >> 3
        window = int.from_bytes(data[b0 : b0 + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(literals)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: first code after CLEAR not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < (1 << _MAX_CODE_WIDTH):
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < (1 << _MAX_CODE_WIDTH):
                table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out.append(entry)
        got += len(entry)
        prev = entry
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    res = b"".join(out)
    if len(res) != n_pixels:
        raise ValueError(
            f"GIF: LZW stream decoded {len(res)} pixels, descriptor "
            f"promises {n_pixels}"
        )
    return res


class _LZWWriter:
    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    """Real dictionary-building LZW (greedy longest-match), emitting CLEAR
    just before the 4096-entry cap so the decoder never sees a frozen
    table.

    Width synchronization: the decoder appends NO table entry for the
    first code after a CLEAR, so its table size trails the encoder's
    assignment counter by one. The encoder therefore derives the code
    width from a simulated decoder table size (`dsize`), incremented per
    emitted code exactly as the decoder appends — the classic GIF
    off-by-one, matched by construction instead of by convention."""
    clear = 1 << min_code_size
    end = clear + 1
    w = _LZWWriter()

    state: dict = {}

    def reset() -> None:
        state["table"] = {bytes([i]): i for i in range(clear)}
        state["next_code"] = end + 1
        state["width"] = min_code_size + 1
        state["dsize"] = end + 1
        state["emitted"] = 0

    def emit(code: int) -> None:
        w.put(code, state["width"])
        state["emitted"] += 1
        if state["emitted"] >= 2:
            state["dsize"] += 1
            if (
                state["dsize"] == (1 << state["width"])
                and state["width"] < _MAX_CODE_WIDTH
            ):
                state["width"] += 1

    reset()
    w.put(clear, state["width"])
    run = b""
    for i in range(len(data)):
        cand = run + data[i : i + 1]
        if cand in state["table"]:
            run = cand
            continue
        emit(state["table"][run])
        state["table"][cand] = state["next_code"]
        state["next_code"] += 1
        run = data[i : i + 1]
        if state["next_code"] >= (1 << _MAX_CODE_WIDTH) - 2:
            w.put(clear, state["width"])
            reset()
    if run:
        emit(state["table"][run])
    w.put(end, state["width"])
    return w.finish()


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image of a GIF into flattened RGB uint8 samples
    (palette applied). 89a extension blocks are skipped; interlace and a
    missing color table are rejected."""
    b = bytes(payload)
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = b[10]
    off = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(b[off : off + 3 * n], dtype=np.uint8)
        if palette.size != 3 * n:
            raise ValueError("GIF: truncated global color table")
        palette = palette.reshape(n, 3)
        off += 3 * n
    while True:
        if off >= len(b):
            raise ValueError("GIF: no image descriptor before EOF")
        block = b[off]
        if block == 0x21:  # 89a extension: label + sub-blocks
            off += 2
            while True:
                if off >= len(b):
                    raise ValueError("GIF: truncated extension block")
                sz = b[off]
                off += 1 + sz
                if sz == 0:
                    break
        elif block == 0x2C:
            break
        elif block == 0x3B:
            raise ValueError("GIF: trailer before any image descriptor")
        else:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
    if off + 10 > len(b):
        raise ValueError("GIF: truncated image descriptor")
    _, _, iw, ih, ipacked = struct.unpack_from("<HHHHB", b, off + 1)
    off += 10
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIF unsupported")
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        palette = np.frombuffer(b[off : off + 3 * n], dtype=np.uint8)
        if palette.size != 3 * n:
            raise ValueError("GIF: truncated local color table")
        palette = palette.reshape(n, 3)
        off += 3 * n
    if palette is None:
        raise ValueError("GIF: no color table for image")
    if off >= len(b):
        raise ValueError("GIF: missing LZW minimum code size")
    min_code_size = b[off]
    off += 1
    chunks = []
    while True:
        if off >= len(b):
            raise ValueError("GIF: truncated image data sub-blocks")
        sz = b[off]
        off += 1
        if sz == 0:
            break
        chunks.append(b[off : off + sz])
        if len(chunks[-1]) != sz:
            raise ValueError("GIF: truncated image data sub-block")
        off += sz
    if off >= len(b) or b[off] != 0x3B:
        raise ValueError("GIF: missing trailer")
    idx = np.frombuffer(
        _lzw_decode(min_code_size, b"".join(chunks), iw * ih), dtype=np.uint8
    )
    if idx.size and int(idx.max()) >= len(palette):
        raise ValueError("GIF: pixel index outside the color table")
    return palette[idx].ravel()


def encode_gif(
    indices: np.ndarray, width: int, height: int, palette: np.ndarray | None = None
) -> bytes:
    """Assemble a GIF87a around ``indices`` (uint8, width*height entries)
    with a 256-entry color table (default: grayscale identity ramp, so
    decoded RGB = each index repeated 3x)."""
    idx = np.asarray(indices, dtype=np.uint8).ravel()
    if idx.size != width * height:
        raise ValueError("encode_gif: indices size != width*height")
    if palette is None:
        ramp = np.arange(256, dtype=np.uint8)
        palette = np.stack([ramp, ramp, ramp], axis=1)
    if palette.shape != (256, 3):
        raise ValueError("encode_gif: palette must be 256x3")
    lzw = _lzw_encode(8, idx.tobytes())
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        ch = lzw[i : i + 255]
        sub.append(len(ch))
        sub += ch
    sub.append(0)
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", width, height, 0x80 | 0x07, 0, 0)
        + palette.astype(np.uint8).tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + bytes([8])
        + bytes(sub)
        + b"\x3b"
    )

"""Minimal AVI (RIFF) Motion-JPEG container: parser + encoder, pure
stdlib/NumPy — the engine's VIDEO path with no external media library.

An MJPEG AVI is plain structure around frames that are each a complete
baseline JPEG: RIFF('AVI ') -> LIST('hdrl') with the 56-byte ``avih``
main header and one LIST('strl') holding the 56-byte ``strh`` stream
header ('vids'/'MJPG') plus a 40-byte BITMAPINFOHEADER ``strf`` ->
LIST('movi') whose '00dc' chunks each hold one JPEG -> optional ``idx1``
index of (fourcc, flags, offset, size) entries. All integers little
endian; every chunk pads to even length. Layout follows the public
AVI RIFF reference (the OpenDML/Microsoft 'AVI RIFF File Reference');
frames decode through :mod:`tersets_spark.jpeg`.

The parser indexes frame chunk boundaries WITHOUT decoding, so frame
sampling (every k-th frame) touches only the JPEG bytes it keeps —
the 100 TB property for video: scan cost tracks sampled frames, not
container size. Structural corruption (bad sizes, truncated chunks,
frame-count mismatch, index disagreeing with the movi walk) raises
ValueError — corrupt media fails loudly, never silently fakes.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


# ---------------------------------------------------------------------------
# parse / decode
# ---------------------------------------------------------------------------


def parse_avi(payload: bytes) -> dict:
    """Walk the RIFF tree and return container metadata + frame index.

    Returns ``{"width", "height", "n_frames", "us_per_frame", "handler",
    "frames": [(offset, size), ...]}`` where each frames entry brackets
    one '00dc'/'00db' chunk's DATA bytes (one JPEG). Nothing is decoded.
    """
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    riff_size = _u32(b, 4)
    if 8 + riff_size > len(b):
        raise ValueError("AVI: RIFF size exceeds payload")
    meta: dict = {"frames": [], "idx1": None}

    def walk(start: int, end: int) -> None:
        off = start
        while off + 8 <= end:
            fourcc = b[off : off + 4]
            size = _u32(b, off + 4)
            data0, data1 = off + 8, off + 8 + size
            if data1 > end:
                raise ValueError(f"AVI: chunk {fourcc!r} overruns its parent")
            if fourcc == b"LIST":
                kind = b[data0 : data0 + 4]
                if kind in (b"hdrl", b"movi", b"strl"):
                    walk(data0 + 4, data1)
            elif fourcc == b"avih":
                if size < 56:
                    raise ValueError("AVI: avih header too short")
                meta["us_per_frame"] = _u32(b, data0)
                meta["n_frames"] = _u32(b, data0 + 16)
                meta["n_streams"] = _u32(b, data0 + 24)
                meta["width"] = _u32(b, data0 + 32)
                meta["height"] = _u32(b, data0 + 36)
            elif fourcc == b"strh":
                if size < 56:
                    raise ValueError("AVI: strh header too short")
                if b[data0 : data0 + 4] == b"vids":
                    meta["handler"] = b[data0 + 4 : data0 + 8].decode(
                        "ascii", "replace"
                    )
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                meta["frames"].append((data0, size))
            elif fourcc == b"idx1":
                meta["idx1"] = (data0, size)
            off = data1 + (size & 1)  # chunks pad to even length

    walk(12, 8 + riff_size)
    if "n_frames" not in meta:
        raise ValueError("AVI: missing avih main header")
    if meta["n_frames"] != len(meta["frames"]):
        raise ValueError(
            f"AVI: header claims {meta['n_frames']} frames, movi holds "
            f"{len(meta['frames'])}"
        )
    if meta.get("idx1") is not None:
        i0, isz = meta.pop("idx1")
        if isz % 16:
            raise ValueError("AVI: idx1 size not a multiple of 16")
        if isz // 16 != len(meta["frames"]):
            raise ValueError("AVI: idx1 entry count != frame count")
        # dwChunkOffset is measured from the 'movi' fourcc; re-derive it
        # from the first frame chunk (data0 - 8 is its header, the fourcc
        # sits at movi_base + stored offset).
        for k in range(len(meta["frames"])):
            e = i0 + 16 * k
            size = _u32(b, e + 12)
            if size != meta["frames"][k][1]:
                raise ValueError(f"AVI: idx1 size mismatch at frame {k}")
    return meta


def decode_avi_frames(
    payload: bytes, every: int = 1, offset: int = 0
) -> list[tuple[int, np.ndarray]]:
    """Decode every ``every``-th frame starting at ``offset`` — ONLY those
    JPEGs are touched; skipped frames cost a chunk-header hop. Returns
    ``[(frame_index, samples), ...]`` with samples as the JPEG decoder's
    flattened uint8 output."""
    from .jpeg import decode_jpeg

    if every < 1 or offset < 0:
        raise ValueError("decode_avi_frames: every >= 1, offset >= 0")
    b = bytes(payload)
    meta = parse_avi(b)
    out = []
    for k in range(offset, len(meta["frames"]), every):
        o, sz = meta["frames"][k]
        out.append((k, np.asarray(decode_jpeg(b[o : o + sz])).ravel()))
    return out


def decode_avi(payload: bytes) -> np.ndarray:
    """Decode ALL frames and concatenate their samples in frame order —
    the media_features path for kind='video'."""
    frames = decode_avi_frames(payload)
    if not frames:
        return np.zeros(0, dtype=np.uint8)
    return np.concatenate([s for _, s in frames])


# ---------------------------------------------------------------------------
# encode (fixture synthesis)
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" * (len(data) & 1))


def _list(kind: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", kind + data)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Assemble a spec-shaped single-stream MJPEG AVI around pre-encoded
    JPEG frames: hdrl(avih + strl(strh+strf)) + movi('00dc' per frame) +
    idx1. Frame dimensions may vary (MJPEG decoders read each JPEG's own
    SOF); width/height describe the nominal stream."""
    if fps <= 0:
        raise ValueError("encode_avi_mjpeg: fps must be > 0")
    n = len(jpeg_frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength
            0,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
        )
        + struct.pack("<4H", 0, 0, width & 0xFFFF, height & 0xFFFF)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks, offsets = [], []
    pos = 4  # dwChunkOffset measured from the 'movi' fourcc
    for f in jpeg_frames:
        offsets.append(pos)
        c = _chunk(b"00dc", f)
        movi_chunks.append(c)
        pos += len(c)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx = b"".join(
        b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, len(f))
        for off, f in zip(offsets, jpeg_frames)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body

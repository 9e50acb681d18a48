"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns next to a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes stream through worker memory batch-by-batch
and never materialize on the driver.

Decoders: WAV (RIFF/PCM, 8- and 16-bit), PPM (binary P6), PNG (8-bit
gray/RGB/RGBA, all five scanline filters — stdlib zlib inflate + NumPy
unfiltering), baseline JPEG (full Huffman entropy decode, dequant, IDCT,
restart markers, 4:4:4/4:2:0 chroma — :mod:`tersets_spark.jpeg`), FLAC
(Rice-coded residuals, fixed/LPC predictors, channel decorrelation,
CRC-verified — :mod:`tersets_spark.flac`) and Motion-JPEG AVI video
(RIFF chunk walk + per-frame JPEG decode, container-level frame
sampling — :mod:`tersets_spark.avi`) are REAL parsers, no external
media library, with matching encoders for fixture synthesis. Remaining
compressed formats (MP3/MP4/H.264...) genuinely need libav, absent in
this container, so for payloads that are not a recognized container
:func:`decode_payload` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested.
Everything Spark-side — schema, partitioning, UDF signature, batch shape —
is real and tested either way.

Scale notes (100 TB): payloads dominate the scan; ``media_features`` selects
only (media_id, kind, payload), so Parquet column pruning drops any sibling
columns. Feature extraction is embarrassingly parallel (no shuffle); the
output is a narrow integer table safe to aggregate anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video | text-bytes
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("hist16", ArrayType(LongType())),
    ]
)

_REAL_KINDS = ("image", "audio", "video")


# ---------------------------------------------------------------------------
# real decoders: uncompressed containers need no external library
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> np.ndarray:
    """Real RIFF/WAVE PCM decoder (pure NumPy): returns uint8 samples.

    Walks the RIFF chunk list (word-aligned, unknown chunks skipped — e.g.
    LIST/INFO), reads 'fmt ' and 'data'. 8-bit PCM is unsigned by spec and
    returned verbatim; 16-bit signed PCM is mapped deterministically to
    uint8 as (s >> 8) + 128 (arithmetic-shift high byte, rebiased).
    Multichannel data stays interleaved — callers treat samples as a flat
    signal. Raises ValueError on malformed/unsupported payloads (never a
    silent fake): truncation, non-PCM codecs, other bit widths."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError(f"unsupported WAV codec {audio_format} (PCM only)")
    if bits == 8:
        return np.frombuffer(data, dtype=np.uint8)
    if bits == 16:
        if len(data) % 2:
            raise ValueError("odd data length for 16-bit PCM")
        s = np.frombuffer(data, dtype="<i2").astype(np.int32)
        return ((s >> 8) + 128).astype(np.uint8)
    raise ValueError(f"unsupported PCM width {bits}")


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal canonical-44-byte-header WAV encoder (mono PCM) for fixture
    synthesis: uint8 -> 8-bit unsigned PCM, int16 -> 16-bit signed PCM."""
    samples = np.asarray(samples)
    if samples.dtype == np.uint8:
        bits, data = 8, samples.tobytes()
    elif samples.dtype == np.int16:
        bits, data = 16, samples.astype("<i2").tobytes()
    else:
        raise ValueError(f"encode_wav: unsupported dtype {samples.dtype}")
    block = bits // 8
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + int(sample_rate).to_bytes(4, "little")
        + int(sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data + (b"\x00" if len(data) & 1 else b"")
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real binary-PPM (P6) decoder: returns the interleaved RGB bytes as a
    flat uint8 array. Full header grammar: whitespace-separated width /
    height / maxval with '#' comments, one whitespace byte before the
    raster. Only maxval <= 255 (1 byte/sample) is supported."""
    b = payload or b""
    if b[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    vals, i = [], 2
    while len(vals) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(b[i:j]))
        i = j
    width, height, maxval = vals
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # exactly one whitespace byte before the raster
    need = width * height * 3
    data = b[i : i + need]
    if len(data) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(data, dtype=np.uint8)


def encode_ppm(rgb: np.ndarray, width: int, height: int) -> bytes:
    """Minimal P6 encoder for fixture synthesis; rgb = flat uint8 raster."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.size != width * height * 3:
        raise ValueError("encode_ppm: raster size != width*height*3")
    return f"P6\n{width} {height}\n255\n".encode() + rgb.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (bit depth 8)


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9, filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Real PNG decoder for the compressed-image path: stdlib ``zlib``
    inflate + NumPy per-scanline UNFILTERING, no external imaging library.
    Returns the reconstructed pixel bytes as a flat uint8 array
    (interleaved channels, like :func:`decode_ppm`).

    Supported: 8-bit depth, color types 0 (gray) / 2 (RGB) / 6 (RGBA),
    non-interlaced — the shapes our fixtures and most ML-pipeline PNGs
    use. All FIVE scanline filters decode (None/Sub/Up/Average/Paeth):
    Sub is a per-byte-lane modular prefix sum (vectorized ``cumsum`` with
    a uint8 accumulator), Up a wrapping vector add of the previous
    reconstructed row; Average/Paeth carry an in-row dependency and run
    as per-byte loops (fixture rows are short; a production decoder would
    JIT these). Raises ValueError on malformed input (bad signature,
    truncated chunk, inflate error, short raster) and
    NotImplementedError for interlace/palette/16-bit — corrupt or
    unsupported media fails loudly, never silently fakes."""
    import zlib

    b = payload or b""
    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(b):
        size = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 8 + size + 4  # skip CRC
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {bit_depth} / color type {color_type} unsupported "
            "(8-bit gray/RGB/RGBA only)"
        )
    if interlace != 0:
        raise NotImplementedError("interlaced PNG unsupported")
    if width <= 0 or height <= 0:
        raise ValueError("bad PNG dimensions")
    try:
        data = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from None
    bpp = _PNG_CHANNELS[color_type]
    stride = width * bpp
    if len(data) != height * (1 + stride):
        raise ValueError("PNG raster length != height * (1 + width*channels)")
    raw = np.frombuffer(data, dtype=np.uint8).reshape(height, 1 + stride)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(raw[y, 0])
        row = raw[y, 1:]
        if f == 0:  # None
            out[y] = row
        elif f == 1:  # Sub: modular prefix sum per byte lane
            rec = row.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(row[lane::bpp], dtype=np.uint8)
            out[y] = rec
        elif f == 2:  # Up
            prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
            out[y] = row + prev
        elif f == 3:  # Average
            prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
            rec = out[y]
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
            rec = out[y]
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (int(row[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return out.ravel()


def encode_png(
    pixels: np.ndarray,
    width: int,
    height: int,
    color_type: int = 0,
    filters: list[int] | None = None,
) -> bytes:
    """Minimal PNG encoder for fixture synthesis: 8-bit gray/RGB/RGBA,
    non-interlaced, one zlib stream. ``filters`` picks the per-scanline
    filter type (default all 0) — forward-filtering all five types lets
    tests prove the decoder inverts each one."""
    import zlib

    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"encode_png: unsupported color type {color_type}")
    bpp = _PNG_CHANNELS[color_type]
    stride = width * bpp
    px = np.asarray(pixels, dtype=np.uint8)
    if px.size != height * stride:
        raise ValueError("encode_png: raster size != height*width*channels")
    px = px.reshape(height, stride)
    filters = [0] * height if filters is None else list(filters)
    if len(filters) != height:
        raise ValueError("encode_png: one filter per scanline")
    lines = bytearray()
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        row = px[y]
        prev = px[y - 1] if y else zero
        if f == 0:
            enc = row
        elif f == 1:
            enc = row.copy()
            enc[bpp:] = row[bpp:] - row[:-bpp]
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row.copy()
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                enc[i] = (int(row[i]) - ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:
            enc = row.copy()
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                enc[i] = (int(row[i]) - _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"encode_png: bad filter {f}")
        lines.append(f)
        lines += enc.tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")

    ihdr = (
        int(width).to_bytes(4, "big")
        + int(height).to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def decode_payload(payload: bytes, kind: str, *, allow_fake: bool = False) -> np.ndarray:
    """Decode a media payload into a uint8 sample array.

    On the real path (``allow_fake=False``), uncompressed containers decode
    for REAL, pure NumPy: RIFF/WAVE PCM (kind='audio'/'video' dumps) and
    binary PPM (kind='image'), recognized by magic bytes; a recognized
    container that fails to parse raises ValueError (corrupt media fails
    loudly, never silently fakes). Compressed formats would need PIL/libav
    — unavailable in this container — so unrecognized payloads of a real
    media kind raise ``NotImplementedError``.

    With ``allow_fake=True`` EVERY payload takes the deterministic
    stand-in (bytes verbatim) — including real containers — so synthetic
    opaque-byte fixtures are never mis-sniffed (a text payload starting
    with 'P6' must not be parsed as an image) and fake-path results are
    bit-stable across releases.
    """
    b = bytes(payload or b"")
    if kind in _REAL_KINDS and not allow_fake:
        if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return decode_wav(b)
        if b[:2] == b"P6":
            return decode_ppm(b)
        if b[: len(_PNG_SIG)] == _PNG_SIG:
            return decode_png(b)
        if b[:3] == b"\xff\xd8\xff":
            from tersets_spark.jpeg import decode_jpeg

            return decode_jpeg(b)
        if b[:4] == b"fLaC":
            from tersets_spark.flac import decode_flac

            return decode_flac(b)
        if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            from tersets_spark.avi import decode_avi

            return decode_avi(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            from tersets_spark.gif import decode_gif

            return decode_gif(b)
        raise NotImplementedError(
            f"no decoder for this {kind} payload in this environment "
            "(real decoders: RIFF/PCM WAV, binary PPM, PNG, baseline JPEG, "
            "FLAC, MJPEG AVI); pass allow_fake=True to use the "
            "deterministic stand-in"
        )
    return np.frombuffer(b, dtype=np.uint8)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents table.

    Payload = utf-8 text bytes; kind cycles by doc_id; metadata derived from
    n_chars. Entirely JVM-side (encode + struct), no Python.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 300).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def synthesize_real_media_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL decodable containers derived
    deterministically from the documents table: even doc_id -> 8-bit PCM
    WAV whose samples are the utf-8 text bytes (kind='audio'); odd doc_id
    -> binary PPM (16 px wide, height = ceil(len/48)) whose raster is the
    text bytes zero-padded to the 16*h*3 grid (kind='image').

    Runs as Arrow-batched mapInPandas — container assembly is Python, but
    this is fixture synthesis, not a hot path; real deployments read media
    payloads straight off storage. The derivation is simple enough that
    the SQL oracle replays the decoded feature stats exactly (samples ==
    text bytes; PPM length rounds up to the grid, padding zeros land in
    histogram bin 0 only)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads, metas = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
                if int(doc_id) % 2 == 0:
                    payloads.append(encode_wav(data, 16000))
                    kinds.append("audio")
                    metas.append(
                        {"width": 0, "height": 0, "sample_rate": 16000, "n_frames": 0}
                    )
                else:
                    w = 16
                    h = max(1, -(-len(data) // (w * 3)))
                    raster = np.zeros(w * h * 3, dtype=np.uint8)
                    raster[: len(data)] = data
                    payloads.append(encode_ppm(raster, w, h))
                    kinds.append("image")
                    metas.append(
                        {"width": w, "height": h, "sample_rate": 0, "n_frames": 1}
                    )
                ids.append(int(doc_id))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_png_media_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL compressed PNG containers
    derived deterministically from the documents table: 8-bit GRAYSCALE,
    16 px wide, height = ceil(len/16), raster = utf-8 text bytes
    zero-padded to the 16*h grid — and each scanline forward-filtered
    with filter type ``row % 5``, so a full decode exercises every PNG
    filter (None/Sub/Up/Average/Paeth) on every document.

    The decoded samples equal the padded text bytes exactly (filters are
    invertible), so the SQL oracle replays decoded feature stats from the
    text alone: n_bytes = 16*ceil(len/16), byte_sum = Σ text bytes
    (padding zeros add nothing), histogram bins likewise."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
                w = 16
                h = max(1, -(-len(data) // w))
                raster = np.zeros(w * h, dtype=np.uint8)
                raster[: len(data)] = data
                payloads.append(
                    encode_png(raster, w, h, color_type=0,
                               filters=[y % 5 for y in range(h)])
                )
                ids.append(int(doc_id))
                metas.append({"width": w, "height": h, "sample_rate": 0,
                              "n_frames": 1})
            yield pd.DataFrame(
                {"media_id": ids, "kind": ["image"] * len(ids),
                 "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_jpeg_media_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL baseline JPEG containers derived
    deterministically from the documents table: 8-bit grayscale, 8 px wide,
    one constant 8x8 block per utf-8 text byte (stacked vertically; empty
    text gets one zero block), quantization table all-ones.

    The DCT of a constant block is a lone integer DC coefficient, entropy
    coding is lossless and the IDCT of a DC-only block is exactly flat, so
    the FULL decode path (Huffman -> dequant -> IDCT -> level shift)
    reproduces each text byte exactly, 64 copies per block — and the SQL
    oracle replays decoded feature stats from the text alone:
    n_bytes = 64*max(1,len), byte_sum = 64*Σ bytes, histogram bins x64."""
    from tersets_spark.jpeg import encode_jpeg_gray

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
                if data.size == 0:
                    data = np.zeros(1, dtype=np.uint8)
                img = np.repeat(np.repeat(data.reshape(-1, 1), 8, axis=0), 8, axis=1)
                payloads.append(encode_jpeg_gray(img))
                ids.append(int(doc_id))
                metas.append({"width": 8, "height": 8 * len(data),
                              "sample_rate": 0, "n_frames": 1})
            yield pd.DataFrame(
                {"media_id": ids, "kind": ["image"] * len(ids),
                 "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_flac_media_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL FLAC streams derived
    deterministically from the documents table: mono 8-bit, samples =
    utf-8 text bytes rebasied to signed (b - 128), subframe kind cycling
    by doc_id over auto/verbatim/fixed2/lpc1 (plus a Rice-escape variant
    every 5th doc) so a full decode exercises constant, verbatim, fixed
    and LPC subframes and both residual encodings.

    FLAC is lossless and the decoder rebiases 8-bit samples back to
    uint8, so decoded samples == text bytes exactly and the SQL oracle
    replays decoded feature stats from the text alone."""
    from tersets_spark.flac import encode_flac

    kinds = ("auto", "verbatim", "fixed2", "lpc1")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
                signed = data.astype(np.int64) - 128
                payloads.append(
                    encode_flac(
                        signed,
                        subframe=kinds[int(doc_id) % 4],
                        rice_escape=(int(doc_id) % 5 == 0),
                    )
                )
                ids.append(int(doc_id))
                metas.append({"width": 0, "height": 0, "sample_rate": 16000,
                              "n_frames": 0})
            yield pd.DataFrame(
                {"media_id": ids, "kind": ["audio"] * len(ids),
                 "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_avi_media_from_documents(
    docs: DataFrame, frame_bytes: int = 16
) -> DataFrame:
    """Media table whose payloads are REAL Motion-JPEG AVI videos derived
    deterministically from the documents table: the utf-8 text bytes split
    into frames of up to ``frame_bytes`` bytes (empty text gets one zero
    byte), each frame a constant-block grayscale baseline JPEG (8 px wide,
    one 8x8 block per byte — the synthesize_jpeg trick, which survives the
    lossy pipeline bit-exactly), wrapped in a spec-shaped RIFF container
    with avih/strh/strf headers and an idx1 index.

    Decoding ALL frames therefore reproduces each text byte exactly 64
    times in order, so the SQL oracle replays full-video feature stats
    from the text alone, and container-level frame sampling replays as a
    byte-position filter (frame f holds text bytes [f*frame_bytes,
    (f+1)*frame_bytes))."""
    from tersets_spark.avi import encode_avi_mjpeg
    from tersets_spark.jpeg import encode_jpeg_gray

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
                if data.size == 0:
                    data = np.zeros(1, dtype=np.uint8)
                frames = []
                for i in range(0, len(data), frame_bytes):
                    ch = data[i : i + frame_bytes]
                    img = np.repeat(
                        np.repeat(ch.reshape(-1, 1), 8, axis=0), 8, axis=1
                    )
                    frames.append(encode_jpeg_gray(img))
                payloads.append(
                    encode_avi_mjpeg(frames, 8, 8 * frame_bytes, fps=25)
                )
                ids.append(int(doc_id))
                metas.append({"width": 8, "height": 8 * frame_bytes,
                              "sample_rate": 0, "n_frames": len(frames)})
            yield pd.DataFrame(
                {"media_id": ids, "kind": ["video"] * len(ids),
                 "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_gif_media_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL GIF87a images derived
    deterministically from the documents table: pixel indices = utf-8
    text bytes zero-padded to a 16-wide grid (the PPM shape), compressed
    with genuine dictionary-building LZW, 256-entry grayscale palette so
    decoded RGB repeats each padded byte exactly 3x. The SQL oracle
    replays decoded feature stats from the text alone (3x the padded-PPM
    math; padding zeros land in histogram bin 0 only)."""
    from tersets_spark.gif import encode_gif

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
                w = 16
                h = max(1, -(-len(data) // w))
                grid = np.zeros(w * h, dtype=np.uint8)
                grid[: len(data)] = data
                payloads.append(encode_gif(grid, w, h))
                ids.append(int(doc_id))
                metas.append({"width": w, "height": h, "sample_rate": 0,
                              "n_frames": 1})
            yield pd.DataFrame(
                {"media_id": ids, "kind": ["image"] * len(ids),
                 "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


VIDEO_FRAME_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sample_sum", LongType()),
    ]
)


def sample_video_frames(
    media: DataFrame, every: int = 2, offset: int = 0
) -> DataFrame:
    """REAL container-level frame sampling over MJPEG AVI payloads: parse
    the RIFF chunk index (no decode), decode ONLY every ``every``-th
    frame's JPEG, emit one stats row per sampled frame. Skipped frames
    cost a chunk-header hop — at 100 TB the decode bill tracks sampled
    frames, not stored footage. Non-AVI video payloads raise (loudly)
    inside the task, like every real decode path."""
    from tersets_spark.avi import decode_avi_frames

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                for k, s in decode_avi_frames(
                    bytes(payload or b""), every=every, offset=offset
                ):
                    ids.append(int(media_id))
                    idxs.append(k)
                    lens.append(len(s))
                    sums.append(int(s.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "n_samples": pd.array(lens, dtype="int64"),
                    "sample_sum": pd.array(sums, dtype="int64"),
                }
            )

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(gen, VIDEO_FRAME_STATS_SCHEMA)
    )


def extract_features_batch(pdf: pd.DataFrame, *, allow_fake: bool = True) -> pd.DataFrame:
    """Per-batch feature extraction: byte stats + 16-bin byte histogram.

    Vectorized over the batch: one concatenated uint8 buffer, reduceat per
    row — no per-byte Python.
    """
    if len(pdf) == 0:
        return pd.DataFrame({f.name: pd.Series(dtype="object") for f in FEATURE_SCHEMA.fields})
    samples = [
        decode_payload(bytes(p) if p is not None else b"", k, allow_fake=allow_fake)
        for p, k in zip(pdf["payload"], pdf["kind"])
    ]
    lens = np.fromiter((len(s) for s in samples), dtype=np.int64, count=len(samples))
    sums = np.fromiter((int(s.sum(dtype=np.int64)) for s in samples), dtype=np.int64)
    hists = [np.bincount(s >> 4, minlength=16).astype(np.int64).tolist() for s in samples]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"].to_numpy(),
            "kind": pdf["kind"].to_numpy(),
            "n_bytes": lens,
            "byte_sum": sums,
            "hist16": hists,
        }
    )


def media_features(media: DataFrame, *, allow_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the media table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_features_batch(pdf, allow_fake=allow_fake)

    return media.select("media_id", "kind", "payload").mapInPandas(gen, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# resize / frame-sample plumbing (stub-backed, batch shape real)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def resize_batch(pdf: pd.DataFrame, width: int, height: int, *, allow_fake: bool = True) -> pd.DataFrame:
    """Per-batch resize: decode -> nearest-neighbor 1-D resample -> bytes.

    The real decoder is stubbed (see decode_payload); the resample itself is
    a genuine vectorized nearest-neighbor index over the sample array, so the
    data path (sizes, dtypes, byte round-trip) is exercised for real.
    """
    if len(pdf) == 0:
        return pd.DataFrame({f.name: pd.Series(dtype="object") for f in RESIZE_SCHEMA.fields})
    n_out = width * height
    out_payloads = []
    for payload, kind in zip(pdf["payload"], pdf["kind"]):
        samples = decode_payload(bytes(payload or b""), kind, allow_fake=allow_fake)
        if len(samples) == 0:
            out_payloads.append(b"\x00" * n_out)
            continue
        idx = (np.arange(n_out, dtype=np.int64) * len(samples)) // n_out
        out_payloads.append(samples[idx].tobytes())
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"].to_numpy(),
            "kind": pdf["kind"].to_numpy(),
            "payload": out_payloads,
            "out_width": np.full(len(pdf), width, dtype=np.int32),
            "out_height": np.full(len(pdf), height, dtype=np.int32),
        }
    )


def resize_media(media: DataFrame, width: int = 32, height: int = 32, *, allow_fake: bool = True) -> DataFrame:
    """mapInPandas resize over the media table; output payloads are
    exactly width*height bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield resize_batch(pdf, width, height, allow_fake=allow_fake)

    return media.select("media_id", "kind", "payload").mapInPandas(gen, RESIZE_SCHEMA)


def frame_sample_batch(pdf: pd.DataFrame, n_frames: int, *, allow_fake: bool = True) -> pd.DataFrame:
    """Per-batch frame sampling: split each payload into n_frames equal
    chunks ("frames"), emitting one output row per frame (explode shape)."""
    if len(pdf) == 0:
        return pd.DataFrame({f.name: pd.Series(dtype="object") for f in FRAME_SCHEMA.fields})
    ids, indices, frames = [], [], []
    for media_id, payload, kind in zip(pdf["media_id"], pdf["payload"], pdf["kind"]):
        samples = decode_payload(bytes(payload or b""), kind, allow_fake=allow_fake)
        bounds = (np.arange(n_frames + 1, dtype=np.int64) * len(samples)) // n_frames
        for i in range(n_frames):
            ids.append(media_id)
            indices.append(i)
            frames.append(samples[bounds[i] : bounds[i + 1]].tobytes())
    return pd.DataFrame(
        {"media_id": ids, "frame_index": pd.array(indices, dtype="int32"), "frame": frames}
    )


def frame_sample(media: DataFrame, n_frames: int = 4, *, allow_fake: bool = True) -> DataFrame:
    """mapInPandas frame sampling: one row per (media, frame)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield frame_sample_batch(pdf, n_frames, allow_fake=allow_fake)

    return media.select("media_id", "kind", "payload").mapInPandas(gen, FRAME_SCHEMA)

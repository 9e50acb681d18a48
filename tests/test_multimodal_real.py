"""Real media decoders: pure-NumPy RIFF/PCM WAV and binary-PPM parsers —
known-answer vectors (hand-assembled byte strings, not just encoder
round-trips), corrupt-payload failure modes, and the Spark-side real-decode
query path (allow_fake=False) over synthesized genuine containers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tersets_spark.multimodal import (
    decode_payload,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_features_batch,
    media_features,
    synthesize_real_media_from_documents,
)


def _wav_bytes(data: bytes, bits: int = 8, extra_chunk: bytes = b"") -> bytes:
    """Hand-assembled RIFF/WAVE, independent of encode_wav."""
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (16000).to_bytes(4, "little")
        + (16000 * bits // 8).to_bytes(4, "little")
        + (bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + extra_chunk + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_wav_8bit_known_answer():
    got = decode_wav(_wav_bytes(bytes([0, 1, 127, 128, 255])))
    assert got.dtype == np.uint8 and list(got) == [0, 1, 127, 128, 255]


def test_wav_16bit_known_answer():
    samples = np.array([-32768, -256, -1, 0, 255, 256, 32767], dtype="<i2")
    got = decode_wav(_wav_bytes(samples.tobytes(), bits=16))
    # (s >> 8) + 128: arithmetic shift, rebias
    want = [0, 127, 127, 128, 128, 129, 255]
    assert got.dtype == np.uint8 and list(got) == want


def test_wav_skips_unknown_chunks_and_word_aligns():
    # LIST chunk with an ODD size before fmt/data exercises 2-byte alignment
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    got = decode_wav(_wav_bytes(b"\x07\x09", extra_chunk=extra))
    assert list(got) == [7, 9]


def test_wav_rejects_malformed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"notriff")
    with pytest.raises(ValueError, match="fmt/data"):
        decode_wav(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")
    # non-PCM codec byte
    bad = bytearray(_wav_bytes(b"\x00"))
    bad[20] = 3  # audio_format = 3 (IEEE float)
    with pytest.raises(ValueError, match="codec"):
        decode_wav(bytes(bad))
    # truncated data chunk
    trunc = _wav_bytes(b"\x01\x02\x03\x04")[:-2]
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(trunc)
    # unsupported width
    with pytest.raises(ValueError, match="width"):
        decode_wav(_wav_bytes(b"\x00\x00\x00", bits=24))


def test_ppm_known_answer_with_comments():
    raster = bytes(range(12))  # 2x2 RGB
    payload = b"P6\n# a comment\n 2\t2\n255\n" + raster
    got = decode_ppm(payload)
    assert got.dtype == np.uint8 and list(got) == list(range(12))


def test_ppm_rejects_malformed():
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    with pytest.raises(ValueError, match="raster"):
        decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 5)


def test_encoder_decoder_roundtrip():
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, 333, dtype=np.uint8)
    assert np.array_equal(decode_wav(encode_wav(u8)), u8)
    s16 = rng.integers(-32768, 32768, 200).astype(np.int16)
    assert np.array_equal(
        decode_wav(encode_wav(s16)), ((s16.astype(np.int32) >> 8) + 128).astype(np.uint8)
    )
    rgb = rng.integers(0, 256, 4 * 3 * 3, dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(rgb, 4, 3)), rgb)


def test_decode_payload_real_path_and_fake_path():
    wav = encode_wav(np.array([1, 2, 3], dtype=np.uint8))
    # real path parses the container
    assert list(decode_payload(wav, "audio")) == [1, 2, 3]
    # fake path NEVER sniffs — bytes verbatim, even for a real container
    assert len(decode_payload(wav, "audio", allow_fake=True)) == len(wav)
    # unrecognized real-kind payload still raises without the flag
    with pytest.raises(NotImplementedError, match="WAV"):
        decode_payload(b"\x89PNG....", "image")


def test_extract_features_real_decode_batch():
    wav = encode_wav(np.array([0x70, 0x7f, 0x10], dtype=np.uint8))
    ppm = encode_ppm(np.arange(6, dtype=np.uint8).repeat(8), 4, 4)
    pdf = pd.DataFrame(
        {"media_id": [1, 2], "kind": ["audio", "image"], "payload": [wav, ppm]}
    )
    out = extract_features_batch(pdf, allow_fake=False)
    assert list(out["n_bytes"]) == [3, 48]
    assert out["byte_sum"][0] == 0x70 + 0x7F + 0x10
    assert out["hist16"][0][7] == 2  # two bytes with high nibble 7


def test_spark_real_decode_pipeline(spark):
    """End-to-end: documents -> genuine WAV/PPM containers -> mapInPandas
    real decode -> per-row features match the text-derived expectations."""
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "x" * 100), (2, ""), (3, "p6 is not a ppm")],
        "doc_id long, text string",
    )
    media = synthesize_real_media_from_documents(docs)
    rows = {r.media_id: r for r in media_features(media, allow_fake=False).collect()}
    assert rows[0].kind == "audio" and rows[0].n_bytes == 11
    assert rows[0].byte_sum == sum(b"hello world")
    assert rows[1].kind == "image" and rows[1].n_bytes == 48 * 3  # ceil(100/48)=3 rows
    assert rows[1].byte_sum == 100 * ord("x")
    assert rows[2].kind == "audio" and rows[2].n_bytes == 0 and rows[2].byte_sum == 0
    assert rows[3].kind == "image" and rows[3].n_bytes == 48
    assert rows[3].byte_sum == sum(b"p6 is not a ppm")


# ---------------------------------------------------------------------------
# PNG (stdlib zlib inflate + NumPy unfiltering)
# ---------------------------------------------------------------------------


def _png_bytes(raster: bytes, width: int, height: int, color_type: int = 0,
               filters=None) -> bytes:
    """Hand-assembled PNG independent of encode_png (filter 0 only)."""
    import zlib

    ch = {0: 1, 2: 3, 6: 4}[color_type]
    stride = width * ch
    assert filters is None, "hand assembler writes filter 0 scanlines"
    lines = b"".join(
        b"\x00" + raster[y * stride:(y + 1) * stride] for y in range(height)
    )

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")

    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes(
        [8, color_type, 0, 0, 0]
    )
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b""))


def test_png_known_answer_hand_assembled():
    from tersets_spark.multimodal import decode_png

    raster = bytes(range(48))  # 16x3 gray
    got = decode_png(_png_bytes(raster, 16, 3))
    assert np.array_equal(got, np.frombuffer(raster, dtype=np.uint8))
    # RGB 2x2
    rgb = bytes(range(12))
    assert np.array_equal(decode_png(_png_bytes(rgb, 2, 2, color_type=2)),
                          np.frombuffer(rgb, dtype=np.uint8))


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_every_filter_roundtrips(color_type, ch, filt):
    from tersets_spark.multimodal import decode_png, encode_png

    rng = np.random.default_rng(100 * color_type + filt)
    w, h = 7, 11
    px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8)
    b = encode_png(px, w, h, color_type=color_type, filters=[filt] * h)
    assert np.array_equal(decode_png(b), px)


def test_png_mixed_filters_and_multi_idat():
    from tersets_spark.multimodal import decode_png, encode_png

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=16 * 9 * 3, dtype=np.uint8)
    b = encode_png(px, 16, 9, color_type=2, filters=[y % 5 for y in range(9)])
    assert np.array_equal(decode_png(b), px)
    # split the IDAT stream into two chunks: decoders must concatenate
    import zlib

    sig_ihdr = b[: 8 + 12 + 13]
    idat_len = int.from_bytes(b[8 + 25: 8 + 29], "big")
    idat_body = b[8 + 33: 8 + 33 + idat_len]

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")

    half = len(idat_body) // 2
    b2 = (sig_ihdr + chunk(b"IDAT", idat_body[:half])
          + chunk(b"IDAT", idat_body[half:]) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(b2), px)


def test_png_rejects_malformed():
    from tersets_spark.multimodal import decode_png, encode_png

    good = encode_png(np.arange(48, dtype=np.uint8), 16, 3)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNH" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:46])  # cut inside the IDAT chunk body
    with pytest.raises(ValueError, match="inflate|raster length"):
        bad = bytearray(good)
        bad[45] ^= 0xFF  # corrupt the deflate stream (IDAT body starts at 41)
        decode_png(bytes(bad))
    with pytest.raises(NotImplementedError, match="interlaced"):
        bad = bytearray(good)
        bad[8 + 8 + 12] = 1  # IHDR interlace byte
        decode_png(bytes(bad))
    with pytest.raises(NotImplementedError, match="color type"):
        bad = bytearray(good)
        bad[8 + 8 + 9] = 3  # palette
        decode_png(bytes(bad))


def test_png_decode_payload_routing_and_fake_path():
    from tersets_spark.multimodal import encode_png

    px = np.arange(32, dtype=np.uint8)
    b = encode_png(px, 16, 2)
    assert np.array_equal(decode_payload(b, "image"), px)
    # fake path returns the container bytes verbatim, never mis-sniffs
    assert np.array_equal(decode_payload(b, "image", allow_fake=True),
                          np.frombuffer(b, dtype=np.uint8))


def test_png_spark_pipeline(spark):
    from tersets_spark.multimodal import (
        media_features,
        synthesize_png_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "hello png world"), (2, "x" * 40), (3, "")],
        "doc_id long, text string",
    )
    feats = {r["media_id"]: r for r in
             media_features(synthesize_png_media_from_documents(docs),
                            allow_fake=False).collect()}
    assert feats[1]["n_bytes"] == 16  # ceil(15/16)=1 row
    assert feats[1]["byte_sum"] == sum(b"hello png world")
    assert feats[2]["n_bytes"] == 48  # ceil(40/16)=3 rows
    assert feats[2]["byte_sum"] == 40 * ord("x")
    assert feats[3]["n_bytes"] == 16  # empty text -> 1 zero row
    assert feats[3]["byte_sum"] == 0

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

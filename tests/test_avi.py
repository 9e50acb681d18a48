"""MJPEG AVI container (tersets_spark.avi): hand-assembled known-answer
parse, encoder/decoder round-trips, container-level frame sampling,
malformed-container rejection, decode_payload dispatch and the Spark
frame-sampling pipeline."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tersets_spark.avi import (
    decode_avi,
    decode_avi_frames,
    encode_avi_mjpeg,
    parse_avi,
)
from tersets_spark.jpeg import encode_jpeg_gray


def _const_block_jpeg(data: bytes) -> bytes:
    arr = np.frombuffer(data, dtype=np.uint8)
    img = np.repeat(np.repeat(arr.reshape(-1, 1), 8, axis=0), 8, axis=1)
    return encode_jpeg_gray(img)


def _sample_avi(chunks: list[bytes]) -> bytes:
    return encode_avi_mjpeg([_const_block_jpeg(c) for c in chunks], 8, 128)


def test_roundtrip_all_frames():
    chunks = [b"Hello, AVI world", b" frames of vary", b"ing length!!"]
    avi = _sample_avi(chunks)
    m = parse_avi(avi)
    assert m["n_frames"] == 3 and m["handler"] == "MJPG"
    assert (m["width"], m["height"]) == (8, 128)
    want = np.concatenate(
        [np.repeat(np.frombuffer(c, dtype=np.uint8), 64) for c in chunks]
    )
    assert np.array_equal(decode_avi(avi), want)


def test_frame_sampling_every_and_offset():
    chunks = [bytes([10 * i]) * 4 for i in range(7)]
    avi = _sample_avi(chunks)
    got = decode_avi_frames(avi, every=2)
    assert [k for k, _ in got] == [0, 2, 4, 6]
    for k, s in got:
        assert np.array_equal(s, np.repeat(np.frombuffer(chunks[k], np.uint8), 64))
    got = decode_avi_frames(avi, every=3, offset=1)
    assert [k for k, _ in got] == [1, 4]
    with pytest.raises(ValueError, match="every >= 1"):
        decode_avi_frames(avi, every=0)


def test_single_and_empty_frame_lists():
    avi = _sample_avi([b"\x00"])
    assert np.array_equal(decode_avi(avi), np.zeros(64, dtype=np.uint8))
    empty = encode_avi_mjpeg([], 8, 8)
    assert parse_avi(empty)["n_frames"] == 0
    assert decode_avi(empty).size == 0


def test_hand_assembled_structure_fields():
    """Pin the byte layout: avih at fixed offsets, idx1 entries 16 bytes,
    chunks padded to even length (odd-length JPEG forces a pad byte)."""
    jpg = _const_block_jpeg(b"\x07")
    if len(jpg) % 2 == 0:
        jpg += b"\xff\xd9"[:0]  # keep as-is; pad comes from the container
    avi = encode_avi_mjpeg([jpg], 8, 8, fps=50)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert struct.unpack_from("<I", avi, 4)[0] == len(avi) - 8
    # hdrl LIST starts at 12; avih data at 12+12+8
    assert avi[12:16] == b"LIST" and avi[20:24] == b"hdrl"
    avih0 = 24 + 8
    assert avi[24:28] == b"avih"
    assert struct.unpack_from("<I", avi, avih0)[0] == 1_000_000 // 50
    assert struct.unpack_from("<I", avi, avih0 + 16)[0] == 1  # total frames
    m = parse_avi(avi)
    off, size = m["frames"][0]
    assert avi[off : off + size] == jpg


def test_malformed_rejection():
    avi = _sample_avi([b"abc", b"def"])
    with pytest.raises(ValueError, match="RIFF size exceeds"):
        parse_avi(avi[:30])
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # frame-count lie: patch avih dwTotalFrames (offset 32+16 from RIFF head)
    bad = bytearray(avi)
    struct.pack_into("<I", bad, 32 + 16, 9)
    with pytest.raises(ValueError, match="header claims 9 frames"):
        parse_avi(bytes(bad))
    # idx1 size lie
    bad = bytearray(avi)
    i0 = avi.rindex(b"idx1") + 8
    struct.pack_into("<I", bad, i0 + 12, 1)
    with pytest.raises(ValueError, match="idx1 size mismatch"):
        parse_avi(bytes(bad))
    # chunk overrun: blow up the first movi frame chunk's size field
    m = parse_avi(avi)
    off, _ = m["frames"][0]
    bad = bytearray(avi)
    struct.pack_into("<I", bad, off - 4, 2**30)
    with pytest.raises(ValueError, match="overruns"):
        parse_avi(bytes(bad))


def test_decode_payload_dispatch_real_video():
    from tersets_spark.multimodal import decode_payload

    avi = _sample_avi([b"xy"])
    out = decode_payload(avi, "video", allow_fake=False)
    assert np.array_equal(
        out, np.repeat(np.frombuffer(b"xy", np.uint8), 64)
    )
    # fake path returns container bytes verbatim (never mis-sniffs)
    fake = decode_payload(avi, "video", allow_fake=True)
    assert np.array_equal(fake, np.frombuffer(avi, dtype=np.uint8))
    # WAV dispatch untouched: RIFF/WAVE still routes to the WAV parser
    with pytest.raises(ValueError):
        decode_payload(b"RIFF\x00\x00\x00\x00WAVExxxx", "audio",
                       allow_fake=False)


def test_spark_pipeline_full_and_sampled(spark):
    from tersets_spark.multimodal import (
        media_features,
        sample_video_frames,
        synthesize_avi_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "hello world, this is a longer text for multiple frames"),
         (2, ""), (3, "tiny")],
        "doc_id long, text string",
    )
    media = synthesize_avi_media_from_documents(docs)
    rows = {r.media_id: r for r in media.collect()}
    assert rows[1].kind == "video" and rows[1].meta.n_frames == 4
    assert rows[2].meta.n_frames == 1  # empty text -> one zero-byte frame

    feats = {r.media_id: r for r in
             media_features(media, allow_fake=False).collect()}
    for mid, text in [(1, "hello world, this is a longer text for multiple frames"),
                      (2, "\x00"), (3, "tiny")]:
        data = text.encode("latin-1")
        assert feats[mid].n_bytes == 64 * len(data)
        assert feats[mid].byte_sum == 64 * sum(data)

    sampled = sorted(
        map(tuple, sample_video_frames(media, every=2).collect())
    )
    want = []
    for mid, text in [(1, "hello world, this is a longer text for multiple frames"),
                      (2, "\x00"), (3, "tiny")]:
        data = text.encode("latin-1")
        for f in range(0, -(-len(data) // 16), 2):
            ch = data[16 * f : 16 * (f + 1)]
            want.append((mid, f, 64 * len(ch), 64 * sum(ch)))
    assert sampled == sorted(want)


def test_mixed_format_media_one_pass(spark):
    """One media table holding every real container format — WAV, PPM,
    PNG, JPEG, FLAC, GIF, MJPEG AVI — decodes in a single media_features
    pass (per-payload magic-byte dispatch, allow_fake=False)."""
    import numpy as np

    from tersets_spark.flac import encode_flac
    from tersets_spark.gif import encode_gif
    from tersets_spark.jpeg import encode_jpeg_gray
    from tersets_spark.multimodal import (
        encode_ppm,
        encode_wav,
        media_features,
        encode_png,
    )

    data = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
    img8 = np.repeat(np.repeat(data.reshape(-1, 1), 8, axis=0), 8, axis=1)
    payloads = {
        1: ("audio", encode_wav(data, 16000), len(data), int(data.sum())),
        2: ("image", encode_ppm(np.tile(data, 3), 16, 1), 48,
            3 * int(data.sum())),
        3: ("image", encode_png(data, 16, 1), 16, int(data.sum())),
        4: ("image", encode_jpeg_gray(img8), 64 * 16, 64 * int(data.sum())),
        5: ("audio", encode_flac(data.astype(np.int64) - 128), 16,
            int(data.sum())),
        6: ("image", encode_gif(data, 16, 1), 48, 3 * int(data.sum())),
        7: ("video", encode_avi_mjpeg([encode_jpeg_gray(img8)], 8, 128),
            64 * 16, 64 * int(data.sum())),
    }
    media = spark.createDataFrame(
        [(mid, kind, bytearray(p), None)
         for mid, (kind, p, _, _) in payloads.items()],
        "media_id long, kind string, payload binary, meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    feats = {r.media_id: r for r in
             media_features(media, allow_fake=False).collect()}
    assert set(feats) == set(payloads)
    for mid, (_, _, n, s) in payloads.items():
        assert (feats[mid].n_bytes, feats[mid].byte_sum) == (n, s), mid

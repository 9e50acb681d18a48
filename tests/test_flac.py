"""FLAC codec: hand-assembled known-answer frame, lossless roundtrips
across every subframe kind / residual encoding / channel decorrelation /
sample width, multi-frame UTF-8 numbering, CRC failure modes, malformed
rejection, and the Spark-side real-decode pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def test_hand_assembled_constant_frame_known_answer():
    """A minimal one-frame stream assembled bit-by-bit (constant subframe,
    value +7 -> uint8 135), independent of encode_flac's frame writer."""
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(4, 16)   # min block
    si.write(4, 16)   # max block
    si.write(0, 24)
    si.write(0, 24)
    si.write(16000, 20)
    si.write(0, 3)    # 1 channel
    si.write(7, 5)    # 8 bps
    si.write(4, 36)   # 4 samples
    si.buf.extend(b"\x00" * 16)
    out += (0x80000000 | len(si.buf)).to_bytes(4, "big") + si.buf

    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)     # reserved + fixed-blocksize
    w.write(6, 4)     # block size: 8-bit at end
    w.write(0, 4)     # sample rate from STREAMINFO
    w.write(0, 4)     # 1 channel independent
    w.write(1, 3)     # 8 bps
    w.write(0, 1)
    w.write(0, 8)     # frame number 0 (1-byte UTF-8)
    w.write(3, 8)     # block size - 1
    w.write(_crc8(bytes(w.buf)), 8)
    w.write(0, 1)     # subframe pad
    w.write(0, 6)     # CONSTANT
    w.write(0, 1)     # no wasted bits
    w.write(7 & 0xFF, 8)  # constant value +7
    w.align()
    w.write(_crc16(bytes(w.buf)), 16)
    out += w.buf
    got = decode_flac(bytes(out))
    assert np.array_equal(got, np.full(4, 135, dtype=np.uint8))


@pytest.mark.parametrize(
    "kind", ["auto", "constant", "verbatim", "fixed0", "fixed1", "fixed2",
             "fixed3", "fixed4", "lpc1"]
)
def test_lossless_roundtrip_every_subframe_kind(kind):
    rng = np.random.default_rng(17)
    if kind == "constant":
        signed = np.full(500, -5, dtype=np.int64)
    else:
        signed = rng.integers(-128, 128, 500, dtype=np.int64)
    dec = decode_flac(encode_flac(signed, subframe=kind))
    assert np.array_equal(dec, (signed + 128).astype(np.uint8))


def test_rice_escape_partitions_roundtrip():
    rng = np.random.default_rng(19)
    signed = rng.integers(-128, 128, 700, dtype=np.int64)
    enc = encode_flac(signed, subframe="fixed1", rice_escape=True)
    assert np.array_equal(decode_flac(enc), (signed + 128).astype(np.uint8))


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_roundtrip(mode):
    rng = np.random.default_rng(23)
    inter = rng.integers(-128, 128, 600, dtype=np.int64)
    enc = encode_flac(inter, n_channels=2, channel_mode=mode)
    assert np.array_equal(decode_flac(enc), (inter + 128).astype(np.uint8))


def test_16bit_rebias_matches_wav_convention():
    rng = np.random.default_rng(29)
    s16 = rng.integers(-32768, 32768, 300, dtype=np.int64)
    got = decode_flac(encode_flac(s16, bps=16))
    assert np.array_equal(got, ((s16 >> 8) + 128).astype(np.uint8))


def test_multiframe_utf8_frame_numbers():
    # >128 frames forces 2-byte UTF-8 coded frame numbers
    rng = np.random.default_rng(31)
    signed = rng.integers(-128, 128, 16 * 130, dtype=np.int64)
    enc = encode_flac(signed, block_size=16)
    assert np.array_equal(decode_flac(enc), (signed + 128).astype(np.uint8))


def test_short_final_frame_and_empty_stream():
    rng = np.random.default_rng(37)
    signed = rng.integers(-128, 128, 257, dtype=np.int64)  # 256 + 1 tail
    enc = encode_flac(signed, subframe="fixed2")
    assert np.array_equal(decode_flac(enc), (signed + 128).astype(np.uint8))
    assert decode_flac(encode_flac(np.empty(0, dtype=np.int64))).size == 0


def test_crc_corruption_caught():
    rng = np.random.default_rng(41)
    signed = rng.integers(-128, 128, 400, dtype=np.int64)
    enc = bytearray(encode_flac(signed))
    # flip a data bit mid-frame -> CRC-16 mismatch
    enc[len(enc) // 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(enc))


def test_rejects_malformed():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFxxxxWAVE")
    good = encode_flac(np.array([1, 2, 3], dtype=np.int64))
    with pytest.raises(ValueError):
        decode_flac(good[:20])  # truncated metadata/frame
    # bad sync code where a frame should start
    bad = bytearray(good)
    frame_off = good.index(b"\xff\xf8", 4)
    bad[frame_off] = 0x00
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))


def test_sample_range_validation():
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([300], dtype=np.int64), bps=8)


def test_decode_payload_routing():
    from tersets_spark.multimodal import decode_payload

    signed = np.arange(-10, 10, dtype=np.int64)
    enc = encode_flac(signed)
    got = decode_payload(enc, "audio", allow_fake=False)
    assert np.array_equal(got, (signed + 128).astype(np.uint8))
    fake = decode_payload(enc, "audio", allow_fake=True)
    assert np.array_equal(fake, np.frombuffer(enc, dtype=np.uint8))


def test_spark_flac_pipeline(spark):
    from tersets_spark.multimodal import (
        media_features,
        synthesize_flac_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(0, "hello flac"), (1, "x" * 300), (2, ""), (3, "short"), (5, "escape me")],
        "doc_id long, text string",
    )
    feats = {r["media_id"]: r for r in
             media_features(synthesize_flac_media_from_documents(docs),
                            allow_fake=False).collect()}
    assert feats[0]["n_bytes"] == 10
    assert feats[0]["byte_sum"] == sum(b"hello flac")
    assert feats[1]["n_bytes"] == 300  # spans two 256-sample frames
    assert feats[1]["byte_sum"] == 300 * ord("x")
    assert feats[2]["n_bytes"] == 0 and feats[2]["byte_sum"] == 0
    assert feats[3]["byte_sum"] == sum(b"short")
    assert feats[5]["byte_sum"] == sum(b"escape me")  # rice-escape doc

"""Baseline JPEG codec: hand-assembled known-answer vectors (independent of
the encoder), a differential suite against an independent NumPy reference
pipeline (entropy coding is lossless, so decode(encode(x)) must equal the
reference DCT->quant->dequant->IDCT result bit-for-bit), constant-block
exactness for every byte value, restart markers, chroma paths, ZRL runs,
malformed-payload rejection, and the Spark-side real-decode pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark.jpeg import (
    ZIGZAG,
    _STD_AC_LUM_BITS,
    _STD_AC_LUM_VALS,
    _STD_DC_LUM_BITS,
    _STD_DC_LUM_VALS,
    _BitWriter,
    _dht_seg,
    _dqt_seg,
    _enc_table,
    _encode_blocks,
    _seg,
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_rgb,
)

# Annex K.1 luminance quantization table (zig-zag order), a realistic
# lossy table for the differential suite.
K1_LUMA = np.array(
    [
        16, 11, 12, 14, 12, 10, 16, 14,
        13, 14, 18, 17, 16, 19, 24, 40,
        26, 24, 22, 22, 24, 49, 35, 37,
        29, 40, 58, 51, 61, 60, 57, 51,
        56, 55, 64, 72, 92, 78, 64, 68,
        87, 69, 55, 56, 80, 109, 81, 87,
        95, 98, 103, 104, 103, 62, 77, 113,
        121, 112, 100, 120, 92, 101, 103, 99,
    ],
    dtype=np.int64,
)


def _reference_decode(img: np.ndarray, q_zz: np.ndarray) -> np.ndarray:
    """Independent NumPy reference: what a correct baseline codec must
    produce for decode(encode(img, q)) — explicit-cosine DCT (not the
    module's precomputed basis), round-quantize, dequantize, IDCT, level
    shift, clip. Entropy coding is lossless so it drops out."""
    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    q = np.empty(64)
    q[ZIGZAG] = q_zz  # de-zigzag into row-major
    q = q.reshape(8, 8)

    def c(u):
        return np.sqrt(0.125) if u == 0 else 0.5

    out = np.empty_like(img)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8].astype(float) - 128.0
            coef = np.zeros((8, 8))
            for u in range(8):
                for v in range(8):
                    s = 0.0
                    for x in range(8):
                        for y in range(8):
                            s += (blk[x, y]
                                  * np.cos((2 * x + 1) * u * np.pi / 16)
                                  * np.cos((2 * y + 1) * v * np.pi / 16))
                    coef[u, v] = c(u) * c(v) * s
            deq = np.rint(coef / q) * q
            rec = np.zeros((8, 8))
            for x in range(8):
                for y in range(8):
                    s = 0.0
                    for u in range(8):
                        for v in range(8):
                            s += (c(u) * c(v) * deq[u, v]
                                  * np.cos((2 * x + 1) * u * np.pi / 16)
                                  * np.cos((2 * y + 1) * v * np.pi / 16))
                    rec[x, y] = s
            out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = np.clip(
                np.rint(rec + 128.0), 0, 255
            )
    return out


def test_hand_assembled_dc_only_known_answer():
    """A minimal 8x8 grayscale JPEG assembled byte-by-byte, entropy bits
    computed by hand (NOT via the encoder): flat value 200 with an all-ones
    quant table -> DC = 8*(200-128) = 576, category 10 (std DC code
    11111110), raw bits 1001000000, EOB (std AC code 1010), 1-padded.
    Decoded: 64 bytes of 200."""
    scan = bytes([0b11111110, 0b10010000, 0b00101011])
    q = np.ones(64, dtype=np.int64)
    jpg = (
        b"\xff\xd8"
        + _dqt_seg(0, q)
        + _seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _dht_seg(0, 0, _STD_DC_LUM_BITS, _STD_DC_LUM_VALS)
        + _dht_seg(1, 0, _STD_AC_LUM_BITS, _STD_AC_LUM_VALS)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    got = decode_jpeg(jpg)
    assert got.shape == (64,)
    assert np.all(got == 200)


def test_constant_blocks_exact_all_values():
    vals = np.arange(256, dtype=np.uint8)
    img = np.repeat(np.repeat(vals.reshape(-1, 1), 8, axis=0), 8, axis=1)
    got = decode_jpeg(encode_jpeg_gray(img))
    assert np.array_equal(got, img.reshape(-1))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_vs_reference_pipeline(seed):
    """decode(encode(img, K1)) must equal the independent reference
    pipeline bit-for-bit: entropy coding is lossless, and both sides do
    DCT -> round-quant -> dequant -> IDCT -> rint -> clip."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_gray(img, qtable=K1_LUMA)).reshape(16, 24)
    want = _reference_decode(img, K1_LUMA)
    assert np.array_equal(got, want)


def test_entropy_layer_is_transparent():
    """The Huffman layer must be exactly lossless: the quantized zig-zag
    coefficients the encoder computes come back bit-identical from
    ``_entropy_decode`` (a smooth gradient hits round-half quantization
    boundaries where two float DCTs may legitimately disagree, so the
    full-pipeline bit-compare is split by layer here)."""
    from tersets_spark.jpeg import _entropy_decode, _fdct_quant

    yy, xx = np.mgrid[0:24, 0:16]
    img = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
    want = _fdct_quant(img.astype(np.uint8), K1_LUMA)
    comps, qts, w, h, _, _ = _entropy_decode(encode_jpeg_gray(img, qtable=K1_LUMA))
    assert (w, h) == (16, 24)
    assert np.array_equal(np.asarray(comps[0].blocks), want)
    assert np.array_equal(qts[0], K1_LUMA)


def test_restart_markers_and_dc_reset():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 8), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_gray(img))
    for ri in (1, 3, 7):
        enc = encode_jpeg_gray(img, restart_interval=ri)
        assert any(
            enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7
            for i in range(len(enc) - 1)
        )
        assert np.array_equal(decode_jpeg(enc), base)


def test_byte_stuffing_roundtrip():
    # flat 255 image drives large positive DC bits -> FF bytes in the scan
    img = np.full((16, 16), 255, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_gray(img))
    assert np.all(got == 255)


def test_odd_dimensions_cropped():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_gray(img))
    assert got.shape == (13 * 21,)
    # edge-replicated pad keeps interior blocks identical to the unpadded ref
    ref = _reference_decode(
        np.pad(img, ((0, 3), (0, 3)), mode="edge"), np.ones(64, dtype=np.int64)
    )[:13, :21]
    assert np.array_equal(got.reshape(13, 21), ref)


def test_zrl_long_zero_run():
    """Force a >16-gap AC run through the writer (two ZRLs) and decode it
    back: assemble the scan from explicitly chosen zig-zag coefficients."""
    zz = np.zeros(64, dtype=np.int32)
    zz[0] = 40     # DC
    zz[40] = -3    # 39 leading zeros -> ZRL + ZRL + run-7 code
    zz[63] = 2     # tail coefficient, no EOB after it
    w = _BitWriter()
    _encode_blocks(
        w, zz, 0,
        _enc_table(_STD_DC_LUM_BITS, _STD_DC_LUM_VALS),
        _enc_table(_STD_AC_LUM_BITS, _STD_AC_LUM_VALS),
    )
    w.flush()
    q = np.ones(64, dtype=np.int64)
    jpg = (
        b"\xff\xd8"
        + _dqt_seg(0, q)
        + _seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _dht_seg(0, 0, _STD_DC_LUM_BITS, _STD_DC_LUM_VALS)
        + _dht_seg(1, 0, _STD_AC_LUM_BITS, _STD_AC_LUM_VALS)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(w.buf)
        + b"\xff\xd9"
    )
    # reconstruct what the IDCT of those exact coefficients gives
    rm = np.zeros(64)
    rm[ZIGZAG] = zz
    from tersets_spark.jpeg import _A

    rec = _A.T @ rm.reshape(8, 8) @ _A
    want = np.clip(np.rint(rec + 128.0), 0, 255).astype(np.uint8).reshape(-1)
    assert np.array_equal(decode_jpeg(jpg), want)


def test_color_gray_rgb_444_exact():
    g = np.repeat(np.repeat(np.arange(0, 256, 16, dtype=np.uint8).reshape(-1, 1), 8, 0), 8, 1)
    rgb = np.stack([g, g, g], axis=-1)
    got = decode_jpeg(encode_jpeg_rgb(rgb, subsample=False)).reshape(*rgb.shape)
    assert np.array_equal(got, rgb)


def test_color_420_constant_tiles_close():
    # constant 16x16 color image: luma + box-averaged chroma all flat;
    # only the rounded YCbCr forward transform separates decode from input
    rgb = np.empty((16, 16, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 180, 90, 30
    got = decode_jpeg(encode_jpeg_rgb(rgb, subsample=True)).reshape(16, 16, 3)
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 2


def test_color_420_smooth_bounded():
    yy, xx = np.mgrid[0:32, 0:32]
    rgb = np.stack(
        [(yy * 4) % 256, (xx * 4) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)
    got = decode_jpeg(encode_jpeg_rgb(rgb, subsample=True)).reshape(32, 32, 3)
    # q=1 keeps luma near-exact; chroma is 2x2 box-averaged then replicated
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 8


def test_rejects_malformed():
    img = np.zeros((8, 8), dtype=np.uint8)
    good = encode_jpeg_gray(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(good[:-10] + b"\xff\xd9")  # truncated scan
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(
            b"\xff\xd8" + _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        )
    with pytest.raises(ValueError, match="zero quantizer"):
        decode_jpeg(b"\xff\xd8" + _dqt_seg(0, np.zeros(64, dtype=np.int64)))
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    # scan that references a Huffman table that was never defined
    bad = (
        b"\xff\xd8"
        + _dqt_seg(0, np.ones(64, dtype=np.int64))
        + _seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + b"\x00\x00"
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="Huffman"):
        decode_jpeg(bad)


def test_decode_payload_routing_and_fake_path():
    from tersets_spark.multimodal import decode_payload

    img = np.full((8, 8), 42, dtype=np.uint8)
    enc = encode_jpeg_gray(img)
    got = decode_payload(enc, "image", allow_fake=False)
    assert np.all(got == 42) and got.shape == (64,)
    # fake path treats the container bytes verbatim
    fake = decode_payload(enc, "image", allow_fake=True)
    assert np.array_equal(fake, np.frombuffer(enc, dtype=np.uint8))


def test_spark_jpeg_pipeline(spark):
    from tersets_spark.multimodal import (
        media_features,
        synthesize_jpeg_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "hello jpeg"), (2, "z" * 33), (3, "")],
        "doc_id long, text string",
    )
    feats = {r["media_id"]: r for r in
             media_features(synthesize_jpeg_media_from_documents(docs),
                            allow_fake=False).collect()}
    assert feats[1]["n_bytes"] == 64 * 10
    assert feats[1]["byte_sum"] == 64 * sum(b"hello jpeg")
    assert feats[2]["n_bytes"] == 64 * 33
    assert feats[2]["byte_sum"] == 64 * 33 * ord("z")
    assert feats[3]["n_bytes"] == 64  # empty text -> one zero block
    assert feats[3]["byte_sum"] == 0

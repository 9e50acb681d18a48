"""GIF codec (tersets_spark.gif): variable-width LZW round-trips with
dictionary growth and CLEAR resets, hand-assembled known-answer bits,
container structure, malformed rejection, dispatch, Spark pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark.gif import _lzw_decode, _lzw_encode, decode_gif, encode_gif


def test_lzw_roundtrip_widths_and_cap():
    rng = np.random.default_rng(5)
    # random 70k bytes forces width growth 9->10->11->12 and a CLEAR reset
    data = rng.integers(0, 256, 70000).astype(np.uint8).tobytes()
    enc = _lzw_encode(8, data)
    assert _lzw_decode(8, enc, len(data)) == data
    # highly repetitive input compresses (real dictionary reuse)
    rep = np.tile(np.arange(50, dtype=np.uint8), 4000).tobytes()
    enc2 = _lzw_encode(8, rep)
    assert len(enc2) < len(rep) // 10
    assert _lzw_decode(8, enc2, len(rep)) == rep


def test_lzw_kwkwk_and_small_code_sizes():
    # the code == len(table) branch (cScSc pattern)
    data = b"a" * 22
    assert _lzw_decode(8, _lzw_encode(8, data), len(data)) == data
    rng = np.random.default_rng(9)
    for mcs in range(2, 9):
        d = rng.integers(0, 1 << mcs, 5000).astype(np.uint8).tobytes()
        assert _lzw_decode(mcs, _lzw_encode(mcs, d), len(d)) == d


def test_lzw_known_answer_bits():
    """First codes of a fresh 8-bit stream, assembled by hand: CLEAR(256),
    'A'(65), 'B'(66), END(257), all 9-bit LSB-first."""
    enc = _lzw_encode(8, b"AB")
    codes = [256, 65, 66, 257]
    acc = 0
    nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert enc == bytes(out)
    assert _lzw_decode(8, enc, 2) == b"AB"


def test_lzw_rejects_corruption():
    enc = _lzw_encode(8, b"hello world")
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(8, enc[:2], 11)
    with pytest.raises(ValueError, match="decoded"):
        _lzw_decode(8, enc, 99)  # pixel-count mismatch
    with pytest.raises(ValueError, match="minimum code size"):
        _lzw_decode(1, enc, 11)


def test_container_roundtrip_and_palette():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 256, 16 * 40).astype(np.uint8)
    g = encode_gif(idx, 16, 40)
    assert np.array_equal(decode_gif(g), np.repeat(idx, 3))
    # custom palette is applied, not the identity ramp
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:, 0] = np.arange(256)  # red ramp
    g2 = encode_gif(idx, 16, 40, palette=pal)
    out = decode_gif(g2).reshape(-1, 3)
    assert np.array_equal(out[:, 0], idx) and not out[:, 1].any()


def test_container_malformed_rejection():
    idx = np.arange(64, dtype=np.uint8)
    g = encode_gif(idx, 8, 8)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JIF87a" + g[6:])
    with pytest.raises(ValueError, match="trailer"):
        decode_gif(g[:-1])
    with pytest.raises(ValueError):
        decode_gif(g[:20])
    bad = bytearray(g)
    bad[10] = 0x07  # drop the global color table flag: the palette bytes
    # are then misread as block structure and rejected
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))
    ioff = 13 + 768  # descriptor follows header + 256-entry GCT
    assert g[ioff] == 0x2C
    bad = bytearray(g)
    bad[ioff + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(bad))


def test_gif89a_extension_blocks_skipped():
    idx = np.arange(64, dtype=np.uint8)
    g = encode_gif(idx, 8, 8)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    g89 = b"GIF89a" + g[6 : 13 + 768] + gce + g[13 + 768 :]
    assert np.array_equal(decode_gif(g89), decode_gif(g))


def test_decode_payload_dispatch(spark):
    from tersets_spark.multimodal import decode_payload

    idx = np.frombuffer(b"xy", dtype=np.uint8)
    g = encode_gif(np.pad(idx, (0, 14)), 16, 1)
    out = decode_payload(g, "image", allow_fake=False)
    want = np.repeat(np.pad(idx, (0, 14)), 3)
    assert np.array_equal(out, want)
    fake = decode_payload(g, "image", allow_fake=True)
    assert np.array_equal(fake, np.frombuffer(g, dtype=np.uint8))


def test_spark_pipeline_matches_text_math(spark):
    from tersets_spark.multimodal import (
        media_features,
        synthesize_gif_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 40)],
        "doc_id long, text string",
    )
    media = synthesize_gif_media_from_documents(docs)
    feats = {r.media_id: r for r in
             media_features(media, allow_fake=False).collect()}
    for mid, text in [(1, "hello world"), (2, ""), (3, "x" * 40)]:
        data = text.encode()
        h = max(1, -(-len(data) // 16))
        assert feats[mid].n_bytes == 3 * 16 * h
        assert feats[mid].byte_sum == 3 * sum(data)


def test_lzw_roundtrip_property():
    """Hypothesis: any byte string round-trips through the LZW pair."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=2000))
    def prop(data):
        assert _lzw_decode(8, _lzw_encode(8, data), len(data)) == data

    prop()

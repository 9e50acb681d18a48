"""Unit tests for the training-data pipeline operators (no Spark session):
batched DoD encoder, MinHash/SimHash kernels, rolling fingerprints, and the
multimodal feature extractor batch function. Spark-side integration of these
operators is exercised through the driver contract (__spark_entry__).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tersets_spark.codecs import delta_of_delta as dod
from tersets_spark.dedup import _hash_shingles, minhash_signature
from tersets_spark.multimodal import decode_payload, extract_features_batch
from tersets_spark.textops import rolling_fingerprint

RNG = np.random.default_rng(11)


# ---------------------------------------------------------------------------
# batched delta-of-delta
# ---------------------------------------------------------------------------


def test_compress_blocks_byte_identical_to_scalar():
    flat = RNG.integers(0, 50257, 50_000).astype(np.int64)
    flat[10_000:20_000] = np.repeat(RNG.integers(0, 100, 100), 100)
    cuts = np.sort(RNG.choice(np.arange(1, len(flat)), 999, replace=False))
    starts = np.concatenate(([0], cuts))
    ends = np.concatenate((cuts, [len(flat)]))
    batched = dod.compress_blocks(flat, starts, ends)
    for s, e, blob in zip(starts, ends, batched):
        assert blob == dod.compress(flat[s:e])
        assert np.array_equal(dod.decompress(blob), flat[s:e])


@pytest.mark.parametrize(
    "segment",
    [[5], [5, 9], [5, 9, 13], [7] * 10, [0, 2**40, -(2**40), 17], list(range(100))],
)
def test_compress_blocks_edge_segments(segment):
    a = np.asarray(segment, dtype=np.int64)
    got = dod.compress_blocks(a, np.array([0]), np.array([len(a)]))[0]
    assert got == dod.compress(a)
    assert np.array_equal(dod.decompress(got), a)


# ---------------------------------------------------------------------------
# batched gorilla xor
# ---------------------------------------------------------------------------


def test_gorilla_blocks_byte_identical_to_scalar():
    from tersets_spark.codecs import gorilla

    flat = RNG.integers(0, 50257, 50_000).astype(np.int64)
    flat[10_000:20_000] = np.repeat(RNG.integers(0, 100, 100), 100)  # zero-xor runs
    cuts = np.sort(RNG.choice(np.arange(1, len(flat)), 999, replace=False))
    starts = np.concatenate(([0], cuts))
    ends = np.concatenate((cuts, [len(flat)]))
    batched = gorilla.compress_blocks(flat, starts, ends)
    for s, e, blob in zip(starts, ends, batched):
        assert blob == gorilla.compress(flat[s:e].astype(np.float64))
        assert np.array_equal(gorilla.decompress(blob), flat[s:e].astype(np.float64))


@pytest.mark.parametrize(
    "segment",
    [[5], [5, 9], [5, 5], [5, 9, 13], [7] * 10, [0, 2**40, -(2**40), 17], list(range(100))],
)
def test_gorilla_blocks_edge_segments(segment):
    from tersets_spark.codecs import gorilla

    a = np.asarray(segment, dtype=np.int64)
    got = gorilla.compress_blocks(a, np.array([0]), np.array([len(a)]))[0]
    assert got == gorilla.compress(a.astype(np.float64))
    assert np.array_equal(gorilla.decompress(got), a.astype(np.float64))


def test_gorilla_blocks_many_tiny_segments():
    from tersets_spark.codecs import gorilla

    flat = RNG.integers(0, 1000, 3000).astype(np.int64)
    starts = np.arange(0, 3000, 3)
    ends = starts + 3
    # mix in all-equal segments (k=0 payload: empty pack_bits buffer)
    flat[300:600] = 42
    for s, e, blob in zip(starts, ends, gorilla.compress_blocks(flat, starts, ends)):
        assert blob == gorilla.compress(flat[s:e].astype(np.float64))


# ---------------------------------------------------------------------------
# minhash / simhash kernels
# ---------------------------------------------------------------------------


def test_minhash_signature_deterministic_and_permutation_invariant():
    shingles = [f"tok{i} tok{i+1} tok{i+2}" for i in range(50)]
    sig1 = minhash_signature(shingles, 128)
    sig2 = minhash_signature(list(reversed(shingles)), 128)
    assert np.array_equal(sig1, sig2)  # set semantics: order-invariant
    assert sig1.shape == (128,)
    # distinct sets give distinct signatures with overwhelming probability
    sig3 = minhash_signature(shingles[:10], 128)
    assert not np.array_equal(sig1, sig3)


def test_minhash_jaccard_estimate_tracks_true_jaccard():
    base = [f"shingle {i}" for i in range(200)]
    variant = base[:160] + [f"other {i}" for i in range(40)]  # J = 160/240 = 2/3
    s1 = minhash_signature(base, 256)
    s2 = minhash_signature(variant, 256)
    est = float(np.mean(s1 == s2))
    assert abs(est - 2 / 3) < 0.12


def test_hash_shingles_is_fnv1a():
    # FNV-1a of b"a": (0xcbf29ce484222325 ^ 0x61) * 0x100000001b3 mod 2^64
    expected = ((0xCBF29CE484222325 ^ 0x61) * 0x100000001B3) % (1 << 64)
    assert int(_hash_shingles(["a"])[0]) == expected


# ---------------------------------------------------------------------------
# rolling fingerprint
# ---------------------------------------------------------------------------


def test_rolling_fingerprint_deterministic_and_shift_sensitive():
    a = rolling_fingerprint(b"the quick brown fox jumps over the lazy dog")
    b = rolling_fingerprint(b"the quick brown fox jumps over the lazy dog")
    c = rolling_fingerprint(b"the quick brown fox jumped over the lazy dog")
    assert a == b
    assert a != c
    assert len(a) <= 8
    # common windows survive in both sketches' hash universe
    assert rolling_fingerprint(b"")  # short input is padded, still fingerprints


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_decode_payload_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00\x01", "image")
    out = decode_payload(b"\x00\x01\xff", "image", allow_fake=True)
    assert out.dtype == np.uint8 and list(out) == [0, 1, 255]
    # non-media kinds decode without the fake flag
    assert list(decode_payload(b"ab", "text-bytes")) == [97, 98]


def test_extract_features_batch_shapes_and_values():
    pdf = pd.DataFrame(
        {
            "media_id": [1, 2, 3],
            "kind": ["image", "audio", "video"],
            "payload": [b"\x00\x10\x20", b"", b"\xff" * 5],
        }
    )
    out = extract_features_batch(pdf, allow_fake=True)
    assert list(out.columns) == ["media_id", "kind", "n_bytes", "byte_sum", "hist16"]
    assert list(out["n_bytes"]) == [3, 0, 5]
    assert list(out["byte_sum"]) == [0x00 + 0x10 + 0x20, 0, 255 * 5]
    assert out["hist16"][0][0] == 1 and out["hist16"][0][1] == 1 and out["hist16"][0][2] == 1
    assert out["hist16"][2][15] == 5
    empty = extract_features_batch(pdf.iloc[0:0], allow_fake=True)
    assert len(empty) == 0


def test_resize_batch_shapes():
    from tersets_spark.multimodal import resize_batch

    pdf = pd.DataFrame(
        {
            "media_id": [1, 2],
            "kind": ["image", "audio"],
            "payload": [bytes(range(100)), b"\x07"],
        }
    )
    out = resize_batch(pdf, 8, 4)
    assert list(out["media_id"]) == [1, 2]
    assert all(len(p) == 32 for p in out["payload"])
    # nearest-neighbor preserves first/last-ish samples
    assert out["payload"][0][0] == 0 and out["payload"][0][-1] >= 90
    assert out["payload"][1] == b"\x07" * 32  # single sample broadcast
    assert len(resize_batch(pdf.iloc[0:0], 8, 4)) == 0


def test_frame_sample_batch_shapes():
    from tersets_spark.multimodal import frame_sample_batch

    pdf = pd.DataFrame(
        {"media_id": [9], "kind": ["video"], "payload": [bytes(range(10))]}
    )
    out = frame_sample_batch(pdf, 4)
    assert list(out["frame_index"]) == [0, 1, 2, 3]
    assert b"".join(out["frame"]) == bytes(range(10))  # frames partition payload


def test_lang_id_col_matches_udf(spark):
    """JVM replace-arithmetic scoring (lang_id_col, the hot path) must agree
    with the pandas-UDF twin doc-for-doc, including und/tie-break cases."""
    from pyspark.sql import functions as F

    from tersets_spark.textops import lang_id_col, lang_id_udf

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    extra = spark.createDataFrame(
        [("", ), (None,), ("the der les de los 的",), ("zzzz qqqq",),
         ("the the der der",)],  # en/de tie -> first profile order (en)
        ["text"],
    )
    both = (
        docs.select("text").unionByName(extra)
        .select(
            lang_id_col(F.col("text")).alias("jvm"),
            lang_id_udf(F.col("text")).alias("py"),
        )
    )
    assert both.filter(F.col("jvm") != F.col("py")).count() == 0
    assert both.filter(F.col("jvm") == "und").count() > 0


def test_simhash_batch_matches_scalar_reference():
    from tersets_spark.dedup import _simhash_batch, _simhash_one

    rng = np.random.default_rng(13)
    vocab = [f"tok{i}" for i in range(500)]
    docs = [
        None,
        [],
        ["solo"],
        ["a", "a", "a"],  # repeated token: votes stack
        [vocab[int(i)] for i in rng.integers(0, 500, 73)],
        [vocab[int(i)] for i in rng.integers(0, 500, 1)],
        [vocab[int(i)] for i in rng.integers(0, 500, 256)],
        ["éé", "multi byte 中文", "x" * 100],
    ]
    got = _simhash_batch(pd.Series(docs, dtype=object)).tolist()
    want = [_simhash_one(d) for d in docs]
    assert got == want


def test_simhash_batch_singleton_and_order():
    from tersets_spark.dedup import _simhash_batch, _simhash_one

    doc = ["alpha", "beta", "gamma", "beta"]
    (got,) = _simhash_batch(pd.Series([doc], dtype=object)).tolist()
    assert got == _simhash_one(doc)
    # batching position must not change a doc's hash
    many = _simhash_batch(pd.Series([["pad"], doc, ["pad", "pad2"]], dtype=object)).tolist()
    assert many[1] == got

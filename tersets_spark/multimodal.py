"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns next to a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes stream through worker memory batch-by-batch
and never materialize on the driver.

The decode step itself is STUBBED: this container has no image/audio
libraries, so :func:`decode_payload` raises ``NotImplementedError`` for real
media kinds unless the deterministic fake decoder is requested. Everything
Spark-side — schema, partitioning, UDF signature, batch shape — is real and
tested; swapping the stub for PIL/libav is a one-function change.

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


def decode_payload(payload: bytes, kind: str, *, allow_fake: bool = False) -> np.ndarray:
    """Decode a media payload into a uint8 sample array.

    Real decoders (PIL / soundfile / libav) are unavailable in this
    container; for ``kind`` in image/audio/video this raises
    ``NotImplementedError`` unless ``allow_fake=True``, in which case the
    deterministic fake decoder (payload bytes verbatim) stands in so the
    downstream plumbing is exercised end-to-end.
    """
    if kind in _REAL_KINDS and not allow_fake:
        raise NotImplementedError(
            f"no {kind} decoder available in this environment; "
            "pass allow_fake=True to use the deterministic stand-in"
        )
    return np.frombuffer(payload or b"", dtype=np.uint8)


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

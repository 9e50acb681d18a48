"""ANN scale-shape tests: chunked nearest-centroid assignment must be
bit-identical to the dense 3-D-tensor argmin while using bounded scratch
memory, and sampled Lloyd training must be an exact NumPy-replayable
function of the deterministic md5 sample (the property the DuckDB oracle
relies on)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from tersets_spark.similarity import (
    CENTROID_CHUNK,
    QUANT_SCALE,
    nearest_centroid,
    train_ivf_centroids,
)


def _naive_assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1).astype(np.int64)


def test_nearest_centroid_matches_naive_at_512_centroids():
    rng = np.random.default_rng(7)
    mat = rng.integers(-QUANT_SCALE, QUANT_SCALE, size=(403, 16), dtype=np.int64)
    cents = rng.integers(-QUANT_SCALE, QUANT_SCALE, size=(512, 16), dtype=np.int64)
    # force ties: duplicate centroids and plant exact-match rows
    cents[100] = cents[37]
    cents[511] = cents[0]
    mat[5] = cents[37]
    mat[6] = cents[0]
    got = nearest_centroid(mat, cents, chunk=CENTROID_CHUNK)
    assert np.array_equal(got, _naive_assign(mat, cents))
    # ties must break to the SMALLEST centroid id across chunk boundaries
    assert got[5] == 37 and got[6] == 0

    # odd chunk sizes (incl. chunk > n_centroids) agree too
    for chunk in (1, 7, 100, 4096):
        assert np.array_equal(nearest_centroid(mat, cents, chunk=chunk), got)


def test_nearest_centroid_bounded_memory_at_1024_centroids():
    """The dense difference tensor at (2000 rows x 1024 centroids x 64 dims)
    would be ~1 GB of int64; the chunked path must stay under 100 MB peak
    (numpy allocations are tracemalloc-tracked via PyDataMem)."""
    import tracemalloc

    rng = np.random.default_rng(11)
    mat = rng.integers(-QUANT_SCALE, QUANT_SCALE, size=(2000, 64), dtype=np.int64)
    cents = rng.integers(-QUANT_SCALE, QUANT_SCALE, size=(1024, 64), dtype=np.int64)
    tracemalloc.start()
    try:
        tracemalloc.reset_peak()
        got = nearest_centroid(mat, cents)
        _, peak = tracemalloc.get_traced_memory()
    finally:
        tracemalloc.stop()
    assert peak < 100 * 1024 * 1024, f"peak {peak/1e6:.1f} MB — assignment not chunked"
    # spot-check correctness on a slice (full naive tensor is the 1 GB case)
    assert np.array_equal(got[:50], _naive_assign(mat[:50], cents))


def _sample_keep(vid: int, hex_lt: str) -> bool:
    return hashlib.md5(str(vid).encode()).hexdigest()[:4] < hex_lt


def _numpy_lloyd(vecs: dict[int, np.ndarray], n_centroids: int, iterations: int,
                 hex_lt: str) -> np.ndarray:
    sample_ids = sorted(v for v in vecs if _sample_keep(v, hex_lt))
    cents = np.stack([vecs[v] for v in sample_ids[:n_centroids]])
    smat = np.stack([vecs[v] for v in sample_ids])
    for _ in range(iterations):
        a = _naive_assign(smat, cents)
        new = cents.copy()
        for c in range(n_centroids):
            rows = smat[a == c]
            if len(rows):
                s = rows.sum(axis=0)
                new[c] = (2 * s + len(rows)) // (2 * len(rows))
        cents = new
    return cents


def test_train_ivf_sampled_matches_numpy_replica(spark):
    """Sampled Spark training == a from-scratch NumPy Lloyd over the same
    md5-selected ids — pinning init, sample predicate, exact integer mean,
    and empty-cluster carry-over in one shot."""
    rng = np.random.default_rng(3)
    n, dim = 160, 8
    raw = rng.uniform(-1.0, 1.0, size=(n, dim))
    rows = [(i, [float(x) for x in raw[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = train_ivf_centroids(emb, n_centroids=8, iterations=3, sample_hex_lt="4000")

    # replicate the engine's quantization from the FLOAT32 column values
    qvecs = {
        i: np.floor(raw[i].astype(np.float32).astype(np.float64) * QUANT_SCALE + 0.5).astype(np.int64)
        for i in range(n)
    }
    want = _numpy_lloyd(qvecs, n_centroids=8, iterations=3, hex_lt="4000")
    assert np.array_equal(got, want)


def test_train_ivf_fails_fast_on_too_small_sample(spark):
    rows = [(i, [float(i), 0.0]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="sample"):
        train_ivf_centroids(emb, n_centroids=32, iterations=1, sample_hex_lt="1000")

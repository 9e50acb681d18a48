"""Deterministic synthetic `sequences` table (FIXTURES.md §1).

Schema is exactly BASELINE.json's input_hint —
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)`` —
plus a derived ``ts0`` (epoch seconds) so rollup tiers and SQL oracles share
one time axis without re-deriving the doc-id hash.

Generation is fully vectorized (one flat token buffer; per-row parameters
broadcast with np.repeat) and deterministic for a given (seed, n_rows):
chunk-size independent, synthesized from numpy PCG64(seed) only — no external
data. Tables are cached as parquet under ``/root/repo/data/`` and memoized by
(seed, n_rows) in the filename.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
EPOCH = 1_700_000_000  # fixed engine epoch (2023-11-14T22:13:20Z)
VOCAB = 50257
N_SOURCES = 12

#: rows per driver testdata scale factor (sf name -> n_rows). sf0.4 exists
#: only for the scaling benchmark: big enough (~300M tokens) that per-run
#: fixed overheads stop dominating the N-vs-4N efficiency ratio.
ROWS_BY_SF = {
    "sf0.001": 2_000,
    "sf0.01": 20_000,
    "sf0.1": 100_000,
    "sf0.4": 400_000,
    # Robustness scale: ~1.18e9 tokens (mean n_tok ~736). Near the ceiling of
    # this generator's int32 list offsets (~2.1e9 tokens); grow past that by
    # writing multiple row groups per chunk, not by widening the offsets.
    "sf1.6": 1_600_000,
}


def sequences_path(sf_name: str, seed: int = 42) -> str:
    n_rows = ROWS_BY_SF.get(sf_name)
    if n_rows is None:
        raise ValueError(f"unknown scale factor {sf_name!r}")
    return os.path.join(DATA_DIR, f"sequences_{sf_name}_seed{seed}_n{n_rows}.parquet")


def generate_sequences(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(np.random.PCG64(seed))

    # n_tok: log-uniform in [16, 4096] (FIXTURES.md §1)
    n_tok = np.exp(rng.uniform(np.log(16), np.log(4096), n_rows)).astype(np.int32)

    # source: Zipf-skewed over 12 sources — intentionally skewed for salting
    ranks = np.arange(1, N_SOURCES + 1, dtype=np.float64)
    probs = ranks**-1.5
    probs /= probs.sum()
    src_idx = rng.choice(N_SOURCES, size=n_rows, p=probs)

    # per-row signal shape: 0=noisy line, 1=plateaus, 2=trend, 3=uniform
    shape = rng.choice(4, size=n_rows, p=[0.4, 0.25, 0.2, 0.15])

    total = int(n_tok.sum())
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])

    pos = np.arange(total, dtype=np.float64) - np.repeat(offsets[:-1], n_tok)
    slope = np.repeat(rng.uniform(-5, 5, n_rows), n_tok)
    intercept = np.repeat(rng.uniform(0, 2000, n_rows), n_tok)
    noise = rng.uniform(-0.5, 0.5, total)
    shape_flat = np.repeat(shape, n_tok)

    signal = np.empty(total, dtype=np.float64)
    m = shape_flat == 0  # noisy line
    signal[m] = slope[m] * pos[m] + intercept[m] + noise[m] * 40
    m = shape_flat == 1  # plateaus: coarsely quantized slow line -> long runs
    signal[m] = np.floor((slope[m] * 0.2 * pos[m] + intercept[m]) / 50.0) * 50.0
    m = shape_flat == 2  # trend
    signal[m] = 0.5 * pos[m] + intercept[m] + noise[m] * 2
    m = shape_flat == 3  # uniform random
    signal[m] = intercept[m] + noise[m] * 4000

    tokens = np.clip(np.round(signal), 0, VOCAB - 1).astype(np.int32)

    doc_ids = np.array([f"doc_{i:012d}" for i in range(n_rows)])
    # deterministic per-doc offset into the day (Knuth multiplicative hash)
    ts0 = (EPOCH + (np.arange(n_rows, dtype=np.uint64) * np.uint64(2654435761)) % 86400).astype(
        np.int64
    )
    sources = np.array([f"src_{i:02d}" for i in range(N_SOURCES)])[src_idx]

    tok_arr = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(tokens))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "tokens": tok_arr,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(sources),
            "ts0": pa.array(ts0, type=pa.int64()),
        }
    )


def ensure_sequences(sf_name: str, seed: int = 42) -> str:
    """Generate-and-cache the sequences parquet for a scale factor; return path."""
    path = sequences_path(sf_name, seed)
    if not os.path.exists(path):
        os.makedirs(DATA_DIR, exist_ok=True)
        table = generate_sequences(ROWS_BY_SF[sf_name], seed)
        tmp = path + ".tmp"
        # Small row groups make the single file splittable: Spark assigns row
        # groups to scan tasks, so a 100k-row table parallelizes across all
        # cores instead of serializing on one unsplittable group.
        pq.write_table(table, tmp, compression="zstd", row_group_size=1000)
        os.replace(tmp, path)
    return path


def sf_name_from_dir(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    if name not in ROWS_BY_SF:
        raise ValueError(f"unknown sf dir {sf_dir!r}")
    return name

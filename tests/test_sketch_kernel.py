"""Fused sketch-partials Arrow kernel vs the expression path: the committed
psk_1m / hll_1m tiers must be bit-identical whichever builder ran."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import run_cascade
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skkseq") / "seq.parquet")
    pq.write_table(generate_sequences(300, seed=31), path)
    return path


def _tier_rows(spark, out, tier):
    df = TierCatalog(out).read_tier(spark, tier)
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_kernel_path_matches_expression_path(spark, seq_path, tmp_path):
    out_k = str(tmp_path / "kernel")
    out_e = str(tmp_path / "expr")
    run_cascade(spark, seq_path, out_k, with_sketches=True, sketch_kernel=True)
    run_cascade(spark, seq_path, out_e, with_sketches=True, sketch_kernel=False)
    for tier in ("psk_1m", "psk_1d", "hll_1m", "hll_1d"):
        assert _tier_rows(spark, out_k, tier) == _tier_rows(spark, out_e, tier), tier
    # no staging leftovers
    assert not [d for d in os.listdir(out_k) if d.startswith("_tmp_")]


def test_bloom_kernel_path_matches_expression_path(spark, seq_path, tmp_path):
    """The 'b' family of the fused kernel (distinct-pair dedup + LUT
    positions + bitwise_or.at) must commit blm tiers bit-identical to the
    expression path's bloom_words build — with and without the psk/hll
    families sharing the pass."""
    out_k = str(tmp_path / "kernel")
    out_e = str(tmp_path / "expr")
    out_all = str(tmp_path / "kernel_all")
    run_cascade(spark, seq_path, out_k, with_blooms=True, sketch_kernel=True)
    run_cascade(spark, seq_path, out_e, with_blooms=True, sketch_kernel=False)
    run_cascade(
        spark, seq_path, out_all,
        with_sketches=True, with_blooms=True, sketch_kernel=True,
    )
    for tier in ("blm_1m", "blm_1h", "blm_1d"):
        rows_e = _tier_rows(spark, out_e, tier)
        assert _tier_rows(spark, out_k, tier) == rows_e, tier
        assert _tier_rows(spark, out_all, tier) == rows_e, tier
    # the shared pass did not perturb the psk/hll families
    ref = str(tmp_path / "sk_only")
    run_cascade(spark, seq_path, ref, with_sketches=True, sketch_kernel=True)
    for tier in ("psk_1m", "hll_1m"):
        assert _tier_rows(spark, out_all, tier) == _tier_rows(spark, ref, tier), tier
    for out in (out_k, out_all):
        assert not [d for d in os.listdir(out) if d.startswith("_tmp_")]


def test_frexp_bitlen_matches_bin_length():
    """np.frexp exponent == int.bit_length for every value the kernel can
    see (exactness argument in the kernel docstring); sweep boundaries."""
    vals = [0, 1, 2, 3] + [(1 << k) + d for k in range(1, 32) for d in (-1, 0, 1)]
    arr = np.array(sorted({v for v in vals if 0 <= v < (1 << 31)}), dtype=np.int64)
    _, exp = np.frexp(arr.astype(np.float64))
    bitlen = np.where(arr == 0, 1, exp)
    expected = np.array([max(int(v).bit_length(), 1) for v in arr])
    assert np.array_equal(bitlen, expected)


def test_auto_selects_kernel_on_vocab_domain(spark, seq_path, tmp_path):
    """Default (sketch_kernel=None): token-vocab inputs repeat heavily, so
    the fused kernel is chosen — same behavior the old hardcoded default
    had on the contract fixtures."""
    out = str(tmp_path / "auto_vocab")
    dirs = run_cascade(spark, seq_path, out, with_sketches=True)
    assert dirs["_sketch_path"] == "kernel"


def test_auto_selects_expression_on_high_cardinality(spark, tmp_path):
    """>=10^6 DISTINCT non-token values: the auto-chooser must take the
    pure-JVM expression path (the kernel's per-unique Python md5 loop
    degrades on unbounded domains), and the tiers must equal an explicit
    kernel run — the choice is performance-only."""
    import pyarrow as pa

    n_docs, per_doc = 1100, 1000  # 1.1M tokens, ALL distinct values
    tokens = [
        np.arange(i * per_doc, (i + 1) * per_doc, dtype=np.int64).tolist()
        for i in range(n_docs)
    ]
    p = str(tmp_path / "hc.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": [f"d{i}" for i in range(n_docs)],
                "tokens": tokens,
                "n_tok": pa.array([per_doc] * n_docs, type=pa.int32()),
                "source": [f"src_{i % 3:02d}" for i in range(n_docs)],
                "ts0": pa.array([1_700_000_000 + i for i in range(n_docs)], type=pa.int64()),
            }
        ),
        p,
    )
    out_auto = str(tmp_path / "auto")
    dirs = run_cascade(spark, p, out_auto, with_sketches=True, with_blocks=False)
    assert dirs["_sketch_path"] == "expression"
    out_k = str(tmp_path / "kern")
    run_cascade(spark, p, out_k, with_sketches=True, with_blocks=False,
                sketch_kernel=True)
    for tier in ("psk_1m", "hll_1m"):
        assert _tier_rows(spark, out_auto, tier) == _tier_rows(spark, out_k, tier), tier


def test_kernel_rejects_negative_tokens(spark, tmp_path):
    import pyarrow as pa

    p = str(tmp_path / "neg.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": ["d0"],
                "tokens": [[5, -1, 7]],
                "n_tok": pa.array([3], type=pa.int32()),
                "source": ["src_00"],
                "ts0": pa.array([1_700_000_000], type=pa.int64()),
            }
        ),
        p,
    )
    out = str(tmp_path / "tiers")
    with pytest.raises(Exception, match="negative token"):
        run_cascade(spark, p, out, with_sketches=True, sketch_kernel=True)


def test_kernel_rejects_tokens_beyond_float53(spark, tmp_path):
    """Values >= 2^53 would have their frexp-derived bit length computed
    through float64 rounding and silently diverge from the expression
    path's length(bin(v)) — the kernel must fail fast instead."""
    import pyarrow as pa

    p = str(tmp_path / "big.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": ["d0"],
                "tokens": [[5, (1 << 53), 7]],
                "n_tok": pa.array([3], type=pa.int32()),
                "source": ["src_00"],
                "ts0": pa.array([1_700_000_000], type=pa.int64()),
            }
        ),
        p,
    )
    out = str(tmp_path / "tiers")
    with pytest.raises(Exception, match="2\\^53"):
        run_cascade(spark, p, out, with_sketches=True, sketch_kernel=True)

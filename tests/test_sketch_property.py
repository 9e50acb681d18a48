"""Hypothesis sweeps over the sketch bucket math (pure-Python twins of the
Spark expressions — the expression/model equivalence is pinned separately in
test_sketch.py / test_hll.py, so these properties transfer)."""

from __future__ import annotations

import hashlib
import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tersets_spark.sketch import SUB_BITS

# pure-Python twins (asserted equal to the Spark expressions in test_sketch)


def bucket_py(v: int) -> int:
    bitlen = v.bit_length() or 1
    shift = max(bitlen - SUB_BITS, 0)
    return bitlen * (1 << SUB_BITS) + (v >> shift)


def lower_py(b: int) -> int:
    bitlen = b >> SUB_BITS
    sub = b & ((1 << SUB_BITS) - 1)
    return sub << max(bitlen - SUB_BITS, 0)


def upper_py(b: int) -> int:
    """Exclusive upper bound of bucket b."""
    bitlen = b >> SUB_BITS
    sub = b & ((1 << SUB_BITS) - 1)
    return (sub + 1) << max(bitlen - SUB_BITS, 0)


values = st.integers(min_value=0, max_value=(1 << 62) - 1)


@settings(max_examples=2000)
@given(values)
def test_value_lies_in_its_bucket(v):
    b = bucket_py(v)
    assert lower_py(b) <= v < upper_py(b)


@settings(max_examples=2000)
@given(values, values)
def test_bucket_order_respects_value_order(a, b):
    if a <= b:
        assert bucket_py(a) <= bucket_py(b)
    if bucket_py(a) < bucket_py(b):
        assert a < b


@settings(max_examples=2000)
@given(values)
def test_relative_error_bound(v):
    b = bucket_py(v)
    lo = lower_py(b)
    if v >= (1 << SUB_BITS):
        assert (v - lo) <= lo * 2 ** (1 - SUB_BITS)
    else:
        assert lo == v  # small values exact


@settings(max_examples=500)
@given(st.lists(values, min_size=1, max_size=200), st.integers(1, 5))
def test_hll_register_merge_associative(vals, parts):
    """Model HLL registers: merging per-partition register tables by max ==
    building over the whole set (the tier re-aggregation contract)."""
    from tersets_spark.hll import RHO_HEX

    def regs(chunk):
        out = {}
        for v in set(chunk):
            h = hashlib.md5(str(v).encode()).hexdigest()
            bkt = int(h[:2], 16)
            bits = bin(int(h[2 : 2 + RHO_HEX], 16))[2:].zfill(4 * RHO_HEX)
            rho = (len(bits) - len(bits.lstrip("0"))) + 1
            out[bkt] = max(out.get(bkt, 0), rho)
        return out

    whole = regs(vals)
    merged: dict[int, int] = {}
    for i in range(parts):
        for bkt, rho in regs(vals[i::parts]).items():
            merged[bkt] = max(merged.get(bkt, 0), rho)
    assert merged == whole


@settings(max_examples=500)
@given(st.lists(values, min_size=1, max_size=300), st.integers(1, 5))
def test_percentile_sketch_merge_associative(vals, parts):
    """Summing per-partition bucket counts == counting over the whole set."""
    from collections import Counter

    whole = Counter(bucket_py(v) for v in vals)
    merged: Counter = Counter()
    for i in range(parts):
        merged += Counter(bucket_py(v) for v in vals[i::parts])
    assert merged == whole

"""Core codec tests: PMC, Gorilla XOR, delta-of-delta, bitpack, dispatch.

Test strategy mirrors the reference's (SURVEY.md §5): property-style
round-trips with seeded generators (analogue of
/root/reference/src/tester.zig:38-113), plus differential tests of the
vectorized implementations against straight-line scalar transcriptions of
the reference algorithms (poor_mans_compression.zig:33-97).
"""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark import Method, compress, decompress, is_within_error_bound
from tersets_spark.codecs._bitpack import (
    bit_length_u64,
    clz64,
    ctz64,
    pack_bits,
    unpack_bits,
)
from tersets_spark.errors import (
    UnknownMethodError,
    UnsupportedErrorBoundError,
    UnsupportedInputError,
)

RNG = np.random.default_rng(42)


def _scalar_pmc_midrange(values, eb):
    """Direct scalar transcription of compressMidrange (zig :33-60)."""
    eb2 = np.longdouble(np.float32(2.0) * np.float32(eb))
    minimum = np.longdouble(values[0])
    maximum = np.longdouble(values[0])
    out = []
    for index, value in enumerate(values):
        v = np.longdouble(value)
        nmin = np.fmin(v, minimum)
        nmax = np.fmax(v, maximum)
        if (nmax - nmin) > eb2:
            out.append((float(np.float64((maximum + minimum) / 2)), index))
            minimum = v
            maximum = v
        else:
            minimum, maximum = nmin, nmax
    out.append((float(np.float64((maximum + minimum) / 2)), len(values)))
    return out


def _blob_pairs(blob):
    body = blob[:-1]
    pairs = np.frombuffer(body, dtype="<f8").reshape(-1, 2)
    ends = pairs.view("<u8")[:, 1]
    return [(float(v), int(e)) for v, e in zip(pairs[:, 0], ends)]


def _series_cases():
    cases = {
        "tokens_small": RNG.integers(0, 50257, size=333).astype(np.float64),
        "tokens_runs": np.repeat(RNG.integers(0, 100, size=40), RNG.integers(1, 9, size=40)).astype(np.float64),
        "uniform": RNG.uniform(0, 1, size=100),
        "trend": 0.1 * np.arange(100) + RNG.uniform(-0.1, 0.1, 100),
        "constant": np.full(150, 7.25),
        "single": np.array([3.5]),
        "two": np.array([1.0, 2.0]),
        "odd": RNG.uniform(-10, 10, size=101),
        "even": RNG.uniform(-10, 10, size=100),
        "big_mixed": RNG.normal(0, 1e6, size=500),
    }
    return cases


@pytest.mark.parametrize("eb", [0.0, 0.25, 1.0, 7.5])
def test_pmc_midrange_matches_scalar_reference(eb):
    for name, values in _series_cases().items():
        blob = compress(values, Method.PoorMansCompressionMidrange, eb)
        assert blob[-1] == 0
        expected = _scalar_pmc_midrange(values, eb)
        got = _blob_pairs(blob)
        assert got == expected, f"case {name} eb={eb}"
        dec = decompress(blob)
        assert is_within_error_bound(values, dec, eb), f"case {name} eb={eb}"


def _scalar_pmc_mean(values, eb):
    """Direct scalar transcription of compressMean (zig :64-97)."""
    ebl = np.longdouble(np.float32(eb))
    minimum = np.longdouble(np.nan)
    maximum = np.longdouble(np.nan)
    length = np.float64(0.0)
    average = np.longdouble(0.0)
    out = []
    for index, value in enumerate(values):
        v = np.longdouble(value)
        nmin = np.fmin(v, minimum)
        nmax = np.fmax(v, maximum)
        nlen = length + 1
        navg = (average * np.longdouble(length) + v) / np.longdouble(nlen)
        if (nmax - navg > ebl) or (navg - nmin > ebl):
            out.append((float(np.float64(average)), index))
            minimum = maximum = average = v
            length = np.float64(1.0)
        else:
            minimum, maximum, length, average = nmin, nmax, nlen, navg
    out.append((float(np.float64(average)), len(values)))
    return out


@pytest.mark.parametrize("eb", [0.0, 0.25, 1.0, 7.5])
def test_pmc_mean_matches_scalar_reference(eb):
    for name, values in _series_cases().items():
        blob = compress(values, Method.PoorMansCompressionMean, eb)
        assert blob[-1] == 1
        expected = _scalar_pmc_mean(values, eb)
        got = _blob_pairs(blob)
        assert got == expected, f"case {name} eb={eb}"
        dec = decompress(blob)
        assert is_within_error_bound(values, dec, eb), f"case {name} eb={eb}"


@pytest.mark.parametrize(
    "method", [Method.PoorMansCompressionMidrange, Method.PoorMansCompressionMean]
)
def test_pmc_lossless_at_zero(method):
    tokens = RNG.integers(0, 50257, size=1000).astype(np.float64)
    dec = decompress(compress(tokens, method, 0.0))
    assert np.array_equal(dec, tokens)


def test_pmc_nan_absorption():
    # NaN values never update min/max and never break segments (zig @min/@max
    # return the non-NaN operand); PMC accepts non-finite input.
    values = np.array([1.0, np.nan, 1.0, 1.0, 5.0, np.nan, 5.0])
    blob = compress(values, Method.PoorMansCompressionMidrange, 0.5)
    got = _blob_pairs(blob)
    assert got == _scalar_pmc_midrange(values, 0.5)
    dec = decompress(blob)
    assert len(dec) == len(values)


def test_gorilla_roundtrip_exact_all_bitpatterns():
    raw = RNG.integers(0, 2**64, size=2000, dtype=np.uint64).view(np.float64)
    blob = compress(raw, Method.GorillaXOR)
    dec = decompress(blob)
    # bit-exact, including NaN payloads and infinities
    assert np.array_equal(dec.view(np.uint64), raw.view(np.uint64))


def test_gorilla_roundtrip_tokens_and_edges():
    for values in [
        RNG.integers(0, 50257, size=513).astype(np.float64),
        np.array([1.5]),
        np.array([2.0, 2.0, 2.0]),
        np.zeros(100),
        np.array([0.0, -0.0, 0.0]),
    ]:
        dec = decompress(compress(values, Method.GorillaXOR))
        assert np.array_equal(dec.view(np.uint64), values.view(np.uint64))


def test_gorilla_compresses_constant_series():
    values = np.full(10_000, 123.456)
    blob = compress(values, Method.GorillaXOR)
    assert len(blob) < 10_000 // 8 + 64  # ~1 control bit per repeated point


def test_delta_of_delta_roundtrip():
    for values in [
        RNG.integers(0, 50257, size=777).astype(np.float64),
        np.arange(5000, dtype=np.float64),  # pure ramp -> all-zero dod
        np.array([42.0]),
        np.array([7.0, 9.0]),
        np.cumsum(RNG.integers(-3, 4, size=1000)).astype(np.float64),
        np.array([0.0, 2.0**40, -(2.0**40), 17.0]),
    ]:
        dec = decompress(compress(values, Method.DeltaOfDelta))
        assert np.array_equal(dec, values)


def test_delta_of_delta_ramp_is_tiny():
    values = np.arange(100_000, dtype=np.float64)
    blob = compress(values, Method.DeltaOfDelta)
    assert len(blob) < 100_000 // 4 + 64  # 2 selector bits per point


def test_delta_of_delta_rejects_fractional():
    with pytest.raises(UnsupportedInputError):
        compress(np.array([1.5, 2.5]), Method.DeltaOfDelta)


def test_bitpack_roundtrip_property():
    for _ in range(25):
        k = int(RNG.integers(1, 200))
        lengths = RNG.integers(1, 65, size=k)
        values = RNG.integers(0, 2**63, size=k, dtype=np.uint64)
        masked = values & ((np.uint64(1) << lengths.astype(np.uint64)) - np.uint64(1))
        masked = np.where(lengths == 64, values, masked)
        buf, total = pack_bits(values, lengths)
        assert total == int(lengths.sum())
        out = unpack_bits(buf, lengths)
        assert np.array_equal(out, masked)


def test_clz_ctz_bitlength():
    x = np.array([0, 1, 2, 3, 2**63, 2**64 - 1, 96], dtype=np.uint64)
    assert list(bit_length_u64(x)) == [0, 1, 2, 2, 64, 64, 7]
    assert list(clz64(x)) == [64, 63, 62, 62, 0, 0, 57]
    assert list(ctz64(x)) == [64, 0, 1, 0, 63, 0, 5]


def test_bitlength_frexp_fast_path_matches_reference():
    """Differential pin of the hi/lo-split frexp trick vs the masked-shift
    reference: a single frexp over the full uint64 would round above 2^53
    (2^k - 1 rounds UP to 2^k, overstating the length by one) and corrupt
    every Gorilla lz/ml stream — so sweep exactly those boundaries plus a
    broad random sample."""
    from tersets_spark.codecs._bitpack import _bit_length_u64_ref

    edges = []
    for k in range(64):
        p = np.uint64(1) << np.uint64(k)
        edges += [p, p - np.uint64(1), p + np.uint64(1)]
    edges.append(np.uint64(2**64 - 1))
    edges = np.array(edges, dtype=np.uint64)
    assert np.array_equal(bit_length_u64(edges), _bit_length_u64_ref(edges))

    rnd = np.random.default_rng(13)
    for hi_bits in (8, 24, 40, 53, 54, 63, 64):
        vals = rnd.integers(0, 2**hi_bits, size=50_000, dtype=np.uint64)
        assert np.array_equal(bit_length_u64(vals), _bit_length_u64_ref(vals))
        # ctz shares the exact-power-of-two frexp argument; pin it off the
        # same sample via the reference identity ctz = bitlen(lowbit) - 1
        low = vals & (np.uint64(0) - vals)
        ref_ctz = np.where(vals == 0, 64, _bit_length_u64_ref(low) - 1)
        assert np.array_equal(ctz64(vals), ref_ctz)


def test_dispatch_framing_and_errors():
    values = np.array([1.0, 2.0, 3.0])
    with pytest.raises(UnsupportedInputError):
        compress(np.array([]), Method.PoorMansCompressionMean, 0.0)
    with pytest.raises(UnsupportedErrorBoundError):
        compress(values, Method.PoorMansCompressionMean, -1.0)
    with pytest.raises(UnsupportedInputError):
        decompress(b"")
    with pytest.raises(UnknownMethodError):
        decompress(bytes([255]))


def test_method_enum_zig_abi_order():
    # Mirrors /root/reference/src/capi.zig:113-126 — ids pinned to Zig order,
    # NOT the reference Python binding's swapped SlidingWindow/BottomUp.
    assert [int(m) for m in list(Method)[:13]] == list(range(13))
    assert Method.SlidingWindow == 10
    assert Method.BottomUp == 11
    assert Method.MixPiece == 12
    assert Method.GorillaXOR == 13
    assert Method.DeltaOfDelta == 14

#!/usr/bin/env python
"""Per-codec single-core throughput microbenchmark -> BENCH/CODECS.md.

Context for the "match the reference's single-node throughput" goal: the
reference (Zig) publishes no numbers (BASELINE.md), so this records OUR
per-codec tokens/sec on the engine's real token data, separating the
vectorized hot path (PMC/Gorilla/DoD — what the cascade runs) from the
faithful per-point Python codecs (Swing..MixPiece — parity-grade, used for
coverage queries, never the throughput path).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq

from tersets_spark import Method, compress, decompress
from tersets_spark.codecs import delta_of_delta
from tersets_spark.tables import ensure_sequences

EB = {
    Method.SimPiece: 1.0,
    Method.MixPiece: 1.0,
    Method.PiecewiseConstantHistogram: 64.0,
    Method.PiecewiseLinearHistogram: 16.0,
}
SLOW = set()


def main() -> None:
    table = pq.read_table(ensure_sequences("sf0.01"), columns=["tokens"])
    col = table.column("tokens").combine_chunks()
    offsets = np.asarray(col.offsets, dtype=np.int64)
    flat = np.asarray(col.values, dtype=np.int64)[: offsets[-1]]
    rows = [(flat[s:e].astype(np.float64)) for s, e in zip(offsets[:-1], offsets[1:])]

    lines = [
        "# BENCH/CODECS — per-codec single-core throughput",
        "",
        f"Input: real engine token series (sf0.01 slice), {len(rows[:512])} series.",
        "Compress+decompress round trip; tokens/sec single core. The cascade's",
        "hot path is the vectorized group (PMC / Gorilla / DoD, plus the batched",
        "multi-block DoD encoder); every sequential codec runs a C kernel",
        "that is differential-tested bit-identical to its Python parity path.",
        "",
        "| codec | tokens/sec (1 core) | note |",
        "|---|---|---|",
    ]

    for method in sorted(Method, key=int):
        eb = EB.get(method, 0.0)
        subset = rows[:64] if method in SLOW else rows[:512]
        total = sum(len(r) for r in subset)
        t0 = time.perf_counter()
        for r in subset:
            decompress(compress(r, method, eb))
        dt = time.perf_counter() - t0
        if method in (Method.PiecewiseConstantHistogram, Method.PiecewiseLinearHistogram):
            from tersets_spark.codecs.histogram import _NATIVE

            note = (
                "native C Min-Merge kernel (bit-identical to python path)"
                if _NATIVE is not None
                else "per-point python (parity)"
            )
        elif method in (
            Method.SwingFilter, Method.SwingFilterDisconnected, Method.SlideFilter
        ):
            from tersets_spark.codecs.swing_slide import _NATIVE as _SWING_NATIVE

            note = (
                "native C filter kernel (bit-identical to python path)"
                if _SWING_NATIVE is not None
                else "per-point python (parity)"
            )
        elif method in (
            Method.VisvalingamWhyatt, Method.SlidingWindow,
            Method.BottomUp, Method.ABCLinearApproximation,
        ):
            from tersets_spark.codecs.line_simplification import _NATIVE as _LS_NATIVE

            note = (
                "native C kernel (bit-identical to python path)"
                if _LS_NATIVE is not None
                else "per-point python (parity)"
            )
        elif method in (Method.SimPiece, Method.MixPiece):
            from tersets_spark.codecs.sim_piece import _NATIVE as _SP_NATIVE

            note = (
                "native C kernel (bit-identical to python path)"
                if _SP_NATIVE is not None
                else "per-point python (parity)"
            )
        else:
            note = "vectorized" if method not in SLOW else "per-point python (parity)"
        lines.append(f"| {method.name} | {total / dt:,.0f} | {note} |")
        print(f"{method.name}: {total / dt:,.0f} tokens/s", file=sys.stderr)

    # batched multi-block encoder at the cascade's real Arrow batch size
    # (256 rows: cache-resident — see BENCH/BASELINE.md)
    batch_rows = 256
    t0 = time.perf_counter()
    n_blobs = 0
    for i in range(0, len(offsets) - 1, batch_rows):
        seg = offsets[i : i + batch_rows + 1]
        base = seg[0]
        n_blobs += len(
            delta_of_delta.compress_blocks(
                flat[base : seg[-1]], seg[:-1] - base, seg[1:] - base
            )
        )
    dt = time.perf_counter() - t0
    lines.append(
        f"| DeltaOfDelta (batched multi-block, 256-row batches) | {offsets[-1] / dt:,.0f} "
        "| cascade hot path |"
    )
    print(f"DoD batched: {offsets[-1] / dt:,.0f} tokens/s", file=sys.stderr)
    assert n_blobs == len(offsets) - 1

    # batched Gorilla encoder (round 4): same protocol as the DoD block
    from tersets_spark.codecs import gorilla

    t0 = time.perf_counter()
    n_blobs = 0
    for i in range(0, len(offsets) - 1, batch_rows):
        seg = offsets[i : i + batch_rows + 1]
        base = seg[0]
        n_blobs += len(
            gorilla.compress_blocks(
                flat[base : seg[-1]], seg[:-1] - base, seg[1:] - base
            )
        )
    dt = time.perf_counter() - t0
    lines.append(
        f"| GorillaXOR (batched multi-block, 256-row batches) | {offsets[-1] / dt:,.0f} "
        "| cascade hot path for compress_method=GorillaXOR |"
    )
    print(f"Gorilla batched: {offsets[-1] / dt:,.0f} tokens/s", file=sys.stderr)
    assert n_blobs == len(offsets) - 1

    # LTTB downsampling (not a codec, but benched here so the operator has a
    # recorded per-core number). The PRODUCTION path is the batched C kernel
    # lttb_batch (what lttb_udf routes every Arrow batch through); the pure-
    # Python lttb is the parity/fallback path, benched alongside for the
    # before/after record.
    from tersets_spark.downsample import lttb, lttb_batch

    # float64 input (what lttb_udf hands the kernel after Arrow conversion);
    # int64 slices here would time a per-array astype copy, not the kernel
    t0 = time.perf_counter()
    for r in rows:
        lttb(r, 64)
    dt_py = time.perf_counter() - t0
    dt_c = float("inf")
    batched = None
    for _ in range(3):  # best-of-3: the call is ms-scale, timer noise matters
        t0 = time.perf_counter()
        batched = lttb_batch(rows, 64)
        dt_c = min(dt_c, time.perf_counter() - t0)
    if batched is not None:
        lines.append(
            f"| LTTB downsample (threshold=64, batched C kernel — production "
            f"path of lttb_udf) | {offsets[-1] / dt_c:,.0f} "
            f"| one kernel call per Arrow batch; python parity path "
            f"{offsets[-1] / dt_py:,.0f} tok/s |"
        )
    else:
        lines.append(
            f"| LTTB downsample (threshold=64, python fallback — C kernel "
            f"unavailable) | {offsets[-1] / dt_py:,.0f} | per-bucket numpy areas |"
        )
    print(
        f"LTTB: C {offsets[-1] / dt_c:,.0f} / py {offsets[-1] / dt_py:,.0f} tokens/s",
        file=sys.stderr,
    )

    lines += [
        "",
        "### Round-4 before/after (same protocol, same input)",
        "",
        "| change | before | after |",
        "|---|---|---|",
        "| GorillaXOR encoder: batched multi-block (gorilla.compress_blocks, "
        "byte-identical to per-row compress; one global widen/xor/clz/ctz + "
        "one segmented bit-pack per Arrow batch) | 2.9M tok/s per-row | see "
        "table (batched row) |",
        "| clz64/ctz64: 6-pass masked shift cascade -> frexp on exact "
        "float64 halves (hi/lo 32-bit split; isolated low bit is a power of "
        "two, exact to 2^63) | — | shared by Gorilla per-row AND batched "
        "(~2x on the xor-control stage) |",
        "| pack_bits / _segmented_pack scatter: np.bitwise_or.at -> "
        "bitwise_or.reduceat over the monotone word index "
        "(or_scatter_monotone) | — | benefits DoD + Gorilla + every "
        "pack_bits caller |",
        "| full cascade with compress_method=GorillaXOR, sf0.1 local[32] "
        "(quiet window, warmup + best-of-2) | — | 10.7 s vs DoD 6.7 s = "
        "1.59x (gate was <= 2x; Gorilla blobs are ~45% larger, so the "
        "delta is mostly write volume) |",
        "",
        "### Round-3 before/after (same protocol, same input)",
        "",
        "| change | before | after |",
        "|---|---|---|",
        "| PWLH MABR: candidate-pruned exact evaluation (trig-free support-"
        "function bounds + exact-direction dedup; winner still evaluated by "
        "the reference's exact scan, so output stays bit-identical — "
        "tests/test_native_histogram.py fast-vs-exact suite) | 51,980 tok/s "
        "| see table (~6-12x; worst-case single doc 268 -> ~80k tok/s, "
        "corpus-wide 21k -> 366k tok/s compress-only in a quiet window) |",
        "| PWLH MABR bounds: tolerance-guarded cycle walks -> one fused exact "
        "scan per unique edge direction, AVX2-guarded (walks averaged 21 "
        "plateau vertices on lattice token data — measured 162M supp evals; "
        "scan is branch-free, slack-free, and vectorizes; fold order cannot "
        "change a min/max VALUE so bit-identity is structural). Exact "
        "candidate evals share the same SIMD treatment (reference's DBL_MIN "
        "max-init quirk seeds the lanes). Build now tries `-O3 -march=native` "
        "with portable `-O2` fallback | 366k tok/s compress-only / 472k "
        "roundtrip | 906k tok/s compress-only; 836k roundtrip (table); worst "
        "doc (len 3,036 lattice staircase) 41k -> 121k tok/s |",
        "",
        "### Round-2 before/after (same protocol, same input)",
        "",
        "| change | before | after |",
        "|---|---|---|",
        "| PWLH compress: C Min-Merge kernel (codecs/_histogram_native.c, "
        "differential-tested bit-identical) | 1,949 tok/s | see table (~50-100k) |",
        "| PWCH compress: same kernel | 56,846 tok/s | see table (~3-4M) |",
        "| Shingle hashing (MinHash/SimHash): per-byte Python FNV -> NumPy "
        "column-Horner | 92k shingles/s | 812k shingles/s (9x); the Spark "
        "MinHash path now hashes JVM-side (xxhash64) so Python hashes 0 "
        "shingles there |",
        "| Swing/SwingDisc/Slide: C filter kernel (codecs/_swing_native.c) "
        "+ fully vectorized decoders | 0.5-1.2M tok/s | see table (~10M "
        "roundtrip; compress alone 56-114M) |",
        "| VW / SlidingWindow / BottomUp / ABC: C kernels "
        "(codecs/_linesimp_native.c) + fully vectorized decoders | "
        "73k-1.1M tok/s | see table (4-9M roundtrip) |",
        "| Sim/Mix-Piece: C kernels (codecs/_piece_native.c, python-dict "
        "grouping semantics preserved) + vectorized segment decoder | "
        "0.5-0.9M tok/s | see table (2-3M roundtrip) |",
        "",
        "With these, EVERY codec runs at millions of tokens/s/core on a "
        "single node, with the pure-Python parity path retained as the "
        "fallback and as the differential-test reference.",
        "",
        "### PWLH: why ~0.9-1.1M tokens/s/core is the faithful floor (profiled)",
        "",
        "gprof on the O3-native kernel over representative series shapes: 76% of",
        "time is MABR evaluation inside `merge_error`, called ~3x per token —",
        "that multiplicity is structural to the reference's Min-Merge (initial",
        "pair costs + two adjacent-pair recomputes per merge through the hashed",
        "heap), not a constant-factor defect. The small-hull exact-scan cutoff",
        "was swept (4/6/8/12/16): 4 is optimal — above it the reference's",
        "trig-per-edge exact scan costs more than the pruned bound pass it",
        "replaces. Remaining headroom would require changing which floats the",
        "reference computes, breaking bit-identity; at 32 cores the kernel",
        "sustains ~28M tokens/s for PWLH alone, and PWLH is not on the cascade",
        "hot path (DoD/Gorilla/PMC are).",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/CODECS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCH/CODECS.md")


if __name__ == "__main__":
    main()

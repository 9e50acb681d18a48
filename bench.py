#!/usr/bin/env python
"""Headline benchmark: full retention-cascade job (compress + rollup tiers).

Default mode (driver contract): one run at local[$SPARK_GRAFT_CPUS] on the
sequences table for $SPARK_GRAFT_SF_DIR's scale factor; prints ONE JSON line
on stdout:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {"raw": s, "1m": s, "1h": s, "1d": s}, "sf": ...,
     "tokens": N, "tokens_per_sec": T}

--scaling mode (BASELINE.md protocol): same job at local[8] and local[32],
3 runs each, median throughput + efficiency = (tp32/tp8)/4, written to
BENCH/BASELINE.md. This is the sandbox stand-in for N vs 4N executor
clusters (north_rule two-cluster-size criterion).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tersets_spark.tables import ROWS_BY_SF, ensure_sequences, sf_name_from_dir


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def run_once(cpus: int, seq_path: str, total_tokens: int) -> dict:
    """One full cascade run on a fresh session + fresh output dir."""
    from pyspark.sql import SparkSession

    from tersets_spark.jobs import run_cascade
    from tersets_spark.catalog import TierCatalog
    from tersets_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(master=f"local[{cpus}]", app_name=f"bench-local{cpus}")
    out = tempfile.mkdtemp(prefix=f"tersets_bench_{cpus}_")
    try:
        t0 = time.monotonic()
        run_cascade(spark, seq_path, out, with_blocks=True, resume=False)
        total = time.monotonic() - t0
        per_tier: dict[str, float] = {}
        for rec in TierCatalog(out).metrics():
            per_tier[rec["tier"]] = max(per_tier.get(rec["tier"], 0.0), rec["wall_ms"] / 1000)
        return {
            "total_sec": round(total, 3),
            "per_tier_sec": {k: round(v, 3) for k, v in per_tier.items()},
            "tokens_per_sec": round(total_tokens / total, 1),
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true", help="local[8] vs local[32] protocol")
    parser.add_argument("--runs", type=int, default=3)
    args = parser.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = sf_name_from_dir(sf_dir)
    sf = float(sf_name[2:])
    seq_path = ensure_sequences(sf_name)

    import pyarrow.parquet as pq

    total_tokens = int(
        pq.read_table(seq_path, columns=["n_tok"])["n_tok"].to_pandas().sum()
    )
    log(f"bench: sf={sf_name} rows={ROWS_BY_SF[sf_name]} tokens={total_tokens}")

    if args.scaling:
        results = {}
        for p in (8, 32):
            runs = []
            for i in range(args.runs):
                r = run_once(p, seq_path, total_tokens)
                log(f"local[{p}] run {i + 1}/{args.runs}: {r}")
                runs.append(r)
            results[p] = {
                "median_total_sec": statistics.median(r["total_sec"] for r in runs),
                "median_tokens_per_sec": statistics.median(r["tokens_per_sec"] for r in runs),
                "runs": runs,
            }
        tp8 = results[8]["median_tokens_per_sec"]
        tp32 = results[32]["median_tokens_per_sec"]
        eff = tp32 / (4 * tp8)
        _write_baseline_md(sf_name, total_tokens, results, eff)
        print(json.dumps({
            "metric": "cascade_scaling",
            "value": results[32]["median_total_sec"],
            "unit": "sec",
            "queries": {"local8": results[8]["median_total_sec"],
                        "local32": results[32]["median_total_sec"]},
            "sf": sf,
            "tokens": total_tokens,
            "tokens_per_sec_local8": tp8,
            "tokens_per_sec_local32": tp32,
            "scaling_efficiency": round(eff, 3),
        }))
        return

    r = run_once(cpus, seq_path, total_tokens)
    print(json.dumps({
        "metric": "retention_cascade_total",
        "value": r["total_sec"],
        "unit": "sec",
        "queries": r["per_tier_sec"],
        "sf": sf,
        "tokens": total_tokens,
        "tokens_per_sec": r["tokens_per_sec"],
        "cpus": cpus,
    }))


def _write_baseline_md(sf_name: str, tokens: int, results: dict, eff: float) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH/BASELINE — two-parallelism scaling evidence",
        "",
        f"Input: deterministic sequences table {sf_name} "
        f"({tokens:,} tokens, seed 42); job = full retention cascade "
        "(raw DoD compress -> 1m rollup+blocks -> 1h -> 1d), fresh output dir per run.",
        "",
        "| parallelism | median total (s) | median tokens/sec |",
        "|---|---|---|",
    ]
    for p, r in results.items():
        lines.append(
            f"| local[{p}] | {r['median_total_sec']:.2f} | {r['median_tokens_per_sec']:,.0f} |"
        )
    lines += [
        "",
        f"**Scaling efficiency** = tp(local[32]) / (4 x tp(local[8])) = **{eff:.3f}** "
        f"(gate: >= 0.8, north_rule).",
        "",
        "Protocol: BASELINE.md. local[8]/local[32] is the sandbox stand-in for",
        "N vs 4N executors; the job is identical binaries + identical input at",
        "both levels, >= 3 runs each, median reported.",
        "",
        "Raw runs:",
        "```json",
        json.dumps({str(k): v for k, v in results.items()}, indent=2),
        "```",
    ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""spark-submit entry point for the retention cascade (north_rule launch).

Cluster launch:

    python -c "from tersets_spark.shipping import _build_zip; print(_build_zip())"
    spark-submit --py-files <that zip> tools/submit_cascade.py \
        --input /path/to/sequences_parquet --out /path/to/tiers \
        [--method DeltaOfDelta] [--no-blocks] [--no-resume] [--salt]

Local smoke (same code path the driver/bench use):

    python tools/submit_cascade.py --input data/sequences_sf0.001_seed42_n2000.parquet \
        --out /tmp/tiers --master "local[4]"

The job is resumable: rerunning with the same --out anti-joins the manifest
and processes only incomplete (tier, source) partitions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="sequences parquet path")
    parser.add_argument("--out", required=True, help="tier catalog output dir")
    parser.add_argument("--method", default="DeltaOfDelta")
    parser.add_argument("--no-blocks", action="store_true")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--salt", action="store_true",
                        help="salted repartition before the map-only tiers (see jobs.py)")
    parser.add_argument("--sketches", action="store_true",
                        help="also materialize the psk_* (percentile) and "
                             "hll_* (distinct) sketch tiers (see jobs.py)")
    parser.add_argument("--serve-range", nargs=2, type=int, default=None,
                        metavar=("START", "END"),
                        help="after the cascade, serve the per-source exact "
                             "aggregate over [START, END) from the stitched "
                             "tiers (second-resolution endpoints decode raw-"
                             "tier edges) and print the rows in the summary")
    parser.add_argument("--serve-gapfill", nargs=3, type=int, default=None,
                        metavar=("START", "END", "STEP"),
                        help="after the cascade, serve the LOCF gap-filled "
                             "per-source grid over [START, END) at STEP "
                             "seconds from the coarsest dividing tier and "
                             "print per-source row/gap counts in the summary")
    parser.add_argument("--serve-points", nargs=2, type=int, default=None,
                        metavar=("START", "END"),
                        help="after the cascade, point-read every document's "
                             "values in [START, END) from the committed raw "
                             "tier and print the point count in the summary")
    parser.add_argument("--ingest", nargs=2, default=None,
                        metavar=("LATE_PATH", "BATCH_ID"),
                        help="absorb a LATE batch into the committed catalog "
                             "with APPEND-only commits (jobs.ingest_append; "
                             "exactly-once per BATCH_ID) instead of running "
                             "the cascade")
    parser.add_argument("--maintain", type=int, default=None, metavar="NOW_TS",
                        help="run one retention->compaction->vacuum pass "
                             "(jobs.maintain) after the cascade/ingest; "
                             "NOW_TS anchors the retention policy horizon "
                             "(0 = compaction+vacuum only)")
    parser.add_argument("--validate", type=float, default=0.0, metavar="FRAC",
                        help="after the cascade, audit a deterministic FRAC "
                             "of doc_ids on disk (decompress round-trip + "
                             "exact tier re-aggregation); exit 3 on mismatch")
    parser.add_argument("--master", default=None,
                        help="override master for local smoke runs (spark-submit sets it otherwise)")
    args = parser.parse_args()

    from tersets_spark.catalog import TierCatalog
    from tersets_spark.jobs import run_cascade
    from tersets_spark.methods import Method

    if args.master:
        from tersets_spark.session import get_spark

        spark = get_spark(master=args.master, app_name="tersets-cascade")
    else:
        # Under spark-submit, master/conf come from the launcher.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("tersets-cascade").getOrCreate()

    if args.ingest:
        from tersets_spark.jobs import ingest_append

        late_path, batch_id = args.ingest
        ingest_res = ingest_append(spark, late_path, args.out, batch_id,
                                   compress_method=Method[args.method])
        summary = {
            "ingest": ingest_res,
            "partitions_done": len(TierCatalog(args.out).metrics()),
        }
    else:
        tiers = run_cascade(
            spark,
            args.input,
            args.out,
            compress_method=Method[args.method],
            with_blocks=not args.no_blocks,
            resume=not args.no_resume,
            salt=args.salt,
            with_sketches=args.sketches,
        )
        summary = {
            "tiers": tiers,
            "partitions_done": len(TierCatalog(args.out).metrics()),
        }
    if args.maintain is not None:
        from tersets_spark.jobs import maintain

        summary["maintain"] = maintain(
            spark, args.out, now_ts=args.maintain if args.maintain > 0 else None
        )
    if args.serve_range:
        from tersets_spark.jobs import range_aggregate_from_catalog

        start, end = args.serve_range
        rows = range_aggregate_from_catalog(spark, args.out, start, end).collect()
        summary["range"] = [start, end]
        summary["range_agg"] = sorted(
            [r["source"], r["cnt"], r["sum"], r["vmin"], r["vmax"]] for r in rows
        )
    if args.serve_gapfill:
        from pyspark.sql import functions as F

        from tersets_spark.jobs import range_gapfill_from_catalog

        s, e, step = args.serve_gapfill
        gf = range_gapfill_from_catalog(spark, args.out, s, e, step)
        per_src = gf.groupBy("source").agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("gap_filled").cast("long")).alias("gaps"),
        ).collect()
        summary["gapfill"] = {
            "range": [s, e, step],
            "per_source": sorted([r["source"], r["rows"], r["gaps"]] for r in per_src),
        }
    if args.serve_points:
        from tersets_spark.jobs import read_doc_range

        s, e = args.serve_points
        summary["point_read"] = {
            "range": [s, e],
            "points": read_doc_range(spark, args.out, s, e).count(),
        }
    if args.validate > 0.0:
        from tersets_spark.jobs import validate_tiers

        report = validate_tiers(spark, args.input, args.out, sample_frac=args.validate)
        summary["validation"] = report
        if any(v["mismatches"] for v in report.values()):
            print(json.dumps(summary))
            spark.stop()
            sys.exit(3)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""spark-submit entry point for the STREAMED cascade + watermarked finalize.

Cluster launch (same zip as tools/submit_cascade.py):

    spark-submit --py-files <engine.zip> tools/stream_cascade.py \
        --input /stream/in --stream-out /stream/tiers --ckpt /stream/ckpt \
        --catalog /tables/tiers --watermark 1700046000 [--tiers 1m,1h,1d]

One invocation = one availableNow streaming pass over the new input files
(restart-safe via the stream checkpoint), then an incremental finalize of
each requested tier's CLOSED buckets below --watermark into the batch
TierCatalog (append commits, exactly-once across crash windows), then a
tombstone-committed compaction of the remaining partials. Run it from cron
with an advancing watermark and the streamed state stays bounded by the
open-bucket window while consumers read one continuously-growing catalog.

Local smoke:

    python tools/stream_cascade.py --input /tmp/in --stream-out /tmp/st \
        --ckpt /tmp/ck --catalog /tmp/cat --watermark 1700046000 \
        --master "local[4]"
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="stream input dir (parquet files)")
    parser.add_argument("--stream-out", required=True, help="streamed partials dir")
    parser.add_argument("--ckpt", required=True, help="stream checkpoint dir")
    parser.add_argument("--catalog", required=True, help="batch TierCatalog dir")
    parser.add_argument("--watermark", type=int, required=True,
                        help="event-time watermark: buckets below it are closed")
    parser.add_argument("--tiers", default="1m,1h,1d",
                        help="comma list of tiers to finalize (default all core)")
    parser.add_argument("--sketches", action="store_true",
                        help="stream + finalize the psk_*/hll_* sketch tiers too")
    parser.add_argument("--no-compact", action="store_true",
                        help="skip the post-commit partial compaction")
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from tersets_spark.catalog import TierCatalog
    from tersets_spark.streaming import (
        finalize_streamed_tier_incremental,
        stream_cascade_to_tiers,
    )

    if args.master:
        from tersets_spark.session import get_spark

        spark = get_spark(master=args.master, app_name="tersets-stream-cascade")
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("tersets-stream-cascade").getOrCreate()

    q = stream_cascade_to_tiers(
        spark, args.input, args.stream_out, args.ckpt,
        with_blocks=False, with_sketches=args.sketches,
    )
    q.awaitTermination()

    os.makedirs(args.catalog, exist_ok=True)
    catalog = TierCatalog(args.catalog)
    tiers = [t.strip() for t in args.tiers.split(",") if t.strip()]
    if args.sketches:
        tiers += [f"{fam}_{lvl}" for fam in ("psk", "hll")
                  for lvl in ("1m", "1h", "1d")]
    summary = {"watermark": args.watermark, "finalized": {}}
    for tier in tiers:
        stats = finalize_streamed_tier_incremental(
            spark, args.stream_out, catalog, tier, args.watermark,
            compact=not args.no_compact,
        )
        stats.pop("compaction", None)
        summary["finalized"][tier] = stats
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

"""SparkSession construction with the engine's standard config.

Tuned for correctness-at-scale defaults: AQE on (runtime skew/coalesce),
Arrow-vectorized Python exchange for the codec kernels, and a shuffle
partition count sized to the local core count (on a real cluster this is
overridden by spark-submit conf; everything here is plain public Spark conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "tersets_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> N; local[*] -> cpu count; keep shuffles 1 task per core
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if inner in ("", "*") else int(inner)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~1.5 MB of int64 tokens per Arrow batch: the vectorized kernels make
        # ~10 passes over each batch, and keeping batch + intermediates
        # cache-resident is worth 4x end-to-end on this host (concurrent DRAM
        # streaming does not scale here — measured in BENCH/BASELINE.md). On
        # a real cluster this is a per-executor cache-tuning knob.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # Token-array rows are wide (~3 KB amortized); smaller scan splits keep
        # every core busy on medium inputs instead of 1-2 jumbo partitions.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Serving reads push doc_id IN (...) lists into the raw-tier scan,
        # where the adaptive per-row-group doc_id bloom filters evaluate
        # them (catalog.tier_writer). Spark's default only converts IN to
        # a parquet predicate up to 10 values — far below a zone-map
        # candidate set (rollup.threshold_points) — so raise it: bloom
        # probes are cheap and the alternative is reading every row group.
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dlog4j2.level=ERROR")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

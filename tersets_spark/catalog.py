"""Iceberg-style tier catalog: partitioned parquet + checkpoint manifest.

No Iceberg runtime jar ships with the sandbox's pyspark (verified in
SURVEY.md §7), so this module implements the same layout contract —
tier tables partitioned by source, idempotent per-partition writes, and a
manifest that records per-partition lineage + throughput metrics — over
plain parquet. The writer interface is Iceberg-shaped: on a real cluster,
swapping ``format("parquet")`` for ``format("iceberg")`` + a catalog name is
a config change, not a code change.

Resumability (north_rule): a job enumerates its partitions, anti-joins the
manifest's completed set, and processes only the remainder; each partition
write is an atomic directory replace, so a killed job resumes with no
duplicate or missing partitions (tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class TierCatalog:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self.manifest_path = os.path.join(base_dir, "_manifest.jsonl")

    # -- manifest ----------------------------------------------------------
    def completed(self, tier: str) -> set[str]:
        done: set[str] = set()
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["tier"] == tier and rec["status"] == "done":
                        done.add(rec["partition"])
        return done

    def record(self, tier: str, partition: str, **metrics) -> None:
        rec = {
            "tier": tier,
            "partition": partition,
            "status": "done",
            "wall_clock_unix": time.time(),
            **metrics,
        }
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def metrics(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f]

    # -- partition-atomic writes -------------------------------------------
    def partition_dir(self, tier: str, partition: str) -> str:
        return os.path.join(self.base_dir, tier, f"source={partition}")

    def write_partition(self, df: DataFrame, tier: str, partition: str, **metrics) -> None:
        """Idempotently (re)write one source partition of a tier table."""
        final = self.partition_dir(tier, partition)
        tmp = final + f".inprogress-{uuid.uuid4().hex[:8]}"
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            _rmtree(final)
        os.replace(tmp, final)
        bytes_out = _dir_bytes(final)
        self.record(
            tier,
            partition,
            wall_ms=round((time.monotonic() - t0) * 1000, 1),
            bytes_out=bytes_out,
            **metrics,
        )

    def read_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        base = os.path.join(self.base_dir, tier)
        df = spark.read.option("basePath", base).parquet(os.path.join(base, "source=*"))
        return df


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            total += os.path.getsize(os.path.join(root, name))
    return total


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path)

"""Scale-shape regression tests for the dedup module (VERDICT round-1 items
1-3): the MinHash verify join must be candidate-bounded (never the full
shingle self-join), and connected-components must not grow plan lineage with
iteration count.
"""

from __future__ import annotations

import time

import pytest


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_minhash_verify_join_is_candidate_bounded(spark, docs):
    """No join in the LSH plan may be keyed on the exploded shingle column.

    The brute-force oracle path self-joins the shingle table (quadratic in a
    shingle bucket) — that join shape must NOT appear in the scale path,
    whose verify is candidates x collected-shingle-sets (array_intersect).
    """
    from tersets_spark.dedup import jaccard_pairs, minhash_lsh_pairs

    brute_join_lines = [
        ln for ln in _optimized_plan(jaccard_pairs(docs)).splitlines() if "Join" in ln
    ]
    # positive control: the oracle path really does join on the shingle key
    assert any("shingle#" in ln for ln in brute_join_lines)

    lsh_plan = _optimized_plan(minhash_lsh_pairs(docs))
    lsh_join_lines = [ln for ln in lsh_plan.splitlines() if "Join" in ln]
    assert lsh_join_lines, "expected candidate/verify joins in the LSH plan"
    assert not any("shingle#" in ln for ln in lsh_join_lines), (
        "minhash_lsh_pairs verify must join candidates to shingle SETS, "
        f"not self-join the shingle table: {lsh_join_lines}"
    )
    # and the exact verify must be the JVM-side set intersection
    assert "array_intersect" in lsh_plan


def test_minhash_path_hashes_shingles_jvm_side(spark, docs):
    """Shingle hashing for signatures happens once, JVM-side (xxhash64) —
    the pandas UDF receives pre-hashed longs, not strings. The shingle-set
    stage is materialized via localCheckpoint (so its blocks are ContextCleaner-
    reclaimable, unlike a .cache entry), which cuts lineage — so the hashing
    is asserted on the pre-checkpoint stage plan and the checkpoint on the
    final plan."""
    from tersets_spark.dedup import _shingle_sets, minhash_lsh_pairs

    stage_plan = _optimized_plan(_shingle_sets(docs, 3, "doc_id", "text"))
    assert "xxhash64" in stage_plan

    final_plan = _optimized_plan(minhash_lsh_pairs(docs))
    assert "LogicalRDD" in final_plan  # checkpointed, not CacheManager-cached
    assert "xxhash64" not in final_plan  # hashing ran once, before checkpoint


def test_dedup_clusters_chain_converges_with_flat_lineage(spark):
    """A 25-node chain needs ~24 label-propagation rounds; with per-round
    localCheckpoint the final plan stays one join deep (an RDD scan), and
    the run completes in seconds instead of doubling work per round."""
    from pyspark.sql import functions as F

    from tersets_spark.dedup import dedup_clusters

    n = 25
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    t0 = time.monotonic()
    labels = dedup_clusters(pairs, max_iterations=40)
    rows = labels.collect()
    wall = time.monotonic() - t0
    assert {r["id"] for r in rows} == set(range(n))
    assert {r["cluster"] for r in rows} == {0}, "chain must collapse to min label"
    # lineage regression: the returned plan reads the checkpointed RDD, not a
    # 24-round join chain (which would also blow `wall` past minutes)
    plan = _optimized_plan(labels)
    assert "Join" not in plan
    assert wall < 120, f"chain CC took {wall:.0f}s — lineage blowup regression"

"""Tier writes are time-clustered: every committed parquet file holds
row groups whose bucket_ts/ts0 [min,max] ranges are non-overlapping, so a
range-serving scan's pushed min/max predicate prunes row groups instead of
reading the whole file. The fixture's ts0 is a multiplicative hash of the
row index (tables.py), i.e. the input arrives maximally time-scattered —
without the write-side sort the same files interleave buckets everywhere.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tersets_spark.catalog import TierCatalog, cluster_for_scan
from tersets_spark.jobs import run_cascade
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seq") / "seq.parquet")
    pq.write_table(generate_sequences(400, seed=11), path)
    return path


def _rowgroup_ranges(parquet_file: str, col: str) -> list[tuple[int, int]]:
    md = pq.ParquetFile(parquet_file).metadata
    idx = md.schema.to_arrow_schema().get_field_index(col)
    out = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx).statistics
        out.append((st.min, st.max))
    return out


def _assert_nonoverlapping(ranges: list[tuple[int, int]]) -> None:
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert lo_a <= hi_a and lo_b <= hi_b
        assert lo_b >= hi_a, f"row groups overlap: ({lo_a},{hi_a}) then ({lo_b},{hi_b})"


def test_cascade_tier_files_are_time_clustered(spark, seq_path, tmp_path):
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    old_page = hconf.get("parquet.page.size")
    # tiny row groups so small test files still get several of them
    hconf.set("parquet.block.size", "16384")
    hconf.set("parquet.page.size", "4096")
    try:
        out = str(tmp_path / "tiers")
        run_cascade(spark, seq_path, out)
    finally:
        for key, old in (("parquet.block.size", old_block), ("parquet.page.size", old_page)):
            if old is None:
                hconf.unset(key)
            else:
                hconf.set(key, old)

    checked_multi = 0
    for tier, col in (("raw", "ts0"), ("1m", "bucket_ts"), ("1h", "bucket_ts")):
        files = glob.glob(os.path.join(out, tier, "source=*", "run=*", "*.parquet"))
        assert files, f"no committed files for tier {tier}"
        for f in files:
            ranges = _rowgroup_ranges(f, col)
            _assert_nonoverlapping(ranges)
            if len(ranges) > 1:
                checked_multi += 1
    # the block-size squeeze must have produced real multi-row-group files,
    # otherwise the non-overlap assertion was vacuous
    assert checked_multi >= 5

    # and the committed data itself is unchanged by the sort
    cat = TierCatalog(out)
    total = cat.read_tier(spark, "1m").agg(F.sum("cnt")).head()[0]
    assert total == pq.read_table(seq_path, columns=["n_tok"])["n_tok"].to_pandas().sum()


def test_cluster_for_scan_passthrough_and_key_choice(spark):
    df = spark.range(4).select(F.col("id").alias("x"))
    assert cluster_for_scan(df) is df  # no time column: untouched
    # ts0 wins when both are present (raw tier semantics): rows in the
    # single partition come back ordered by ts0, not by bucket_ts
    ts = spark.createDataFrame(
        [(3, 0), (1, 2), (2, 1)], "ts0 int, bucket_ts int"
    ).coalesce(1)
    got = [r.ts0 for r in cluster_for_scan(ts).collect()]
    assert got == [1, 2, 3]


def test_raw_tier_writes_carry_docid_bloom_filter(spark, tmp_path):
    """tier_writer adds an adaptive parquet bloom filter on doc_id for the
    blob-carrying (raw) tier only. No metadata API exposes bloom offsets in
    this pyarrow, so detect behaviorally: identical deterministic data
    written with vs without the bloom option differs in size by the filter
    bytes for the raw shape, and not at all for a rollup shape."""
    from tersets_spark.catalog import tier_writer

    def _sz(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    raw = spark.range(20000).selectExpr(
        "concat('doc_', id) AS doc_id", "'s' AS source",
        "id AS ts0", "2 AS n_tok", "cast(concat('b', id) AS BINARY) AS blob",
    ).coalesce(1)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    tier_writer(raw).mode("overwrite").parquet(a)
    from tersets_spark.catalog import cluster_for_scan
    cluster_for_scan(raw).write.mode("overwrite").parquet(b)
    assert _sz(a) > _sz(b), "raw tier file must carry the doc_id bloom bytes"

    rollup = raw.drop("blob").withColumnRenamed("ts0", "bucket_ts")
    c, d = str(tmp_path / "c"), str(tmp_path / "d")
    tier_writer(rollup).mode("overwrite").parquet(c)
    cluster_for_scan(rollup).write.mode("overwrite").parquet(d)
    assert _sz(c) == _sz(d), "rollup tiers must not pay the bloom build"

"""Spark rollup cascade vs independent oracles (DuckDB SQL + scalar NumPy)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import duckdb

from tersets_spark import Method
from tersets_spark.kernels import bucket_rollup_pdf
from tersets_spark.rollup import TIERS, cascade, gap_fill, with_mean
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def tiny_table():
    return generate_sequences(200, seed=42)


def _scalar_rollup(pdf: pd.DataFrame, delta: int) -> pd.DataFrame:
    """Straight-line per-point oracle for the vectorized kernel."""
    rows = []
    for _, r in pdf.iterrows():
        toks = np.asarray(r["tokens"], dtype=np.int64)
        buckets: dict[int, list[int]] = {}
        for j, v in enumerate(toks):
            b = ((int(r["ts0"]) + j) // delta) * delta
            buckets.setdefault(b, []).append(int(v))
        for b, vals in sorted(buckets.items()):
            rows.append(
                {
                    "doc_id": r["doc_id"],
                    "source": r["source"],
                    "bucket_ts": b,
                    "cnt": len(vals),
                    "sum": sum(vals),
                    "vmin": min(vals),
                    "vmax": max(vals),
                    "first": vals[0],
                    "last": vals[-1],
                }
            )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("delta", [60, 3600, 86400, 7])
def test_bucket_rollup_kernel_matches_scalar_oracle(tiny_table, delta):
    pdf = tiny_table.to_pandas().head(50)
    got = (
        bucket_rollup_pdf(pdf, delta)
        .sort_values(["doc_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    exp = (
        _scalar_rollup(pdf, delta)
        .sort_values(["doc_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"cnt": "int64", "sum": "int64"}), exp.astype(got.dtypes.to_dict())
    )


def test_bucket_rollup_blocks_roundtrip(tiny_table):
    from tersets_spark import decompress

    pdf = tiny_table.to_pandas().head(10)
    out = bucket_rollup_pdf(pdf, 60, with_blocks=True, block_method=Method.DeltaOfDelta)
    for _, r in out.iterrows():
        vals = decompress(bytes(r["block"]))
        assert len(vals) == r["cnt"]
        assert int(vals.sum()) == r["sum"]
        assert int(vals[0]) == r["first"] and int(vals[-1]) == r["last"]


def test_rollup_emit_gorilla_blocks_batched_and_byte_identical(tiny_table):
    """1m per-bucket blocks with block_method=GorillaXOR must route through
    the batched multi-block encoder (not a per-bucket Python compress call)
    and stay byte-identical to the per-row codec — the fused Gorilla
    cascade's 1m stage depends on this."""
    from tersets_spark import codecs, decompress
    from tersets_spark.kernels import rollup_map_in_arrow

    batch = tiny_table.slice(0, 10).to_batches()[0]
    gen = rollup_map_in_arrow(60, with_blocks=True, block_method=Method.GorillaXOR)
    out = list(gen([batch]))[0].to_pandas()
    pdf = batch.to_pandas()
    by_doc = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64) for _, r in pdf.iterrows()}
    ts0 = {r["doc_id"]: int(r["ts0"]) for _, r in pdf.iterrows()}
    assert len(out) > 1
    for _, r in out.iterrows():
        blob = bytes(r["block"])
        vals = decompress(blob)
        assert len(vals) == r["cnt"] and int(vals.sum()) == r["sum"]
        toks = by_doc[r["doc_id"]]
        s = max(0, int(r["bucket_ts"]) - ts0[r["doc_id"]])
        seg = toks[s : s + int(r["cnt"])]
        assert blob == codecs.compress(
            seg.astype(np.float64), Method.GorillaXOR, 0.0
        ), "batched 1m Gorilla block must be byte-identical to the per-row codec"


def test_cascade_matches_duckdb_oracle(spark, tiny_table, tmp_path):
    path = str(tmp_path / "seq.parquet")
    import pyarrow.parquet as pq

    pq.write_table(tiny_table, path)
    seq = spark.read.parquet(path)
    tiers = cascade(seq)

    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW pts AS
        SELECT doc_id, source,
               ts0 + unnest(generate_series(0, n_tok - 1)) AS ts,
               unnest(tokens) AS v
        FROM read_parquet('{path}')
        """
    )
    for tier, delta in TIERS.items():
        got = (
            with_mean(tiers[tier])
            .orderBy("doc_id", "bucket_ts")
            .toPandas()
            .reset_index(drop=True)
        )
        exp = con.execute(
            f"""
            SELECT doc_id, source, (ts // {delta}) * {delta} AS bucket_ts,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(v) AS BIGINT) AS sum,
                   CAST(MIN(v) AS BIGINT) AS vmin,
                   CAST(MAX(v) AS BIGINT) AS vmax,
                   CAST(FIRST(v ORDER BY ts) AS BIGINT) AS first,
                   CAST(LAST(v ORDER BY ts) AS BIGINT) AS last,
                   CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean
            FROM pts GROUP BY 1,2,3 ORDER BY doc_id, bucket_ts
            """
        ).df()
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()), rtol=0, atol=0)


def test_gap_fill_locf_and_linear(spark):
    rows = [
        ("a", 0, 10.0),
        ("a", 60, 20.0),
        ("a", 240, 50.0),
        ("b", 120, 7.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    locf = (
        gap_fill(df, ["k"], "ts", 60, ["v"], strategy="locf")
        .orderBy("k", "ts")
        .collect()
    )
    a = [(r.ts, r.v, r.gap_filled) for r in locf if r.k == "a"]
    assert a == [
        (0, 10.0, False),
        (60, 20.0, False),
        (120, 20.0, True),
        (180, 20.0, True),
        (240, 50.0, False),
    ]
    lin = (
        gap_fill(df, ["k"], "ts", 60, ["v"], strategy="linear")
        .orderBy("k", "ts")
        .collect()
    )
    a = [(r.ts, r.v) for r in lin if r.k == "a"]
    assert a == [(0, 10.0), (60, 20.0), (120, 30.0), (180, 40.0), (240, 50.0)]
    b = [(r.ts, r.v) for r in lin if r.k == "b"]
    assert b == [(120, 7.0)]


def test_compress_udf_roundtrip_token_equality(spark, tiny_table, tmp_path):
    """Per-row invariant from input_hint: token-array equality (lossless)."""
    import pyarrow.parquet as pq

    from tersets_spark.kernels import compress_udf, decompress_tokens_udf

    path = str(tmp_path / "seq2.parquet")
    pq.write_table(tiny_table, path)
    seq = spark.read.parquet(path)
    for method in (
        Method.DeltaOfDelta,
        Method.GorillaXOR,
        Method.PoorMansCompressionMidrange,
        Method.PoorMansCompressionMean,
    ):
        blobbed = seq.select(
            "doc_id", "tokens", compress_udf(method, 0.0)("tokens").alias("blob")
        )
        from pyspark.sql import functions as F

        bad = blobbed.filter(
            decompress_tokens_udf(F.col("blob")) != F.col("tokens")
        ).count()
        assert bad == 0, f"token inequality for {method.name}"


def test_rollup_up_blocks_decode_to_child_sums(spark, tiny_table, tmp_path):
    """Upper-tier blocks: each 1h bucket's block decodes to EXACTLY the
    independently recomputed child 1m sum series (time order), and the
    default with_blocks=False output is unchanged by the feature."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from tersets_spark.kernels import decompress_udf
    from tersets_spark.rollup import rollup_raw, rollup_up

    tmp = str(tmp_path / "blocks_up_seq.parquet")
    pq.write_table(tiny_table, tmp)
    seq = spark.read.parquet(tmp)
    m1 = rollup_raw(seq, 60)

    plain = rollup_up(m1, 3600)
    blocked = rollup_up(m1, 3600, with_blocks=True)
    cols = ["doc_id", "source", "bucket_ts", "cnt", "sum", "vmin", "vmax", "first", "last"]
    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, blocked.select(*cols).collect())
    )

    # decoded block == independently recomputed child series per bucket
    got = {
        (r["doc_id"], r["bucket_ts"]): (r["n_child"], tuple(r["dec"]))
        for r in blocked.select(
            "doc_id", "bucket_ts", "n_child", decompress_udf(F.col("block")).alias("dec")
        ).collect()
    }
    child = (
        m1.withColumn("_h", (F.floor(F.col("bucket_ts") / 3600) * 3600).cast("long"))
        .groupBy("doc_id", "_h")
        .agg(F.sort_array(F.collect_list(F.struct("bucket_ts", "sum"))).alias("p"))
        .collect()
    )
    want = {
        (r["doc_id"], r["_h"]): tuple(float(x["sum"]) for x in r["p"]) for r in child
    }
    assert set(got) == set(want) and got
    for k, (n, dec) in got.items():
        assert n == len(want[k]) and dec == want[k]

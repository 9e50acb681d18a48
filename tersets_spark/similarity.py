"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the baseline (and the small-scale oracle);
random-hyperplane LSH bucketing is the scale path. Dot products run
JVM-side (``zip_with`` + ``aggregate``) so the hot path never crosses into
Python; only bucket assignment is a (vectorized) pandas UDF.

Scale notes (100 TB / 10^9+ vectors): brute force is a broadcast of the
probe set against a full scan — one pass, no shuffle, O(n*k) memory in the
top-k window per probe. The LSH path turns that full scan into bucket
joins: each probe only meets vectors sharing a sign-pattern bucket in one
of the hash tables, so cost scales with bucket occupancy. Recall is
measured explicitly (``ann_recall``) rather than assumed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from .dedup import cosine_expr


def knn_bruteforce(
    emb: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each probe id: broadcast probes x full scan.

    Output: (probe_id, rank, neighbor_id) — integers only, deterministic
    tie-break by neighbor id. Self-matches are excluded.
    """
    ids = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    probes = F.broadcast(
        emb.filter(F.col(id_col).isin(probe_ids)).select(
            F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec")
        )
    )
    scored = (
        ids.crossJoin(probes)
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_expr(F.col("pvec"), F.col("vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id")
    )


def det_planes(tables: int, planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic +-1 hyperplanes (Achlioptas-style sparse/sign random
    projections, JMLR 2003 — provably comparable to Gaussian planes for
    sign-LSH): sign(t,p,d) = +1 iff the first md5 nibble of
    "seed:t:p:d" < 8. md5 is engine-portable, so an independent SQL engine
    reconstructs the identical matrix — combined with integer-exact dots
    over QUANT_SCALE-quantized vectors this makes every bucket assignment
    reproducible bit-for-bit (the ann_lsh_recall oracle replays it)."""
    import hashlib

    signs = np.empty((tables, planes, dim), dtype=np.int64)
    for t in range(tables):
        for p in range(planes):
            for d in range(dim):
                h = hashlib.md5(f"{seed}:{t}:{p}:{d}".encode()).hexdigest()
                signs[t, p, d] = 1 if int(h[0], 16) < 8 else -1
    return signs


def _bucket_udf(tables: int, planes: int, dim: int, seed: int):
    all_planes = det_planes(tables, planes, dim, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def bucket(qvecs: pd.Series) -> pd.Series:
        # input: QUANT_SCALE-quantized int vectors -> exact integer dots
        mat = np.stack([np.asarray(v, dtype=np.int64) for v in qvecs])
        signs = np.einsum("tpd,nd->tnp", all_planes, mat) > 0
        weights = 1 << np.arange(planes, dtype=np.int64)
        buckets = (signs * weights).sum(axis=2)  # (tables, n)
        return pd.Series(
            [[int(t) << 32 | int(buckets[t, i]) for t in range(tables)] for i in range(mat.shape[0])]
        )

    return bucket


def knn_lsh(
    emb: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    planes: int = 8,
    tables: int = 8,
    dim: int = 64,
    seed: int = 0xA55,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: same output schema as brute force.

    Candidates = union over hash tables of same-bucket vectors; exact cosine
    re-rank of candidates only. Fewer planes -> bigger buckets -> higher
    recall and cost; measure with :func:`ann_recall`.
    """
    bucket = _bucket_udf(tables, planes, dim, seed)
    ids = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    banded = ids.select(
        "neighbor_id", F.explode(bucket(quantized_col(F.col("vec")))).alias("bucket")
    )
    probes = emb.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec")
    )
    probe_buckets = F.broadcast(
        probes.select("probe_id", F.explode(bucket(quantized_col(F.col("pvec")))).alias("bucket"))
    )
    candidates = (
        banded.join(probe_buckets, "bucket")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id")
        .distinct()
    )
    scored = (
        candidates.join(ids, "neighbor_id")
        .join(F.broadcast(probes), "probe_id")
        .select("probe_id", "neighbor_id", cosine_expr(F.col("pvec"), F.col("vec")).alias("cosine"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id")
    )


def ann_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """recall@k of the approximate result vs the exact top-k, per probe.

    Output: (probe_id, k, hits, recall_milli) — recall scaled x1000 as an
    exact integer.
    """
    e = exact.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("k"), F.collect_set("neighbor_id").alias("truth")
    )
    a = approx.groupBy("probe_id").agg(F.collect_set("neighbor_id").alias("found"))
    return (
        e.join(a, "probe_id", "left")
        .select(
            "probe_id",
            "k",
            F.size(F.array_intersect("truth", F.coalesce("found", F.array()))).cast("long").alias(
                "hits"
            ),
        )
        .withColumn("recall_milli", F.expr("(hits * 1000) DIV k"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + probed clusters
# ---------------------------------------------------------------------------

#: Quantization grid for the coarse quantizer: embeddings are snapped to
#: integers (floor(x * 4096 + 0.5)) before Lloyd iterations, so ALL k-means
#: state is exact int64 — sums are order-independent (Spark's aggregation
#: order no longer matters), reruns/resumes are bit-stable, and an
#: independent SQL engine reproduces the identical clustering (the
#: ann_ivf_recall DuckDB oracle replays the same integer arithmetic).
#: The candidate re-rank still uses the ORIGINAL float embeddings, so the
#: quantization only moves coarse-cluster boundaries by <2^-12.
QUANT_SCALE = 4096


def quantized_col(vec_col):
    """array<float> -> array<long> on the QUANT_SCALE grid, JVM-side.
    floor(x*scale + 0.5) (not round()) so Spark and SQL replicas share one
    well-defined half-rule across engines."""
    return F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") * F.lit(float(QUANT_SCALE)) + F.lit(0.5)).cast(
            "long"
        ),
    )


#: Training-sample predicate: keep a vector iff the first 4 hex digits of
#: md5(str(id)) compare lexicographically below this threshold. Lowercase
#: hex sorts identically to its numeric value ('0'<'9'<'a'<'f'), so the
#: string compare IS the numeric compare — and both Spark and DuckDB
#: evaluate the identical predicate, making the sampled Lloyd replayable
#: in pure SQL. "4000"/"10000" = keep ~25% of vectors. k-means practice
#: trains the coarse quantizer on a sample; shuffling every vector x dim
#: through five Lloyd iterations is the one cost that would dominate a
#: 10^9-vector index build for no recall benefit.
TRAIN_SAMPLE_HEX_LT = "4000"

#: Centroid-axis chunk for nearest-centroid assignment: per-batch scratch
#: is O(batch x chunk), never O(batch x n_centroids x dim) — at 4096
#: centroids the dense 3-D difference tensor would be ~21 GB per 10k-row
#: batch; chunked it is a few MB regardless of centroid count.
CENTROID_CHUNK = 256


def nearest_centroid(mat: np.ndarray, cents: np.ndarray, chunk: int = CENTROID_CHUNK) -> np.ndarray:
    """Exact-int64 nearest-centroid ids for each row of ``mat``, chunking
    the centroid axis so scratch memory is O(rows x chunk).

    Uses the integer identity ||x-c||^2 = x.x - 2 x.c + c.c — int64 matmul
    is exact (values bounded ~dim*(2*scale)^2 << 2^63), so distances are
    the same integers the dense difference tensor would produce. Ties break
    to the SMALLEST centroid id (strict < across chunks + first-argmin
    within a chunk == global first occurrence, matching np.argmin and the
    SQL oracle's ORDER BY dist, cluster)."""
    mat = np.ascontiguousarray(mat, dtype=np.int64)
    cents = np.ascontiguousarray(cents, dtype=np.int64)
    xx = (mat * mat).sum(axis=1)
    best_d = None
    best_i = None
    for c0 in range(0, len(cents), chunk):
        cc = cents[c0 : c0 + chunk]
        d = xx[:, None] - 2 * (mat @ cc.T) + (cc * cc).sum(axis=1)[None, :]
        i = d.argmin(axis=1)
        dm = np.take_along_axis(d, i[:, None], axis=1).ravel()
        if best_d is None:
            best_d, best_i = dm, i + c0
        else:
            better = dm < best_d
            best_d = np.where(better, dm, best_d)
            best_i = np.where(better, i + c0, best_i)
    return best_i.astype(np.int64)


def train_sample_filter(id_col, hex_lt: str = TRAIN_SAMPLE_HEX_LT):
    """Deterministic hash-sample predicate on the id column, engine-portable
    (same md5-hex string compare in Spark and DuckDB)."""
    return F.substring(F.md5(id_col.cast("string")), 1, 4) < hex_lt


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_hex_lt: str | None = TRAIN_SAMPLE_HEX_LT,
) -> np.ndarray:
    """Deterministic INTEGER-EXACT coarse quantizer; returns quantized
    centroids as int64 (n_centroids x dim).

    Trains on a deterministic md5 hash SAMPLE of the vectors
    (``sample_hex_lt``, ~25% by default; None = all) — a 10^9-vector index
    must not shuffle every vector x dim through every Lloyd iteration, and
    the sample predicate is replayed verbatim by the SQL oracle so results
    stay hash-matched. Init = the quantized SAMPLED vectors with the
    ``n_centroids`` smallest ids (deterministic, seed-free). Each Lloyd
    iteration assigns every sampled vector to its nearest centroid
    (vectorized pandas UDF, exact int64 distances via
    :func:`nearest_centroid`, ties to the smallest cluster id) and
    recomputes centroids JVM-side (posexplode + groupBy(cluster, dim) sum
    over LONGS — exact, shuffle-order-independent). New centroid element =
    round-half-up of the mean, computed as floor((2*s + n) / (2*n)) in
    exact integer arithmetic. Empty clusters keep their previous centroid.
    """
    q = emb.select(F.col(id_col).alias("vid"), quantized_col(F.col(vec_col)).alias("qvec"))
    if sample_hex_lt is not None:
        q = q.filter(train_sample_filter(F.col("vid"), sample_hex_lt))
    init_rows = q.orderBy("vid").limit(n_centroids).select("qvec").collect()
    if len(init_rows) < n_centroids:
        raise ValueError(
            f"training sample has {len(init_rows)} vectors < n_centroids={n_centroids}; "
            "widen sample_hex_lt"
        )
    centroids = np.stack([np.asarray(r[0], dtype=np.int64) for r in init_rows])

    for _ in range(iterations):
        assign = _assign_udf(centroids)
        assigned = q.select(F.col("qvec").alias("vec"), assign(F.col("qvec")).alias("cluster"))
        sums = (
            assigned.select("cluster", F.posexplode("vec").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = centroids.copy()
        for r in sums:
            s, n = int(r.s), int(r.n)
            new[r.cluster, r.dim] = (2 * s + n) // (2 * n)  # floor: exact round-half-up
        centroids = new  # absent (cluster, dim) rows = empty cluster: unchanged
    return centroids


def _assign_udf(centroids: np.ndarray):
    cents = np.asarray(centroids, dtype=np.int64)  # closure copy ships with the UDF

    @F.pandas_udf(LongType())
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.int64) for v in vecs])
        # chunked exact assignment: memory O(batch x CENTROID_CHUNK), not
        # O(batch x n_centroids x dim); same integers, same tie-break
        return pd.Series(nearest_centroid(mat, cents))

    return assign


def knn_ivf(
    emb: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_hex_lt: str | None = TRAIN_SAMPLE_HEX_LT,
) -> DataFrame:
    """IVF ANN: assign vectors to coarse clusters, search the ``n_probe``
    nearest clusters per probe, exact cosine re-rank. Same output schema as
    :func:`knn_bruteforce`.

    Scale: training runs on a deterministic hash sample, the index
    assignment is one map pass with O(batch x CENTROID_CHUNK) scratch, and
    a query touches n_probe/n_centroids of the data — the classic IVF trade
    measured by :func:`ann_recall`.
    """
    centroids = train_ivf_centroids(
        emb, n_centroids, iterations, id_col, vec_col, sample_hex_lt=sample_hex_lt
    )
    assign = _assign_udf(centroids)
    indexed = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        assign(quantized_col(F.col(vec_col))).alias("cluster"),
    )
    probes = emb.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pvec"),
        quantized_col(F.col(vec_col)).alias("qpvec"),
    )
    # n_probe nearest clusters per probe, computed driver-side (tiny);
    # exact int64 distances, stable sort so ties go to the smaller cluster.
    probe_rows = probes.collect()
    probe_clusters = []
    for r in probe_rows:
        v = np.asarray(r.qpvec, dtype=np.int64)
        d = ((centroids - v) ** 2).sum(axis=1)
        for c in np.argsort(d, kind="stable")[:n_probe]:
            probe_clusters.append((r.probe_id, int(c)))
    probes = probes.drop("qpvec")
    pc = F.broadcast(
        probes.sparkSession.createDataFrame(probe_clusters, "probe_id long, cluster long")
    )
    candidates = (
        indexed.join(pc, "cluster")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id", "vec")
        .distinct()
    )
    scored = candidates.join(F.broadcast(probes), "probe_id").select(
        "probe_id", "neighbor_id", cosine_expr(F.col("pvec"), F.col("vec")).alias("cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id")
    )

"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.

Spark-first design: everything that CAN be a DataFrame op is one (shingling
via posexplode + window lead, candidate generation via band-bucket joins,
exact verification via explode-join-agg). The only Python is Arrow-vectorized
NumPy inside pandas UDFs (MinHash signatures, SimHash bits).

Scale notes (100 TB):

* exact dedup is a hash groupBy on a 16-byte key — one shuffle, partial
  aggregation map-side;
* brute-force Jaccard (``jaccard_pairs``) shuffles the exploded shingle
  table and is quadratic within a shingle bucket; it is the small-scale
  ORACLE. The scale path is ``minhash_lsh_pairs``: LSH bands bound each
  join bucket to near-duplicates only, so the pair join touches
  O(duplicates) rows, not O(n^2);
* SimHash reduces each doc to one int64; candidate pairs join on 16-bit
  band keys (4 bands -> any pair within Hamming distance 3 shares >= 1 band
  by pigeonhole — exhaustive, not probabilistic);
* embedding near-dup joins on LSH sign-buckets of the normalized vectors;
  the brute-force variant is the oracle at test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from .textops import fingerprint_md5, ws_tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per normalized-text fingerprint.

    Output: (fingerprint, keep_id = min id, n_copies). Scale: single shuffle
    on the md5 key with map-side partial aggregation.
    """
    return (
        df.select(F.col(id_col).alias("id"), fingerprint_md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# shingling + exact n-gram Jaccard (the oracle path)
# ---------------------------------------------------------------------------


def shingle_table(df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word k-shingles per document, fully JVM-side.

    posexplode + window lead keeps the plan in whole-stage codegen; output is
    (id, shingle) distinct.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    return (
        toks.select("id", F.concat_ws(" ", *parts).alias("shingle"), parts[-1].alias("_last"))
        .filter(F.col("_last").isNotNull())
        .select("id", "shingle")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold (exact, brute force).

    Output: (id_a, id_b, n_inter, n_a, n_b) with id_a < id_b — integer
    columns only, so the result is engine-independent. Intended as the
    small-scale oracle; use minhash_lsh_pairs at scale.
    """
    # localCheckpoint, not .cache(): materialized once for the self-join's
    # two sides + sizes, and the blocks are ContextCleaner-reclaimable when
    # the result is dropped (a CacheManager entry would live app-lifetime)
    sh = shingle_table(df, k, id_col, text_col).localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .filter(
            F.col("n_inter")
            >= F.lit(threshold) * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .select("id_a", "id_b", "n_inter", "n_a", "n_b")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)
_MINHASH_SEED = 0x5EED_1DEA


def _perm_coeffs(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_MINHASH_SEED)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    """FNV-1a 64-bit over utf-8 shingle bytes — vectorized column-Horner.

    All strings are joined into ONE byte buffer, scattered into a
    transposed padded matrix with a single fancy assignment, and the byte
    loop runs column-by-column (max string length iterations of whole-batch
    NumPy ops), never per byte OR per string in Python. Strings are
    processed in descending-length order so each column's still-active set
    is a contiguous prefix slice (no per-column index arrays). Output is
    bit-identical to the scalar FNV-1a recurrence, which the DuckDB oracle
    reproduces in SQL (HUGEINT mod-2^64 arithmetic).
    """
    n = len(shingles)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    encoded = [s.encode("utf-8") for s in shingles]
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    width = max(int(lens.max()), 1)
    order = np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)  # original order
    total = int(lens_s.sum())
    mat_t = np.zeros((width, n), dtype=np.uint8)
    if total:
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        bounds = np.zeros(n, dtype=np.int64)
        np.cumsum(lens_s[:-1], out=bounds[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(bounds, lens_s)
        src = np.repeat(starts[order], lens_s) + within
        mat_t[within, np.repeat(np.arange(n, dtype=np.int64), lens_s)] = flat[src]
    out_s = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    asc = lens_s[::-1]  # ascending view for the prefix-count searchsorted
    for j in range(width):
        k = n - int(np.searchsorted(asc, j, side="right"))
        if k == 0:
            break
        # (h ^ byte) * prime, mod 2^64 via uint64 wraparound
        out_s[:k] = (out_s[:k] ^ mat_t[j, :k]) * _FNV_PRIME
    out = np.empty(n, dtype=np.uint64)
    out[order] = out_s
    return out


def _signature_from_hashes(hashes: np.ndarray, num_perm: int) -> np.ndarray:
    """MinHash signature from 64-bit shingle hashes: min over shingles of
    (a*h + b) mod 2^61-1 per permutation (products wrap mod 2^64 first —
    deterministic, engine-wide)."""
    a, b = _perm_coeffs(num_perm)
    if hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.int64).max, dtype=np.int64)
    prod = (a[:, None] * hashes[None, :] + b[:, None]) % _MERSENNE
    return prod.min(axis=1).astype(np.int64)


def minhash_signature(shingles: list[str], num_perm: int = 128) -> np.ndarray:
    """MinHash signature over FNV-hashed shingle strings (driver-side and
    test entry point; the Spark path hashes JVM-side instead, see
    :func:`minhash_udf`)."""
    return _signature_from_hashes(_hash_shingles(shingles).astype(np.uint64), num_perm)


def minhash_udf(num_perm: int = 128):
    """Signature UDF over PRE-HASHED shingles (array<long> from JVM-side
    ``xxhash64``) — no string hashing in Python at all; the pandas UDF only
    runs the (P, S) permuted-min matrix op per document."""

    @F.pandas_udf(ArrayType(LongType()))
    def _minhash(hash_lists: pd.Series) -> pd.Series:
        out = []
        for hs in hash_lists:
            if hs is None or len(hs) == 0:
                out.append(
                    np.full(num_perm, np.iinfo(np.int64).max, dtype=np.int64).tolist()
                )
                continue
            hashes = np.asarray(hs, dtype=np.int64).view(np.uint64)
            out.append(_signature_from_hashes(hashes, num_perm).tolist())
        return pd.Series(out)

    return _minhash


def _shingle_sets(df: DataFrame, k: int, id_col: str, text_col: str) -> DataFrame:
    """One groupBy collects BOTH the distinct shingle strings (for the exact
    per-candidate verify) and their JVM-side xxhash64 (for signatures):
    each shingle is hashed exactly once, inside whole-stage codegen
    (plan-shape regression: tests/test_dedup_scale.py)."""
    sh = shingle_table(df, k, id_col, text_col)
    return sh.groupBy("id").agg(
        F.collect_list("shingle").alias("shingles"),
        F.collect_list(F.xxhash64("shingle")).alias("hashes"),
    )


def band_buckets(sig, bands: int, rows_per_band: int):
    """Array of per-band bucket hashes for a MinHash signature column —
    the ONE banding expression shared by the batch LSH and the streamed
    incremental index, so their candidate conditions are provably the
    same (JVM ``hash`` over each signature slice)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.hash(F.slice(sig, b * rows_per_band + 1, rows_per_band)),
    )


def verify_candidate_pairs(
    candidates: DataFrame, shingle_sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of a skinny (id_a, id_b) candidate list.

    Joins each side's collected shingle set and intersects JVM-side
    (``array_intersect``); work is O(sum of candidate-pair shingle sizes),
    never a shingle-keyed self-join. Emitted pairs carry no approximation.
    """
    sets_a = shingle_sets.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sets_b = shingle_sets.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_inter"),
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
        )
        .filter(
            F.col("n_inter")
            >= F.lit(threshold) * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via shingle -> MinHash -> banded LSH -> exact verify.

    Candidate pairs share at least one band bucket (detect prob for J=0.8
    with 32 bands x 4 rows: 1-(1-0.8^4)^32 ~ 1-5e-8); every candidate is
    then verified with the EXACT shingle Jaccard, so emitted pairs carry no
    approximation — LSH only bounds the join. Same output schema as
    ``jaccard_pairs``.
    """
    rows_per_band = num_perm // bands
    # localCheckpoint (not .cache): materialized once for the three uses
    # below, and the blocks are reclaimed by the ContextCleaner when the
    # returned plan becomes unreachable — a CacheManager entry from
    # .cache() would accumulate for the application lifetime across
    # repeated calls in a long-lived session.
    shingle_sets = _shingle_sets(df, k, id_col, text_col).localCheckpoint(eager=True)
    sigs = shingle_sets.select(
        "id", minhash_udf(num_perm)(F.col("hashes")).alias("sig")
    )
    banded = sigs.select(
        "id",
        F.posexplode(band_buckets(F.col("sig"), bands, rows_per_band)).alias(
            "band", "bucket"
        ),
    )
    candidates = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # Exact verification of candidates ONLY — never the all-co-shingled-
    # pairs self-join of ``jaccard_pairs``, so the scale path stays
    # sub-quadratic end to end.
    return verify_candidate_pairs(candidates, shingle_sets, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_one(tokens) -> int:
    """Scalar-reference SimHash for one document (kept as the differential
    anchor for the batched UDF; tests pin batch == per-doc bitwise)."""
    if tokens is None or len(tokens) == 0:
        return 0
    hashes = _hash_shingles(list(tokens))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    # distinct powers of two, so sum == bitwise OR
    word = (((votes > 0).astype(np.uint64)) << np.arange(64, dtype=np.uint64)).sum(
        dtype=np.uint64
    )
    return int(word.astype(np.int64))


def _simhash_batch(token_lists: pd.Series) -> pd.Series:
    """Whole-batch SimHash: ONE column-Horner FNV pass over every token of
    every doc, then 64 bit-plane passes with per-doc ``np.add.reduceat``
    vote sums. Bit-identical to the per-doc reference (:func:`_simhash_one`)
    — votes are exact integer sums, so grouping is order-independent. Each
    bit-plane pass touches ~8 bytes/token, keeping the working set
    cache-resident rather than materializing an n_tokens x 64 matrix."""
    docs = [list(t) if t is not None else [] for t in token_lists]
    lens = np.fromiter((len(d) for d in docs), dtype=np.int64, count=len(docs))
    out = np.zeros(len(docs), dtype=np.int64)
    nz = np.flatnonzero(lens > 0)
    if nz.size:
        hashes = _hash_shingles([tok for i in nz for tok in docs[i]])
        nzlens = lens[nz]
        starts = np.zeros(nz.size, dtype=np.int64)
        np.cumsum(nzlens[:-1], out=starts[1:])
        words = np.zeros(nz.size, dtype=np.uint64)
        one = np.uint64(1)
        for b in range(64):
            bit = ((hashes >> np.uint64(b)) & one).astype(np.int64)
            votes = 2 * np.add.reduceat(bit, starts) - nzlens
            words |= (votes > 0).astype(np.uint64) << np.uint64(b)
        out[nz] = words.astype(np.int64)
    return pd.Series(out)


@F.pandas_udf(LongType())
def simhash_udf(token_lists: pd.Series) -> pd.Series:
    """64-bit SimHash over FNV-hashed tokens (sign of per-bit vote sums).

    FNV-1a is kept here DELIBERATELY (vs the MinHash path's JVM xxhash64):
    it is reproducible in portable SQL, so the DuckDB oracle recomputes the
    exact same simhash words (HUGEINT mod-2^64 arithmetic) and the pair
    output is hash-checked end to end. Batching: :func:`_simhash_batch`.
    """
    return _simhash_batch(token_lists)


def simhash_pairs(
    df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of 64-bit SimHash.

    Banding: split the hash into max_hamming+1 16-bit chunks — any pair
    within the distance budget agrees on >= 1 chunk (pigeonhole), so the
    candidate join is exhaustive. Distance check is JVM-side bit_count(xor).
    """
    hashes = df.select(
        F.col(id_col).alias("id"), simhash_udf(ws_tokens(F.col(text_col))).alias("sim")
    )
    n_bands = max_hamming + 1
    width = 64 // n_bands
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("sim"), b * width).bitwiseAND(F.lit((1 << width) - 1))
            for b in range(n_bands)
        ]
    )
    banded = hashes.select("id", "sim", F.posexplode(chunks).alias("band", "chunk"))
    return (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "chunk"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.expr("bit_count(x.sim ^ y.sim)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine_expr(a, b):
    """JVM-side cosine similarity of two array<float|double> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def embedding_near_dup(
    df: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Brute-force cosine near-dup pairs (id_a < id_b). Oracle path —
    quadratic; at scale use :func:`embedding_near_dup_lsh`."""
    left = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    right = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        left.crossJoin(right)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_expr(F.col("va"), F.col("vb")) >= threshold)
        .select("id_a", "id_b")
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    planes: int = 12,
    tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 0x51AB5,
) -> DataFrame:
    """Random-hyperplane LSH blocking + exact cosine verify (scale path).

    Vectors sharing a sign-pattern bucket in ANY of ``tables`` tables become
    candidates; candidates are verified with the exact cosine. Bucket joins
    replace the O(n^2) cross join with O(sum of bucket^2).
    """
    rng = np.random.default_rng(seed)
    all_planes = rng.standard_normal((tables, planes, dim)).astype(np.float64)

    @F.pandas_udf(ArrayType(LongType()))
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = []
        signs = np.einsum("tpd,nd->tnp", all_planes, mat) > 0
        weights = 1 << np.arange(planes, dtype=np.int64)
        buckets = (signs * weights).sum(axis=2)  # (tables, n)
        for i in range(mat.shape[0]):
            out.append([int(t) << 32 | int(buckets[t, i]) for t in range(tables)])
        return pd.Series(out)

    ids = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    banded = ids.select("id", F.explode(bucket_udf(F.col("vec"))).alias("bucket"))
    candidates = (
        banded.alias("x")
        .join(banded.alias("y"), "bucket")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    verified = (
        candidates.join(ids.withColumnRenamed("id", "id_a").withColumnRenamed("vec", "va"), "id_a")
        .join(ids.withColumnRenamed("id", "id_b").withColumnRenamed("vec", "vb"), "id_b")
        .filter(cosine_expr(F.col("va"), F.col("vb")) >= threshold)
        .select("id_a", "id_b")
    )
    return verified


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def dedup_clusters(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster) labels.

    Iterative min-label propagation: every node starts labeled with its own
    id; each round, a node adopts the minimum label among itself and its
    neighbors; convergence when no label changes. Rounds needed = graph
    diameter — near-dup components are tiny (pairs of near-identical docs),
    so this converges in 2-3 rounds; ``max_iterations`` bounds pathological
    chains. Output keeps only nodes that appear in some pair (singletons are
    trivially their own cluster).

    Scale: each round is one shuffle join on the edge list — the standard
    large-scale CC shape (a Spark-native stand-in for GraphX/GraphFrames).
    The canonical "keep one per cluster" policy is then: keep id == cluster.

    Each round's labels are ``localCheckpoint``-ed (eager), so the plan stays
    ONE join deep regardless of iteration count — without it the lineage
    doubles per round and every convergence ``count()`` re-executes the whole
    chain (quadratic work, and a driver stack hazard past ~15 rounds). On a
    cluster where executor loss matters, swap ``localCheckpoint`` for a
    reliable ``checkpoint()`` directory — same plan shape.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round; reclaimable after
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster").alias("nmin"))
        )
        # Materialize once per round: the changed-count and the next round's
        # labels both read the checkpointed blocks, not the join lineage.
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("cluster"), F.coalesce("nmin", F.col("cluster"))).alias(
                    "new_cluster"
                ),
                "cluster",
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_cluster") != F.col("cluster")).count()
        labels = updated.select("id", F.col("new_cluster").alias("cluster"))
        if changed == 0:
            break
    return labels

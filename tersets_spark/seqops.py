"""Sequence-level training-data operators over the primary table
(doc_id, tokens: array<int32>, n_tok, source) — the ops a pretraining
pipeline runs on pre-tokenized corpora (north_star input_hint), all
JVM-side (no Python in any plan here).

* :func:`exact_seq_dedup_stats` — exact duplicate SEQUENCES (token-array
  equality) per source, via a canonical digest, never a shuffle of the
  raw token payload.
* :func:`repetition_stats` — repetition/diversity quality metrics: the
  max same-token run is computed with a single JVM ``aggregate`` fold
  over the array (struct state), not posexplode + window — O(n) per row,
  zero shuffle, zero Python.
* :func:`ngram_contamination` — benchmark decontamination: flag sequences
  sharing any token ``n``-gram with a held-out source, gram join against
  the broadcast benchmark gram set.
* :func:`sequence_offsets` — global concat-stream offset per document via
  a TWO-LEVEL prefix sum (per-bucket totals + intra-bucket window), so no
  single window partition ever sees more than ``bucket_docs`` rows.
* :func:`pack_sequences` — GPT-style context packing: concatenate all
  documents in a deterministic total order (optional EOS separator after
  each) and chunk the stream into fixed ``ctx``-token training blocks.
* :func:`token_stats` — per-source token-frequency/vocab stats (top-k by
  count), the tokenizer-audit pass of a pretraining pipeline.

Scale notes (10^12 sequences): dedup groups by a 16-byte digest + length
(the token arrays themselves never shuffle); repetition metrics are
map-only; contamination joins grams against a broadcast benchmark set —
if the benchmark outgrows broadcast, the same plan works as a shuffled
semi-join on the gram digest. Packing never materializes a global window:
offsets come from the two-level prefix sum (bucket totals are ~rows /
bucket_docs — recurse the same trick if even THAT outgrows one window
partition), and each document is routed straight to the <= 1 + cost/ctx
blocks it overlaps, so the only big shuffle is the unavoidable one that
carries each token to its output block. token_stats shuffles at most
(vocab x sources) rows per map partition thanks to partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def _seq_digest(tokens: Column) -> Column:
    """Canonical 128-bit digest of a token array: md5 of the comma-joined
    decimal rendering. Engine-portable (DuckDB renders the same string),
    and 16 bytes shuffle instead of the token payload. Collisions are
    2^-64-scale; an exact verify join can be added where that matters."""
    return F.md5(F.concat_ws(",", tokens.cast("array<string>")))


def exact_seq_dedup_stats(seq: DataFrame) -> DataFrame:
    """Per-source exact-duplicate-sequence stats.

    Output: (source, docs, distinct_seqs, dup_docs) — dup_docs = rows whose
    token array equals an earlier row's. Two-stage: group by (source,
    digest, n_tok) then combine — the wide token column is dropped before
    the shuffle."""
    groups = (
        seq.select("source", F.col("n_tok"), _seq_digest(F.col("tokens")).alias("dig"))
        .groupBy("source", "dig", "n_tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return groups.groupBy("source").agg(
        F.sum("n").cast("long").alias("docs"),
        F.count(F.lit(1)).cast("long").alias("distinct_seqs"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("dup_docs"),
    )


def max_run_col(tokens: Column) -> Column:
    """Longest run of one repeated token, as a single JVM ``aggregate``
    fold: state = (prev_token, current_run, best_run). O(n) per row inside
    codegen — the posexplode+window formulation would shuffle every token."""
    init = F.struct(
        F.lit(None).cast("int").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(tokens, init, step, lambda acc: acc["best"])


def repetition_stats(seq: DataFrame, run_threshold: int = 16) -> DataFrame:
    """Per-source repetition/diversity metrics (exact integers only).

    Output: (source, docs, sum_n_tok, sum_distinct, max_run,
    repetitive_docs) — repetitive_docs counts sequences whose longest
    same-token run reaches ``run_threshold`` (boilerplate/looping text in
    token space). Diversity ratio = sum_distinct / sum_n_tok is left to the
    reader so the row stays integer-exact."""
    per_doc = seq.select(
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct"),
        max_run_col(F.col("tokens")).alias("max_run"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("n_tok").cast("long").alias("sum_n_tok"),
        F.sum("n_distinct").cast("long").alias("sum_distinct"),
        F.max("max_run").cast("long").alias("max_run"),
        F.sum((F.col("max_run") >= run_threshold).cast("long")).cast("long").alias(
            "repetitive_docs"
        ),
    )


def ngram_contamination(
    seq: DataFrame, benchmark_source: str, n: int = 13
) -> DataFrame:
    """Benchmark decontamination sweep: per source, how many sequences share
    at least one token ``n``-gram with ``benchmark_source`` (the held-out
    set). The standard pretraining hygiene check (13-gram overlap).

    Plan: grams are built JVM-side (transform over an index sequence →
    slice), the benchmark's distinct gram set is broadcast, and candidates
    are counted with a semi-join — no Python, one small shuffle for the
    final per-source count."""
    # Guarded: sequence(1, 0) in Spark DESCENDS to [1, 0] and slice with
    # start 0 is a runtime error, so docs shorter than n get an explicit
    # empty gram list (they cannot contain a full n-gram).
    grams = F.when(
        F.col("n_tok") >= n,
        F.transform(
            F.sequence(F.lit(1), F.col("n_tok") - n + 1),
            lambda i: F.slice(F.col("tokens"), i, n),
        ),
    ).otherwise(F.array().cast("array<array<int>>"))
    with_grams = seq.select("doc_id", "source", F.explode(grams).alias("gram"))
    bench = F.broadcast(
        with_grams.filter(F.col("source") == benchmark_source).select("gram").distinct()
    )
    contaminated = (
        with_grams.filter(F.col("source") != benchmark_source)
        .join(bench, "gram", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    totals = seq.filter(F.col("source") != benchmark_source).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs")
    )
    hits = contaminated.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("contaminated_docs")
    )
    return (
        totals.join(hits, "source", "left")
        .select(
            "source",
            "docs",
            F.coalesce("contaminated_docs", F.lit(0)).cast("long").alias("contaminated_docs"),
        )
    )


def default_order_key() -> Column:
    """Deterministic total-order key: the trailing digits of ``doc_id``
    (the tables' ids are ``doc_%012d``). Callers with other id shapes pass
    their own integer ``order_key`` — packing only needs SOME total order,
    and at ingest scale a monotone row id always exists."""
    # try_cast: a doc_id with no trailing digits extracts '' -> NULL (not an
    # opaque ANSI cast error), which sequence_offsets turns into a clear
    # fail-fast raise_error.
    return F.regexp_extract(F.col("doc_id"), r"(\d+)$", 1).try_cast("long")


#: Dense-key acceptance slack: the fast path is taken when the key range
#: (max-min+1) is at most this multiple of the row count. Density bounds
#: the bucket-offset broadcast at slack * rows / bucket_docs entries (with
#: unique keys a bucket never EXCEEDS bucket_docs rows either way — the
#: sparse-key failure mode is too MANY near-empty buckets, not fat ones).
DENSE_KEY_SLACK = 8


def _densify_keys(df: DataFrame) -> DataFrame:
    """Replace ``_so_key`` with its 0-based global rank, scalably — the
    sparse-key pre-pass: hash-shaped keys would shatter the DIV-bucketing
    into ~one bucket per row, making the bucket-offset broadcast
    data-sized.

    Same two-level trick, one level up: range-repartition the (narrow,
    unique) key column, rank within each range partition, and add the
    exclusive prefix of per-partition counts. The keyed projection is
    localCheckpoint-ed so the count job and the rank window see the SAME
    sampled range boundaries (two executions of repartitionByRange may
    sample different splits); only the 8-byte key column is materialized,
    never the token payload. Ranks join back on the unique key — one
    equi-join shuffle. Rank VALUES are deterministic (global order of
    unique keys) regardless of where the sampled boundaries land."""
    spark = df.sparkSession
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    keys = (
        df.select("_so_key")
        .repartitionByRange(n_parts, "_so_key")
        .withColumn("_so_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # Duplicate keys would make the rank join below emit each duplicated
    # document once PER occurrence (k ranks x k rows = k^2), silently
    # multiplying tokens in the packed corpus — fail fast instead. Exact
    # per-partition distinct sums to the global distinct because
    # repartitionByRange co-locates equal keys.
    agg = keys.groupBy("_so_pid").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("_so_key").alias("nd"),
    )
    rows = agg.collect()
    dup = sum(r["n"] - r["nd"] for r in rows)
    if dup:
        raise ValueError(
            f"sequence_offsets: order_key has {dup} duplicate value(s); "
            "keys must be a total order (unique per document)"
        )
    counts = {r["_so_pid"]: r["n"] for r in rows}
    offs, acc = {}, 0
    for pid in range(n_parts):
        offs[pid] = acc
        acc += counts.get(pid, 0)
    off_expr = F.element_at(
        F.array(*[F.lit(offs[p]) for p in range(n_parts)]), F.col("_so_pid") + 1
    )
    w = Window.partitionBy("_so_pid").orderBy("_so_key")
    ranks = keys.select(
        "_so_key",
        (F.row_number().over(w) - 1 + off_expr).cast("long").alias("_so_rank"),
    )
    return (
        df.join(ranks, "_so_key")
        .drop("_so_key")
        .withColumnRenamed("_so_rank", "_so_key")
    )


def sequence_offsets(
    seq: DataFrame,
    cost: Column,
    order_key: Column | None = None,
    bucket_docs: int = 65536,
    dense_keys: bool | None = None,
) -> DataFrame:
    """Exclusive running sum of ``cost`` over documents in ``order_key``
    order, as ``pack_start`` (long) — i.e. each document's first position
    in the virtual concatenated token stream.

    A naive ``sum().over(Window.orderBy(key))`` funnels the whole table
    through ONE window partition; instead:

    1. bucket ``order_key`` into ranges of ``bucket_docs`` documents,
    2. aggregate per-bucket cost totals (tiny: rows/bucket_docs),
    3. exclusive-prefix those totals with a window over the buckets,
    4. broadcast-join the bucket offsets back and add an intra-bucket
       exclusive running sum (each window partition is <= bucket_docs
       rows, independent of table size).

    All arithmetic is exact long-integer; no Python anywhere. A NULL
    ``order_key`` raises at runtime: a null key would silently fall out of
    the bucket equi-join (dropping the doc AND shifting every later
    offset), so it fails fast instead.

    Keys must be UNIQUE (they are a total order). ``dense_keys``: the
    DIV-bucketing in step 1 assumes keys are roughly dense — hash-shaped
    keys would make the bucket-offset broadcast data-sized. ``None``
    (default) probes min/max/count (one cheap agg over the key column) and
    takes the fast path iff the key range is within ``DENSE_KEY_SLACK`` x
    the row count; otherwise a :func:`_densify_keys` rank pre-pass
    converts keys to 0-based positions first (ingest-generated monotone
    row ids always take the fast path). ``True``/``False`` forces.

    Output contract: the input columns plus ``pack_start`` — internal
    working columns are dropped (and prefixed ``_so_`` so a caller column
    named e.g. ``_cost`` is never clobbered).
    """
    key = order_key if order_key is not None else default_order_key()
    key = F.when(key.isNotNull(), key).otherwise(
        F.raise_error(
            "sequence_offsets: NULL order_key (default key needs doc_id "
            "with trailing digits; pass order_key= for other id shapes)"
        )
    )
    df = seq.withColumn("_so_key", key).withColumn("_so_cost", cost.cast("long"))
    if not isinstance(df.schema["_so_key"].dataType, NumericType):
        # Non-numeric keys (e.g. md5-hex shuffle keys, opaque string ids):
        # any orderable type ranks fine in _densify_keys, but the dense-path
        # probe/DIV below needs integers — always take the rank pre-pass.
        if dense_keys:
            raise ValueError("dense_keys=True requires an integer order_key")
        dense_keys = False
    if dense_keys is None:
        stats = df.agg(
            F.min("_so_key").alias("lo"),
            F.max("_so_key").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).head()
        dense_keys = stats.n == 0 or (
            stats.hi - stats.lo + 1 <= DENSE_KEY_SLACK * stats.n
        )
    if not dense_keys:
        df = _densify_keys(df)
    df = df.withColumn("_so_bucket", F.expr(f"_so_key DIV {int(bucket_docs)}"))
    btot = df.groupBy("_so_bucket").agg(F.sum("_so_cost").alias("_so_btot"))
    wb = Window.orderBy("_so_bucket").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "_so_bucket",
        F.coalesce(F.sum("_so_btot").over(wb), F.lit(0)).cast("long").alias("_so_boff"),
    )
    wi = (
        Window.partitionBy("_so_bucket")
        .orderBy("_so_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.join(F.broadcast(boff), "_so_bucket")
        .withColumn(
            "_so_ioff", F.coalesce(F.sum("_so_cost").over(wi), F.lit(0)).cast("long")
        )
        .withColumn("pack_start", (F.col("_so_boff") + F.col("_so_ioff")).cast("long"))
        .drop("_so_bucket", "_so_key", "_so_boff", "_so_ioff", "_so_cost")
    )


def pack_sequences(
    seq: DataFrame,
    ctx: int = 2048,
    sep_token: int | None = None,
    order_key: Column | None = None,
    bucket_docs: int = 65536,
    dense_keys: bool | None = None,
) -> DataFrame:
    """Concat-and-chunk context packing: the documents are laid out
    back-to-back in ``order_key`` order (with ``sep_token`` appended after
    each document when given) and the stream is cut into fixed ``ctx``-token
    blocks — the standard way pretraining corpora are packed into training
    examples with zero padding.

    Output: (block_id: long, tokens: array<int>, n_tokens: long,
    n_docs: long, n_starts: long) — every block has exactly ``ctx`` tokens
    except possibly the last; ``n_starts`` counts documents whose first
    token lands in the block (attention-mask boundary info).

    Plan: offsets via :func:`sequence_offsets`; each document explodes to
    only the blocks it overlaps (<= 1 + cost/ctx rows — proportional to
    OUTPUT size, never n^2), carrying the JVM-sliced piece of its token
    array; blocks reassemble with a hash groupBy collecting (position,
    piece) structs, sorted and flattened JVM-side. The sole big shuffle
    carries each token once, to its output block.
    """
    cost = (F.col("n_tok").cast("long") + (1 if sep_token is not None else 0)).alias("c")
    off = sequence_offsets(seq, cost, order_key, bucket_docs, dense_keys)
    toks = (
        F.concat(F.col("tokens"), F.array(F.lit(int(sep_token)).cast("int")))
        if sep_token is not None
        else F.col("tokens")
    )
    off = off.select(
        F.col("pack_start"),
        toks.alias("_toks"),
        cost.cast("long").alias("_cost"),  # recomputed: offsets drop internals
    ).filter(F.col("_cost") > 0)
    first_b = F.expr(f"pack_start DIV {int(ctx)}")
    last_b = F.expr(f"(pack_start + _cost - 1) DIV {int(ctx)}")
    spans = off.select(
        "pack_start",
        "_toks",
        "_cost",
        F.explode(F.sequence(first_b, last_b)).alias("block_id"),
    )
    lo = F.greatest(F.col("block_id") * ctx, F.col("pack_start"))
    hi = F.least((F.col("block_id") + 1) * ctx, F.col("pack_start") + F.col("_cost"))
    piece = F.slice(
        F.col("_toks"),
        (lo - F.col("pack_start") + 1).cast("int"),
        (hi - lo).cast("int"),
    )
    starts_here = (F.col("block_id") == F.expr(f"pack_start DIV {int(ctx)}")).cast("long")
    contrib = spans.select(
        "block_id",
        lo.alias("_lo"),
        piece.alias("_piece"),
        starts_here.alias("_starts"),
    )
    assembled = F.flatten(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_lo").alias("lo"), F.col("_piece").alias("p")))
            ),
            lambda s: s["p"],
        )
    )
    return contrib.groupBy("block_id").agg(
        assembled.alias("tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_starts").cast("long").alias("n_starts"),
    ).withColumn("n_tokens", F.size("tokens").cast("long"))


def token_stats(seq: DataFrame, top_k: int = 10) -> DataFrame:
    """Per-source token-frequency leaderboard: the ``top_k`` most frequent
    token ids per source with exact counts and a dense rank (ties broken by
    lower token id, so the row set is deterministic).

    Output: (source, rank, token, cnt, source_tokens, source_vocab) —
    ``source_tokens``/``source_vocab`` are the source's total token count
    and distinct-token count, replicated per row for one-query audits.

    Plan: explode + two hash aggregations. The explode streams inside
    whole-stage codegen; partial (map-side) aggregation bounds the shuffle
    at (distinct tokens x sources) rows per map partition regardless of
    corpus size. The windowed rank runs over per-source groups that are at
    most vocab-sized."""
    freq = (
        seq.select("source", F.explode("tokens").alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    totals = freq.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("source_tokens"),
        F.count(F.lit(1)).cast("long").alias("source_vocab"),
    )
    wr = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        freq.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= top_k)
        .join(F.broadcast(totals), "source")
        .select("source", "rank", "token", "cnt", "source_tokens", "source_vocab")
    )


# ---------------------------------------------------------------------------
# deterministic split assignment + sketch-served length gating
# ---------------------------------------------------------------------------

#: hex digits of md5 used for split thresholds (32 bits of headroom:
#: fraction granularity 2^-32, far finer than any split spec).
SPLIT_HEX_DIGITS = 8


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str | None]]:
    """(split, upper-threshold-hex) pairs from ordered fractions.

    Thresholds are cumulative fractions scaled to 16^SPLIT_HEX_DIGITS and
    formatted as lowercase hex — lowercase hex sorts numerically, so a
    plain string compare against the md5 prefix IS the numeric compare in
    Spark and DuckDB alike. The LAST split carries no threshold (it is the
    CASE else-branch): a full-range threshold would need one more digit
    than the md5 prefix and break the string compare."""
    if not fractions or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must be non-empty and sum to 1")
    names = list(fractions)
    out: list[tuple[str, str | None]] = []
    cum = 0.0
    scale = 16 ** SPLIT_HEX_DIGITS
    for name in names[:-1]:
        cum += fractions[name]
        scaled = round(cum * scale)
        if scaled >= scale:
            # Cumulative fraction rounds to 1.0 (e.g. {"a": 1.0, "b": 0.0}):
            # every remaining prefix belongs to this split. A 9-hex-digit
            # threshold would sort BELOW most 8-digit prefixes ('1' < '2'..'f')
            # and silently misassign; 'g' sorts after every hex digit, so
            # `prefix < 'g'` is always true in Spark and DuckDB alike.
            out.append((name, "g"))
        else:
            out.append((name, format(scaled, f"0{SPLIT_HEX_DIGITS}x")))
    out.append((names[-1], None))
    return out


def split_assign(
    seq: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: one pure-JVM CASE over the
    first SPLIT_HEX_DIGITS hex digits of ``md5(salt || ':' || id)``.

    Properties a pretraining pipeline needs: (a) stable — a document's
    split never changes across runs, machines, or engines (md5 + string
    compare are engine-portable, so the SQL oracle replays it verbatim);
    (b) salt-keyed — a new salt draws an independent assignment;
    (c) map-only — no shuffle, no sampling state, whole-stage codegen.
    Adds a ``split`` string column."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    hexpfx = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        1, SPLIT_HEX_DIGITS,
    )
    pairs = split_thresholds(fractions)
    expr = F.lit(pairs[-1][0])
    for name, thr in reversed(pairs[:-1]):
        expr = F.when(hexpfx < thr, name).otherwise(expr)
    return seq.withColumn("split", expr)


def span_digests(
    tokens: Column, n_tok: Column, span: int, sel_hex_digits: int = 1
) -> Column:
    """Content-defined selected window digests of a token array.

    Every length-``span`` token window gets an md5 digest of its
    comma-joined decimal rendering (the :func:`_seq_digest` canonical
    form applied to the window); a window is SELECTED iff the first
    ``sel_hex_digits`` hex digits of its digest are all ``'0'`` —
    probability ``16^-sel_hex_digits``, decided by CONTENT alone.
    ``sel_hex_digits=0`` selects every window (exact mode).

    Content-defined selection is the property that makes sampled span
    dedup sound: two identical windows hash identically, so they are
    either BOTH selected or BOTH skipped regardless of which documents
    or offsets they sit at — a duplicated window pair survives sampling
    with probability ``16^-d``, not ``16^-2d``, and no alignment between
    the two copies is ever needed (the same reason winnowing/CDC anchors
    chunk boundaries on content, not position).

    Docs shorter than ``span`` contribute no windows (explicit empty
    array: ``sequence(1, 0)`` would DESCEND, same guard as
    :func:`ngram_contamination`)."""
    if sel_hex_digits < 0 or sel_hex_digits > 8:
        raise ValueError("sel_hex_digits must be in [0, 8]")
    digs = F.when(
        n_tok >= span,
        F.transform(
            F.sequence(F.lit(1), n_tok.cast("int") - span + 1),
            lambda i: F.md5(
                F.concat_ws(",", F.slice(tokens, i, span).cast("array<string>"))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    if sel_hex_digits == 0:
        return digs
    prefix = "0" * sel_hex_digits
    return F.filter(
        digs, lambda d: F.substring(d, 1, sel_hex_digits) == F.lit(prefix)
    )


def span_dedup_stats(
    seq: DataFrame, span: int = 16, sel_hex_digits: int = 1
) -> DataFrame:
    """Repeated-substring (span-level) duplication audit — the
    within-and-across-document dedup signal of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (ACL 2022), re-expressed
    as a content-defined-sampled window fingerprint sweep instead of a
    suffix array.

    A *duplicated window* is a length-``span`` token window whose exact
    content appears at >= 2 positions corpus-wide (across documents OR
    repeated inside one — boilerplate headers and degenerate loops both
    show up here and both matter for training). Windows are fingerprinted
    and sampled content-defined (:func:`span_digests`), so a duplicated
    pair is detected iff its shared digest is selected — one Bernoulli
    draw per distinct content, never per occurrence.

    Output per source: (source, docs, windows, sel_windows, dup_windows,
    span_dup_docs) — ``windows`` counts every position (``max(n_tok -
    span + 1, 0)`` summed), ``sel_windows``/``dup_windows`` count selected
    positions / selected positions whose digest repeats, ``span_dup_docs``
    counts documents containing at least one such repeat.

    Plan shape (the 10^12-sequence story): the md5-per-window pass is
    map-only inside whole-stage codegen — O(corpus tokens) digests, no
    shuffle, embarrassingly parallel; only the SELECTED ``16^-d`` fraction
    explodes, so the one digest shuffle (a count window over tiny
    per-digest groups) carries ``16^-d`` of the corpus positions at 16
    bytes each, never a token payload. At 100 TB you raise
    ``sel_hex_digits`` (each step costs 16x detection odds per distinct
    duplicated content but duplicated TRAINING data repeats many times,
    so high-multiplicity content is still caught with near-certainty:
    miss probability ``(1 - 16^-d)`` per DISTINCT content, once)."""
    base = seq.select(
        "doc_id",
        "source",
        F.greatest(F.col("n_tok").cast("long") - (span - 1), F.lit(0).cast("long")).alias(
            "wins"
        ),
        span_digests(F.col("tokens"), F.col("n_tok"), span, sel_hex_digits).alias(
            "digs"
        ),
    )
    sel = base.select("doc_id", "source", F.explode("digs").alias("dig"))
    flagged = sel.withColumn(
        "npos", F.count(F.lit(1)).over(Window.partitionBy("dig"))
    )
    per_doc = flagged.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sel_w"),
        F.sum((F.col("npos") >= 2).cast("long")).cast("long").alias("dup_w"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.sum("sel_w").cast("long").alias("sel_windows"),
        F.sum("dup_w").cast("long").alias("dup_windows"),
        F.sum((F.col("dup_w") > 0).cast("long")).cast("long").alias("span_dup_docs"),
    )
    totals = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("wins").cast("long").alias("windows"),
    )
    return totals.join(per_src, "source", "left").select(
        "source",
        "docs",
        "windows",
        F.coalesce("sel_windows", F.lit(0)).cast("long").alias("sel_windows"),
        F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
        F.coalesce("span_dup_docs", F.lit(0)).cast("long").alias("span_dup_docs"),
    )


def source_divergence(seq: DataFrame) -> DataFrame:
    """Per-source token-distribution drift vs the whole corpus, as an
    EXACT total-variation distance — the distribution-shift audit a
    data-mixing pipeline runs per source/shard before reweighting.

    TV(source s, corpus) = 1/2 * sum_t |c_st/N_s - C_t/N| over the corpus
    vocabulary. Computed rationally: the summed numerator
    ``sum_t |c_st*N - C_t*N_s|`` is an exact integer (decimal(38,0) /
    HUGEINT — no float ever enters the sum, so aggregation order cannot
    perturb it), and the two output floats are single exactly-rounded
    conversions of exact integers (``tv_num``) plus one multiply chain and
    one division evaluated identically in Spark and the DuckDB oracle —
    the same bit-determinism argument as hll.py's estimate.

    Output: (source, docs, toks, vocab, corpus_toks, tv_num, tv_dist)
    with ``tv_dist = tv_num / (2*N_s*N)`` in [0, 1].

    Plan shape: explode + partial-aggregated groupBy bounds the only
    corpus-sized stage's shuffle at (vocab x sources) rows per map
    partition (token_stats' argument); the per-source x corpus-vocab grid
    is vocab x |sources| rows built by cross-joining the BROADCAST
    per-source totals against the corpus frequency table — absent
    (source, token) cells must still contribute ``C_t * N_s``, so the
    grid, not the sparse freq table, drives the sum."""
    freq = (
        seq.select("source", F.explode("tokens").alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    corpus = freq.groupBy("token").agg(F.sum("c").cast("long").alias("ct"))
    ns = freq.groupBy("source").agg(
        F.sum("c").cast("long").alias("toks"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    docs = seq.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("docs"))
    total = corpus.agg(F.sum("ct").cast("long").alias("corpus_toks"))
    dim = ns.join(docs, "source").crossJoin(F.broadcast(total))
    grid = corpus.crossJoin(F.broadcast(dim))
    dec = "decimal(38,0)"
    term = F.abs(
        F.coalesce(F.col("c"), F.lit(0)).cast(dec) * F.col("corpus_toks").cast(dec)
        - F.col("ct").cast(dec) * F.col("toks").cast(dec)
    )
    summed = (
        grid.join(freq, ["source", "token"], "left")
        .groupBy("source", "docs", "toks", "vocab", "corpus_toks")
        .agg(F.sum(term).alias("tv_num_exact"))
    )
    return summed.select(
        "source",
        "docs",
        "toks",
        "vocab",
        "corpus_toks",
        F.col("tv_num_exact").cast("double").alias("tv_num"),
        (
            F.col("tv_num_exact").cast("double")
            / (
                F.lit(2.0)
                * F.col("toks").cast("double")
                * F.col("corpus_toks").cast("double")
            )
        ).alias("tv_dist"),
    )


def length_gate_by_sketch(
    seq: DataFrame, pct: int = 99, keys: tuple[str, ...] = ("source",)
) -> DataFrame:
    """Length-outlier gate whose threshold is served by the HDR sketch —
    the consumer side of the sketch tiers applied to curation: per-key
    p``pct`` document length comes from a bounded log-bucket sketch of
    ``n_tok`` (one hash aggregate + one window over <= 32*2^5 rows/key),
    NOT from sorting or windowing the corpus; the per-key thresholds
    broadcast back and each document is gated map-side.

    Output per key: (keys..., p_est, kept_docs, dropped_docs, kept_tokens,
    dropped_tokens). Integer-exact end to end (bit-length buckets + count
    compare), so a SQL oracle replays the threshold AND the gate."""
    from .sketch import percentiles, sketch

    ks = list(keys)
    thr = percentiles(sketch(seq, ks, "n_tok"), ks, [pct]).select(
        *ks, F.col("estimate").alias("p_est")
    )
    kept = F.col("n_tok").cast("long") <= F.col("p_est")
    return (
        seq.join(F.broadcast(thr), ks)
        .groupBy(*ks, "p_est")
        .agg(
            F.sum(kept.cast("long")).alias("kept_docs"),
            F.sum((~kept).cast("long")).alias("dropped_docs"),
            F.sum(F.when(kept, F.col("n_tok").cast("long")).otherwise(F.lit(0))).alias("kept_tokens"),
            F.sum(F.when(~kept, F.col("n_tok").cast("long")).otherwise(F.lit(0))).alias("dropped_tokens"),
        )
    )


#: Remix gate scale: the md5 prefix compared is 12 hex digits (48 bits),
#: so thresholds live in [0, 16^12] — the keep-fraction resolution (same
#: role as SPLIT_HEX_DIGITS for splits).
REMIX_SCALE = 16 ** 12


def remix_thresholds(
    source_tokens: dict[str, int], weights: dict[str, int]
) -> dict[str, int]:
    """Per-source integer gate thresholds realizing target mixture weights
    WITHOUT upsampling: scale the whole corpus down to the largest total at
    which every source can supply its target share from the data it has.

    With ``t_s`` = tokens in source s and integer weight ``w_s``, the
    binding source m minimizes ``t_s / w_s`` (exact fraction compare,
    source-name tie-break); source s keeps ``w_s * t_m / w_m`` tokens in
    expectation, i.e. threshold ``floor(w_s * t_m * 16^12 / (w_m * t_s))``
    out of 16^12. Pure integer arithmetic at every step, so Spark, the
    DuckDB oracle, and this Python replica agree bit-for-bit (the binding
    source's threshold is exactly 16^12 = keep everything).
    """
    missing = [s for s in source_tokens if s not in weights]
    if missing:
        raise ValueError(f"remix weights missing sources: {missing}")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("remix weights must be positive integers")
    # exact argmin of t_s / w_s via cross-multiplied integer compare,
    # source-name tie-break (no float ratio ever enters the decision)
    m = next(iter(sorted(source_tokens)))
    for s in sorted(source_tokens):
        if (
            source_tokens[s] * weights[m] < source_tokens[m] * weights[s]
            or (
                source_tokens[s] * weights[m] == source_tokens[m] * weights[s]
                and s < m
            )
        ):
            m = s
    return {
        s: (weights[s] * source_tokens[m] * REMIX_SCALE)
        // (weights[m] * source_tokens[s])
        for s in source_tokens
    }


def remix_gate_hex(thr: int) -> str:
    """Threshold -> the string the md5 12-hex prefix is compared against.
    ``'g'`` sorts after every hex digit in Spark and DuckDB alike, so a
    full-range threshold (>= 16^12) keeps everything — the same sentinel
    split_thresholds uses."""
    return "g" if thr >= REMIX_SCALE else format(thr, "012x")


def remix_sources(
    seq: DataFrame,
    weights: dict[str, int],
    salt: str = "remix-v1",
) -> DataFrame:
    """Deterministic source re-mixing (importance resampling to target
    mixture weights) — the data-mixing step a pretraining pipeline runs
    after curation: given integer target weights per source, keep a
    deterministic md5-gated subset so kept token mass is proportional to
    the weights, downsampling only (the binding source is kept whole).

    Map-only after one tiny per-source token-count aggregate (collected:
    |sources| rows, never data-sized): thresholds are exact integers
    (:func:`remix_thresholds`), the gate is a pure-JVM CASE over the md5
    hex prefix (stable across runs/engines, salt-keyed — split_assign's
    idiom), so the full pipeline replays in SQL.

    Output per source: (source, target_w, thr_hex, docs_kept, tokens_kept).
    Sources whose gate keeps zero documents drop from the output (both
    engines agree: empty groups don't exist).
    """
    counts = {
        r["source"]: int(r["t"])
        for r in seq.groupBy("source")
        .agg(F.sum(F.col("n_tok").cast("long")).alias("t"))
        .collect()
    }
    thrs = remix_thresholds(counts, weights)
    hexpfx = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 12
    )
    thr_expr = F.lit(None).cast("string")
    w_expr = F.lit(None).cast("long")
    for s in sorted(thrs):
        thr_expr = F.when(F.col("source") == s, F.lit(remix_gate_hex(thrs[s]))).otherwise(thr_expr)
        w_expr = F.when(F.col("source") == s, F.lit(int(weights[s]))).otherwise(w_expr)
    return (
        seq.withColumn("_thr", thr_expr)
        .withColumn("_w", w_expr)
        .where(hexpfx < F.col("_thr"))
        .groupBy("source")
        .agg(
            F.first("_w").alias("target_w"),
            F.first("_thr").alias("thr_hex"),
            F.count(F.lit(1)).cast("long").alias("docs_kept"),
            F.sum(F.col("n_tok").cast("long")).alias("tokens_kept"),
        )
    )


def shard_assign(
    seq: DataFrame,
    n_shards: int = 64,
    salt: str = "shard-v1",
    bucket_docs: int = 65536,
) -> DataFrame:
    """Deterministic global shuffle + token-balanced contiguous shard
    assignment — the writer side of a training data loader: documents are
    ordered by a salted md5 key (an engine-portable permutation; re-salt
    for an independent epoch order), then cut into ``n_shards`` contiguous
    shards of near-equal TOKEN mass (each shard's excess over the ideal
    ``total/n`` is bounded by one document).

    shard = ``(pack_start * n_shards) DIV total_tokens`` where
    ``pack_start`` is the exclusive token prefix-sum in key order — the
    same scalable two-level prefix machinery as context packing
    (:func:`sequence_offsets`; the md5 key is a string, so it takes the
    rank pre-pass — no global window, no driver loop). All arithmetic is
    exact long integers; fails fast if ``total_tokens * n_shards``
    approaches 2^63 (switch the multiply to decimal(38,0) when a corpus
    actually gets there).

    Output: the input columns + ``shard`` (long in [0, n_shards)).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    total = seq.agg(F.sum(F.col("n_tok").cast("long"))).head()[0]
    if not total:
        raise ValueError("shard_assign: empty input")
    if total * n_shards >= 2**63:
        raise ValueError(
            f"shard_assign: total_tokens({total}) * n_shards({n_shards}) "
            "overflows long arithmetic"
        )
    key = F.concat(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))),
        F.lit("|"),
        F.col("doc_id").cast("string"),
    )
    df = sequence_offsets(
        seq, F.col("n_tok"), order_key=key, bucket_docs=bucket_docs
    )
    return df.withColumn(
        "shard", F.expr(f"(pack_start * {int(n_shards)}) DIV {int(total)}")
    ).drop("pack_start")


def upsample_plan(
    source_tokens: dict[str, int], weights: dict[str, int], total: int | None = None
) -> dict[str, tuple[int, int]]:
    """Per-source (whole_copies, fractional_threshold) realizing target
    mixture weights WITH upsampling — the epoch-style mixing plan
    (high-quality sources repeated >1x) where :func:`remix_thresholds`
    only downsamples.

    Source s should contribute ``w_s / sum(w) * total`` tokens (``total``
    defaults to the corpus size, i.e. re-mix in place). With ``t_s``
    actual tokens that is a replication RATE ``r_s = w_s*total /
    (sum(w)*t_s)``, realized as ``floor(r_s)`` whole copies of every
    document plus one md5-gated extra copy at the fractional remainder:

        k_s   = (w_s*total) // (sum(w)*t_s)
        thr_s = ((w_s*total) mod (sum(w)*t_s)) * 16^12 // (sum(w)*t_s)

    Pure integers throughout (Python bigints here, HUGEINT in the oracle),
    so the plan replays bit-for-bit in SQL; thr < 16^12 always (the
    remainder is a strict fraction), so no 'g' sentinel is needed.
    """
    missing = [s for s in source_tokens if s not in weights]
    if missing:
        raise ValueError(f"upsample weights missing sources: {missing}")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("upsample weights must be positive integers")
    wsum = sum(weights[s] for s in source_tokens)
    if total is None:
        total = sum(source_tokens.values())
    plan: dict[str, tuple[int, int]] = {}
    for s, t in source_tokens.items():
        num = weights[s] * total
        den = wsum * t
        plan[s] = (num // den, (num % den) * REMIX_SCALE // den)
    return plan


def upsample_mix(
    seq: DataFrame,
    weights: dict[str, int],
    salt: str = "upmix-v1",
    total: int | None = None,
) -> DataFrame:
    """Deterministic epoch-weighted mixing WITH upsampling: adds a
    ``copies`` column (long >= 0) — how many times this document appears
    in the mixed corpus so each source's expected token mass is
    proportional to its target weight (:func:`upsample_plan`).

    Map-only after one tiny per-source count aggregate: copies =
    whole-copies CASE + one md5-prefix gate for the fractional remainder
    (split_assign's idiom — stable across runs, salts draw independent
    remainders). Callers materialize the replication with
    ``F.explode(F.sequence(1, copies))`` filtered to copies >= 1, keeping
    the explode adjacent to the consumer so no shuffle ever carries
    replicated token payloads.
    """
    counts = {
        r["source"]: int(r["t"])
        for r in seq.groupBy("source")
        .agg(F.sum(F.col("n_tok").cast("long")).alias("t"))
        .collect()
    }
    plan = upsample_plan(counts, weights, total)
    hexpfx = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))), 1, 12
    )
    k_expr = F.lit(None).cast("long")
    thr_expr = F.lit(None).cast("string")
    for s in sorted(plan):
        k, thr = plan[s]
        k_expr = F.when(F.col("source") == s, F.lit(k)).otherwise(k_expr)
        thr_expr = F.when(
            F.col("source") == s, F.lit(format(thr, "012x"))
        ).otherwise(thr_expr)
    return seq.withColumn(
        "copies",
        (k_expr + (hexpfx < thr_expr).cast("long")).cast("long"),
    )


def windowed_token_topk(
    seq: DataFrame, k: int = 5, bucket_seconds: int = 3600
) -> DataFrame:
    """Per-window heavy hitters: the ``k`` most frequent token ids for each
    (source, event-time bucket) — "trending tokens per hour", the windowed
    twin of :func:`token_stats`'s corpus-lifetime leaderboard and the exact
    companion to the CMS frequency tiers (cms.py estimates any token's
    count in a window; this materializes the window's top of the table).

    Event time follows the engine's token-per-second model (token at
    position p of a doc carries ts0 + p, the same clock the sketch tiers
    and rollups use), so the windows line up with the cascade's buckets.

    Determinism: rank orders by (cnt DESC, token ASC) — a total order, so
    the returned row set is reproducible and oracle-hashable.

    Output: (source, bucket_ts, rank, token, cnt, bucket_tokens) with
    rank in [1, k]; ``bucket_tokens`` is the window's total token count
    (the denominator for share-of-window analyses).

    Scale: posexplode streams inside whole-stage codegen; map-side partial
    aggregation bounds the shuffle at (sources x windows x batch-local
    vocab) rows per map task regardless of corpus size, and the rank
    window runs over per-(source, window) groups that are at most
    vocab-sized. The window total rides the SAME (source, window)
    partitioning as the rank window (an unbounded-frame sum, not a
    groupBy+join — one explode pass, one exchange, no recompute of the
    count subtree). Pure JVM end to end.
    """
    b = int(bucket_seconds)
    pts = seq.select(
        "source", "ts0", F.posexplode("tokens").alias("pos", "token")
    ).select(
        "source",
        (F.floor((F.col("ts0") + F.col("pos")) / b) * b).cast("long").alias("bucket_ts"),
        "token",
    )
    freq = pts.groupBy("source", "bucket_ts", "token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wp = Window.partitionBy("source", "bucket_ts")
    wr = wp.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        freq.select(
            "source",
            "bucket_ts",
            F.row_number().over(wr).cast("long").alias("rank"),
            F.col("token").cast("long").alias("token"),
            "cnt",
            F.sum("cnt").over(wp).cast("long").alias("bucket_tokens"),
        )
        .filter(F.col("rank") <= int(k))
        .select(
            "source", "bucket_ts", "rank", "token", "cnt", "bucket_tokens"
        )
    )


def token_distribution_drift(
    seq: DataFrame,
    bucket_seconds: int = 86400,
    materialize_counts: bool = True,
) -> DataFrame:
    """Corpus DRIFT monitor: total-variation distance between the token
    distributions of consecutive time windows, per source — "did what this
    source feeds the training mix change since yesterday?". TV distance is
    the standard distribution-shift alarm (0 = identical mix, 1 = disjoint
    vocabularies); KL needs logs whose libm rounding differs across engines,
    so TV is the one drift metric an oracle can replay bit-exactly.

    Integer-exact formulation: for windows with token counts c1 (total n1)
    and c2 (total n2),

        TV = 1/2 * sum_t |c1_t/n1 - c2_t/n2|
           = sum_t |c1_t*n2 - c2_t*n1|  /  (2*n1*n2)

    — the numerator and denominator are exact int64 (counts x window totals;
    tokens present in only one window contribute |c*n| via the full outer
    join), and the single final division is bit-stable.

    "Consecutive" means adjacent EXISTING windows of the source (sparse
    sources compare across their gap, like :func:`~tersets_spark.rollup.
    counter_rate` does for elapsed time). Event time follows the engine's
    token-per-second clock, so windows line up with the cascade's buckets.

    Output: one row per (source, adjacent window pair):
    (source, prev_ts, bucket_ts, n_prev, n_cur, tv_num, tv) where
    tv = tv_num / (2*n_prev*n_cur).

    Scale: raw tokens are exploded and shuffled exactly ONCE into the
    bounded (source, window, token) count table, which is then MATERIALIZED
    (``localCheckpoint`` when ``materialize_counts``; counts are bounded by
    sources x windows x vocab — always orders of magnitude below the token
    payload) so the two sides of each pair read it instead of re-running
    the explode. The pairwise full outer join is folded into a SIGNED
    UNION: the prev side contributes +c1*n2, the cur side -c2*n1, one hash
    aggregation on (source, pair, token) sums them — tokens present on one
    side only keep their whole term, and the plan is union + hash agg (one
    exchange over 2x counts) instead of a sort-merge outer join. Pure JVM
    end to end.
    """
    b = int(bucket_seconds)
    counts = (
        seq.select(
            "source", "ts0", F.posexplode("tokens").alias("pos", "token")
        )
        .select(
            "source",
            (F.floor((F.col("ts0") + F.col("pos")) / b) * b)
            .cast("long")
            .alias("bucket_ts"),
            "token",
        )
        .groupBy("source", "bucket_ts", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    if materialize_counts:
        counts = counts.localCheckpoint()
    totals = counts.groupBy("source", "bucket_ts").agg(
        F.sum("cnt").cast("long").alias("n")
    )
    w = Window.partitionBy("source").orderBy("bucket_ts")
    pairs = totals.select(
        "source",
        F.lag("bucket_ts").over(w).alias("prev_ts"),
        F.col("bucket_ts"),
        F.lag("n").over(w).alias("n_prev"),
        F.col("n").alias("n_cur"),
    ).where(F.col("prev_ts").isNotNull())
    prev_side = (
        counts.withColumnRenamed("bucket_ts", "prev_ts")
        .join(F.broadcast(pairs), ["source", "prev_ts"])
        .select(
            "source", "bucket_ts", "token",
            (F.col("cnt") * F.col("n_cur")).alias("s"),
        )
    )
    cur_side = counts.join(
        F.broadcast(pairs.select("source", "bucket_ts", "n_prev")),
        ["source", "bucket_ts"],
    ).select(
        "source", "bucket_ts", "token",
        (-F.col("cnt") * F.col("n_prev")).alias("s"),
    )
    agg = (
        prev_side.unionByName(cur_side)
        .groupBy("source", "bucket_ts", "token")
        .agg(F.sum("s").cast("long").alias("d"))
        .groupBy("source", "bucket_ts")
        .agg(F.sum(F.abs(F.col("d"))).cast("long").alias("tv_num"))
    )
    return agg.join(F.broadcast(pairs), ["source", "bucket_ts"]).select(
        "source",
        "prev_ts",
        "bucket_ts",
        "n_prev",
        "n_cur",
        "tv_num",
        (
            F.col("tv_num")
            / (F.lit(2) * F.col("n_prev") * F.col("n_cur")).cast("double")
        ).alias("tv"),
    )

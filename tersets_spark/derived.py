"""Materialized RECORDING RULES over the committed tier catalog.

Prometheus recording rules / TimescaleDB continuous aggregates on an
EXPRESSION: a derived table (``drv_<rule>``) precomputed from the 1h
serving tier, committed through the same manifest machinery as every
other tier (immutable runs, per-partition commits, snapshot reads), and
kept fresh INCREMENTALLY — a late-data ingest touches O(|batch|) keys,
so the refresh recomputes exactly the derived rows those keys can
influence, never the corpus.

Two built-in rules cover the two dependency classes a derived metric
can have:

* ``rate_1h`` — per-source counter rate over 1h bucket TOTALS (PromQL
  ``rate()`` recorded per series). A bucket's rate depends on its
  PREDECESSOR bucket of the same series: sequential-within-series
  coupling, so the refresh unit is the affected SOURCE (recomputing a
  source's series is O(buckets-per-source) collapsed rows — serving
  scale, not corpus scale).
* ``group_1h`` — label-grouped totals via a source→group dim
  (rollup.group_aggregate; PromQL ``sum by (team)`` recorded). A group
  row depends on ALL the group's sources in ONE bucket: cross-series
  but bucket-local coupling, so the refresh unit is the touched
  (group, bucket) CELL — recompute reads the 1h tier at the touched
  buckets only (pushed IN predicate over time-clustered runs).

Freshness bookkeeping rides the manifest: every materialize/refresh
appends a path-less ``status="derived_refresh"`` record carrying the
upstream manifest snapshot it is consistent with (path-less records are
invisible to readers by construction — ``current_run_lists`` only
consults records with a ``path``). A refresh classifies the 1h commits
since that watermark:

* ``append`` commits (late-data ingest, streamed finalize) → the
  incremental path: the delta run dirs themselves name the touched
  (source, bucket) keys; nothing else is read to FIND the work.
* ``compact`` commits → content-identical by contract; ignored.
* anything else (retention, delete/rebuild, full-partition replace) →
  content changed in ways appends don't describe; the affected
  partitions are re-derived whole (still bounded to those partitions,
  and still bitwise the from-scratch answer).

Every partition rewrite commits through ``record_if_current`` against
the run captured when the old rows were read — a concurrent writer
landing first wins and the refresh abandons that partition (the
compaction/maintenance idiom), reporting it for a retry.

No reference counterpart: TerseTS has no query engine. Public analogs:
Prometheus recording rules, TimescaleDB continuous aggregates,
Materialize/dbt incremental models.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TierCatalog, tier_writer

#: rules → the key column their derived rows are partitioned/read by
DERIVED_RULES = {"rate_1h": "source", "group_1h": "grp", "alert_1h": "source"}

#: refresh coupling class per rule: "series" (a row depends on other
#: buckets of the SAME series — rate's predecessor, alert's islands) →
#: refresh re-derives affected sources' series; "cell" (a row depends
#: only on its own bucket across series) → refresh recomputes touched
#: cells and splices
RULE_COUPLING = {"rate_1h": "series", "group_1h": "cell", "alert_1h": "series"}

#: canonical column order per rule (partitioned reads append the key
#: column last; read_derived restores this order)
DERIVED_COLUMNS = {
    "rate_1h": ["source", "bucket_ts", "value", "delta", "increase",
                "elapsed", "rate"],
    "group_1h": ["grp", "bucket_ts", "n_series", "cnt", "sum", "vmin",
                 "vmax", "mean"],
    "alert_1h": ["source", "start_ts", "end_ts", "n_buckets", "duration",
                 "peak", "total"],
}

#: the alert tier has no bucket_ts; reads/serving cut on start_ts
DERIVED_TIME_COLUMN = {
    "rate_1h": "bucket_ts", "group_1h": "bucket_ts", "alert_1h": "start_ts",
}


def _require_params(rule: str, params: dict | None) -> dict:
    """Validate rule parameters. ``alert_1h`` REQUIRES integer
    ``threshold`` and ``min_duration`` (a recorded alert rule without a
    pinned condition is meaningless); the other rules take none."""
    if rule == "alert_1h":
        if not params or not {"threshold", "min_duration"} <= set(params):
            raise ValueError(
                "alert_1h needs params={'threshold': int, 'min_duration': int}"
            )
        return {"threshold": int(params["threshold"]),
                "min_duration": int(params["min_duration"])}
    if params:
        raise ValueError(f"rule {rule!r} takes no params, got {params}")
    return {}

#: bucket lists above this size stop being broadcast IN-list material;
#: the refresh falls back to whole-partition re-derivation instead
MAX_TOUCHED_BUCKETS = 100_000


def _require_rule(rule: str) -> str:
    if rule not in DERIVED_RULES:
        raise ValueError(f"unknown derived rule {rule!r}; have {sorted(DERIVED_RULES)}")
    return DERIVED_RULES[rule]


def _collapse(h1: DataFrame) -> DataFrame:
    """1h tier → one exact int64 total per (source, bucket)."""
    return h1.groupBy("source", "bucket_ts").agg(
        F.sum("sum").cast("long").alias("x")
    )


def derived_rows(
    h1: DataFrame,
    rule: str,
    mapping: DataFrame | None = None,
    sources: list[str] | None = None,
    buckets: list[int] | None = None,
    params: dict | None = None,
) -> DataFrame:
    """The rule's derived table over (a slice of) a 1h tier frame — the
    ONE definition materialize, refresh, and every equality test share.

    ``sources`` / ``buckets`` restrict the recompute (pushed into the
    scan). The "series"-coupled rules (rate, alert) honor only
    ``sources`` — a rate row needs its predecessor and an alert island
    spans buckets, so slicing buckets would corrupt edges; ``group_1h``
    honors both (a group cell is bucket-local). ``params`` carries the
    alert rule's pinned condition.
    """
    key = _require_rule(rule)
    params = _require_params(rule, params)
    if rule == "rate_1h":
        from .rollup import counter_rate

        if sources is not None:
            h1 = h1.where(F.col("source").isin(list(sources)))
        per = _collapse(h1)
        out = counter_rate(per, value_col="x", keys=("source",))
        return out.select(
            "source", F.col("bucket_ts").cast("long").alias("bucket_ts"),
            "value", "delta", "increase", "elapsed", "rate",
        )
    if rule == "alert_1h":
        from .rollup import alert_intervals

        if sources is not None:
            h1 = h1.where(F.col("source").isin(list(sources)))
        per = _collapse(h1)
        out = alert_intervals(
            per, params["threshold"], 3600, params["min_duration"],
            value_col="x", keys=("source",),
        )
        return out.select(
            "source", F.col("start_ts").cast("long").alias("start_ts"),
            F.col("end_ts").cast("long").alias("end_ts"),
            "n_buckets", "duration", "peak", "total",
        )
    from .rollup import group_aggregate

    if mapping is None:
        raise ValueError("group_1h needs a (source, grp) mapping frame")
    if sources is not None:
        h1 = h1.where(F.col("source").isin(list(sources)))
    if buckets is not None:
        h1 = h1.where(F.col("bucket_ts").isin([int(b) for b in buckets]))
    out = group_aggregate(h1, mapping)
    return out.select(
        key, F.col("bucket_ts").cast("long").alias("bucket_ts"),
        "n_series", "cnt", "sum", "vmin", "vmax", "mean",
    )


def read_derived(
    spark: SparkSession, out_dir: str, rule: str, as_of: int | None = None
) -> DataFrame:
    """Manifest-resolved read of a derived tier. Run dirs store the key
    in the partition path (named ``source=`` by the catalog's layout
    convention); rename it back to the rule's key column."""
    key = _require_rule(rule)
    df = TierCatalog(out_dir).read_tier(spark, f"drv_{rule}", as_of=as_of)
    if key != "source":
        df = df.withColumnRenamed("source", key)
    return df.select(*DERIVED_COLUMNS[rule])


def _commit_partitions(
    catalog: TierCatalog,
    rows: DataFrame,
    rule: str,
    expected: dict[str, str | None] | None,
    upstream_snapshot: int,
    affected: list[str] | None = None,
    **lineage,
) -> tuple[list[str], list[str]]:
    """Write ``rows`` partitioned by the rule key and commit each
    partition — conditionally when ``expected`` carries the guard runs
    (refresh), unconditionally otherwise (first materialize). An
    ``affected`` partition that produced NO rows (its whole series
    expired or fell below the rule's minimum) gets a conditional
    DELETE commit — a stale run must not outlive the data it derived
    from. Returns (committed, conflicted) partition keys."""
    key = _require_rule(rule)
    tier = f"drv_{rule}"
    tmp = os.path.join(
        catalog.base_dir, f"_tmp_{tier}_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    )
    # the key column rides the directory name (source=<key>), like every
    # other tier; rename so one writer shape serves both rules
    staged = rows.withColumnRenamed(key, "source") if key != "source" else rows
    (
        tier_writer(staged, "source")
        .mode("overwrite")
        .partitionBy("source")
        .parquet(tmp)
    )
    committed: list[str] = []
    conflicted: list[str] = []
    for entry in sorted(os.listdir(tmp)):
        if not entry.startswith("source="):
            continue
        part = entry.split("=", 1)[1]
        tmp_part = os.path.join(tmp, entry)
        if expected is None:
            catalog.commit_moved_partition(
                tier, part, tmp_part,
                upstream_snapshot=upstream_snapshot, **lineage,
            )
            committed.append(part)
            continue
        rel, dest = catalog._new_run_dir(tier, part)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(tmp_part, dest)
        ok = catalog.record_if_current(
            tier, part, expected.get(part), path=rel,
            upstream_snapshot=upstream_snapshot, **lineage,
        )
        if ok:
            committed.append(part)
            if catalog.auto_vacuum:
                catalog.vacuum(tier, partitions=[part])
        else:
            shutil.rmtree(dest, ignore_errors=True)
            conflicted.append(part)
    shutil.rmtree(tmp, ignore_errors=True)
    if expected is not None and affected:
        written = set(committed) | set(conflicted)
        for part in affected:
            if part in written or expected.get(part) is None:
                continue
            ok = catalog.record_if_current(
                tier, part, expected.get(part), status="derived_delete",
                path=None, upstream_snapshot=upstream_snapshot, **lineage,
            )
            if ok:
                committed.append(part)
                if catalog.auto_vacuum:
                    catalog.vacuum(tier, partitions=[part])
            else:
                conflicted.append(part)
    return committed, conflicted


def _watermark(catalog: TierCatalog, rule: str, upstream_snapshot: int, **m) -> None:
    catalog.record(
        f"drv_{rule}", "_watermark", status="derived_refresh",
        upstream_snapshot=upstream_snapshot, **m,
    )


def _last_watermark_rec(recs: list[dict], rule: str) -> dict | None:
    """The LATEST freshness watermark record for a rule (carries the
    upstream snapshot AND the rule's pinned params)."""
    tier = f"drv_{rule}"
    best = None
    for r in recs:
        if r["tier"] == tier and r.get("status") == "derived_refresh":
            if best is None or int(r["upstream_snapshot"]) >= int(
                best["upstream_snapshot"]
            ):
                best = r
    return best


def _last_watermark(recs: list[dict], rule: str) -> int | None:
    rec = _last_watermark_rec(recs, rule)
    return None if rec is None else int(rec["upstream_snapshot"])


def materialize_derived(
    spark: SparkSession,
    out_dir: str,
    rule: str,
    mapping: DataFrame | None = None,
    params: dict | None = None,
) -> dict:
    """Build the derived tier from the CURRENT committed 1h tier and
    commit it (one immutable run per key partition + the freshness
    watermark). The upstream snapshot is pinned BEFORE the read so the
    watermark never claims consistency with commits the build didn't
    see. ``params`` (the alert rule's threshold/for-duration) is
    validated here and RECORDED IN THE WATERMARK — every later refresh
    reuses the pinned condition, so the materialized rows can never
    silently drift to a different rule definition."""
    _require_rule(rule)
    params = _require_params(rule, params)
    catalog = TierCatalog(out_dir)
    snap = catalog.pin()
    try:
        h1 = catalog.read_tier(spark, "1h")
        rows = derived_rows(h1, rule, mapping=mapping, params=params or None)
        committed, _ = _commit_partitions(
            catalog, rows, rule, expected=None, upstream_snapshot=snap,
            status_note="materialize",
        )
    finally:
        catalog.unpin()
    _watermark(catalog, rule, snap, partitions=len(committed),
               rule_params=params)
    return {"rule": rule, "partitions": committed, "upstream_snapshot": snap,
            "params": params}


def refresh_derived(
    spark: SparkSession,
    out_dir: str,
    rule: str,
    mapping: DataFrame | None = None,
    params: dict | None = None,
) -> dict:
    """Bring a materialized rule up to date with the 1h tier,
    incrementally where the manifest proves it safe (module docstring
    has the classification). Rule params come from the LAST watermark
    (the condition pinned at materialize time); passing ``params``
    explicitly is allowed only when it MATCHES — a refresh must never
    quietly re-evaluate a different rule. Returns ``{"mode",
    "refreshed", "conflicted", "touched_buckets"}``; ``mode`` is
    ``"noop"`` / ``"incremental"`` / ``"rebuild"``."""
    key = _require_rule(rule)
    catalog = TierCatalog(out_dir)
    recs = catalog.metrics()
    wm = _last_watermark_rec(recs, rule)
    if wm is None:
        raise ValueError(
            f"derived rule {rule!r} has never been materialized in {out_dir}"
        )
    last = int(wm["upstream_snapshot"])
    pinned = wm.get("rule_params") or {}
    if params is not None and _require_params(rule, params or None) != pinned:
        raise ValueError(
            f"refresh_derived: params {params} differ from the pinned rule "
            f"condition {pinned}; re-materialize to change the rule"
        )
    params = pinned or None
    snap_now = len(recs)
    h1_commits = [
        r for r in recs[last:snap_now] if r["tier"] == "1h" and "path" in r
    ]
    if not h1_commits:
        _watermark(catalog, rule, snap_now, refreshed=0,
                   rule_params=pinned)
        return {"mode": "noop", "refreshed": [], "conflicted": [],
                "touched_buckets": 0}

    incremental = all(
        r.get("status") in ("append", "compact") for r in h1_commits
    )
    append_recs = [r for r in h1_commits if r.get("status") == "append"]
    if incremental and not append_recs:
        # compaction only: content identical, nothing to re-derive
        _watermark(catalog, rule, snap_now, refreshed=0,
                   rule_params=pinned)
        return {"mode": "noop", "refreshed": [], "conflicted": [],
                "touched_buckets": 0}

    base = os.path.join(out_dir, "1h")
    touched_buckets: list[int] = []
    if incremental:
        # the delta runs THEMSELVES name the touched keys — finding the
        # work costs O(|delta|), not a tier scan. EVERY append run must
        # still exist: with some vacuumed away (a later compaction
        # superseded them) a partial read would UNDERCOUNT the touched
        # keys while the watermark still advances — permanently stale
        # rows; fall back to the per-partition rebuild instead.
        delta_dirs = [os.path.join(base, r["path"]) for r in append_recs]
        if delta_dirs and all(os.path.exists(d) for d in delta_dirs):
            delta = spark.read.option("basePath", base).parquet(*delta_dirs)
            pairs = (
                delta.select("source", "bucket_ts").distinct().collect()
            )
            touched_sources = sorted({r["source"] for r in pairs})
            touched_buckets = sorted({int(r["bucket_ts"]) for r in pairs})
        else:
            incremental = False
    if incremental and len(touched_buckets) > MAX_TOUCHED_BUCKETS:
        incremental = False  # IN-list stops being a sane pushdown
    if not incremental:
        touched_sources = sorted({r["partition"] for r in h1_commits})

    # Every read resolves AS OF the same snapshot the commits were
    # classified against (snap_now) — pin() would resolve the CURRENT
    # manifest, and a 1h commit landing between metrics() and pin()
    # would then be covered by the watermark without ever having been
    # classified (its derived rows permanently stale). The conditional
    # commits still guard against concurrent drv writers at commit time.
    snap_read = snap_now
    h1 = catalog.read_tier(spark, "1h", as_of=snap_read)
    expected = catalog.current_runs(f"drv_{rule}", as_of=snap_read)
    if RULE_COUPLING[rule] == "series":
        # within-series coupling (rate's predecessor, alert's islands)
        # -> re-derive the affected sources' series
        parts = touched_sources
        new_rows = derived_rows(h1, rule, sources=parts, params=params)
    else:
        mapping = _require_mapping(mapping)
        grp_of = {
            r["source"]: r["grp"] for r in mapping.distinct().collect()
        }
        # unmapped sources land in group_aggregate's "other" group;
        # affected groups are filtered AFTER the aggregate (never by
        # source list — "other" has no enumerable source set)
        parts = sorted({grp_of.get(s, "other") for s in touched_sources})
        if incremental:
            # bucket-local coupling -> recompute ONLY touched cells,
            # keep every other bucket's rows from the live runs
            old = read_derived(
                spark, out_dir, rule, as_of=snap_read
            ).where(
                F.col(key).isin(parts)
                & ~F.col("bucket_ts").isin(touched_buckets)
            )
            fresh = derived_rows(
                h1, rule, mapping=mapping, buckets=touched_buckets
            ).where(F.col(key).isin(parts))
            new_rows = old.unionByName(fresh)
        else:
            new_rows = derived_rows(h1, rule, mapping=mapping).where(
                F.col(key).isin(parts)
            )
    committed, conflicted = _commit_partitions(
        catalog, new_rows, rule, expected=expected,
        upstream_snapshot=snap_read, affected=list(parts),
        touched_buckets=len(touched_buckets),
        refresh_mode="incremental" if incremental else "rebuild",
    )
    if not conflicted:
        _watermark(
            catalog, rule, snap_read,
            refreshed=len(committed), touched_buckets=len(touched_buckets),
            rule_params=pinned,
        )
    return {
        "mode": "incremental" if incremental else "rebuild",
        "refreshed": committed,
        "conflicted": conflicted,
        "touched_buckets": len(touched_buckets),
    }


def _require_mapping(mapping: DataFrame | None) -> DataFrame:
    if mapping is None:
        raise ValueError("group_1h needs a (source, grp) mapping frame")
    return mapping.select("source", "grp")

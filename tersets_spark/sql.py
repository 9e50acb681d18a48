"""Spark-SQL surface over a committed tier catalog.

:func:`register_views` materializes every committed tier of a
:class:`~tersets_spark.catalog.TierCatalog` as a session temp view — all
views resolved against ONE manifest snapshot, so ``spark.sql`` consumers
joining across tiers (``tersets_1m`` x ``tersets_psk_1h``...) get the
cross-tier consistency :meth:`TierCatalog.pin` gives Python readers. A
user who lives in SQL can then run the whole analytics surface
declaratively::

    register_views(spark, out_dir)
    spark.sql('''
        SELECT source, bucket_ts, sum
        FROM tersets_1h
        WHERE bucket_ts >= :t0 AND bucket_ts < :t1
    ''')

Snapshot semantics: a view captures the snapshot's resolved run
directories (lazy plan — nothing is copied), so later commits do NOT leak
into registered views; like any pinned read, the views stay valid while
superseded run dirs exist (``auto_vacuum=False`` or a grace period —
the Iceberg ``expire_snapshots`` trade). Re-register to move to a newer
snapshot.

Scale: views are plain manifest-resolved parquet scans — bucket_ts/doc_id
predicates in the SQL push down into the time-clustered files exactly as
they do through the DataFrame twins.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .catalog import TierCatalog

__all__ = ["register_views"]


def register_views(
    spark: SparkSession,
    out_dir: str,
    as_of: int | None = None,
    prefix: str = "tersets",
) -> dict[str, str]:
    """Register one temp view per committed tier; returns {tier: view}.

    All views resolve against one manifest snapshot (``as_of`` or the
    current one). Tier names map to view names as ``{prefix}_{tier}``
    (dots sanitized); tiers whose every partition was deleted are
    skipped."""
    catalog = TierCatalog(out_dir)
    snap = catalog.snapshot() if as_of is None else as_of
    views: dict[str, str] = {}
    tiers = sorted({m["tier"] for m in catalog.metrics() if m.get("tier")})
    for tier in tiers:
        if not catalog.current_run_lists(tier, as_of=snap):
            continue  # fully deleted / never-committed tier
        view = f"{prefix}_{tier}".replace(".", "_").replace("-", "_")
        if tier.startswith("drv_"):
            # derived recording-rule tiers: surface the rule's canonical
            # columns (the partition path reuses the source= layout slot,
            # so the key column needs its real name back)
            from .derived import DERIVED_RULES, read_derived

            rule = tier[len("drv_"):]
            if rule not in DERIVED_RULES:
                continue  # unknown/foreign derived tier: leave unregistered
            df = read_derived(spark, out_dir, rule, as_of=snap)
        else:
            df = catalog.read_tier(spark, tier, as_of=snap)
        df.createOrReplaceTempView(view)
        views[tier] = view
    return views

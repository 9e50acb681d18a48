#!/usr/bin/env python
"""Mimic the round driver's correctness gate locally.

For every entry in __spark_entry__.queries(): run the Spark query at the
given sf dir; if an oracle_sql() entry exists, run it in DuckDB with the
testdata parquet files registered as views plus the synthesized `sequences`
table, then compare row count, column names, and sorted cell values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    if len(spark_df) != len(oracle_df):
        return f"ROWS {len(spark_df)} vs {len(oracle_df)}"
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"COLS {list(a.columns)} vs {list(b.columns)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            same = x == y or (
                isinstance(x, float)
                and isinstance(y, float)
                and (math.isnan(x) and math.isnan(y) or x == y)
            )
            if not same:
                return f"VAL col={col} row={i}: {x!r} vs {y!r}"
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from tersets_spark.session import get_spark

    spark = get_spark(master="local[16]", app_name="contract-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.monotonic()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.monotonic() - t0
        if name not in osql:
            print(f"{name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s)")
            continue
        odf = con.sql(osql[name]).df()
        verdict = compare(name, sdf, odf)
        print(f"{name}: {verdict} ({len(sdf)} rows, {t_spark:.1f}s)")
        if verdict != "OK":
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()

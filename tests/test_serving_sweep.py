"""Randomized serving-equivalence sweep: many seeded-random aligned
ranges and thresholds served from a committed catalog must equal an
independent DuckDB replay over the raw points — breadth assurance across
the serving surface beyond the hand-picked contract constants."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from tersets_spark.jobs import (
    range_aggregate_from_catalog,
    range_aggregate_many_from_catalog,
    run_cascade,
    threshold_from_catalog,
)
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sweep")
    path = str(base / "seq.parquet")
    pq.write_table(generate_sequences(200, seed=71), path)
    out = str(base / "tiers")
    os.makedirs(out)
    run_cascade(spark, path, out, with_blocks=False)
    con = duckdb.connect()
    con.sql(f"""
        CREATE VIEW pts AS
        SELECT doc_id, source,
               ts0 + unnest(generate_series(0, n_tok - 1)) AS ts,
               unnest(tokens) AS v
        FROM read_parquet('{path}')
    """)
    lo, hi = con.sql("SELECT MIN(ts), MAX(ts) + 1 FROM pts").fetchone()
    return out, con, int(lo), int(hi)


def _rand_ranges(lo, hi, n, seed):
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n:
        a = int(rng.integers(lo, hi - 180)) // 60 * 60
        b = int(rng.integers(a + 120, min(a + (hi - lo), hi))) // 60 * 60
        if b > a >= lo:
            out.append((a, b))
    return out


def test_range_aggregate_sweep(spark, env):
    out, con, lo, hi = env
    ranges = _rand_ranges(lo + 60, hi, 10, seed=1)
    for s, e in ranges:
        got = {
            r["source"]: (r["cnt"], r["sum"], r["vmin"], r["vmax"], r["mean"])
            for r in range_aggregate_from_catalog(spark, out, s, e).collect()
        }
        want = {
            src: (c, sm, mn, mx, mean)
            for src, c, sm, mn, mx, mean in con.sql(f"""
                SELECT source, CAST(COUNT(*) AS BIGINT),
                       CAST(SUM(v) AS BIGINT),
                       CAST(MIN(v) AS BIGINT), CAST(MAX(v) AS BIGINT),
                       CAST(SUM(v) AS DOUBLE) / COUNT(*)
                FROM pts WHERE ts >= {s} AND ts < {e} GROUP BY source
            """).fetchall()
        }
        assert got == want, (s, e)
    # and the batch path agrees with the replica in one job
    many = range_aggregate_many_from_catalog(spark, out, ranges).collect()
    for r in many:
        s, e = ranges[r["range_id"]]
        want = con.sql(f"""
            SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(v) AS BIGINT),
                   CAST(MIN(v) AS BIGINT), CAST(MAX(v) AS BIGINT),
                   CAST(SUM(v) AS DOUBLE) / COUNT(*)
            FROM pts WHERE ts >= {s} AND ts < {e}
              AND source = '{r["source"]}'
        """).fetchone()
        assert (r["cnt"], r["sum"], r["vmin"], r["vmax"], r["mean"]) == want


def test_threshold_sweep(spark, env):
    out, con, lo, hi = env
    vmax = con.sql("SELECT MAX(v) FROM pts").fetchone()[0]
    rng = np.random.default_rng(3)
    nonempty = 0
    for q in rng.uniform(0.55, 0.999, 5):
        thr = int(q * vmax)
        got = sorted(
            (r["doc_id"], r["ts"], r["v"])
            for r in threshold_from_catalog(spark, out, thr).collect()
        )
        want = sorted(con.sql(
            f"SELECT doc_id, ts, CAST(v AS BIGINT) FROM pts WHERE v >= {thr}"
        ).fetchall())
        assert got == want, thr
        nonempty += bool(want)
    assert nonempty >= 3, "sweep degenerated to empty results"

"""Post-load tier integrity audit: passes on a good catalog, catches both a
corrupted raw blob (decode failure / wrong tokens) and a tampered aggregate."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from tersets_spark.jobs import run_cascade, validate_tiers
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vseq") / "seq.parquet")
    pq.write_table(generate_sequences(300, seed=11), path)
    return path


def _committed_files(out: str, tier: str) -> list[str]:
    return sorted(glob.glob(os.path.join(out, tier, "source=*", "run=*", "*.parquet")))


def _drop_crc_sidecar(parquet_path: str) -> None:
    """Hadoop's LocalFileSystem keeps a .crc sidecar that would flag our
    tampering before the audit runs; object stores (the deploy target)
    have no such sidecar, so drop it to simulate silent corruption."""
    d, base = os.path.split(parquet_path)
    crc = os.path.join(d, f".{base}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_validate_passes_on_good_cascade(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out)
    # audit every doc so the corruption tests below can't dodge the sample
    report = validate_tiers(spark, seq_path, out, sample_frac=1.0)
    assert set(report) == {"raw", "1m", "1h", "1d"}
    for tier, r in report.items():
        assert r["checked"] > 0, tier
        assert r["mismatches"] == 0, (tier, r)


def test_validate_catches_corrupt_raw_blob(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out)
    # flip bytes inside one committed blob (torn write / bit rot)
    victim = _committed_files(out, "raw")[0]
    t = pq.read_table(victim)
    blobs = t["blob"].to_pylist()
    b = bytearray(blobs[0])
    b[len(b) // 2] ^= 0xFF
    blobs[0] = bytes(b)
    import pyarrow as pa

    cols = {name: t[name] for name in t.column_names}
    cols["blob"] = pa.array(blobs, type=pa.binary())
    pq.write_table(pa.table(cols), victim)
    _drop_crc_sidecar(victim)

    report = validate_tiers(spark, seq_path, out, sample_frac=1.0)
    assert report["raw"]["mismatches"] >= 1
    # the aggregate tiers were not touched
    assert report["1m"]["mismatches"] == 0


def test_validate_catches_tampered_aggregate(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out)
    victim = _committed_files(out, "1h")[0]
    t = pq.read_table(victim)
    sums = t["sum"].to_pylist()
    sums[0] = (sums[0] or 0) + 1
    import pyarrow as pa

    cols = {name: t[name] for name in t.column_names}
    cols["sum"] = pa.array(sums, type=t.schema.field("sum").type)
    pq.write_table(pa.table(cols), victim)
    _drop_crc_sidecar(victim)

    report = validate_tiers(spark, seq_path, out, sample_frac=1.0)
    assert report["1h"]["mismatches"] >= 1
    assert report["raw"]["mismatches"] == 0
    assert report["1m"]["mismatches"] == 0


def test_validate_sample_is_deterministic(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out)
    r1 = validate_tiers(spark, seq_path, out, sample_frac=0.3)
    r2 = validate_tiers(spark, seq_path, out, sample_frac=0.3)
    assert r1 == r2
    assert 0 < r1["raw"]["checked"] < 300


def test_validate_seed_selects_a_different_slice(spark, seq_path):
    """Different seeds must audit DIFFERENT doc sets (the point of re-
    auditing with a fresh seed); same seed must reproduce the same set."""
    from pyspark.sql import functions as F

    from tersets_spark.jobs import audit_keep

    seq = spark.read.parquet(seq_path)

    def kept(seed):
        return {
            r["doc_id"]
            for r in seq.where(audit_keep(0.5, seed)).select("doc_id").collect()
        }

    a, b, a2 = kept(1), kept(2), kept(1)
    assert a == a2
    # 300 docs at 50%: P(identical sets for independent seeds) ~ 2^-300
    assert a != b
    assert 0 < len(a) < 300 and 0 < len(b) < 300


def test_validate_clean_after_retention(spark, seq_path, tmp_path):
    """An aged catalog (rows expired by apply_retention) must audit clean:
    the audit restricts each comparison to where both sides are complete."""
    import pyspark.sql.functions as F

    from tersets_spark.jobs import apply_retention
    from tersets_spark.tables import EPOCH

    out = str(tmp_path / "tiers")
    run_cascade(spark, seq_path, out)

    m1 = spark.read.option("basePath", f"{out}/1m").parquet(f"{out}/1m/source=*")
    lo, hi = m1.agg(F.min("bucket_ts"), F.max("bucket_ts")).collect()[0]
    now = EPOCH + 10 * 86400
    dropped = apply_retention(
        spark, out, now,
        policy={"raw": now - (lo + hi) // 2, "1m": now - (lo + 3 * hi) // 4,
                "1h": None, "1d": None},
    )
    assert dropped["raw"] > 0 and dropped["1m"] > 0

    report = validate_tiers(spark, seq_path, out, sample_frac=1.0)
    for tier, r in report.items():
        assert r["mismatches"] == 0, (tier, r)
    # the audit still covered real data above the horizons
    assert report["raw"]["checked"] > 0
    assert report["1m"]["checked"] > 0

"""Resumable cascade: kill mid-job, resume, verify no dup/missing partitions."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tersets_spark.catalog import TierCatalog
from tersets_spark.jobs import run_cascade
from tersets_spark.tables import generate_sequences


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seq") / "seq.parquet")
    pq.write_table(generate_sequences(300, seed=7), path)
    return path


def test_cascade_kill_and_resume(spark, seq_path, tmp_path):
    out = str(tmp_path / "tiers")

    # first run dies after the 1m tier
    with pytest.raises(RuntimeError, match="injected failure"):
        run_cascade(spark, seq_path, out, fail_after_tier="1m")

    cat = TierCatalog(out)
    assert cat.completed("raw") and cat.completed("1m")
    assert not cat.completed("1h") and not cat.completed("1d")
    manifest_before = {(m["tier"], m["partition"]) for m in cat.metrics()}

    # resume completes only the missing tiers, reusing finished partitions
    dirs = run_cascade(spark, seq_path, out)
    manifest_after = cat.metrics()
    # no partition recorded twice
    keys = [(m["tier"], m["partition"]) for m in manifest_after]
    assert len(keys) == len(set(keys))
    assert manifest_before.issubset(set(keys))
    # per-partition lineage metrics present
    assert all({"rows", "bytes_out", "wall_ms"} <= set(m) for m in manifest_after)

    # tier invariants: total cnt equals total tokens at every tier
    total_tokens = pq.read_table(seq_path, columns=["n_tok"])["n_tok"].to_pandas().sum()
    for tier in ("1m", "1h", "1d"):
        df = cat.read_tier(spark, tier)
        assert df.groupBy().sum("cnt").collect()[0][0] == total_tokens
    # raw tier has one blob per series
    raw = cat.read_tier(spark, "raw")
    assert raw.count() == pq.read_metadata(seq_path).num_rows

    # idempotency: fresh rerun with resume=False produces identical tier data
    out2 = str(tmp_path / "tiers2")
    run_cascade(spark, seq_path, out2)
    for tier in ("1m", "1h", "1d"):
        a = cat.read_tier(spark, tier)
        b = TierCatalog(out2).read_tier(spark, tier)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert dirs["1d"].endswith("1d")

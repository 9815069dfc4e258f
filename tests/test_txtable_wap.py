"""Write-audit-publish on TxTable (Iceberg WAP pattern): staged data is
invisible to readers and auditable via read_wap; publish is atomic and
constraint-gated; abort leaves no trace; vacuum never reclaims pending
WAP files; concurrent appends between stage and publish are legal."""

import os

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.operators.txtable import (
    ConstraintViolation,
    TxTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double")


def test_staged_invisible_then_published_atomically(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.stage_wap(_df(spark, [(2, 2.0), (3, 3.0)]), "w1")
    # readers see only the published snapshot
    assert t.read(spark).count() == 1
    # the audit step reads the staged rows
    audit = t.read_wap(spark, "w1")
    assert {r.k for r in audit.collect()} == {2, 3}
    snap = t.publish_wap(spark, "w1")
    assert t.latest_snapshot() == snap
    assert {r.k for r in t.read(spark).collect()} == {1, 2, 3}
    # marker gone: re-publish refused
    with pytest.raises(ValueError, match="no staged WAP"):
        t.publish_wap(spark, "w1")


def test_publish_enforces_check_constraints(spark, tmp_path):
    """The audit gate and the constraint gate compose: a staged batch
    violating a table CHECK is refused AT PUBLISH (staging defers the
    check — the audit may be what decides)."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.add_check_constraint(spark, "v_positive", "v > 0")
    t.stage_wap(_df(spark, [(2, -2.0)]), "bad")
    with pytest.raises(ConstraintViolation):
        t.publish_wap(spark, "bad")
    # the staged state survives a refused publish (fix then retry, or
    # abort) and the table is untouched
    assert t.read(spark).count() == 1
    assert t.read_wap(spark, "bad").count() == 1
    assert t.abort_wap("bad") >= 1


def test_abort_releases_files_and_vacuum_sweeps(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.stage_wap(_df(spark, [(2, 2.0)]), "w")
    n = t.abort_wap("w")
    assert n >= 1
    with pytest.raises(ValueError):
        t.read_wap(spark, "w")
    # aborted files are ordinary orphans — vacuum reclaims them
    _, deleted = t.vacuum(keep_last=1)
    assert deleted >= 1
    assert t.read(spark).count() == 1


def test_vacuum_keeps_pending_wap_files(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.stage_wap(_df(spark, [(2, 2.0)]), "pending")
    dropped, deleted = t.vacuum(keep_last=1)
    assert deleted == 0  # staged WAP data is live state, not orphans
    # still auditable and publishable after the vacuum
    assert t.read_wap(spark, "pending").count() == 1
    t.publish_wap(spark, "pending")
    assert t.read(spark).count() == 2


def test_vacuum_on_empty_table_keeps_wap(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.stage_wap(_df(spark, [(1, 1.0)]), "first")
    _, deleted = t.vacuum()
    assert deleted == 0
    t.publish_wap(spark, "first")
    assert t.read(spark).count() == 1


def test_concurrent_append_between_stage_and_publish(spark, tmp_path):
    """Publish rides the append rebase path: an append landing between
    stage and publish must not conflict, and both datasets survive."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.stage_wap(_df(spark, [(10, 10.0)]), "w")
    t.append(_df(spark, [(2, 2.0)]))  # interleaved writer
    t.publish_wap(spark, "w")
    assert {r.k for r in t.read(spark).collect()} == {1, 2, 10}


def test_publish_replay_idempotent_with_txn(spark, tmp_path):
    """A foreachBatch-style caller publishes with txn_id; if it crashes
    after the commit but before removing its own bookkeeping and
    re-stages + re-publishes the same transaction, the commit is a
    recorded no-op — no duplicate rows."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.stage_wap(_df(spark, [(2, 2.0)]), "w")
    t.publish_wap(spark, "w", txn_id="batch-7")
    # replay: stage the same data again under a new wap id, same txn
    t.stage_wap(_df(spark, [(2, 2.0)]), "w-replay")
    t.publish_wap(spark, "w-replay", txn_id="batch-7")
    rows = t.read(spark).collect()
    assert sorted(r.k for r in rows) == [1, 2]


def test_duplicate_wap_id_refused(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.stage_wap(_df(spark, [(1, 1.0)]), "w")
    with pytest.raises(ValueError, match="already staged"):
        t.stage_wap(_df(spark, [(2, 2.0)]), "w")
    with pytest.raises(ValueError, match="bad wap_id"):
        t.stage_wap(_df(spark, [(3, 3.0)]), "../evil")

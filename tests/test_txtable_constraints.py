"""TxTable CHECK constraints (Delta's ADD CONSTRAINT contract):
registration validates existing rows, writers enforce on incoming rows,
NULL passes (SQL CHECK semantics), pure-rearrangement maintenance
(delete/OPTIMIZE) never re-validates, constraints survive unrelated
commits and are droppable."""

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.operators.txtable import (
    ConstraintViolation,
    TxTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double, tag string")


def test_append_enforces_check(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0, "a"), (2, 2.0, "b")]))
    t.add_check_constraint(spark, "v_positive", "v > 0")
    assert t.constraints() == {"v_positive": "v > 0"}
    with pytest.raises(ConstraintViolation, match="v_positive"):
        t.append(_df(spark, [(3, -1.0, "c")]))
    # table untouched by the refused write
    assert t.read(spark).count() == 2
    t.append(_df(spark, [(3, 3.0, "c")]))
    assert t.read(spark).count() == 3


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, -5.0, "a")]))
    with pytest.raises(ConstraintViolation, match="existing row"):
        t.add_check_constraint(spark, "v_positive", "v > 0")
    assert t.constraints() == {}


def test_null_passes_check(spark, tmp_path):
    """SQL CHECK semantics: a row violates only when the predicate is
    FALSE — NULL (unknown) passes; NOT NULL is its own constraint."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0, "a")]))
    t.add_check_constraint(spark, "v_positive", "v > 0")
    t.append(_df(spark, [(2, None, "b")]))  # NULL passes CHECK
    t.add_check_constraint(spark, "tag_not_null", "tag IS NOT NULL")
    with pytest.raises(ConstraintViolation, match="tag_not_null"):
        t.append(_df(spark, [(3, 1.0, None)]))


def test_merge_enforces_and_maintenance_does_not(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "c")]))
    t.add_check_constraint(spark, "v_positive", "v > 0")
    # merge bringing a violating update is refused
    with pytest.raises(ConstraintViolation):
        t.merge(spark, _df(spark, [(2, -9.0, "b")]), ["k"])
    # valid merge lands
    t.merge(spark, _df(spark, [(2, 20.0, "b"), (4, 4.0, "d")]), ["k"])
    got = {(r.k, r.v) for r in t.read(spark).collect()}
    assert got == {(1, 1.0), (2, 20.0), (3, 3.0), (4, 4.0)}
    # delete/optimize rearrange existing rows — never re-validated,
    # never refused (enforce=False staging path)
    t.delete_where(spark, F.col("k") == 1)
    t.optimize(spark)
    assert t.read(spark).count() == 3
    # constraints carried across all those commits
    assert t.constraints() == {"v_positive": "v > 0"}


def test_drop_constraint(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0, "a")]))
    t.add_check_constraint(spark, "v_positive", "v > 0")
    t.drop_check_constraint("v_positive")
    t.append(_df(spark, [(2, -1.0, "b")]))  # enforcement gone
    assert t.read(spark).count() == 2
    with pytest.raises(ValueError):
        t.drop_check_constraint("nope")
    t.add_check_constraint(spark, "x", "k IS NOT NULL")
    with pytest.raises(ValueError, match="already exists"):
        t.add_check_constraint(spark, "x", "k IS NOT NULL")


def test_constraint_on_empty_table_then_first_append(spark, tmp_path):
    """Delta allows ADD CONSTRAINT before any data: the constraint-only
    snapshot records no schema and the first data write defines it."""
    t = TxTable(str(tmp_path / "t"))
    t.add_check_constraint(spark, "k_not_null", "k IS NOT NULL")
    with pytest.raises(ConstraintViolation):
        t.append(_df(spark, [(None, 1.0, "a")]))
    t.append(_df(spark, [(1, 1.0, "a")]))
    assert t.read(spark).count() == 1
    assert t.constraints() == {"k_not_null": "k IS NOT NULL"}


def test_multiple_violations_reported_together(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0, "a")]))
    t.add_check_constraint(spark, "v_positive", "v > 0")
    t.add_check_constraint(spark, "k_small", "k < 100")
    with pytest.raises(ConstraintViolation) as e:
        t.append(_df(spark, [(200, -1.0, "x"), (300, 5.0, "y")]))
    msg = str(e.value)
    assert "v_positive" in msg and "k_small" in msg
    assert "1 row(s)" in msg and "2 row(s)" in msg


def test_check_validates_staged_bytes_not_input_plan(spark, tmp_path):
    """ADVICE r8 TOCTOU: validation must run on the STAGED files so the
    checked bytes are the committed bytes and the input plan is evaluated
    once. A nondeterministic df (rand()) whose pre-check evaluation could
    pass while the staged evaluation violates must be judged on what was
    actually written: with a constraint that the staged rows always
    violate, the refused write leaves the table untouched and the staged
    files as vacuum-able orphans."""
    import os

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0, "a")]))
    t.add_check_constraint(spark, "v_positive", "v > 0")
    before = set(os.listdir(t.data_dir))
    with pytest.raises(ConstraintViolation, match="v_positive"):
        t.append(
            spark.range(4).select(
                F.col("id").alias("k"),
                # nondeterministic, but always <= 0: any single
                # evaluation passes or fails on the staged bytes alone
                (-F.rand() - F.lit(0.001)).alias("v"),
                F.lit("x").alias("tag"),
            )
        )
    assert t.read(spark).count() == 1
    # refused rows were staged (validation read them back), then orphaned
    orphans = set(os.listdir(t.data_dir)) - before
    assert orphans, "violating write should have staged files first"
    live = set(t._manifest(t.latest_snapshot())["files"])
    assert not (orphans & live)
    t.vacuum(keep_last=1)
    assert not (set(os.listdir(t.data_dir)) & orphans)


def test_txn_marker_cache_sees_other_writers(spark, tmp_path):
    """The incremental txn-marker cache must pick up commits made by a
    DIFFERENT TxTable instance after this instance's last scan (the
    per-micro-batch O(log^2) fix cannot go stale)."""
    root = str(tmp_path / "t")
    a = TxTable(root)
    b = TxTable(root)
    a.append(_df(spark, [(1, 1.0, "a")]), txn_id="batch-1")
    # b's cache was warmed before a's commit? force a warm scan first:
    assert not b.txn_committed("batch-0")
    assert b.txn_committed("batch-1")
    b.append(_df(spark, [(2, 2.0, "b")]), txn_id="batch-2")
    assert a.txn_committed("batch-2")
    # replayed txn through the cached path is still a recorded no-op
    snap = a.latest_snapshot()
    a.append(_df(spark, [(9, 9.0, "z")]), txn_id="batch-2")
    assert a.latest_snapshot() == snap
    assert a.read(spark).count() == 2

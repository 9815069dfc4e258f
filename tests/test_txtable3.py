"""Add-column schema evolution on the transaction-log table: evolution
is a pure metadata commit (no file rewrite), reads null-fill by name,
time travel is schema-versioned, and the strict path still refuses
accidental drift. Companion to test_txtable.py / test_txtable2.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.operators.txtable import TxTable


def v1(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def v2(spark, lo, hi):
    return v1(spark, lo, hi).withColumn(
        "tag", F.concat(F.lit("t"), F.col("id").cast("string"))
    )


def test_add_column_evolution_null_fills_old_files(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(v1(spark, 0, 10))
    files_before = set(t._manifest(0)["files"])
    t.append(v2(spark, 10, 20), merge_schema=True)
    # pure metadata evolution: snapshot-0 files survive by NAME
    assert files_before <= set(t._manifest(1)["files"])

    df = t.read(spark)
    assert df.columns == ["id", "v", "tag"]
    got = {r.id: (r.v, r.tag) for r in df.collect()}
    assert len(got) == 20
    assert all(got[i] == (2 * i, None) for i in range(10))
    assert all(got[i] == (2 * i, f"t{i}") for i in range(10, 20))


def test_time_travel_is_schema_versioned(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(v1(spark, 0, 10))
    t.append(v2(spark, 10, 20), merge_schema=True)
    old = t.read(spark, snapshot=0)
    assert old.columns == ["id", "v"]
    assert old.count() == 10


def test_strict_append_still_refuses_drift(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(v1(spark, 0, 10))
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(v2(spark, 10, 20))


def test_type_change_is_not_evolution(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(v1(spark, 0, 10))
    bad = spark.range(10, 20).select(
        "id", F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="cannot change column"):
        t.append(bad, merge_schema=True)


def test_batch_missing_columns_under_evolution(spark, tmp_path):
    """A narrow batch (columns the table already has missing) is legal
    under merge_schema: the logical schema is unchanged and the new
    file's absent columns read as null."""
    t = TxTable(str(tmp_path / "t"))
    t.append(v2(spark, 0, 10), merge_schema=True)
    narrow = spark.range(10, 15).select("id")
    t.append(narrow, merge_schema=True)
    df = t.read(spark)
    assert df.columns == ["id", "v", "tag"]
    got = {r.id: (r.v, r.tag) for r in df.collect()}
    assert all(got[i] == (None, None) for i in range(10, 15))
    assert got[3] == (6, "t3")


def test_merge_and_delete_after_evolution(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(v1(spark, 0, 10))
    t.append(v2(spark, 10, 20), merge_schema=True)
    # updates must match the UNIFIED schema
    upd = spark.createDataFrame(
        [(0, 999, "patched")], schema="id bigint, v bigint, tag string"
    )
    t.merge(spark, upd, key_cols=["id"])
    got = {r.id: (r.v, r.tag) for r in t.read(spark).collect()}
    assert got[0] == (999, "patched")
    assert len(got) == 20

    t.delete_where(spark, "id >= 15")
    assert t.read(spark).count() == 15


def test_changes_across_evolution_refused(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(v1(spark, 0, 10))
    t.append(v2(spark, 10, 20), merge_schema=True)
    with pytest.raises(ValueError, match="schema change"):
        t.changes(spark, 0)
    # but CDF within one schema era still works
    t.append(v2(spark, 20, 25), merge_schema=True)
    ch = t.changes(spark, 1).collect()
    assert {r.id for r in ch} == set(range(20, 25))
    assert all(r._change == "insert" for r in ch)


def test_optimize_preserves_evolved_schema(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(v1(spark, 0, 10))
    t.append(v2(spark, 10, 20), merge_schema=True)
    t.optimize(spark, n_files=2)
    df = t.read(spark)
    assert df.columns == ["id", "v", "tag"]
    assert df.count() == 20
    # compaction physically materializes the unified schema: a fresh
    # strict append of full-width batches is legal again
    t.append(v2(spark, 20, 22), merge_schema=True)
    assert t.read(spark).count() == 22

"""Registry contract tests: every oracle key has a query, every query runs
and returns rows with stable schema at sf0.001 (the heavy full-oracle
comparison lives in tools/verify_oracle.py)."""

import pytest

from stock_market_etl_pipeline_spark import registry

from conftest import SF_DIR


def test_every_oracle_has_query():
    qs, osql = registry.queries(), registry.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 24


@pytest.mark.parametrize("name", ["ticks_ohlcv", "db_summary", "predictions"])
def test_query_smoke(spark, name):
    df = registry.queries()[name](spark, SF_DIR)
    assert df.count() > 0


def test_dedup_exact_groups_nonvacuous(spark):
    """The registered exact-dedup query must exercise its POSITIVE path at
    every verify scale: the raw corpus has zero natural exact duplicates,
    so the registration plants byte-identical twins (doc_id + 10M) of the
    first 25 ids. Each group must have >1 member and the ORIGINAL id as
    survivor (ids < 10M)."""
    df = registry.queries()["dedup_exact_groups"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0, "vacuously green: planted duplicates missing"
    assert all(r.n_docs >= 2 for r in rows)
    assert all(r.keep_doc_id < 10_000_000 for r in rows)


def test_suppliers_above_nation_avg_nonvacuous(spark):
    """sf0.001 has exactly one supplier per nation; the at-or-above (>=)
    exact-cents comparison must return every such supplier (each IS its
    nation's average) rather than a vacuous empty set."""
    df = registry.queries()["suppliers_above_nation_avg"](spark, SF_DIR)
    assert df.count() > 0, "vacuously green: no rows at sf0.001"

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

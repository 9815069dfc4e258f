"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``stock_market_etl_pipeline_spark/`` — this file
just re-exports the registry (see registry.py for the operator → query
mapping and SURVEY.md §2 for the inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stock_market_etl_pipeline_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full enrichment (C5) → per-symbol performance (A6)
    over /root/testdata/sf0.001 — exercises scan → window → agg → join."""
    return registry.queries()["performance_summary"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()

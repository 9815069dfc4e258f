"""SQL surface tests: temp views expose the same plans as the DataFrame API."""

from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.operators.enrich import enrich
from stock_market_etl_pipeline_spark.sources.ticks import ticks
from stock_market_etl_pipeline_spark.sql_api import register_views

from conftest import SF_DIR


def test_register_views_and_sql_matches_dataframe(spark):
    names = register_views(spark, SF_DIR)
    assert set(names) >= {"lineitem", "documents", "ticks", "enriched", "overview"}

    sql_rows = spark.sql(
        """
        SELECT symbol, ROUND(AVG(close), 6) AS avg_close
        FROM enriched GROUP BY symbol ORDER BY symbol LIMIT 5
        """
    ).collect()
    df_rows = (
        enrich(ticks(spark, SF_DIR))
        .groupBy("symbol")
        .agg(F.round(F.avg("close"), 6).alias("avg_close"))
        .orderBy("symbol")
        .limit(5)
        .collect()
    )
    assert sql_rows == df_rows


def test_sql_view_plans_keep_pushdown(spark):
    register_views(spark, SF_DIR)
    df = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity > 49")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # projection pruning + predicate pushdown reach the parquet scan
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49" in plan
    assert "struct<l_orderkey:bigint,l_quantity" in plan

"""IO sink tests: partitioned parquet roundtrip, bucketed-table co-located
join (no Exchange in the joined plan)."""

import io
import contextlib

from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.io_sink import write_bucketed, write_parquet
from stock_market_etl_pipeline_spark.sources.ticks import ticks

from conftest import SF_DIR


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    t = ticks(spark, SF_DIR)
    path = str(tmp_path / "ticks_pq")
    write_parquet(t, path)
    back = spark.read.parquet(path)
    assert back.count() == t.count()
    assert set(back.columns) == set(t.columns)
    # partition pruning: reading one symbol touches one partition dir
    one = back.filter(F.col("symbol") == 1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() > 0


def test_bucketed_join_skips_exchange(spark, tmp_path):
    t = ticks(spark, SF_DIR)
    write_bucketed(t.select("symbol", "date", "close"), "t_close",
                   bucket_by="symbol", n_buckets=8)
    write_bucketed(t.select("symbol", "date", "volume"), "t_vol",
                   bucket_by="symbol", n_buckets=8)
    a = spark.table("t_close")
    b = spark.table("t_vol").groupBy("symbol").agg(F.sum("volume").alias("v"))
    joined = a.join(b, "symbol")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # bucketed layout satisfies the join's clustering: no shuffle exchange
    # (BroadcastExchange may appear if the agg side broadcasts; forbid
    # shuffle exchanges specifically)
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == a.count()
    spark.sql("DROP TABLE IF EXISTS t_close")
    spark.sql("DROP TABLE IF EXISTS t_vol")


def test_merge_schema_reads_evolved_columns(spark, tmp_path):
    from stock_market_etl_pipeline_spark.sources.tables import (
        read_parquet_evolving,
    )

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, 10.0)], "id long, close double").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, 20.0, "NASDAQ")], "id long, close double, exchange string"
    ).write.mode("append").parquet(path)

    df = read_parquet_evolving(spark, path)
    assert set(df.columns) == {"id", "close", "exchange"}
    rows = {r["id"]: r["exchange"] for r in df.collect()}
    assert rows == {1: None, 2: "NASDAQ"}

"""Custom Python DataSource tests: partition-per-symbol quote API source
feeding the real cleaning pipeline end-to-end."""

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.sources.quote_api import (
    QuoteAPIDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(QuoteAPIDataSource)


def test_read_produces_symbol_day_grid(spark):
    df = (
        spark.read.format("quote_api")
        .option("symbols", "AAPL,MSFT,GOOG")
        .option("days", "30")
        .load()
    )
    assert df.count() == 90
    counts = {r["symbol"]: r["n"] for r in
              df.groupBy("symbol").agg(F.count("*").alias("n")).collect()}
    assert counts == {"AAPL": 30, "MSFT": 30, "GOOG": 30}
    # raw API values are strings (cast happens in the cleaning stage)
    assert dict(df.dtypes)["close"] == "string"


def test_reads_are_deterministic(spark):
    opts = {"symbols": "IBM", "days": "10"}
    a = spark.read.format("quote_api").options(**opts).load().collect()
    b = spark.read.format("quote_api").options(**opts).load().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_partition_per_symbol(spark):
    df = (
        spark.read.format("quote_api")
        .option("symbols", "A,B,C,D")
        .option("days", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4


def test_source_feeds_cleaning_pipeline(spark):
    from stock_market_etl_pipeline_spark.operators.clean import clean_quotes
    from stock_market_etl_pipeline_spark.operators.enrich import enrich

    raw = (
        spark.read.format("quote_api")
        .option("symbols", "AAPL,MSFT")
        .option("days", "25")
        .load()
        .withColumn("extracted_at", F.current_timestamp())
    )
    enriched = enrich(
        clean_quotes(raw).drop("extracted_at", "data_source")
    )
    rows = enriched.filter(F.col("symbol") == "AAPL").orderBy("date").collect()
    assert len(rows) == 25
    assert rows[0]["daily_change"] is None
    assert rows[1]["ma_5"] == pytest.approx(
        (rows[0]["close"] + rows[1]["close"]) / 2
    )


def test_streaming_source_serves_days_as_microbatches(spark, tmp_path):
    import time

    stream = (
        spark.readStream.format("quote_api")
        .option("symbols", "AAPL,MSFT")
        .option("days", "3")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("qa_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        n = spark.sql("SELECT count(*) c FROM qa_stream_test").collect()[0]["c"]
        if n >= 6:
            break
        time.sleep(1)
    q.stop()
    out = spark.sql(
        "SELECT symbol, count(*) n, count(DISTINCT date) d "
        "FROM qa_stream_test GROUP BY 1"
    ).collect()
    got = {r["symbol"]: (r["n"], r["d"]) for r in out}
    # exactly `days` rows per symbol, one per micro-batch day, no repeats
    assert got == {"AAPL": (3, 3), "MSFT": (3, 3)}

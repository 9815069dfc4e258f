"""End-to-end pipeline test: raw JSON drops → cleaned/enriched parquet sink
+ validation gate + summary, through the real CLI-shaped entrypoint."""

from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.pipeline import run_pipeline
from stock_market_etl_pipeline_spark.schema import RAW_QUOTE_SCHEMA

from conftest import make_raw_rows


def test_pipeline_end_to_end(spark, tmp_path, raw_quotes):
    inp = str(tmp_path / "landing")
    sink = str(tmp_path / "warehouse")
    raw_quotes.write.mode("overwrite").json(inp)

    result = run_pipeline(spark, inp, sink)

    assert result.success
    assert result.validation_passed
    assert result.records_loaded == 35  # 25 AAPL + 8 MSFT + DUP + ONE
    assert result.unique_symbols == 4

    out = spark.read.parquet(sink)
    assert out.count() == 35
    # partitioned layout by symbol
    assert any(p.startswith("symbol=") for p in
               __import__("os").listdir(sink) if not p.startswith("_"))
    # enrichment columns present and windowed values sane
    aapl = out.filter(F.col("symbol") == "AAPL").orderBy("date").collect()
    assert aapl[0]["daily_change"] is None
    assert aapl[1]["daily_change"] == 1.0


def test_pipeline_rerun_overwrites(spark, tmp_path):
    inp = str(tmp_path / "landing2")
    sink = str(tmp_path / "warehouse2")
    df = spark.createDataFrame(make_raw_rows("IBM", 10), RAW_QUOTE_SCHEMA)
    df.write.mode("overwrite").json(inp)
    r1 = run_pipeline(spark, inp, sink)
    r2 = run_pipeline(spark, inp, sink)  # idempotent overwrite, no dup rows
    assert r1.records_loaded == r2.records_loaded == 10
    assert spark.read.parquet(sink).count() == 10

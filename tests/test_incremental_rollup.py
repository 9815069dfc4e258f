"""Incremental monthly-rollup maintenance (streaming/rollup.py): the
partition-level-recompute continuous aggregate must equal the batch
aggregate after every ingestion step — including when a later batch adds
rows to an ALREADY-MATERIALIZED month (the case naive append would get
wrong)."""

from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.sources.ticks import ticks
from stock_market_etl_pipeline_spark.streaming.rollup import (
    monthly_bars,
    start_monthly_rollup,
)

from conftest import SF_DIR
import pytest

# Long-matrix tier (VERDICT r12 #1): multi-batch streaming / replay /
# restart-storm e2e tests. Excluded from the default run so the driver's
# verify window fits; run with `python -m pytest tests/ -m slow -q` (the
# round close-out ritual runs all tiers).
pytestmark = pytest.mark.slow



def _assert_rollup_matches(spark, rollup_dir, expected):
    got = spark.read.parquet(rollup_dir)
    cols = ["symbol", "year", "month", "open", "high", "low", "close",
            "volume", "trading_days"]
    g = got.select(*cols)
    e = expected.select(*cols)
    assert g.count() == e.count()
    assert g.exceptAll(e).count() == 0
    assert e.exceptAll(g).count() == 0


def test_rollup_incremental_matches_batch(spark, tmp_path):
    t = ticks(spark, SF_DIR).cache()
    landing = str(tmp_path / "landing")
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    # split mid-month so chunk 2 reopens months chunk 1 already wrote
    cutoff = t.agg(F.percentile_approx("date", 0.5)).collect()[0][0]
    chunk1 = t.filter(F.col("date") <= F.lit(cutoff))
    chunk2 = t.filter(F.col("date") > F.lit(cutoff))
    assert chunk1.count() > 0 and chunk2.count() > 0

    chunk1.write.mode("append").parquet(landing)
    q = start_monthly_rollup(spark, landing, rollup, ckpt)
    q.awaitTermination(120)
    _assert_rollup_matches(spark, rollup, monthly_bars(chunk1))

    # late/out-of-order arrivals into existing months: partition recompute
    # must replace, not duplicate, the affected (year, month) partitions
    chunk2.write.mode("append").parquet(landing)
    q = start_monthly_rollup(spark, landing, rollup, ckpt)
    q.awaitTermination(120)
    _assert_rollup_matches(spark, rollup, monthly_bars(t))
    t.unpersist()


def test_rollup_rerun_is_idempotent(spark, tmp_path):
    t = ticks(spark, SF_DIR)
    landing = str(tmp_path / "landing")
    rollup = str(tmp_path / "rollup")

    t.write.mode("append").parquet(landing)
    q = start_monthly_rollup(spark, landing, rollup, str(tmp_path / "c1"))
    q.awaitTermination(120)
    # fresh checkpoint -> the file source re-delivers everything; the
    # dynamic-overwrite sink must land in the same state, not double up
    q = start_monthly_rollup(spark, landing, rollup, str(tmp_path / "c2"))
    q.awaitTermination(120)
    _assert_rollup_matches(spark, rollup, monthly_bars(t))

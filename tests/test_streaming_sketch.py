"""Incrementally-merged HLL sketch table (streaming/sketch_rollup.py):
the merge-maintained sketches must equal a one-shot sketch over all
landed data after every ingestion step, and batch REPLAY must be a no-op
— HLL union idempotence is the sink's exactly-once story, so it gets
asserted directly, not assumed."""

from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.sources.tables import load_table
from stock_market_etl_pipeline_spark.streaming.sketch_rollup import (
    distinct_estimates,
    merge_into_store,
    sketch_batch,
    start_distinct_sketch_rollup,
)

from conftest import SF_DIR

KEYS = ["o_orderpriority"]


def _oneshot(df):
    return {
        r["o_orderpriority"]: r["est"]
        for r in df.groupBy("o_orderpriority")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("o_custkey", F.lit(12))
            ).alias("est")
        )
        .collect()
    }


def _maintained(spark, sketch_dir):
    return {
        r["o_orderpriority"]: r["approx_distinct"]
        for r in distinct_estimates(spark, sketch_dir, KEYS).collect()
    }


def test_sketch_rollup_incremental_equals_oneshot(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders").cache()
    landing = str(tmp_path / "landing")
    sketches = str(tmp_path / "sketches")
    ckpt = str(tmp_path / "ckpt")

    cutoff = o.agg(F.percentile_approx("o_orderdate", 0.5)).collect()[0][0]
    chunk1 = o.filter(F.col("o_orderdate") <= F.lit(cutoff))
    chunk2 = o.filter(F.col("o_orderdate") > F.lit(cutoff))
    assert chunk1.count() > 0 and chunk2.count() > 0

    chunk1.write.mode("append").parquet(landing)
    q = start_distinct_sketch_rollup(
        spark, landing, sketches, ckpt, KEYS, "o_orderdate", "o_custkey"
    )
    q.awaitTermination(120)
    assert _maintained(spark, sketches) == _oneshot(chunk1)

    # second arrival merges into existing day partitions without rescan
    chunk2.write.mode("append").parquet(landing)
    q = start_distinct_sketch_rollup(
        spark, landing, sketches, ckpt, KEYS, "o_orderdate", "o_custkey"
    )
    q.awaitTermination(120)
    assert _maintained(spark, sketches) == _oneshot(o)
    o.unpersist()


def test_sketch_merge_replay_is_noop(spark, tmp_path):
    """Crash-between-write-and-commit: the restarted query re-delivers the
    last batch. Re-merging an already-merged batch sketch must leave the
    store in the identical state (register-wise max is idempotent)."""
    o = load_table(spark, SF_DIR, "orders")
    sketches = str(tmp_path / "sketches")

    first = o.filter(F.col("o_orderkey") % 3 == 0)
    replayed = o.filter(F.col("o_orderkey") % 3 == 1)

    merge_into_store(
        spark, sketch_batch(first, KEYS, "o_orderdate", "o_custkey"), sketches, KEYS
    )
    merge_into_store(
        spark, sketch_batch(replayed, KEYS, "o_orderdate", "o_custkey"), sketches, KEYS
    )
    before = _maintained(spark, sketches)

    # the replay: same batch merged AGAIN, simulating redelivery
    merge_into_store(
        spark, sketch_batch(replayed, KEYS, "o_orderdate", "o_custkey"), sketches, KEYS
    )
    assert _maintained(spark, sketches) == before

"""applyInPandasWithState: cumulative state across micro-batches AND
across stream restarts (checkpoint-recovered). Sink is foreachBatch →
parquet (memory sink cannot resume from a checkpoint)."""

from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.streaming.stateful import running_vwap
import pytest

# Long-matrix tier (VERDICT r12 #1): multi-batch streaming / replay /
# restart-storm e2e tests. Excluded from the default run so the driver's
# verify window fits; run with `python -m pytest tests/ -m slow -q` (the
# round close-out ritual runs all tiers).
pytestmark = pytest.mark.slow



def _run_once(spark, src, ckpt, out):
    stream = spark.readStream.schema(
        "symbol string, close double, volume bigint"
    ).parquet(src)

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        running_vwap(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        cur = latest.get(r["symbol"])
        if cur is None or r["batch_id"] > cur["batch_id"]:
            latest[r["symbol"]] = r
    return latest


def test_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    batch1 = spark.createDataFrame(
        [("A", 10.0, 100), ("A", 20.0, 100), ("B", 5.0, 10)],
        "symbol string, close double, volume bigint",
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    got1 = _run_once(spark, src, ckpt, out)
    assert got1["A"]["n_rows"] == 2
    assert got1["A"]["vwap"] == (10 * 100 + 20 * 100) / 200
    assert got1["B"]["total_volume"] == 10

    # second drop: state must resume from the checkpoint, not restart at 0
    batch2 = spark.createDataFrame(
        [("A", 40.0, 200), ("C", 1.0, 1)],
        "symbol string, close double, volume bigint",
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    got2 = _run_once(spark, src, ckpt, out)
    assert got2["A"]["n_rows"] == 3
    assert got2["A"]["total_volume"] == 400
    assert got2["A"]["vwap"] == (10 * 100 + 20 * 100 + 40 * 200) / 400
    assert got2["C"]["n_rows"] == 1
    # B had no new rows in run 2 -> its latest emission is still batch 0
    assert got2["B"]["n_rows"] == 1

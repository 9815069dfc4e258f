"""Stream-stream attribution join: the streaming result must equal the
batch join over the same data, and the interval condition must actually
filter (no unbounded cross-match per user)."""

from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.sources.events import load_events
from stock_market_etl_pipeline_spark.streaming.joins import (
    view_to_click_attribution,
)

from conftest import SF_DIR


def test_stream_stream_join_matches_batch(spark, tmp_path):
    ev = load_events(spark, SF_DIR)
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.write.mode("overwrite").parquet(vdir)
    clicks.write.mode("overwrite").parquet(cdir)

    vs = spark.readStream.schema(views.schema).parquet(vdir)
    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    q = (
        view_to_click_attribution(vs, cs)
        .writeStream.format("memory")
        .queryName("attribution")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql("SELECT * FROM attribution")
    batch = view_to_click_attribution(views, clicks)

    # inner stream-stream join: every emitted row appears in the batch
    # result and (for watermark-closed rows) vice versa — on a bounded
    # availableNow run with final watermark past all data, the sets match
    assert got.count() > 0
    assert got.exceptAll(batch).count() == 0
    missing = batch.exceptAll(got)
    assert missing.count() == 0

    # the interval condition really bounds matches
    assert got.filter(F.col("lag_us") < 0).count() == 0
    assert got.filter(F.col("lag_us") > 3600 * 1_000_000).count() == 0

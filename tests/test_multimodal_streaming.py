"""Multimodal plumbing + Structured Streaming ingest tests."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    documents_as_media,
    frame_sample,
)
from stock_market_etl_pipeline_spark.streaming.ingest import start_quote_ingest

from conftest import SF_DIR, make_raw_rows


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    return documents_as_media(docs).cache()


def test_media_schema_and_payload(media):
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    row = media.first()
    assert row["byte_len"] == len(row["payload"])


def test_decode_stub_deterministic(media):
    out1 = decode_media(media).orderBy("media_id").collect()
    out2 = decode_media(media).orderBy("media_id").collect()
    assert [r.asDict() for r in out1] == [r.asDict() for r in out2]
    for r in out1:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert len(r["feature"]) == 8
    assert decode_media(media).schema == DECODED_SCHEMA


def test_decode_real_path_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_media(media, decode_stub=False).collect()


def test_frame_sample_explodes_video_rows(media):
    decoded = decode_media(media)
    frames = frame_sample(decoded, every_nth=5)
    rows = frames.collect()
    assert rows, "expected at least one video row"
    for r in rows:
        assert r["frame_idx"] % 5 == 0
        assert r["frame_idx"] < r["n_frames"]


def test_streaming_ingest_dedups_overlap(spark, tmp_path):
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    day1 = make_raw_rows("AAPL", 5)
    # overlapping re-fetch: same dates, later extracted_at, bumped close
    day2 = [
        (s, d, o, h, lo, str(float(c) + 1), v,
         dt.datetime(2024, 6, 3, 12, 0, 0), src)
        for (s, d, o, h, lo, c, v, ts, src) in make_raw_rows("AAPL", 7)
    ]
    from stock_market_etl_pipeline_spark.schema import RAW_QUOTE_SCHEMA

    spark.createDataFrame(day1, RAW_QUOTE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).json(landing)
    spark.createDataFrame(day2, RAW_QUOTE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).json(landing)

    q = start_quote_ingest(spark, landing, sink, ckpt, trigger_once=True)
    q.awaitTermination(120)

    out = spark.read.parquet(sink)
    # 7 distinct (symbol, date) keys survive the overlap
    assert out.select("symbol", "date").distinct().count() == 7
    assert out.groupBy("symbol", "date").count().filter("count > 1").count() == 0

"""events.parquet reader with nanosecond-timestamp normalization.

The driver's events table stores ``ts`` as parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) the column
arrives as a raw int64 of nanoseconds; this reader converts it to a proper
TimestampType at microsecond precision — the same truncation DuckDB applies
when casting ns→µs, so oracle comparisons stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Self-sufficient: the driver passes its own SparkSession, which won't
    # have session.py's config. The conf is runtime-settable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = ev.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        ev = ev.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return ev

"""Parquet table readers for the driver testdata layout.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (TESTDATA.md).
Reading is lazy; Catalyst pushes projections and predicates into the
parquet scan, so callers should select/filter on the returned DataFrame
rather than pre-materializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Per-path schema memo: the driver testdata schemas are fixed (TESTDATA.md),
# so after the first read we pass the schema explicitly and skip the
# file-listing + footer schema-inference job Spark otherwise runs on every
# `spark.read.parquet` — ~0.1 s of driver latency per read, per query build.
_SCHEMA_CACHE: dict[str, StructType] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    cached = _SCHEMA_CACHE.get(path)
    if cached is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(cached).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant parquet read: mergeSchema unions the
    schemas of all files (columns added over time arrive as nulls in old
    files). The append-sink reality at scale — daily drops gain columns;
    a plain read would silently pick one file's schema."""
    return spark.read.option("mergeSchema", "true").parquet(path)

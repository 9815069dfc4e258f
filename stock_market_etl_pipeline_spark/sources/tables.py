"""Parquet table readers for the driver testdata layout.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (TESTDATA.md).
Reading is lazy; Catalyst pushes projections and predicates into the
parquet scan, so callers should select/filter on the returned DataFrame
rather than pre-materializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant parquet read: mergeSchema unions the
    schemas of all files (columns added over time arrive as nulls in old
    files). The append-sink reality at scale — daily drops gain columns;
    a plain read would silently pick one file's schema."""
    return spark.read.option("mergeSchema", "true").parquet(path)

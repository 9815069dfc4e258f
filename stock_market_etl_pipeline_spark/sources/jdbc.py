"""JDBC source (SURVEY.md §2.1 S8-S10) — pushdown-tuned reader.

The reference's dashboard scans Postgres with LIMIT/projection pushed into
SQL (``dashboard/app.py:105-110``, ``app_fast.py:25``). Spark's JDBC DSv2
source pushes projections, filters, limits, and (where the dialect allows)
aggregates; partitioned reads parallelize the scan across executors by a
numeric column range.

No database exists in the test environment — this module is exercised by
the driver contract only through its plan construction (options), and the
JDBC round-trip is covered by write_jdbc + this reader in a deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC scan with pushdown enabled.

    With partition_column/bounds, Spark issues num_partitions range-bounded
    queries in parallel (the reference's single-connection scan becomes a
    parallel read). pushDownLimit/pushDownAggregate let Catalyst ship
    LIMIT/aggregates to the database like the reference's hand-written SQL.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("pushDownLimit", "true")
        .option("pushDownAggregate", "true")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()

"""Mergeable-sketch registry surface (operators/sketches.py).

Three-entry pattern, mirroring the repo's approx-vs-exact convention
(`approx_stats` / `ann_ivf_topk` precedent):

- `distinct_custkeys_by_priority` — the EXACT twin, hash-green against
  DuckDB. This is the correctness anchor the sketch estimates are tested
  against (tests/test_sketches.py asserts the HLL estimate within the
  published relative standard error of THESE numbers).
- `sketch_distinct_rollup_merge` — rows-only by design (approximate
  algorithms differ across engines): the two-level pattern itself —
  per-(priority, day) HLL sketches, merged per priority. At 100 TB the
  level-1 table is persisted and this query touches only sketches.
- `sketch_price_quantiles` — rows-only: per-priority p50/p95/p99 of
  order value from merged per-day KLL sketches.

Reference parity: the reference has no sketch surface (exact pandas
aggregates only, reference ``src/transform.py:200-249``); SURVEY.md §4
names sketches as the documented scale switch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.sketches import (
    hll_daily_rollup,
    hll_merged_distinct,
    kll_daily_rollup,
    kll_merged_quantiles,
)
from .registry import register
from .sources.tables import load_table


@register(
    "distinct_custkeys_by_priority",
    """
    SELECT o_orderpriority AS priority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def q_distinct_custkeys_by_priority(spark, sf_dir):
    """Exact distinct-customer count per order priority — the hash-green
    anchor for the sketch estimates below. COUNT DISTINCT plans as a
    two-stage expand/partial-agg in Spark; at 100 TB the sketch variant
    replaces it wherever ±1.6% is acceptable."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").cast("long").alias("n_distinct_cust"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


@register("sketch_distinct_rollup_merge")  # rows-only: estimates are engine-specific
def q_sketch_distinct_rollup_merge(spark, sf_dir):
    """Two-level mergeable-distinct: per-(priority, order-day) HLL
    sketches (the persisted level-1 table — KBs per row, built with one
    partial-aggregating shuffle) merged per priority via register-wise-max
    union. The merge is lossless w.r.t. a one-shot sketch
    (test_sketches.py asserts estimate equality), so incremental daily
    maintenance gives the identical answer to a full rebuild."""
    o = load_table(spark, sf_dir, "orders")
    rollup = hll_daily_rollup(
        o, ["o_orderpriority"], F.to_date("o_orderdate"), "o_custkey"
    )
    return (
        hll_merged_distinct(rollup, ["o_orderpriority"])
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("approx_distinct").cast("long").alias("approx_distinct_cust"),
        )
        .orderBy("priority")
    )


@register("sketch_price_quantiles")  # rows-only: estimates are engine-specific
def q_sketch_price_quantiles(spark, sf_dir):
    """Per-priority p50/p95/p99 order value read off MERGED per-day KLL
    sketches — the persisted-rollup path for quantile dashboards at
    100 TB (exact per-group percentiles need a full sort per group;
    merged KLL needs only the sketch table). Rank-error ≈1.65% at k=200
    is asserted against exact percentiles in test_sketches.py."""
    o = load_table(spark, sf_dir, "orders")
    rollup = kll_daily_rollup(
        o, ["o_orderpriority"], F.to_date("o_orderdate"), "o_totalprice"
    )
    q = kll_merged_quantiles(rollup, ["o_orderpriority"], [0.50, 0.95, 0.99])
    return q.select(
        F.col("o_orderpriority").alias("priority"),
        F.round("p50", 2).alias("p50"),
        F.round("p95", 2).alias("p95"),
        F.round("p99", 2).alias("p99"),
    ).orderBy("priority")

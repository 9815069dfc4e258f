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
    hll_sliding_distinct,
    kll_daily_rollup,
    kll_merged_quantiles,
    theta_daily_rollup,
    theta_merged_per_group,
    theta_set_algebra,
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


_SET_A, _SET_B = "1-URGENT", "5-LOW"


@register(
    "customer_priority_set_algebra",
    f"""
    WITH flags AS (
        SELECT o_custkey,
               MAX(CASE WHEN o_orderpriority = '{_SET_A}' THEN 1 ELSE 0 END)
                   AS in_a,
               MAX(CASE WHEN o_orderpriority = '{_SET_B}' THEN 1 ELSE 0 END)
                   AS in_b
        FROM orders
        GROUP BY 1
    )
    SELECT CAST(SUM(in_a) AS BIGINT)                 AS a_cnt,
           CAST(SUM(in_b) AS BIGINT)                 AS b_cnt,
           CAST(COUNT(*) AS BIGINT)                  AS union_cnt,
           CAST(SUM(in_a * in_b) AS BIGINT)          AS intersect_cnt,
           CAST(SUM(in_a * (1 - in_b)) AS BIGINT)    AS a_minus_b_cnt,
           CAST(SUM(in_b * (1 - in_a)) AS BIGINT)    AS b_minus_a_cnt
    FROM flags
    WHERE in_a = 1 OR in_b = 1
    """,
)
def q_customer_priority_set_algebra(spark, sf_dir):
    """EXACT set algebra between the urgent and low customer populations
    — the hash-green anchor for `theta_customer_set_algebra`. One scan,
    one shuffle on o_custkey (per-customer membership flags), one 1-row
    final agg: all six set cardinalities (|A|, |B|, |A∪B|, |A∩B|, |A∖B|,
    |B∖A|) without a single join/intersect/except node. At 100 TB the
    theta twin replaces it wherever ±1.6% is acceptable and the flag
    shuffle over every distinct member is not."""
    o = load_table(spark, sf_dir, "orders")
    flags = o.groupBy("o_custkey").agg(
        F.max(
            F.when(F.col("o_orderpriority") == _SET_A, 1).otherwise(0)
        ).alias("in_a"),
        F.max(
            F.when(F.col("o_orderpriority") == _SET_B, 1).otherwise(0)
        ).alias("in_b"),
    )
    return (
        flags.filter((F.col("in_a") == 1) | (F.col("in_b") == 1))
        .agg(
            F.sum("in_a").cast("long").alias("a_cnt"),
            F.sum("in_b").cast("long").alias("b_cnt"),
            F.count(F.lit(1)).cast("long").alias("union_cnt"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias(
                "intersect_cnt"
            ),
            F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("long").alias(
                "a_minus_b_cnt"
            ),
            F.sum(F.col("in_b") * (1 - F.col("in_a"))).cast("long").alias(
                "b_minus_a_cnt"
            ),
        )
    )


@register("theta_customer_set_algebra")  # rows-only: estimates are engine-specific
def q_theta_customer_set_algebra(spark, sf_dir):
    """Sketch-only set algebra between the urgent and low customer
    populations: per-(priority, day) theta sketches (the persisted
    level-1 table), union-merged per priority, then
    intersection/difference/union read off the two merged sketches —
    history is never rescanned. This is the question family HLL cannot
    answer natively (its registers support union only; intersection must
    be inferred by inclusion-exclusion with compounding error): theta
    sketches retain hashed samples, so A∩B and A∖B are first-class.
    test_sketches.py certifies merge-losslessness and bounds every
    estimate against the exact hash-green twin."""
    o = load_table(spark, sf_dir, "orders")
    rollup = theta_daily_rollup(
        o, ["o_orderpriority"], F.to_date("o_orderdate"), "o_custkey"
    )
    merged = theta_merged_per_group(rollup, ["o_orderpriority"])
    est = theta_set_algebra(merged, "o_orderpriority", _SET_A, _SET_B)
    return est.select(
        F.round("a_est", 1).alias("a_est"),
        F.round("b_est", 1).alias("b_est"),
        F.round("union_est", 1).alias("union_est"),
        F.round("intersect_est", 1).alias("intersect_est"),
        F.round("a_minus_b_est", 1).alias("a_minus_b_est"),
        F.round("b_minus_a_est", 1).alias("b_minus_a_est"),
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


@register("sketch_rolling_active_users")  # rows-only: estimates are engine-specific
def q_sketch_rolling_active_users(spark, sf_dir):
    """The 100 TB configuration of the MAU curve: per-day HLL sketches of
    user_id (the persisted level-1 table) merged over each trailing
    30-day window — the sliding COUNT DISTINCT answered entirely from
    KB-sized sketches, with the 30× coverage fan-out applied to ONE ROW
    PER DAY instead of the user-day table. Rows-only by design (HLL
    register contents are engine-specific); the hash-green exact twin is
    `rolling_active_users`, and per-day estimate agreement within the
    RSE band is asserted in tests/test_sketches.py."""
    from .sources.events import load_events

    ev = load_events(spark, sf_dir)
    daily = hll_daily_rollup(
        ev, [], F.col("ts").cast("date"), "user_id"
    )
    return hll_sliding_distinct(daily, window_days=30).select(
        "day", F.col("approx_distinct").alias("mau_30d_est")
    )


@register("sketch_token_counts")  # rows-only: sketch layout is a design choice
def q_sketch_token_counts(spark, sf_dir):
    """Heavy-hitter token frequencies from a MERGED count-min sketch —
    the frequency member of the sketch quartet (HLL distinct / KLL
    quantiles / theta set algebra / CM frequencies). Per-source CM
    tables (operators/sketches.count_min_rollup — depth·width rows per
    source, regardless of token volume) are persisted at level 1; this
    query sum-merges them (lossless: counters are linear) and reads the
    top-100 tokens by ESTIMATED count over the distinct-token candidate
    set, the classic CM heavy-hitter workflow. The hash-green exact
    twin is `token_frequencies`; test_sketches.py certifies the CM
    guarantees against it: estimates never under-count, and the
    overestimate stays within (e/width)·N.

    Plan: the merged sketch is ≤ depth·width rows and BROADCASTS to the
    candidate probes — estimation never shuffles the token set; the
    top-100 is TakeOrderedAndProject, exactly like the exact twin."""
    from .functions.text import ws_tokens
    from .operators.sketches import (
        count_min_estimate,
        count_min_merge,
        count_min_rollup,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(ws_tokens(F.col("text"))).alias("tok"),
    ).select("source", F.lower("tok").alias("token"))
    per_source = count_min_rollup(toks, ["source"], "token")
    merged = count_min_merge(per_source, [])
    candidates = toks.select("token").distinct()
    est = count_min_estimate(merged, candidates, "token")
    return est.orderBy(F.col("est_n").desc(), "token").limit(100)

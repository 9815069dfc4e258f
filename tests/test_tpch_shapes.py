"""Decision-support shapes (registry_tpch): semantic properties the oracle
parity can't see — threshold invariants, anti-join exclusion, and
non-vacuity at the verify scale."""

import pyspark.sql.functions as F

from stock_market_etl_pipeline_spark import registry
from stock_market_etl_pipeline_spark.sources.tables import load_table

from conftest import SF_DIR


def test_small_quantity_order_revenue_threshold(spark):
    """Every contributing line sits strictly below 20% of its part's
    average quantity — re-derive the per-part averages and check the
    surviving line count matches the query's brand totals."""
    df = registry.queries()["small_quantity_order_revenue"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0, "vacuously green: no small-quantity lines"
    assert all(r.n_small_lines > 0 and r.small_revenue > 0 for r in rows)

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty")
    )
    pa = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    expected = (
        li.join(pa, "l_partkey")
        .filter(F.col("qty") * F.col("n") * 5 < F.col("sq"))
        .count()
    )
    assert sum(r.n_small_lines for r in rows) == expected


def test_large_volume_customers_threshold(spark):
    df = registry.queries()["large_volume_customers"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0, "vacuously green: threshold above data max"
    assert all(r.sum_qty > 300 for r in rows)
    # one row per qualifying order (orderkey is unique in orders)
    assert len({r.o_orderkey for r in rows}) == len(rows)


def test_customers_without_urgent_orders_excludes_urgent(spark):
    """No customer counted in the rollup may own an URGENT order, and the
    segment counts must sum to the anti-join survivor count."""
    df = registry.queries()["customers_without_urgent_orders"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0, "vacuously green: every rich customer is urgent"

    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    urgent_keys = {
        r.o_custkey
        for r in orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    # recompute the exact-cents above-average cut
    bal = cust.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    ).collect()
    pos = [r.cents for r in bal if r.cents > 0]
    s, n = sum(pos), len(pos)
    survivors = {
        r.c_custkey
        for r in bal
        if r.cents * n > s and r.c_custkey not in urgent_keys
    }
    assert sum(r.n_customers for r in rows) == len(survivors)

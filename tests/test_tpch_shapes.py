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


def test_forecast_revenue_change_band_semantics(spark):
    """Single-row output; recompute the band filter independently."""
    rows = registry.queries()["forecast_revenue_change"](spark, SF_DIR).collect()
    assert len(rows) == 1 and rows[0].n_lines > 0
    li = load_table(spark, SF_DIR, "lineitem")
    n = li.filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
        & F.round(F.col("l_discount") * 100, 0).cast("long").between(5, 7)
        & (F.col("l_quantity").cast("long") < 24)
    ).count()
    assert rows[0].n_lines == n


def test_promo_share_bounds_and_identity(spark):
    """0 <= share <= 100 and share == 100*promo/total on the same row."""
    rows = registry.queries()["promo_revenue_share"](spark, SF_DIR).collect()
    assert len(rows) > 1
    for r in rows:
        assert 0.0 <= r.promo_share_pct <= 100.0
        assert r.promo_revenue <= r.total_revenue
        assert abs(
            r.promo_share_pct - 100.0 * r.promo_revenue / r.total_revenue
        ) < 1e-9


def test_topk_queries_are_deterministic_and_bounded(spark):
    """Q3/Q10 top-k: row caps hold, ordering is by exact revenue with the
    key tiebreak (re-sort the collected rows and compare)."""
    q3 = registry.queries()["unshipped_order_revenue"](spark, SF_DIR).collect()
    assert 0 < len(q3) <= 10
    assert q3 == sorted(q3, key=lambda r: (-r.revenue, r.l_orderkey))
    q10 = registry.queries()["returned_item_customers"](spark, SF_DIR).collect()
    assert 0 < len(q10) <= 20
    assert q10 == sorted(q10, key=lambda r: (-r.returned_revenue, r.c_custkey))


def test_local_supplier_revenue_same_nation_only(spark):
    """Every counted line must have supplier and customer in the same
    nation: recompute the line count via an independent join."""
    rows = registry.queries()["local_supplier_revenue"](spark, SF_DIR).collect()
    assert len(rows) > 0
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, SF_DIR, "supplier").select("s_suppkey", "s_nationkey")
    n_expected = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .count()
    )
    assert sum(r.n_lines for r in rows) == n_expected


def test_late_shipping_counts_each_order_once(spark):
    """An order with several late lines counts once: recompute via a
    per-order max-lag aggregate and compare totals."""
    rows = registry.queries()["late_shipping_priority_counts"](
        spark, SF_DIR
    ).collect()
    assert len(rows) > 0
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    expected = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("sd") > F.date_add(F.col("od"), 60))
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert sum(r.n_late_orders for r in rows) == expected

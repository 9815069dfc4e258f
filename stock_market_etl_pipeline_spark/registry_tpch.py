"""Decision-support query shapes (TPC-H Q17/Q18/Q22 analogs) over the
warehouse tables.

The reference's SQL surface is key-value lookups + grouped aggregates
(reference ``src/database.py:1-210``, ``dashboard/app.py`` summary
panels); these queries extend it with the three classic decision-support
shapes its users would reach for next — correlated-scalar filter
(fraction-of-group-average), HAVING-filtered semi-join, and anti-join —
each expressed decorrelated and shuffle-minimal, the forms Catalyst's
subquery decorrelation targets, stated directly.

Float policy (oracles.py): money sums/averages go through exact
scaled-integer cents (NOTES rule 10); quantities are integer-valued
doubles and are compared/summed as exact int64.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import cents, register, revenue_sum_dec
from .sources.tables import load_table


# ---------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue (fraction of per-group average)
# ---------------------------------------------------------------------------

@register(
    "small_quantity_order_revenue",
    """
    WITH pa AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_partkey
    ),
    small AS (
        SELECT l.l_partkey, l.l_extendedprice, l.l_discount
        FROM lineitem l JOIN pa USING (l_partkey)
        WHERE CAST(l.l_quantity AS BIGINT) * pa.n_lines * 5 < pa.sum_qty
    )
    SELECT p.p_brand,
           COUNT(*) AS n_small_lines,
           CAST(SUM(CAST(ROUND(s.l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(s.l_discount * 100, 0) AS BIGINT)))
                AS BIGINT) / 10000.0 AS small_revenue
    FROM small s JOIN part p ON s.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q_small_quantity_order_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below 20%
    of their part's average quantity, grouped by brand.

    The correlated scalar subquery (``WHERE l_quantity < 0.2 * (SELECT
    AVG(..) WHERE same part)``) is decorrelated into one per-part
    aggregate joined back on l_partkey — both sides of that join hash on
    the SAME key, so the fact table shuffles once and the agg side is
    orders-of-magnitude smaller (|parts|, not |lineitems|).  The
    fraction-of-average predicate is EXACT integer arithmetic:
    ``qty < 0.2 · sum/n``  ⇔  ``qty·n·5 < sum`` over int64 (quantities
    are integer-valued 1..50; sum·5 ≤ 50·|lines/part|·5 — no overflow
    until ~10¹⁶ lines per part), so the filter decision is
    order-independent and bit-identical across engines.  Revenue is the
    exact cents sum (NOTES rule 10).  The part dim joins broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        "l_extendedprice",
        "l_discount",
    )
    pa = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("n_lines")
    )
    small = li.join(pa, "l_partkey").filter(
        F.col("qty") * F.col("n_lines") * F.lit(5) < F.col("sum_qty")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        small.join(F.broadcast(p), small.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            revenue_sum_dec().alias("small_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-volume customers (HAVING-filtered semi-join)
# ---------------------------------------------------------------------------

_Q18_MIN_QTY = 300  # classic TPC-H threshold; 5 orders qualify at sf0.001


@register(
    "large_volume_customers",
    f"""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > {_Q18_MIN_QTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o   ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity exceeds 300, with
    their customer.

    The ``IN (SELECT .. GROUP BY .. HAVING)`` semi-join is a per-orderkey
    aggregate filtered BEFORE any join — the map-side-combinable sum
    shrinks |lineitem| to |orders| rows, and the >300 filter cuts that to
    a sliver (5 rows at sf0.001, ~0.01% of orders at any sf since the
    threshold sits in the distribution tail), so AQE converts the
    orders-side join to broadcast at runtime.  Quantities sum as exact
    int64 (integer-valued doubles), o_totalprice passes through raw.
    The customer join shuffles on c_custkey — no broadcast assumption on
    a dim that is 15M rows at SF100.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q22 shape: well-funded customers with no urgent orders (anti-join)
# ---------------------------------------------------------------------------

@register(
    "customers_without_urgent_orders",
    """
    WITH pos AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               COUNT(*) AS n_pos
        FROM customer WHERE c_acctbal > 0.0
    ),
    rich AS (
        SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
        FROM customer c, pos
        WHERE CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) * pos.n_pos
              > pos.sum_cents
    )
    SELECT r.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(r.c_acctbal * 100, 0) AS BIGINT))
                AS BIGINT) / 100.0 AS total_acctbal
    FROM rich r
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = r.c_custkey
          AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY r.c_mktsegment
    """,
)
def q_customers_without_urgent_orders(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average (positive) balances
    who have never placed an URGENT-priority order, rolled up by market
    segment.

    Every customer has SOME order in this data, so the classic "no orders
    at all" anti-join would be vacuously empty at every verify scale; the
    priority predicate keeps it non-vacuous (18 anti-join survivors at
    sf0.001) while exercising the same plan: filtered orders → LEFT ANTI
    on custkey.  The global above-average cut is ONE 1-row aggregate
    broadcast to every row (the ``days_ago_global_max`` pattern), with
    the comparison in exact integer cents — ``bal > avg`` ⇔
    ``cents(bal)·n > Σcents`` — so the cut is bit-identical across
    engines.  Balance totals are exact cents sums.  The anti-join
    shuffles both sides on custkey; the filtered-orders side is ~20% of
    orders and carries only the key column.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    pos = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(cents("c_acctbal")).alias("sum_cents"),
            F.count(F.lit(1)).alias("n_pos"),
        )
    )
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        cents("c_acctbal") * F.col("n_pos") > F.col("sum_cents")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(cents("c_acctbal")) / F.lit(100.0)).alias("total_acctbal"),
        )
    )

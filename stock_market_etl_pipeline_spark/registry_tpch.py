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


# ---------------------------------------------------------------------------
# Q6 shape: banded-predicate revenue scan
# ---------------------------------------------------------------------------

@register(
    "forecast_revenue_change",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                AS BIGINT) / 10000.0 AS discount_revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
      AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
      AND CAST(l_quantity AS BIGINT) < 24
    """,
)
def q_forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: revenue that would be recovered by dropping
    mid-band discounts on small-quantity 1996 shipments — a pure
    scan-filter-aggregate with NO join and NO shuffle beyond the final
    1-row combine.

    The discount band compares exact integer percent-points (a float
    BETWEEN 0.05 AND 0.07 would 1-ulp-flip at the band edges), quantity
    compares as int64, and the revenue Σ cents(price)·pct(discount) is
    exact int64 closed by one division. The date band and both numeric
    predicates all push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ship = F.col("l_shipdate").cast("date")
    disc_pct = cents("l_discount")
    return (
        li.filter(
            (ship >= F.lit("1996-01-01").cast("date"))
            & (ship < F.lit("1997-01-01").cast("date"))
            & disc_pct.between(5, 7)
            & (F.col("l_quantity").cast("long") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum(cents("l_extendedprice") * cents("l_discount"))
                / F.lit(10000.0)
            ).alias("discount_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share by year
# ---------------------------------------------------------------------------

_REV_CENTS_SQL = (
    "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
)


@register(
    "promo_revenue_share",
    f"""
    SELECT CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS ship_year,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN {_REV_CENTS_SQL} ELSE 0 END) AS BIGINT)
               / 10000.0 AS promo_revenue,
           CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) / 10000.0 AS total_revenue,
           100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN {_REV_CENTS_SQL} ELSE 0 END) AS BIGINT)
                 / CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def q_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: what fraction of each year's revenue came from
    PROMO-type parts — the conditional-aggregate ratio.

    One broadcast join (part dim) and one combinable groupBy on the year;
    both the conditional and total sums are exact int64 cents, so the
    share is a division of identical integers — identical doubles on
    both engines, emitted raw.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_cents = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    promo_cents = F.when(F.col("p_type") == "PROMO", rev_cents).otherwise(
        F.lit(0)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year(F.col("l_shipdate").cast("date"))
            .cast("int")
            .alias("ship_year")
        )
        .agg(
            (F.sum(promo_cents) / F.lit(10000.0)).alias("promo_revenue"),
            (F.sum(rev_cents) / F.lit(10000.0)).alias("total_revenue"),
            (
                F.lit(100.0) * F.sum(promo_cents) / F.sum(rev_cents)
            ).alias("promo_share_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 shape: top unshipped-order revenue for a market segment
# ---------------------------------------------------------------------------

_Q3_CUTOFF = "1998-06-15"
_Q3_SEGMENT = "BUILDING"


@register(
    "unshipped_order_revenue",
    f"""
    WITH agg AS (
        SELECT l.l_orderkey,
               CAST(o.o_orderdate AS DATE) AS order_date,
               o.o_orderpriority,
               CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS rev_cents
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
          AND CAST(o.o_orderdate AS DATE) < DATE '{_Q3_CUTOFF}'
          AND CAST(l.l_shipdate AS DATE) > DATE '{_Q3_CUTOFF}'
        GROUP BY 1, 2, 3
    )
    SELECT l_orderkey, order_date, o_orderpriority,
           rev_cents / 10000.0 AS revenue
    FROM agg
    ORDER BY rev_cents DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_unshipped_order_revenue(spark, sf_dir):
    """TPC-H Q3 shape: the 10 highest-revenue orders from one market
    segment that were placed before the cutoff but still have lineitems
    shipping after it.

    Both date predicates and the segment filter apply BEFORE the joins
    (scan-level pruning); the per-order aggregate shuffles on the same
    orderkey the lineitem join used. Top-k orders on the EXACT int64
    cents sum with orderkey as tiebreak — a deterministic
    TakeOrderedAndProject, never a full sort; the displayed revenue is
    the same integer divided once.
    """
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").cast("date")
            < F.lit(_Q3_CUTOFF).cast("date")
        )
        .select(
            "o_orderkey", "o_custkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").cast("date")
            > F.lit(_Q3_CUTOFF).cast("date")
        )
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev_cents = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "order_date", "o_orderpriority")
        .agg(F.sum(rev_cents).alias("rev_cents"))
    )
    return (
        agg.orderBy(F.col("rev_cents").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey", "order_date", "o_orderpriority",
            (F.col("rev_cents") / F.lit(10000.0)).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q5 shape: local-supplier revenue per nation
# ---------------------------------------------------------------------------

@register(
    "local_supplier_revenue",
    f"""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) / 10000.0 AS local_revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q_local_supplier_revenue(spark, sf_dir):
    """TPC-H Q5 shape: revenue where the customer and the supplier sit in
    the SAME nation — the multi-join with a cross-table equality
    constraint.

    Join order is chosen so each shuffle key is already in hand: orders ⋈
    customer on custkey, the result ⋈ lineitem on orderkey (the big
    fact's only shuffle), then supplier ⋈ by suppkey with the same-nation
    constraint as a residual join condition (supplier broadcasts — it is
    the smallest dim after nation), and nation broadcasts for the display
    name. Revenue is the exact int64 cents sum.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_cents = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum(rev_cents) / F.lit(10000.0)).alias("local_revenue"),
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue by customer
# ---------------------------------------------------------------------------

@register(
    "returned_item_customers",
    f"""
    WITH agg AS (
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation,
               CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS rev_cents
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3, 4
    )
    SELECT c_custkey, c_name, c_acctbal, nation,
           rev_cents / 10000.0 AS returned_revenue
    FROM agg
    ORDER BY rev_cents DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_returned_item_customers(spark, sf_dir):
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    (l_returnflag = 'R').

    The returnflag filter pushes into the lineitem scan; the per-customer
    aggregate reuses the custkey partitioning of the customer join;
    nation broadcasts. Top-k on the EXACT cents integer with custkey
    tiebreak (deterministic TakeOrderedAndProject), the displayed
    revenue divides that same integer.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_cents = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    agg = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.sum(rev_cents).alias("rev_cents"))
    )
    return (
        agg.orderBy(F.col("rev_cents").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey", "c_name", "c_acctbal", "nation",
            (F.col("rev_cents") / F.lit(10000.0)).alias("returned_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q4 shape: late-shipping order counts by priority (EXISTS semi-join)
# ---------------------------------------------------------------------------

@register(
    "late_shipping_priority_counts",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60
    )
    GROUP BY 1
    """,
)
def q_late_shipping_priority_counts(spark, sf_dir):
    """TPC-H Q4 shape: how many orders per priority class have at least
    one lineitem that shipped more than 60 days after the order date.

    The correlated EXISTS is a LEFT SEMI join with the date comparison as
    a residual condition — each order counts ONCE however many late lines
    it has, and the semi-join stops probing an order's lines at the first
    match instead of materializing the fanout. One orderkey shuffle
    (lineitem carries only key + shipdate), then a tiny combinable count
    by priority. Date arithmetic is exact integer day addition on both
    engines — no timestamp floats anywhere.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sdate")
    )
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.sdate > F.date_add(o.odate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )

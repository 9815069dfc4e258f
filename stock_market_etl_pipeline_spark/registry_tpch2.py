"""Decision-support query shapes, part 2 (TPC-H Q2/Q7/Q9/Q11/Q15/Q16/
Q19/Q21 analogs) over the warehouse tables.

Continues ``registry_tpch.py`` (reference SQL surface:
``src/database.py:1-210`` key-value lookups + grouped aggregates; these
are the classic decision-support shapes beyond it, adapted to this
schema — no partsupp/receiptdate/shipmode columns exist, so each analog
states its substitution in the docstring).  New plan shapes exercised
here: cross-dim nation-pair fact join (Q7), profit expression over two
money columns (Q9), global-fraction HAVING via a broadcast 1-row scalar
(Q11), scalar-max equality join (Q15), NOT-IN exclusion as a broadcast
anti-join under a distinct-count rollup (Q16), disjunctive
brand/size/qty band predicates (Q19), argmin-per-group via min +
equality join-back (Q2), and a unique-max-within-group window test
(Q21).

Float policy (oracles.py): money goes through exact scaled-integer
cents; fraction predicates are cross-multiplied into exact int64
comparisons (never a float ratio); unit prices use integer floor
division to stay engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import cents, register, revenue_sum_dec
from .sources.tables import load_table

_REV_CENTS = lambda: F.sum(  # noqa: E731
    cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
)

_REV_CENTS_SQL = (
    "SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))"
)


# ---------------------------------------------------------------------------
# Q7 shape: cross-nation trade volume by nation pair and ship year
# ---------------------------------------------------------------------------

@register(
    "nation_pair_trade",
    f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           COUNT(*) AS n_lines,
           CAST({_REV_CENTS_SQL} AS BIGINT) / 10000.0 AS trade_revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def q_nation_pair_trade(spark, sf_dir):
    """TPC-H Q7 shape: revenue shipped between DIFFERENT nations, grouped
    by (supplier nation, customer nation, ship year).

    The classic Q7 restricts to two named nations; this analog keeps all
    cross-nation pairs (output is bounded by |nations|² · |years| — a few
    thousand rows at ANY corpus scale, so the full matrix costs nothing
    extra and is more useful).  Plan: the fact joins orders on orderkey
    (the one big shuffle), customer rides the o_custkey shuffle,
    supplier and both nation copies broadcast.  The <> filter runs on
    broadcast-joined dim columns BEFORE the aggregate, so asymmetric
    pairs never reach the shuffle.  Revenue is the exact cents sum.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            revenue_sum_dec().alias("trade_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape: product profit by supplier nation and order year
# ---------------------------------------------------------------------------

@register(
    "product_profit_by_nation_year",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))
                    - CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT) * 100)
                AS BIGINT) / 10000.0 AS profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q_product_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape: profit on widget-family parts by supplier nation
    and order year.

    This schema has no partsupp.ps_supplycost, so cost substitutes the
    part's retail price × quantity (stated, deterministic); profit per
    line is the EXACT integer
    ``cents(ext)·(100−cents(disc)) − cents(retail)·qty·100`` (both terms
    in 10⁻⁴-dollar units; |line| ≤ ~5·10⁹ ⇒ int64 sums have sf-thousands
    of headroom).  The name LIKE filter prunes the part dim BEFORE its
    broadcast join, which then prunes the fact rows before the orderkey
    shuffle — the same predicate placement Catalyst picks for Q9.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
        "l_extendedprice", "l_discount",
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("order_year")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit_line = (
        cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
        - cents("p_retailprice") * F.col("qty") * F.lit(100)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "order_year")
        .agg((F.sum(profit_line) / F.lit(10000.0)).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q11 shape: important parts (share-of-global-value HAVING)
# ---------------------------------------------------------------------------

@register(
    "important_parts_value",
    f"""
    WITH pv AS (
        SELECT l_partkey,
               COUNT(*) AS n_lines,
               CAST({_REV_CENTS_SQL} AS BIGINT) AS value_cents
        FROM lineitem GROUP BY 1
    ),
    g AS (SELECT SUM(value_cents) AS tot, COUNT(*) AS n_parts FROM pv)
    SELECT pv.l_partkey, p.p_name, pv.n_lines,
           pv.value_cents / 10000.0 AS part_value
    FROM pv, g
    JOIN part p ON pv.l_partkey = p.p_partkey
    WHERE pv.value_cents * g.n_parts * 2 > 3 * g.tot
    """,
)
def q_important_parts_value(spark, sf_dir):
    """TPC-H Q11 shape: parts whose traded value exceeds 1.5× the average
    per-part value (the share-of-global HAVING).

    No partsupp ⇒ "stock value" substitutes lineitem traded value.  The
    per-part rollup is localCheckpoint-materialized ONCE (|parts| rows)
    and shared by the global total and the filter probe — without it
    Catalyst re-derives the rollup for the 1-row aggregate and the fact
    is scanned twice (the corpus_prep trade, measured winning at sf1).
    The 1-row total broadcasts to every per-part row (the
    ``days_ago_global_max`` pattern), and the fraction predicate is
    cross-multiplied into exact int64:
    ``value > 1.5·tot/n`` ⇔ ``value·n·2 > 3·tot`` (value ≤ ~10¹²·n ⇒
    headroom past sf10).  The 1.5× threshold is verified non-vacuous at
    sf0.001/0.01/0.1 (2/29/252 rows).  Part names join by broadcast
    AFTER the filter — only survivors pay the dim join.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    pv = (
        li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _REV_CENTS().alias("value_cents"),
        )
        .localCheckpoint(eager=True)
    )
    g = pv.agg(
        F.sum("value_cents").alias("tot"), F.count(F.lit(1)).alias("n_parts")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        pv.crossJoin(F.broadcast(g))
        .filter(
            F.col("value_cents") * F.col("n_parts") * F.lit(2)
            > F.lit(3) * F.col("tot")
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            "p_name",
            "n_lines",
            (F.col("value_cents") / F.lit(10000.0)).alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier(s) by revenue in a quarter (scalar-max join)
# ---------------------------------------------------------------------------

_Q15_LO, _Q15_HI = "1996-01-01", "1996-04-01"


@register(
    "top_supplier_revenue",
    f"""
    WITH sr AS (
        SELECT l_suppkey,
               CAST({_REV_CENTS_SQL} AS BIGINT) AS rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
          AND l_shipdate <  TIMESTAMP '{_Q15_HI}'
        GROUP BY 1
    )
    SELECT sr.l_suppkey AS s_suppkey, s.s_name,
           sr.rev_cents / 10000.0 AS quarter_revenue
    FROM sr JOIN supplier s ON sr.l_suppkey = s.s_suppkey
    WHERE sr.rev_cents = (SELECT MAX(rev_cents) FROM sr)
    """,
)
def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) whose 1996-Q1 shipped revenue
    equals the maximum across all suppliers.

    The view+scalar-subquery formulation decorrelates to: per-supplier
    quarter revenue (one suppkey aggregate over the date-pruned scan —
    the band reaches the parquet scan as timestamp bounds), a 1-row MAX
    broadcast back, and an exact-cents equality filter.  The rollup is
    localCheckpoint-materialized (|suppliers| rows) so the MAX and the
    probe share it — otherwise the banded fact scan runs twice.
    Equality on the
    exact int64 makes "the max" engine-portable (a float revenue would
    1-ulp-tie); if several suppliers genuinely tie they ALL return, in
    both engines.  Supplier names broadcast to the ≤-a-few winners.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    sr = (
        li.groupBy("l_suppkey")
        .agg(_REV_CENTS().alias("rev_cents"))
        .localCheckpoint(eager=True)
    )
    mx = sr.agg(F.max("rev_cents").alias("max_cents"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sr.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            (F.col("rev_cents") / F.lit(10000.0)).alias("quarter_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape: supplier diversity by part attrs, excluding flagged suppliers
# ---------------------------------------------------------------------------

@register(
    "supplier_count_by_part_attrs",
    """
    WITH g AS (
        SELECT SUM(CAST(ROUND(s_acctbal * 100, 0) AS BIGINT)) AS tot,
               COUNT(*) AS n FROM supplier
    ),
    excluded AS (
        SELECT s_suppkey FROM supplier, g
        WHERE CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) * g.n < g.tot
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND p.p_brand <> 'Brand#5'
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY 1, 2, 3
    """,
)
def q_supplier_count_by_part_attrs(spark, sf_dir):
    """TPC-H Q16 shape: how many DISTINCT (non-flagged) suppliers ship
    each (brand, type, size) combination, over an IN-list of sizes and a
    brand exclusion.

    No s_comment ⇒ the "complaints" NOT-IN set substitutes suppliers with
    below-average account balance (exact cents cross-multiplied cut —
    ~half the suppliers at every sf, so the anti-join is never vacuous).
    Plan: the exclusion set is a broadcast LEFT ANTI (suppliers are tiny
    relative to the fact at any scale — |suppliers| = 0.01·|customers|),
    part attrs broadcast with size/brand predicates pruning the dim
    BEFORE the join, and the distinct-count shuffles once on the
    (brand, type, size) group key with suppkey as the distinct column.
    """
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal"
    )
    g = sup.agg(
        F.sum(cents("s_acctbal")).alias("tot"), F.count(F.lit(1)).alias("n")
    )
    excluded = (
        sup.crossJoin(F.broadcast(g))
        .filter(cents("s_acctbal") * F.col("n") < F.col("tot"))
        .select("s_suppkey")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
            & (F.col("p_brand") != "Brand#5")
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(excluded),
            li.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive brand/size/quantity band revenue
# ---------------------------------------------------------------------------

@register(
    "disjunctive_band_revenue",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST({_REV_CENTS_SQL} AS BIGINT) / 10000.0 AS band_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 15
           AND CAST(l.l_quantity AS BIGINT) BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 10 AND 30
           AND CAST(l.l_quantity AS BIGINT) BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 20 AND 50
           AND CAST(l.l_quantity AS BIGINT) BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_band_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue from three OR'd (brand, size-band,
    quantity-band) conjuncts — the classic disjunctive-predicate plan
    test.

    The quantity bands apply to the FACT side and the brand/size bands to
    the DIM side; Catalyst distributes the disjunction: the part dim is
    pre-filtered to the union of the three brand/size boxes before its
    broadcast (dim rows outside every box never ship), and the residual
    OR runs post-join inside codegen.  Quantities compare as exact int64;
    revenue is the exact cents sum.  Output is one global row — COUNT +
    revenue — so the aggregate is a map-side-combinable scalar.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        "l_extendedprice", "l_discount",
    )
    box = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("qty").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(10, 30)
            & F.col("qty").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(20, 50)
            & F.col("qty").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(box)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            revenue_sum_dec().alias("band_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 shape: cheapest supplier per part (argmin via min + equality join-back)
# ---------------------------------------------------------------------------

@register(
    "min_cost_supplier_per_part",
    """
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               (CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * 10000)
               // CAST(l_quantity AS BIGINT) AS unit_micros
        FROM lineitem
    ),
    best AS (
        SELECT l_partkey, MIN(unit_micros) AS min_unit_micros
        FROM unit GROUP BY 1
    ),
    winner AS (
        SELECT u.l_partkey, b.min_unit_micros,
               MIN(u.l_suppkey) AS best_suppkey
        FROM unit u
        JOIN best b ON u.l_partkey = b.l_partkey
                   AND u.unit_micros = b.min_unit_micros
        GROUP BY 1, 2
    )
    SELECT w.l_partkey AS p_partkey, p.p_name, w.best_suppkey,
           s.s_name, n.n_name AS supp_nation, w.min_unit_micros
    FROM winner w
    JOIN part p     ON w.l_partkey = p.p_partkey
    JOIN supplier s ON w.best_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    """,
)
def q_min_cost_supplier_per_part(spark, sf_dir):
    """TPC-H Q2 shape: for every part, the supplier offering the minimum
    observed unit price, with supplier name and nation.

    No partsupp.ps_supplycost ⇒ unit cost substitutes the observed
    lineitem unit price.  To keep the argmin engine-portable the unit
    price is an INTEGER: ``cents(extendedprice)·10⁴ floor-div qty``
    (micro-dollars/unit; floor division of positive int64 is identical
    in Spark's ``div`` and DuckDB's ``//``, where a float ratio would
    1-ulp-flip ties).  The correlated ``WHERE cost = (SELECT MIN ...
    same part)`` collapses to a SINGLE-PASS argmin:
    ``min(struct(unit_micros, suppkey))`` per part — lexicographic
    struct ordering makes the winner the cheapest supplier with
    MIN(suppkey) as deterministic tiebreak, in one fact scan and one
    shuffle (the oracle states the same result as the classic
    decorrelated join-back, proving the equivalence).  Dims broadcast
    onto the |parts|-sized winner set.
    """
    unit = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            "(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * 10000)"
            " div CAST(l_quantity AS BIGINT)"
        ).alias("unit_micros"),
    )
    winner = (
        unit.groupBy("l_partkey")
        .agg(
            F.min(F.struct("unit_micros", "l_suppkey")).alias("m")
        )
        .select(
            "l_partkey",
            F.col("m.unit_micros").alias("min_unit_micros"),
            F.col("m.l_suppkey").alias("best_suppkey"),
        )
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        winner.join(F.broadcast(p), winner.l_partkey == p.p_partkey)
        .join(F.broadcast(s), winner.best_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "best_suppkey",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            "min_unit_micros",
        )
    )


# ---------------------------------------------------------------------------
# Q21 shape: sole-last-shipping supplier in multi-supplier orders
# ---------------------------------------------------------------------------

@register(
    "sole_last_supplier_orders",
    """
    WITH ss AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_ship
        FROM lineitem GROUP BY 1, 2
    ),
    w1 AS (
        SELECT l_orderkey, l_suppkey, supp_ship,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
               MAX(supp_ship) OVER (PARTITION BY l_orderkey) AS order_ship
        FROM ss
    ),
    flagged AS (
        SELECT *,
               SUM(CASE WHEN supp_ship = order_ship THEN 1 ELSE 0 END)
                   OVER (PARTITION BY l_orderkey) AS n_at_max
        FROM w1
    )
    SELECT f.l_suppkey AS s_suppkey, s.s_name,
           COUNT(*) AS n_orders_waited
    FROM flagged f JOIN supplier s ON f.l_suppkey = s.s_suppkey
    WHERE f.n_supp >= 2 AND f.n_at_max = 1 AND f.supp_ship = f.order_ship
    GROUP BY 1, 2
    """,
)
def q_sole_last_supplier_orders(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the UNIQUE last shipper in
    orders involving several suppliers — the EXISTS(other supplier) AND
    NOT EXISTS(other supplier shipping later) double-correlation.

    No receipt/commit dates ⇒ "kept the order waiting" substitutes
    "strictly latest ship date among ≥2 suppliers of the order".  Both
    correlated EXISTS collapse into ONE window pass over the per-
    (order, supplier) max-shipdate rollup: n_supp ≥ 2 is the EXISTS,
    n_at_max = 1 the NOT-EXISTS (a timestamp tie means nobody is
    strictly last — dropping ties is what makes the result
    deterministic and engine-portable).  Shuffle budget: the fact
    shuffles ONCE into the (orderkey, suppkey) rollup; the windows then
    re-key that rollup to orderkey alone (a second, rollup-sized
    exchange — unavoidable natively, since HashPartitioning(order, supp)
    does not satisfy PARTITION BY order), and the final per-supplier
    count is a |suppliers|-sized aggregate.  Supplier names broadcast.
    """
    ss = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_ship"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = ss.select(
        "l_orderkey",
        "l_suppkey",
        "supp_ship",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.max("supp_ship").over(w).alias("order_ship"),
    ).withColumn(
        "n_at_max",
        F.sum(
            F.when(F.col("supp_ship") == F.col("order_ship"), 1).otherwise(0)
        ).over(w),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.filter(
            (F.col("n_supp") >= 2)
            & (F.col("n_at_max") == 1)
            & (F.col("supp_ship") == F.col("order_ship"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_orders_waited"))
    )


# ---------------------------------------------------------------------------
# Q20 shape: dominant supplier per part (nested aggregate + majority cut)
# ---------------------------------------------------------------------------

@register(
    "dominant_part_suppliers",
    """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_ps
        FROM lineitem GROUP BY 1, 2
    ),
    pt AS (
        SELECT l_partkey,
               CAST(SUM(qty_ps) AS BIGINT) AS qty_p,
               COUNT(*) AS n_supp
        FROM ps GROUP BY 1
    )
    SELECT ps.l_partkey, ps.l_suppkey, s.s_name,
           ps.qty_ps, pt.qty_p, pt.n_supp,
           ps.qty_ps * 1.0 / pt.qty_p AS share
    FROM ps
    JOIN pt USING (l_partkey)
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    WHERE pt.n_supp >= 2 AND ps.qty_ps * pt.n_supp > 3 * pt.qty_p
    """,
)
def q_dominant_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped more than 3× their FAIR
    SHARE of a part's total quantity, among parts served by ≥2
    suppliers — the supply-concentration risk report (Q20's
    excess-availqty predicate adapted: no partsupp.ps_availqty exists,
    so excess-over-fair-share of shipped volume substitutes, stated; a
    strict-majority cut is vacuous on this data's near-uniform supplier
    mix — 0 rows at every verify scale — while 3× fair share selects
    3/360/761 rows at sf0.001/0.01/0.1, pinned by the registry test).

    The nested aggregate derives the per-part total FROM the
    (part, supplier) rollup — never a second fact scan. The rollup is
    FACT-sized (≈ one row per distinct (part, supplier), ~0.9× the
    lineitem count at any sf), so it must not be checkpointed or
    consumed twice (the r12 sweep caught the original eager
    localCheckpoint at ×14.9 for 10× rows — the mad_daily_moves
    lesson's complement: a fact-sized table NEVER wants a checkpoint).
    Instead the ticks() trick: hash-partition on l_partkey ONCE —
    HashPartitioning(l_partkey) satisfies the (l_partkey, l_suppkey)
    groupBy AND the per-part totals window, so the rollup and the
    nested aggregate run on a single exchange with no second
    materialization. The fair-share cut cross-multiplies to exact
    int64 (``qty_ps·n_supp > 3·qty_p``); the n_supp ≥ 2 guard keeps
    single-source parts out. Share divides exact ints raw; supplier
    names broadcast onto the winners only.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("qty")
    )
    ps = (
        li.repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty").alias("qty_ps"))
    )
    wp = Window.partitionBy("l_partkey")
    j = ps.select(
        "l_partkey", "l_suppkey", "qty_ps",
        F.sum("qty_ps").over(wp).alias("qty_p"),
        F.count(F.lit(1)).over(wp).alias("n_supp"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        j.filter(
            (F.col("n_supp") >= 2)
            & (F.col("qty_ps") * F.col("n_supp") > 3 * F.col("qty_p"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            "s_name",
            "qty_ps",
            "qty_p",
            "n_supp",
            (F.col("qty_ps") * 1.0 / F.col("qty_p")).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort lifetime-value curves (first-order cohort × order-age revenue)
# ---------------------------------------------------------------------------

@register(
    "clv_cohort_revenue",
    """
    WITH co AS (
        SELECT o_custkey,
               CAST(date_trunc('month', MIN(o_orderdate)) AS DATE)
                   AS cohort_month
        FROM orders GROUP BY 1
    )
    SELECT co.cohort_month,
           CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate))
                - (year(co.cohort_month) * 12 + month(co.cohort_month))
                AS INTEGER) AS age_months,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) / 100.0 AS revenue
    FROM orders o JOIN co ON o.o_custkey = co.o_custkey
    GROUP BY 1, 2
    """,
)
def q_clv_cohort_revenue(spark, sf_dir):
    """Customer-lifetime-value cohort curves: customers are cohorted by
    their FIRST order month, and every later order contributes revenue
    at its month-age relative to that cohort — the standard retention-
    revenue triangle (cohort × age) behind LTV reporting (the orders-
    table analog of the events-table ``user_retention_cohorts``).

    Plan: the cohort assignment is a per-custkey MIN aggregate joined
    back to orders ON THE SAME custkey — both sides hash-partition on
    the one key, so the fact shuffles once and the triangle aggregate
    (≤ |months|² groups) is map-side-combinable.  Month age is pure
    integer calendar arithmetic (y·12+m differences — no float dates);
    revenue sums exact cents of o_totalprice (2dp money, NOTES rule
    10).  Output is bounded by the square of the observed month span at
    any corpus scale.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    co = o.groupBy(F.col("o_custkey").alias("co_custkey")).agg(
        F.trunc(F.min("o_orderdate").cast("date"), "MM").alias("cohort_month")
    )
    age = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
        - (F.year("cohort_month") * 12 + F.month("cohort_month"))
    ).cast("int")
    return (
        o.join(co, o.o_custkey == co.co_custkey)
        .groupBy("cohort_month", age.alias("age_months"))
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# ABC / Pareto revenue classification
# ---------------------------------------------------------------------------


@register(
    "abc_revenue_classes",
    """
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS rev_u
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT rev_u,
               SUM(rev_u) OVER (ORDER BY rev_u DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_u,
               SUM(rev_u) OVER () AS total_u
        FROM pr
    ),
    classed AS (
        SELECT CASE WHEN 5 * cum_u <= 4 * total_u THEN 'A'
                    WHEN 20 * cum_u <= 19 * total_u THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev_u, total_u
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_u) AS BIGINT) / 10000.0 AS class_revenue,
           CAST(CAST(SUM(rev_u) AS BIGINT) AS DOUBLE)
               / CAST(MAX(total_u) AS BIGINT) AS revenue_share
    FROM classed GROUP BY abc_class
    """,
)
def q_abc_revenue_classes(spark, sf_dir):
    """Pareto / ABC inventory classification: parts ranked by discounted
    revenue, class A = parts whose cumulative share is within 80% of
    total revenue, B to 95%, C the tail — the concentration summary
    behind "20% of parts drive 80% of revenue".

    Exactness: per-part revenue is the exact cents·(100−disc) int64 unit
    (revenue_sum_dec's integer core); the class cut is CROSS-MULTIPLIED
    (5·cum ≤ 4·total, 20·cum ≤ 19·total) so the 80/95% thresholds are
    exact integer comparisons — a float `cum/total <= 0.8` would 1-ulp
    flip at boundary parts. ×20 headroom: total ≈ 6e16 at sf10 → 1.2e18
    < 2⁶³. The final share division converts both int64s to double
    (correctly rounded, identical cross-engine) and divides once.

    Plan: ONE fact shuffle (groupBy l_partkey); the ranking window runs
    over the PARTS-SIZED rollup — a deliberate rollup-sized global sort
    (the Pareto curve is inherently a total order over parts; |parts| ≪
    |lineitem| by the fan-out factor, and only (rev_u, partkey) pairs
    sort). Output is 3 rows.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
            "rev_row"
        ),
    )
    pr = li.groupBy("l_partkey").agg(F.sum("rev_row").alias("rev_u"))
    w_cum = (
        Window.orderBy(F.col("rev_u").desc(), F.col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy()
    ranked = pr.select(
        "rev_u",
        F.sum("rev_u").over(w_cum).alias("cum_u"),
        F.sum("rev_u").over(w_all).alias("total_u"),
    )
    classed = ranked.select(
        F.when(5 * F.col("cum_u") <= 4 * F.col("total_u"), "A")
        .when(20 * F.col("cum_u") <= 19 * F.col("total_u"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_u",
        "total_u",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum("rev_u").cast("bigint") / 10000.0).alias("class_revenue"),
        (
            F.sum("rev_u").cast("bigint").cast("double")
            / F.max("total_u").cast("bigint")
        ).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# New vs returning customer revenue by month
# ---------------------------------------------------------------------------


@register(
    "new_vs_returning_revenue",
    """
    WITH fc AS (
        SELECT o_custkey,
               MIN(date_trunc('month', o_orderdate)) AS first_month
        FROM orders GROUP BY o_custkey
    ),
    tagged AS (
        SELECT date_trunc('month', o.o_orderdate) AS order_month,
               CASE WHEN date_trunc('month', o.o_orderdate) = fc.first_month
                    THEN 'new' ELSE 'returning' END AS customer_class,
               o.o_custkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders o JOIN fc ON o.o_custkey = fc.o_custkey
    )
    SELECT CAST(order_month AS DATE) AS order_month,
           customer_class,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(price_cents) AS BIGINT) / 100.0 AS revenue
    FROM tagged GROUP BY 1, 2
    """,
)
def q_new_vs_returning_revenue(spark, sf_dir):
    """Monthly revenue split by acquisition status: an order is 'new'
    revenue iff it falls in its customer's FIRST calendar month of
    ordering, else 'returning' — the growth-accounting view every
    subscription/commerce dashboard opens with (the cohort triangle
    clv_cohort_revenue generalizes this; this is its first-diagonal
    slice stated directly).

    Plan: the first-month rollup and the fact side hash on the SAME key
    (o_custkey), so Catalyst plans one exchange reused by both the
    aggregate and the join; the month groupBy then reduces to
    |months|·2 rows. Money is exact cents (NOTES rule 10); months
    compare as date_trunc values (calendar arithmetic, no floats).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        cents("o_totalprice").alias("price_cents"),
    )
    fc = o.groupBy("o_custkey").agg(
        F.min("order_month").alias("first_month")
    )
    tagged = o.join(fc, "o_custkey").select(
        F.col("order_month").cast("date").alias("order_month"),
        F.when(F.col("order_month") == F.col("first_month"), "new")
        .otherwise("returning")
        .alias("customer_class"),
        "o_custkey",
        "price_cents",
    )
    return tagged.groupBy("order_month", "customer_class").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        (F.sum("price_cents").cast("bigint") / 100.0).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Discount-band revenue effectiveness
# ---------------------------------------------------------------------------


@register(
    "discount_band_revenue",
    """
    WITH b AS (
        SELECT CAST(round(l_discount * 100) AS INTEGER)    AS discount_pct,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
               CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
                                                            AS net_e4,
               l_quantity
        FROM lineitem
    ),
    tot AS (SELECT CAST(SUM(net_e4) AS BIGINT) AS t FROM b)
    SELECT discount_pct,
           CAST(COUNT(*) AS BIGINT)                    AS n_items,
           CAST(SUM(price_cents) AS BIGINT) / 100.0    AS gross_revenue,
           CAST(SUM(net_e4) AS BIGINT) / 10000.0       AS net_revenue,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               * 1.0 / COUNT(*)                        AS avg_quantity,
           CAST(SUM(net_e4) AS BIGINT) * 1.0 / t       AS revenue_share
    FROM b, tot
    GROUP BY discount_pct, t
    """,
)
def q_discount_band_revenue(spark, sf_dir):
    """Revenue mix by discount percentage band (0%..10% — l_discount
    lives on the 1% grid): item counts, gross vs net revenue, average
    order quantity, and each band's share of total net revenue — the
    'is discounting buying us volume?' rollup behind Q19's banded
    predicates.

    Exactness: the band key rounds the 2dp discount onto its integer
    percent; revenue is the revenue_sum_dec cents×(100−disc) idiom
    (exact int64, ÷10⁴ once); avg_quantity divides two exact ints
    (quantities are integer-valued doubles); revenue_share divides the
    band's exact int64 by the broadcast 1-row exact total. Every
    emitted double is ONE division of identical integers — raw, no
    rounding needed.

    Plan: one lineitem scan, one 11-group aggregate, one broadcast of
    the 1-row total — the share never re-scans the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        cents("l_discount").cast("int").alias("discount_pct"),
        cents("l_extendedprice").alias("price_cents"),
        (
            cents("l_extendedprice")
            * (F.lit(100) - cents("l_discount"))
        ).alias("net_e4"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    agg = b.groupBy("discount_pct").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("price_cents").alias("gross_cents"),
        F.sum("net_e4").alias("net_e4"),
        F.sum("qty").alias("qty_sum"),
    )
    tot = agg.agg(F.sum("net_e4").alias("t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "discount_pct",
        "n_items",
        (F.col("gross_cents") / F.lit(100.0)).alias("gross_revenue"),
        (F.col("net_e4") / F.lit(10000.0)).alias("net_revenue"),
        (F.col("qty_sum") * F.lit(1.0) / F.col("n_items")).alias(
            "avg_quantity"
        ),
        (F.col("net_e4") * F.lit(1.0) / F.col("t")).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (zero-order customers kept)
# ---------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    """
    WITH per_cust AS (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority = '1-URGENT'
        GROUP BY 1
    )
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per_cust
    GROUP BY 1
    """,
)
def q_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 analog: how many customers placed exactly N qualifying
    orders — INCLUDING the zero-order customers the left join preserves
    (the reason Q13 is the classic outer-join benchmark query; customers
    who only ever placed excluded-class orders also land in bucket 0).
    Substitution: the schema has no o_comment, so the qualifying
    predicate is o_orderpriority = '1-URGENT' instead of NOT LIKE
    '%special%requests%' — same plan shape, a non-key residual filtered
    BEFORE the join, chosen so the zero bucket is robustly non-vacuous
    (18/150 customers at sf0.001, 203/1500 at sf0.01 — asserted in
    tests/test_registry.py).
    Completes the decision-support suite: every TPC-H shape expressible
    on this schema now has an analog (Q12 alone is data-limited — no
    shipmode/commitdate/receiptdate, recorded in NOTES).

    Plan: the exclusion filter pushes into the orders scan; orders
    pre-aggregate to (custkey, n) BEFORE the join — the outer join then
    matches one row per customer instead of fanning out order rows, and
    both sides shuffle once on custkey (co-partitioned sort-merge). The
    final histogram groupBy sees one row per customer and emits at most
    a few hundred distinct counts; COALESCE(n, 0) encodes the unmatched
    (zero-order) customers. Counts are exact integers — no float policy
    needed."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_cust = c.join(
        o, c.c_custkey == o.o_custkey, "left"
    ).select(F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"))
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )

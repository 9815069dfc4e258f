"""Distributional statistics: concentration indices, autocorrelation,
quality-funnel observability, session bounce rates.

The concentration pair (Gini, HHI) is the inequality toolkit an analyst
runs over revenue rollups; the ACF query is the time-series diagnostic
behind "is this series momentum or noise"; the funnel makes the
doc-quality filter's per-rule attrition visible (which rule is doing the
cutting); bounce rate is the classic session-quality KPI.

Exactness discipline (NOTES rules 10/11): every statistic here is closed
over EXACT integer aggregates (cents, ranks, counts) widened to
DECIMAL(38)/HUGEINT where products clear int64, and finished by a
constant number of correctly-rounded double ops (cast / sqrt / one
multiply chain / one divide) — identical on both engines, emitted raw.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import cents, register
from .sources.events import load_events
from .sources.tables import load_table
from .sources.ticks import ticks
from .oracles import WITH_TICKS


def _dec(c):
    return c.cast("decimal(38,0)")


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue, per nation
# ---------------------------------------------------------------------------


@register(
    "gini_revenue_concentration",
    """
    WITH cust AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS spend_cents
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT c.c_nationkey AS nationkey, cust.spend_cents,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_nationkey
                   ORDER BY cust.spend_cents, cust.custkey) AS rn
        FROM cust JOIN customer c ON cust.custkey = c.c_custkey
    ),
    g AS (
        SELECT nationkey,
               CAST(COUNT(*) AS HUGEINT)                    AS n,
               SUM(CAST(spend_cents AS HUGEINT))            AS s,
               SUM(CAST(rn AS HUGEINT) * spend_cents)       AS sw
        FROM ranked GROUP BY 1
    )
    SELECT n.n_name,
           CAST(g.n AS BIGINT) AS n_customers,
           CAST(2 * g.sw - (g.n + 1) * g.s AS DOUBLE)
               / CAST(g.n * g.s AS DOUBLE) AS gini
    FROM g JOIN nation n ON g.nationkey = n.n_nationkey
    """,
)
def q_gini_revenue_concentration(spark, sf_dir):
    """Gini coefficient of customer order-revenue inequality per nation:
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over each nation's customers
    ranked by total spend ascending.

    Exactness: spend is exact int64 cents; the rank-weighted sum and the
    closing products run in DECIMAL(38)/HUGEINT (rn·x ≈ 10¹³ and n·Σx
    clear int64 once nations hold ~10⁶ customers), so numerator and
    denominator are exact integers — ties in spend are rank-order
    invariant for Σ i·xᵢ (swapping equal x across adjacent ranks changes
    nothing), and the custkey tiebreak makes the ranking deterministic
    anyway. One double division closes it, emitted raw.

    Plan: orders aggregate to customer grain first (the big shuffle runs
    on o_custkey and REDUCES 10:1 before anything joins), customer dim
    joins on the rollup, and the ranking window partitions by nation over
    customer-grain rows only. Output is 25 rows at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(cents("o_totalprice")).alias("spend_cents")
    )
    ranked = cust.join(
        customer.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_nationkey").alias("nationkey"),
        ),
        "custkey",
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("nationkey").orderBy("spend_cents", "custkey")
        ),
    )
    g = ranked.groupBy("nationkey").agg(
        _dec(F.count(F.lit(1))).alias("n"),
        F.sum(_dec(F.col("spend_cents"))).alias("s"),
        F.sum(_dec(F.col("rn")) * _dec(F.col("spend_cents"))).alias("sw"),
    )
    return g.join(
        F.broadcast(nation),
        g.nationkey == F.col("n_nationkey"),
    ).select(
        "n_name",
        F.col("n").cast("bigint").alias("n_customers"),
        (
            (F.lit(2) * F.col("sw") - (F.col("n") + 1) * F.col("s"))
            .cast("double")
            / (F.col("n") * F.col("s")).cast("double")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman index of supplier revenue, per nation
# ---------------------------------------------------------------------------


@register(
    "hhi_supplier_concentration",
    """
    WITH srev AS (
        SELECT l_suppkey AS suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY 1
    ),
    bynat AS (
        SELECT s.s_nationkey AS nationkey,
               CAST(COUNT(*) AS BIGINT)            AS n_suppliers,
               SUM(CAST(srev.rev AS HUGEINT))      AS s,
               SUM(CAST(srev.rev AS HUGEINT) * srev.rev) AS d2,
               MAX(srev.rev)                       AS rmax
        FROM srev JOIN supplier s ON srev.suppkey = s.s_suppkey
        GROUP BY 1
    )
    SELECT n.n_name, n_suppliers,
           10000.0 * (CAST(d2 AS DOUBLE)
                      / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS hhi,
           CAST(rmax AS DOUBLE) / CAST(s AS DOUBLE)              AS top_share
    FROM bynat JOIN nation n ON bynat.nationkey = n.n_nationkey
    """,
)
def q_hhi_supplier_concentration(spark, sf_dir):
    """Herfindahl–Hirschman index (×10000, the antitrust scale) of
    supplier revenue concentration per nation, plus the single-supplier
    top share (CR1).

    Exactness: per-supplier revenue is the exact cents·(100−disc) int64
    sum (revenue_sum_dec's integers, undivided); squares accumulate in
    DECIMAL(38)/HUGEINT (rev² ≈ 10²⁴ at cluster scale). HHI closes with
    cast/multiply/divide/multiply on identical exact integers — four
    correctly-rounded IEEE ops, emitted raw.

    Plan: lineitem aggregates to supplier grain on ONE l_suppkey shuffle
    (the only data-sized exchange), the supplier dim broadcasts onto the
    rollup, and the nation aggregate touches |suppliers| rows. 25 rows
    out at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    srev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(
            cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
        ).alias("rev")
    )
    bynat = srev.join(
        F.broadcast(
            supplier.select(
                F.col("s_suppkey").alias("suppkey"),
                F.col("s_nationkey").alias("nationkey"),
            )
        ),
        "suppkey",
    ).groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(_dec(F.col("rev"))).alias("s"),
        F.sum(_dec(F.col("rev")) * _dec(F.col("rev"))).alias("d2"),
        F.max("rev").alias("rmax"),
    )
    return bynat.join(
        F.broadcast(nation), bynat.nationkey == F.col("n_nationkey")
    ).select(
        "n_name",
        "n_suppliers",
        (
            F.lit(10000.0)
            * (
                F.col("d2").cast("double")
                / (F.col("s").cast("double") * F.col("s").cast("double"))
            )
        ).alias("hhi"),
        (F.col("rmax").cast("double") / F.col("s").cast("double")).alias(
            "top_share"
        ),
    )


# ---------------------------------------------------------------------------
# Autocorrelation of daily close changes, lags 1..5, per symbol
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 5


@register(
    "price_change_acf",
    WITH_TICKS
    + f""",
    d0 AS (
        SELECT symbol, date,
               CAST(ROUND(close * 100, 0) AS BIGINT)
               - LAG(CAST(ROUND(close * 100, 0) AS BIGINT))
                     OVER (PARTITION BY symbol ORDER BY date) AS d
        FROM ticks
    ),
    d AS (
        SELECT symbol, d,
               ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date) AS rn
        FROM d0 WHERE d IS NOT NULL
    ),
    xl AS (
        SELECT symbol, rn, d, CAST(u.lag AS INTEGER) AS lag,
               rn - u.lag AS j
        FROM d, UNNEST(generate_series(1, {_ACF_MAX_LAG})) AS u(lag)
    ),
    m AS (
        SELECT x.symbol, x.lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x.d) AS BIGINT)  AS sx,
               CAST(SUM(b.d) AS BIGINT)  AS sy,
               CAST(SUM(x.d * b.d) AS BIGINT) AS sxy,
               CAST(SUM(x.d * x.d) AS BIGINT) AS sxx,
               CAST(SUM(b.d * b.d) AS BIGINT) AS syy
        FROM xl x JOIN d b ON x.symbol = b.symbol AND x.j = b.rn
        GROUP BY 1, 2
    )
    SELECT symbol, lag, n AS n_pairs,
           CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
                 AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
                THEN (CASE WHEN CAST(n AS HUGEINT) * sxy
                               - CAST(sx AS HUGEINT) * sy < 0
                           THEN -1.0 ELSE 1.0 END)
                   * sqrt(CAST((CAST(n AS HUGEINT) * sxy
                                - CAST(sx AS HUGEINT) * sy) * 1000000000
                               // (CAST(n AS HUGEINT) * sxx
                                   - CAST(sx AS HUGEINT) * sx) AS BIGINT)
                          * CAST((CAST(n AS HUGEINT) * sxy
                                  - CAST(sx AS HUGEINT) * sy) * 1000000000
                                 // (CAST(n AS HUGEINT) * syy
                                     - CAST(sy AS HUGEINT) * sy) AS BIGINT))
                   / 1e9 + 0.0
                ELSE NULL END AS acf
    FROM m
    """,
)
def q_price_change_acf(spark, sf_dir):
    """Per-symbol autocorrelation of daily close CHANGES at lags 1..5 —
    the momentum-vs-mean-reversion diagnostic (returns ACF ≈ 0 is the
    efficient-market null; persistent positive lags flag trending).

    Works on integer cent differences, not float returns: all five
    moment sums (Σx, Σy, Σxy, Σx², Σy²) are exact int64 over each
    (symbol, lag) group (group size is the symbol's history, constant
    under keyed scale-up), the Pearson numerator/denominators widen to
    DECIMAL(38)/HUGEINT for the closing products (n·Σxy ≈ 10¹⁹ clears
    int64), and r closes as num / (√denx·√deny) — cast, two sqrts, one
    multiply, one divide, all correctly rounded on identical exact
    integers, emitted raw. Constant series (zero variance) yield NULL.

    Plan: ONE symbol exchange serves the date-ordered lag window for the
    diff and all five lag columns (one Window node); the lag dimension
    unpivots via an inline struct array (no join, no re-shuffle), and
    the final aggregate groups |symbols|·5 keys. DuckDB mirrors the
    unpivot with generate_series + a per-(symbol,lag) window — same
    pairs by construction.
    """
    t = ticks(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("date")
    c = cents("close")
    d = t.select(
        "symbol", "date", (c - F.lag(c).over(w)).alias("d")
    ).filter(F.col("d").isNotNull())
    lag_cols = [
        F.lag("d", L).over(w).alias(f"y{L}")
        for L in range(1, _ACF_MAX_LAG + 1)
    ]
    wide = d.select("symbol", "date", "d", *lag_cols)
    pairs = wide.select(
        "symbol",
        F.col("d").alias("x"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).alias("lag"), F.col(f"y{L}").alias("y")
                    )
                    for L in range(1, _ACF_MAX_LAG + 1)
                ]
            )
        ).alias("p"),
    ).select("symbol", F.col("p.lag").alias("lag"), "x", F.col("p.y").alias("y"))
    m = pairs.filter(F.col("y").isNotNull()).groupBy("symbol", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = _dec(F.col("n")) * _dec(F.col("sxy")) - _dec(F.col("sx")) * _dec(
        F.col("sy")
    )
    denx = _dec(F.col("n")) * _dec(F.col("sxx")) - _dec(F.col("sx")) * _dec(
        F.col("sx")
    )
    deny = _dec(F.col("n")) * _dec(F.col("syy")) - _dec(F.col("sy")) * _dec(
        F.col("sy")
    )
    q9 = F.lit(1000000000).cast("decimal(38,0)")
    pre = m.select(
        "symbol",
        "lag",
        F.col("n").alias("n_pairs"),
        num.alias("num"), (num * q9).alias("num9"),
        denx.alias("denx"), deny.alias("deny"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    sign = F.when(F.col("num") < zero, F.lit(-1.0)).otherwise(F.lit(1.0))
    return pre.select(
        "symbol",
        "lag",
        F.col("n_pairs"),
        F.when(
            (F.col("denx") > zero) & (F.col("deny") > zero),
            sign
            * F.sqrt(
                F.expr("num9 div denx").cast("double")
                * F.expr("num9 div deny").cast("double")
            )
            / F.lit(1e9)
            + F.lit(0.0),
        ).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Session bounce rate per day
# ---------------------------------------------------------------------------


@register(
    "session_bounce_rate",
    """
    WITH gaps AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                     OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    ),
    per_session AS (
        SELECT user_id, session_id,
               CAST(MIN(ts) AS DATE) AS day,
               COUNT(*)              AS n_events
        FROM sessions GROUP BY 1, 2
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT)                        AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT)                                 AS n_bounces,
           SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
               / COUNT(*)                                  AS bounce_rate
    FROM per_session GROUP BY 1
    """,
)
def q_session_bounce_rate(spark, sf_dir):
    """Daily bounce rate: fraction of sessions (30-min-gap islands, the
    sessionize_events definition verbatim) containing exactly one event,
    keyed by the session's start day.

    bounce_rate is one int÷int division — bit-identical, emitted raw.
    Plan: the single user_id exchange serves the lag window, the running
    session-id sum, and the per-session aggregate (sessionize_events'
    reuse pattern); the daily rollup then groups |sessions| rows by
    ~|days| keys. Output is bounded by the calendar at any scale.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = ev.withColumn("new_session", new_session).withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.to_date(F.min("ts")).alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return per_session.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(bounce).cast("bigint").alias("n_bounces"),
        (F.sum(bounce) * F.lit(1.0) / F.count(F.lit(1))).alias("bounce_rate"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve deciles (the distribution behind the Gini scalar)
# ---------------------------------------------------------------------------


@register(
    "lorenz_revenue_deciles",
    """
    WITH cust AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS spend_cents
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT c.c_nationkey AS nationkey, cust.spend_cents,
               NTILE(10) OVER (
                   PARTITION BY c.c_nationkey
                   ORDER BY cust.spend_cents, cust.custkey) AS decile
        FROM cust JOIN customer c ON cust.custkey = c.c_custkey
    ),
    d AS (
        SELECT nationkey, CAST(decile AS INTEGER) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(spend_cents AS HUGEINT)) AS BIGINT)
                   AS decile_spend_cents
        FROM ranked GROUP BY 1, 2
    ),
    c AS (
        SELECT *,
               SUM(CAST(decile_spend_cents AS HUGEINT)) OVER (
                   PARTITION BY nationkey ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(CAST(decile_spend_cents AS HUGEINT)) OVER (
                   PARTITION BY nationkey) AS tot
        FROM d
    )
    SELECT n.n_name, decile, n_customers, decile_spend_cents,
           CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
    FROM c JOIN nation n ON c.nationkey = n.n_nationkey
    """,
)
def q_lorenz_revenue_deciles(spark, sf_dir):
    """Lorenz curve of customer revenue per nation at decile resolution —
    the distribution gini_revenue_concentration summarizes to a scalar:
    each nation's customers ranked by spend ascending, NTILE(10)
    bucketed, with the decile's exact cents total and the cumulative
    revenue share up to it ("the bottom 80% of customers hold cum_share
    of revenue").

    NTILE is deterministic under the (spend, custkey) total order and
    both engines implement the SQL-standard split (size difference ≤ 1,
    larger buckets first). All sums are exact cents in
    DECIMAL(38)/HUGEINT; cum_share is one division of two exact wide
    ints per output row, emitted raw.

    Plan: same shape as the Gini query (orders reduce on the custkey
    shuffle BEFORE the dim join; windows run on customer-grain rows,
    partitioned by nation); the decile rollup is 250 rows, and the
    cumulative window runs on those 250 only. Output 25·10 rows at any
    scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(cents("o_totalprice")).alias("spend_cents")
    )
    ranked = cust.join(
        customer.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_nationkey").alias("nationkey"),
        ),
        "custkey",
    ).withColumn(
        "decile",
        F.ntile(10).over(
            Window.partitionBy("nationkey").orderBy("spend_cents", "custkey")
        ),
    )
    d = ranked.groupBy("nationkey", "decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("spend_cents").cast("bigint").alias("decile_spend_cents"),
    )
    wn = Window.partitionBy("nationkey")
    cum = (
        F.sum(_dec(F.col("decile_spend_cents")))
        .over(wn.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0))
    )
    tot = F.sum(_dec(F.col("decile_spend_cents"))).over(wn)
    c = d.select(
        "nationkey", "decile", "n_customers", "decile_spend_cents",
        (cum.cast("double") / tot.cast("double")).alias("cum_share"),
    )
    return c.join(
        F.broadcast(nation), c.nationkey == F.col("n_nationkey")
    ).select(
        "n_name", "decile", "n_customers", "decile_spend_cents", "cum_share"
    )


# ---------------------------------------------------------------------------
# Repeat-purchase rate per nation
# ---------------------------------------------------------------------------


@register(
    "repeat_order_rate_by_nation",
    """
    WITH cust AS (
        SELECT o_custkey AS custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    ),
    bynat AS (
        SELECT c.c_nationkey AS nationkey,
               CAST(COUNT(*) AS BIGINT)        AS n_customers,
               CAST(SUM(CASE WHEN cust.n_orders >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT)                 AS n_repeat,
               CAST(SUM(cust.n_orders) AS BIGINT) AS n_orders
        FROM cust JOIN customer c ON cust.custkey = c.c_custkey
        GROUP BY 1
    )
    SELECT n.n_name, n_customers, n_repeat, n_orders,
           n_repeat * 1.0 / n_customers AS repeat_rate,
           n_orders * 1.0 / n_customers AS orders_per_customer
    FROM bynat JOIN nation n ON bynat.nationkey = n.n_nationkey
    """,
)
def q_repeat_order_rate_by_nation(spark, sf_dir):
    """Repeat-ORDER rate per nation: share of (ordering) customers
    with >=2 orders, plus orders-per-customer — the retention KPI pair
    (repeat_purchase_rate's orders/dim-join sibling, nation-resolved).
    Both ratios are single int÷int divisions, emitted raw; the custkey
    rollup reduces orders 10:1 before the dim join, and the nation
    aggregate touches customer-grain rows only."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    bynat = cust.join(
        customer.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_nationkey").alias("nationkey"),
        ),
        "custkey",
    ).groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_repeat"),
        F.sum("n_orders").cast("bigint").alias("n_orders"),
    )
    return bynat.join(
        F.broadcast(nation), bynat.nationkey == F.col("n_nationkey")
    ).select(
        "n_name", "n_customers", "n_repeat", "n_orders",
        (F.col("n_repeat") * F.lit(1.0) / F.col("n_customers")).alias(
            "repeat_rate"
        ),
        (F.col("n_orders") * F.lit(1.0) / F.col("n_customers")).alias(
            "orders_per_customer"
        ),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit of order totals
# ---------------------------------------------------------------------------


@register(
    "first_digit_distribution",
    """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders
    ),
    counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY 1
    )
    SELECT digit, n,
           n * 1.0 / (SELECT SUM(n) FROM counts) AS share
    FROM counts
    """,
)
def q_first_digit_distribution(spark, sf_dir):
    """Leading-digit distribution of order totals — the Benford's-law
    data-quality audit (fabricated or capped monetary data shows up as a
    first-digit histogram far from the log-decaying Benford shape; the
    synthetic testdata's uniform pricing is itself visibly non-Benford,
    which is the point of the audit).

    The digit comes from the exact integer dollar floor (FLOOR of a 2dp
    double is exact; both engines cast-truncate identically via explicit
    FLOOR per NOTES rule 4), the share is one int÷int division against a
    broadcast 1-row total. One scan, one 9-key aggregate — trivially
    cluster-scale."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = counts.agg(F.sum("n").alias("__tot"))
    return counts.join(F.broadcast(tot)).select(
        "digit", "n", (F.col("n") * F.lit(1.0) / F.col("__tot")).alias("share")
    )


# ---------------------------------------------------------------------------
# Customer inter-order cadence percentiles per nation
# ---------------------------------------------------------------------------


@register(
    "order_gap_percentiles",
    """
    WITH gaps AS (
        SELECT o_custkey AS custkey,
               date_diff('day',
                         CAST(LAG(o_orderdate) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS DATE),
                         CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    ),
    g AS (
        SELECT c.c_nationkey AS nationkey, gaps.gap_days
        FROM gaps JOIN customer c ON gaps.custkey = c.c_custkey
        WHERE gaps.gap_days IS NOT NULL
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT)          AS n_gaps,
           ROUND(quantile_cont(gap_days, 0.25), 6) AS p25_days,
           ROUND(quantile_cont(gap_days, 0.50), 6) AS median_days,
           ROUND(quantile_cont(gap_days, 0.75), 6) AS p75_days,
           CAST(MAX(gap_days) AS BIGINT)     AS max_days
    FROM g JOIN nation n ON g.nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q_order_gap_percentiles(spark, sf_dir):
    """Customer re-order cadence per nation: quartiles of the
    days-between-consecutive-orders distribution (the inputs to "when is
    this customer overdue" retention models). The events sibling is
    inter_event_gaps; this is the orders/dim-join variant.

    Gaps are exact integer days (date_diff of DATE casts); both engines
    interpolate quantiles at (n−1)·p over the sorted ints, so the
    quartile values live on the exact quarter grid (a + {{0,.25,.5,.75}}
    ·(b−a) with int a,b is exactly representable) — rounded 6dp to
    follow inter_event_gaps' precedent. One custkey exchange serves both
    the lag window and (by key co-location) the dim join; the percentile
    aggregate then groups by nation."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    g = gaps.join(
        customer.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_nationkey").alias("nationkey"),
        ),
        "custkey",
    )
    agg = g.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.expr("percentile(gap_days, 0.25)"), 6).alias("p25_days"),
        F.round(F.expr("percentile(gap_days, 0.50)"), 6).alias("median_days"),
        F.round(F.expr("percentile(gap_days, 0.75)"), 6).alias("p75_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )
    return agg.join(
        F.broadcast(nation), agg.nationkey == F.col("n_nationkey")
    ).select("n_name", "n_gaps", "p25_days", "median_days", "p75_days",
             "max_days")


# ---------------------------------------------------------------------------
# Cross-series correlation matrix (top-k symbols)
# ---------------------------------------------------------------------------

_CORR_TOP_K = 10


@register(
    "symbol_correlation_matrix",
    WITH_TICKS
    + f""",
    vol AS (
        SELECT symbol FROM ticks GROUP BY symbol
        ORDER BY SUM(volume) DESC, symbol LIMIT {_CORR_TOP_K}
    ),
    d AS (
        SELECT t.symbol, t.date,
               CAST(ROUND(t.close * 100, 0) AS BIGINT)
               - LAG(CAST(ROUND(t.close * 100, 0) AS BIGINT))
                     OVER (PARTITION BY t.symbol ORDER BY t.date) AS d
        FROM ticks t JOIN vol USING (symbol)
    ),
    p AS (
        SELECT a.symbol AS symbol_a, b.symbol AS symbol_b,
               CAST(COUNT(*) AS BIGINT)      AS n,
               CAST(SUM(a.d) AS BIGINT)      AS sx,
               CAST(SUM(b.d) AS BIGINT)      AS sy,
               CAST(SUM(a.d * b.d) AS BIGINT) AS sxy,
               CAST(SUM(a.d * a.d) AS BIGINT) AS sxx,
               CAST(SUM(b.d * b.d) AS BIGINT) AS syy
        FROM d a JOIN d b ON a.date = b.date AND a.symbol < b.symbol
        WHERE a.d IS NOT NULL AND b.d IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT symbol_a, symbol_b, n AS n_days,
           CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
                 AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
                THEN (CASE WHEN CAST(n AS HUGEINT) * sxy
                               - CAST(sx AS HUGEINT) * sy < 0
                           THEN -1.0 ELSE 1.0 END)
                   * sqrt(CAST((CAST(n AS HUGEINT) * sxy
                                - CAST(sx AS HUGEINT) * sy) * 1000000000
                               // (CAST(n AS HUGEINT) * sxx
                                   - CAST(sx AS HUGEINT) * sx) AS BIGINT)
                          * CAST((CAST(n AS HUGEINT) * sxy
                                  - CAST(sx AS HUGEINT) * sy) * 1000000000
                                 // (CAST(n AS HUGEINT) * syy
                                     - CAST(sy AS HUGEINT) * sy) AS BIGINT))
                   / 1e9 + 0.0
                ELSE NULL END AS corr
    FROM p
    """,
)
def q_symbol_correlation_matrix(spark, sf_dir):
    """Pairwise Pearson correlation of daily close CHANGES between the
    top-10 symbols by total volume — the cross-asset co-movement matrix
    (pair-trading screens, portfolio diversification audits);
    rolling_beta_20's static, symbol×symbol sibling.

    Scale: top-k selection is an aggregate + TakeOrdered (k rows,
    broadcast back as a semi-join filter), so the date self-join runs on
    k series only — C(10,2)=45 output rows and ≤k rows per date-key on
    each join side regardless of corpus size. Exactness: the
    price_change_acf discipline — int64 moment sums over cent diffs,
    DECIMAL(38)/HUGEINT closing products, corr as cast / √·√ / divide
    on identical exact integers, emitted raw; constant series → NULL.
    """
    t = ticks(spark, sf_dir)
    top = (
        t.groupBy("symbol")
        .agg(F.sum("volume").alias("__v"))
        .orderBy(F.col("__v").desc(), F.col("symbol").asc())
        .limit(_CORR_TOP_K)
        .select("symbol")
    )
    w = Window.partitionBy("symbol").orderBy("date")
    c = cents("close")
    d = (
        t.join(F.broadcast(top), "symbol", "left_semi")
        .select("symbol", "date", (c - F.lag(c).over(w)).alias("d"))
        .filter(F.col("d").isNotNull())
    )
    a = d.select(
        F.col("symbol").alias("symbol_a"), F.col("date").alias("da"),
        F.col("d").alias("x"),
    )
    b = d.select(
        F.col("symbol").alias("symbol_b"), F.col("date").alias("db"),
        F.col("d").alias("y"),
    )
    p = (
        a.join(b, (a.da == b.db) & (F.col("symbol_a") < F.col("symbol_b")))
        .groupBy("symbol_a", "symbol_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    num = _dec(F.col("n")) * _dec(F.col("sxy")) - _dec(F.col("sx")) * _dec(
        F.col("sy")
    )
    denx = _dec(F.col("n")) * _dec(F.col("sxx")) - _dec(F.col("sx")) * _dec(
        F.col("sx")
    )
    deny = _dec(F.col("n")) * _dec(F.col("syy")) - _dec(F.col("sy")) * _dec(
        F.col("sy")
    )
    q9 = F.lit(1000000000).cast("decimal(38,0)")
    pre = p.select(
        "symbol_a", "symbol_b", F.col("n").alias("n_days"),
        num.alias("num"), (num * q9).alias("num9"),
        denx.alias("denx"), deny.alias("deny"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    sign = F.when(F.col("num") < zero, F.lit(-1.0)).otherwise(F.lit(1.0))
    return pre.select(
        "symbol_a", "symbol_b", "n_days",
        F.when(
            (F.col("denx") > zero) & (F.col("deny") > zero),
            sign
            * F.sqrt(
                F.expr("num9 div denx").cast("double")
                * F.expr("num9 div deny").cast("double")
            )
            / F.lit(1e9)
            + F.lit(0.0),
        ).alias("corr"),
    )


# ---------------------------------------------------------------------------
# Monthly seasonality index
# ---------------------------------------------------------------------------


@register(
    "monthly_seasonality_index",
    WITH_TICKS
    + """,
    m AS (
        SELECT CAST(month(date) AS INTEGER) AS month,
               CAST(COUNT(*) AS BIGINT)     AS n_days,
               CAST(SUM(CAST(ROUND(close * 100, 0) AS BIGINT)) AS BIGINT)
                   AS s_cents
        FROM ticks GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(s_cents) AS BIGINT) AS s_all,
               CAST(SUM(n_days) AS BIGINT)  AS n_all
        FROM m
    )
    SELECT month, n_days,
           ROUND(s_cents / (100.0 * n_days), 6) AS avg_close,
           CAST(CAST(s_cents AS HUGEINT) * n_all AS DOUBLE)
               / CAST(CAST(n_days AS HUGEINT) * s_all AS DOUBLE)
               AS seasonal_index
    FROM m, tot
    """,
)
def q_monthly_seasonality_index(spark, sf_dir):
    """Additive seasonal index per calendar month: the month's average
    close relative to the all-time average (index 1.0 = no seasonality)
    — the first chart of any seasonality screen.

    The ratio of two averages clears both denominators exactly:
    (Σm/nm)/(Σall/nall) = Σm·nall / (nm·Σall), products in
    DECIMAL(38)/HUGEINT, closed by ONE double division — no float
    average is ever formed (NOTES rule 10's avg_cents extended to
    ratios of averages). avg_close itself uses the standard avg_cents
    form. Plan: one 12-key aggregate off the ticks scan plus a 1-row
    broadcast total."""
    t = ticks(spark, sf_dir)
    m = t.groupBy(F.month("date").cast("int").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(cents("close")).cast("bigint").alias("s_cents"),
    )
    tot = m.agg(
        F.sum("s_cents").cast("bigint").alias("s_all"),
        F.sum("n_days").cast("bigint").alias("n_all"),
    )
    return m.join(F.broadcast(tot)).select(
        "month", "n_days",
        F.round(F.col("s_cents") / (F.lit(100.0) * F.col("n_days")), 6).alias(
            "avg_close"
        ),
        (
            (_dec(F.col("s_cents")) * _dec(F.col("n_all"))).cast("double")
            / (_dec(F.col("n_days")) * _dec(F.col("s_all"))).cast("double")
        ).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# Volume vs |price move| correlation per symbol
# ---------------------------------------------------------------------------


@register(
    "volume_move_correlation",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol, date, volume,
               abs(CAST(ROUND(close * 100, 0) AS BIGINT)
                   - LAG(CAST(ROUND(close * 100, 0) AS BIGINT))
                         OVER (PARTITION BY symbol ORDER BY date)) AS mv
        FROM ticks
    ),
    m AS (
        SELECT symbol,
               CAST(COUNT(*) AS BIGINT)        AS n,
               CAST(SUM(volume) AS BIGINT)     AS sx,
               CAST(SUM(mv) AS BIGINT)         AS sy,
               CAST(SUM(volume * mv) AS BIGINT) AS sxy,
               CAST(SUM(volume * volume) AS BIGINT) AS sxx,
               CAST(SUM(mv * mv) AS BIGINT)    AS syy
        FROM d WHERE mv IS NOT NULL GROUP BY 1
    )
    SELECT symbol, n AS n_days,
           CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
                 AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
                THEN (CASE WHEN CAST(n AS HUGEINT) * sxy
                               - CAST(sx AS HUGEINT) * sy < 0
                           THEN -1.0 ELSE 1.0 END)
                   * sqrt(CAST((CAST(n AS HUGEINT) * sxy
                                - CAST(sx AS HUGEINT) * sy) * 1000000000
                               // (CAST(n AS HUGEINT) * sxx
                                   - CAST(sx AS HUGEINT) * sx) AS BIGINT)
                          * CAST((CAST(n AS HUGEINT) * sxy
                                  - CAST(sx AS HUGEINT) * sy) * 1000000000
                                 // (CAST(n AS HUGEINT) * syy
                                     - CAST(sy AS HUGEINT) * sy) AS BIGINT))
                   / 1e9 + 0.0
                ELSE NULL END AS vol_move_corr
    FROM m
    """,
)
def q_volume_move_correlation(spark, sf_dir):
    """Per-symbol Pearson correlation between daily volume and the
    MAGNITUDE of the close move (cents) — the volume-volatility relation
    (positive correlation is the classic liquidity signature; a symbol
    where it breaks down is the anomaly worth a desk's look).

    Same exact-moment machinery as price_change_acf: volume and |Δcents|
    are both int64, all five sums exact per symbol, closing products in
    DECIMAL(38)/HUGEINT, one √·√-divide finish, raw. One symbol
    exchange serves lag window and aggregate; |symbols| rows out."""
    t = ticks(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("date")
    c = cents("close")
    d = t.select(
        "symbol", "volume",
        F.abs(c - F.lag(c).over(w)).alias("mv"),
    ).filter(F.col("mv").isNotNull())
    m = d.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("volume").alias("sx"),
        F.sum("mv").alias("sy"),
        F.sum(F.col("volume") * F.col("mv")).alias("sxy"),
        F.sum(F.col("volume") * F.col("volume")).alias("sxx"),
        F.sum(F.col("mv") * F.col("mv")).alias("syy"),
    )
    num = _dec(F.col("n")) * _dec(F.col("sxy")) - _dec(F.col("sx")) * _dec(
        F.col("sy")
    )
    denx = _dec(F.col("n")) * _dec(F.col("sxx")) - _dec(F.col("sx")) * _dec(
        F.col("sx")
    )
    deny = _dec(F.col("n")) * _dec(F.col("syy")) - _dec(F.col("sy")) * _dec(
        F.col("sy")
    )
    q9 = F.lit(1000000000).cast("decimal(38,0)")
    pre = m.select(
        "symbol", F.col("n").alias("n_days"),
        num.alias("num"), (num * q9).alias("num9"),
        denx.alias("denx"), deny.alias("deny"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    sign = F.when(F.col("num") < zero, F.lit(-1.0)).otherwise(F.lit(1.0))
    return pre.select(
        "symbol", F.col("n_days"),
        F.when(
            (F.col("denx") > zero) & (F.col("deny") > zero),
            sign
            * F.sqrt(
                F.expr("num9 div denx").cast("double")
                * F.expr("num9 div deny").cast("double")
            )
            / F.lit(1e9)
            + F.lit(0.0),
        ).alias("vol_move_corr"),
    )


# ---------------------------------------------------------------------------
# Linear-interpolation gap fill
# ---------------------------------------------------------------------------


@register(
    "gap_fill_interpolated",
    WITH_TICKS
    + """
    , bounds AS (
        SELECT symbol, MIN(date) AS d0, MAX(date) AS d1 FROM ticks GROUP BY 1
    ),
    calendar AS (
        SELECT symbol, CAST(g.gs AS DATE) AS date
        FROM bounds, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS g(gs)
    ),
    filled AS (
        SELECT c.symbol, c.date, t.close,
               CASE WHEN t.close IS NOT NULL
                    THEN CAST(ROUND(t.close * 100, 0) AS BIGINT) END AS rc,
               CASE WHEN t.close IS NOT NULL THEN c.date END AS rd
        FROM calendar c LEFT JOIN ticks t USING (symbol, date)
    ),
    x AS (
        SELECT *,
               LAST_VALUE(rc IGNORE NULLS) OVER wp  AS pc,
               LAST_VALUE(rd IGNORE NULLS) OVER wp  AS pd,
               FIRST_VALUE(rc IGNORE NULLS) OVER wn AS nc,
               FIRST_VALUE(rd IGNORE NULLS) OVER wn AS nd
        FROM filled
        WINDOW wp AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT symbol, date,
           CASE WHEN close IS NOT NULL THEN close
                WHEN nc IS NULL THEN pc / 100.0
                ELSE (pc * date_diff('day', pd, nd)
                      + (nc - pc) * date_diff('day', pd, date))
                     / (100.0 * date_diff('day', pd, nd))
           END AS close,
           close IS NULL AS is_gap
    FROM x
    """,
)
def q_gap_fill_interpolated(spark, sf_dir):
    """Calendar densification with LINEAR interpolation across gaps —
    gap_fill_forward's repair-quality sibling (ffill's step function
    turns an n-day gap into zero-returns plus one jump; interpolation
    spreads the move, which is what return/volatility consumers want).
    Trailing gaps forward-fill (no later anchor). Interpolated values
    are the single exact division (p·n + (q−p)·k)/(100·n) on int64
    cents and day counts — bit-identical across engines, emitted raw
    (operators/resample.py::calendar_interpolate)."""
    from .operators.resample import calendar_interpolate

    return calendar_interpolate(ticks(spark, sf_dir))


# ---------------------------------------------------------------------------
# Spearman rank correlation (volume vs price move) — exact integer ranks
# ---------------------------------------------------------------------------


@register(
    "spearman_volume_move",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol, volume,
               abs(CAST(ROUND(close * 100, 0) AS BIGINT)
                   - LAG(CAST(ROUND(close * 100, 0) AS BIGINT))
                         OVER (PARTITION BY symbol ORDER BY date)) AS mv
        FROM ticks
    ),
    r AS (
        SELECT symbol,
               2 * RANK() OVER (PARTITION BY symbol ORDER BY volume)
                 + COUNT(*) OVER (PARTITION BY symbol, volume) - 1 AS a,
               2 * RANK() OVER (PARTITION BY symbol ORDER BY mv)
                 + COUNT(*) OVER (PARTITION BY symbol, mv) - 1 AS b
        FROM d WHERE mv IS NOT NULL
    ),
    m AS (
        SELECT symbol,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(a) AS HUGEINT) AS sa,
               CAST(SUM(b) AS HUGEINT) AS sb,
               CAST(SUM(CAST(a AS HUGEINT) * b) AS HUGEINT) AS sab,
               CAST(SUM(CAST(a AS HUGEINT) * a) AS HUGEINT) AS saa,
               CAST(SUM(CAST(b AS HUGEINT) * b) AS HUGEINT) AS sbb
        FROM r GROUP BY 1
    )
    SELECT symbol, CAST(n AS BIGINT) AS n_days,
           CASE WHEN n * saa - sa * sa != 0 AND n * sbb - sb * sb != 0
                THEN (CASE WHEN n * sab - sa * sb < 0
                           THEN -1.0 ELSE 1.0 END)
                   * sqrt(CAST((n * sab - sa * sb) * 1000000000
                               // (n * saa - sa * sa) AS BIGINT)
                          * CAST((n * sab - sa * sb) * 1000000000
                                 // (n * sbb - sb * sb) AS BIGINT))
                   / 1e9 + 0.0
           END AS spearman
    FROM m
    """,
)
def q_spearman_volume_move(spark, sf_dir):
    """Spearman rank correlation of volume against the absolute daily
    price move, per symbol — the robust sibling of
    ``volume_move_correlation`` (Pearson): rank correlation ignores the
    heavy tails both series have, so it answers "do high-volume days
    tend to be big-move days" without a few crash days dominating.

    Exactness: Spearman is Pearson ON RANKS, and tie-averaged ranks are
    the only float hazard — the fractional average rank for a tie group
    is (first + last)/2, so DOUBLED ranks stay exact integers:
    2·avg_rank = 2·RANK() + (tie_count − 1), computed with one rank
    window plus a per-(symbol, value) count window on each side (the
    constant factor 2 cancels in the correlation). From there the
    machinery is rolling_corr_20's: exact DECIMAL(38)/HUGEINT moments,
    closed by two correctly-rounded sqrts, one multiply, one divide on
    identical integers — bit-exact raw doubles. Zero-variance ranks
    (all-tied series) null out on both sides.

    Plan: every window and the final aggregate hash on symbol — ONE
    data-sized exchange; the (symbol, value) tie-count windows reuse it
    (finer keys hash-cluster within the same partitioning)."""
    t = ticks(spark, sf_dir)
    c = F.round(F.col("close") * 100, 0).cast("bigint")
    d = t.select(
        "symbol", "volume",
        F.abs(
            c - F.lag(c).over(
                Window.partitionBy("symbol").orderBy("date")
            )
        ).alias("mv"),
    ).filter(F.col("mv").isNotNull())

    def rank2(col):
        return (
            F.lit(2) * F.rank().over(
                Window.partitionBy("symbol").orderBy(col)
            )
            + F.count(F.lit(1)).over(Window.partitionBy("symbol", col))
            - F.lit(1)
        )

    r = d.select(
        "symbol", rank2("volume").alias("a"), rank2("mv").alias("b")
    )
    dec = "decimal(38,0)"
    m = r.groupBy("symbol").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("a").cast(dec).alias("sa"),
        F.sum("b").cast(dec).alias("sb"),
        F.sum(F.col("a").cast(dec) * F.col("b")).alias("sab"),
        F.sum(F.col("a").cast(dec) * F.col("a")).alias("saa"),
        F.sum(F.col("b").cast(dec) * F.col("b")).alias("sbb"),
    )
    n, sa, sb = F.col("n"), F.col("sa"), F.col("sb")
    cov = n * F.col("sab") - sa * sb
    va = n * F.col("saa") - sa * sa
    vb = n * F.col("sbb") - sb * sb
    zero = F.lit(0).cast(dec)
    q9 = F.lit(1000000000).cast(dec)
    pre = m.select(
        "symbol", n.cast("long").alias("n_days"),
        cov.alias("num"), (cov * q9).alias("num9"),
        va.alias("va"), vb.alias("vb"),
    )
    sign = F.when(F.col("num") < zero, F.lit(-1.0)).otherwise(F.lit(1.0))
    return pre.select(
        "symbol", "n_days",
        F.when(
            (F.col("va") != zero) & (F.col("vb") != zero),
            sign
            * F.sqrt(
                F.expr("num9 div va").cast("double")
                * F.expr("num9 div vb").cast("double")
            )
            / F.lit(1e9)
            + F.lit(0.0),
        ).alias("spearman"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval (deterministic, seedless)
# ---------------------------------------------------------------------------

_BOOT_B = 100
# One md5 per (row, hash-group) serves _BOOT_PER_MD5 = 6 replicates: the
# digest's first 30 hex chars parse as TWO 15-hex (60-bit) integers (the
# md5_hash60 idiom — hex->int conversion is the measured hot path, so
# each conversion is reused for THREE 20-bit chunks via cheap div/mod),
# and each 20-bit chunk buckets mod 1e6. The 2^20-vs-1e6 wrap bias
# (~4.6% of bucket mass folded onto low buckets) shifts the effective
# Poisson CDF thresholds by <5e-5 in probability — immaterial for
# replicate weights, and the OPERATOR is defined by this exact hash
# stream on both engines. Net: md5 x17 and conv x34 per row instead of
# x100 each (quiet steady-state 20.5 -> 6-7 s at sf0.1).
_BOOT_PER_MD5 = 6
_BOOT_GROUPS = -(-_BOOT_B // _BOOT_PER_MD5)  # 17; last group partial
_CHUNK = 1 << 20
# Poisson(1) CDF at scale 1e6 (k = 0..8); a row's replicate weight is the
# number of thresholds <= its hash bucket — the classic Poisson bootstrap
# approximation of multinomial resampling, exact-integer on both engines.
_BOOT_CDF = (367879, 735759, 919699, 981012, 996340, 999406, 999917,
             999990, 999999)


@register(
    "bootstrap_order_value_ci",
    f"""
    WITH hg AS (
        SELECT g.g,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               md5(o_orderkey || '-' || g.g) AS h32
        FROM orders
        CROSS JOIN (SELECT unnest(range({_BOOT_GROUPS})) AS g) g
    ),
    c AS (
        SELECT g, cents,
               ('0x' || substr(h32, 1, 15))::BIGINT  AS c0,
               ('0x' || substr(h32, 16, 15))::BIGINT AS c1
        FROM hg
    ),
    w0 AS (
        SELECT g * {_BOOT_PER_MD5} + j.j AS b, cents,
               ((CASE WHEN j.j < 3 THEN c0 ELSE c1 END)
                // (CASE j.j % 3 WHEN 0 THEN 1 WHEN 1 THEN {_CHUNK}
                    ELSE {_CHUNK * _CHUNK} END))
               % {_CHUNK} % 1000000 AS bk
        FROM c
        CROSS JOIN (SELECT unnest(range({_BOOT_PER_MD5})) AS j) j
        WHERE g * {_BOOT_PER_MD5} + j.j < {_BOOT_B}
    ),
    w AS (
        SELECT b, cents,
               {" + ".join(
                   f"CASE WHEN bk >= {t} THEN 1 ELSE 0 END"
                   for t in _BOOT_CDF
               )} AS wt
        FROM w0
    ),
    reps AS (
        SELECT b,
               CAST(SUM(wt * cents) AS BIGINT) * 1.0
                   / CAST(SUM(wt) AS BIGINT) / 100 AS mean_b
        FROM w GROUP BY b
    ),
    ranked AS (
        SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b) AS rn FROM reps
    ),
    pt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) * 1.0 / COUNT(*) / 100 AS point_mean
        FROM orders
    )
    SELECT pt.n_orders, pt.point_mean,
           MAX(CASE WHEN rn = 3 THEN mean_b END) AS ci_lo,
           MAX(CASE WHEN rn = {_BOOT_B - 2} THEN mean_b END) AS ci_hi,
           CAST({_BOOT_B} AS BIGINT) AS n_replicates
    FROM ranked, pt
    GROUP BY pt.n_orders, pt.point_mean
    """,
)
def q_bootstrap_order_value_ci(spark, sf_dir):
    """95% percentile-bootstrap confidence interval for the mean order
    value — via the POISSON bootstrap, the resampling scheme that
    actually works distributed: instead of drawing n rows with
    replacement (which needs global coordination), every (row,
    replicate) pair independently gets a Poisson(1) weight, which
    converges to multinomial resampling for large n. Weights come from
    portable md5-derived buckets (functions/text.md5_hash60 idiom; one
    md5 per 6 replicates, one 60-bit conversion per 3 — see _BOOT_PER_MD5
    comment) tested against the Poisson(1) CDF at 1e6 — fully
    deterministic, seedless, identical across engines/partitionings/
    runs: the reproducible-CI property a training-data release needs.

    Exactness: wt is an exact small int (count of CDF thresholds ≤ the
    hash bucket); each replicate mean is Σ(wt·cents)/Σwt/100 — exact
    int64 sums closed by two divisions; CI bounds are ORDER STATISTICS
    (ranks 3 and {98} of {100} replicate means — identical doubles sort
    identically), never an interpolated percentile. Point estimate is
    the exact full-sample mean. All raw, no rounding.

    Plan: one orders scan cross-joined with a broadcast 17-row
    hash-group range (6 replicates per group, staged projections so
    md5/conv stay single-evaluation columns — GenerateExec gets no
    subexpression elimination, so CASE chains must consume plain
    attributes); the B× row fan-out collapses map-side (partial
    aggregation into ≤ B groups per task), so the shuffle carries
    B·tasks rows, not B·n — the bootstrap costs B× COMPUTE (inherent to
    the statistic) but no extra data movement. The rank window runs
    over {100} rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    # r13 fan-out (guide §2.5 input skew / §1.2 step 1): the testdata
    # orders parquet is ONE row group, so the 17 md5 + 34 conv renders
    # per row all ran on a single task. The width must be EXPLICIT:
    # an implicit repartition(col) is AQE-coalesced by its shuffle BYTES
    # (~2.4 MB here → 1 post-shuffle partition, measured), but bytes are
    # a blind proxy for this stage's cost — the hash work is multiplied
    # 17× by the replicate-group cross join ABOVE the exchange. A
    # deterministic key (retry-safe) at defaultParallelism width scales
    # with the cluster, not a local constant. Measured (quiet host,
    # interleaved A/B, min-of-4): 6.41 → 1.54 s at sf0.1; rows identical.
    dp = spark.sparkContext.defaultParallelism
    o_spread = o.repartition(dp, F.col("o_orderkey"))
    grp_ids = spark.range(_BOOT_GROUPS).select(F.col("id").alias("g"))
    hg = o_spread.crossJoin(F.broadcast(grp_ids)).select(
        "cents", "g",
        F.md5(F.concat_ws("-", "o_orderkey", "g")).alias("h32"),
    )

    # staged projections keep every expensive expression a PLAIN COLUMN
    # before it is referenced many times: md5 (5 chunk consumers) and
    # each conv bucket (9 CASE consumers) would otherwise be re-inlined
    # into every consumer inside the explode's struct array, where
    # GenerateExec gets no subexpression elimination (first cut measured
    # 103 s — 6x SLOWER than the one-md5-per-replicate version it was
    # meant to beat; staged: ~4 s).
    convs = hg.select(
        "cents", "g",
        F.conv(F.substring("h32", 1, 15), 16, 10)
        .cast("bigint")
        .alias("c0"),
        F.conv(F.substring("h32", 16, 15), 16, 10)
        .cast("bigint")
        .alias("c1"),
    )

    def _bucket(j: int):
        shift = _CHUNK ** (j % 3)
        return F.expr(
            f"(({'c0' if j < 3 else 'c1'} div {shift}) "
            f"% {_CHUNK}) % 1000000"
        ).alias(f"h{j}")

    def _wt(j: int):
        h = F.col(f"h{j}")
        wt = None
        for t in _BOOT_CDF:
            ind = F.when(h >= t, 1).otherwise(0)
            wt = ind if wt is None else wt + ind
        return wt.alias(f"w{j}")

    buckets = convs.select(
        "cents", "g", *[_bucket(j) for j in range(_BOOT_PER_MD5)]
    )
    weights = buckets.select(
        "cents", "g", *[_wt(j) for j in range(_BOOT_PER_MD5)]
    )
    w = (
        weights.select(
            "cents",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("g") * _BOOT_PER_MD5 + j).alias("b"),
                            F.col(f"w{j}").alias("wt"),
                        )
                        for j in range(_BOOT_PER_MD5)
                    ]
                )
            ).alias("x"),
        )
        .select(F.col("x.b").alias("b"), "cents", F.col("x.wt").alias("wt"))
        .filter(F.col("b") < _BOOT_B)
    )
    reps = w.groupBy("b").agg(
        (
            F.sum(F.col("wt") * F.col("cents")) * F.lit(1.0)
            / F.sum("wt")
            / F.lit(100)
        ).alias("mean_b")
    )
    ranked = reps.select(
        "mean_b",
        F.row_number()
        .over(Window.partitionBy().orderBy("mean_b"))
        .alias("rn"),
    )
    pt = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (
            F.sum("cents") * F.lit(1.0) / F.count(F.lit(1)) / F.lit(100)
        ).alias("point_mean"),
    )
    ci = ranked.agg(
        F.max(F.when(F.col("rn") == 3, F.col("mean_b"))).alias("ci_lo"),
        F.max(
            F.when(F.col("rn") == _BOOT_B - 2, F.col("mean_b"))
        ).alias("ci_hi"),
    )
    return (
        pt.crossJoin(F.broadcast(ci))
        .select(
            "n_orders", "point_mean", "ci_lo", "ci_hi",
            F.lit(_BOOT_B).cast("long").alias("n_replicates"),
        )
    )

"""Extended coverage queries: JSON parsing (S1 analog), sessionization,
describe-stats (A8), join-heavy TPC-H-style shapes, filter patterns
(P8-P10), and union-by-name (O7).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import avg_cents, register, revenue_sum_dec
from .sources.tables import load_table
from .sources.events import load_events
from .sources.ticks import ticks
from .oracles import WITH_TICKS


@register(
    "json_extract_events",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                       AS n_events,
           ROUND(AVG(value), 6)                           AS avg_value,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT)                                AS sum_k
    FROM events GROUP BY event_type
    """,
)
def q_json_extract_events(spark, sf_dir):
    """S1 analog: parse JSON payload column, aggregate extracted fields.

    get_json_object is JVM-side (Jackson) — no Python in the parse path.
    """
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.sum(k).cast("bigint").alias("sum_k"),
    )


@register(
    "sessionize_events",
    """
    WITH gaps AS (
        SELECT user_id, event_id, ts, value,
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
    )
    SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(FLOOR((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000)
                AS BIGINT)          AS duration_secs,
           ROUND(SUM(value), 6) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_sessionize_events(spark, sf_dir):
    """Session windows (gap > 30 min) via lag + running sum — the batch
    equivalent of streaming session windows; one shuffle on user_id serves
    the lag, the cumulative sum, and the final group-by."""
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
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # explicit floor: Spark's bigint cast truncates but DuckDB's cast
        # rounds half-even -- floor is identical in both for positives
        F.floor(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("duration_secs"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


@register(
    "describe_stats",
    WITH_TICKS
    + """
    SELECT CAST(COUNT(close) AS BIGINT)     AS close_count,
           ROUND(SUM(CAST(ROUND(close * 100, 0) AS BIGINT))
                 / (100.0 * COUNT(close)), 6) AS close_mean,
           ROUND(STDDEV_SAMP(close), 6)     AS close_std,
           MIN(close)                       AS close_min,
           MAX(close)                       AS close_max,
           CAST(COUNT(volume) AS BIGINT)    AS volume_count,
           ROUND(AVG(volume), 6)            AS volume_mean,
           ROUND(STDDEV_SAMP(volume), 6)    AS volume_std,
           MIN(volume)                      AS volume_min,
           MAX(volume)                      AS volume_max
    FROM ticks
    """,
)
def q_describe_stats(spark, sf_dir):
    """A8: describe() block as explicit aggregates (df.describe itself
    returns stringly-typed output; this is the engine-grade equivalent)."""
    t = ticks(spark, sf_dir)
    return t.agg(
        F.count("close").alias("close_count"),
        avg_cents("close").alias("close_mean"),
        F.round(F.stddev_samp("close"), 6).alias("close_std"),
        F.min("close").alias("close_min"),
        F.max("close").alias("close_max"),
        F.count("volume").alias("volume_count"),
        F.round(F.avg("volume"), 6).alias("volume_mean"),
        F.round(F.stddev_samp("volume"), 6).alias("volume_std"),
        F.min("volume").alias("volume_min"),
        F.max("volume").alias("volume_max"),
    )


@register(
    "top_revenue_orders",
    """
    WITH rev AS (
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, c.c_name, CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority, r.revenue
    FROM rev r
    JOIN orders o   ON r.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY r.revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3-shaped: per-order revenue rollup → dim joins → global top-k.

    The orders/customer sides broadcast; the top-k is
    TakeOrderedAndProject (no global sort materialization).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    from .registry import revenue_sum_dec

    rev = li.groupBy("l_orderkey").agg(revenue_sum_dec().alias("revenue"))
    return (
        rev.join(F.broadcast(orders), rev.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "o_orderkey",
            "c_name",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "customer_segment_stats",
    """
    SELECT c.c_mktsegment,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(o.o_orderkey) AS BIGINT)         AS n_orders,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT)                             AS open_orders,
           ROUND(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                 / (100.0 * COUNT(o.o_totalprice)), 6)     AS avg_order_value
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_customer_segment_stats(spark, sf_dir):
    """Dimension join + conditional aggregation per market segment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
            .cast("bigint")
            .alias("open_orders"),
            avg_cents("o_totalprice").alias("avg_order_value"),
        )
    )


@register(
    "symbol_filter_range",
    WITH_TICKS
    + """
    SELECT symbol, date, close, volume
    FROM ticks
    WHERE symbol IN (1, 3, 5, 7)
      AND date BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    """,
)
def q_symbol_filter_range(spark, sf_dir):
    """P8-P10: IN-list + date-range predicates (the dashboard filter path).

    Both predicates push into the aggregate's input scan.
    """
    t = ticks(spark, sf_dir)
    return t.filter(
        F.col("symbol").isin(1, 3, 5, 7)
        & F.col("date").between("1996-01-01", "1997-12-31")
    ).select("symbol", "date", "close", "volume")


@register(
    "union_sources",
    WITH_TICKS
    + """
    , orders_feed AS (
        SELECT o_custkey AS symbol, CAST(o_orderdate AS DATE) AS date,
               MAX(o_totalprice) AS close, 'orders' AS source
        FROM orders GROUP BY 1, 2
    ),
    lineitem_feed AS (
        SELECT symbol, date, close, 'lineitem' AS source FROM ticks
    ),
    unioned AS (
        SELECT * FROM lineitem_feed UNION ALL SELECT * FROM orders_feed
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(date) AS first_date, MAX(date) AS last_date
    FROM unioned GROUP BY source
    """,
)
def q_union_sources(spark, sf_dir):
    """O7: unionByName of two source feeds with per-source lineage column."""
    t = ticks(spark, sf_dir).select(
        "symbol", "date", "close", F.lit("lineitem").alias("source")
    )
    orders = load_table(spark, sf_dir, "orders")
    o_feed = (
        orders.groupBy(
            F.col("o_custkey").alias("symbol"),
            F.to_date("o_orderdate").alias("date"),
        )
        .agg(F.max("o_totalprice").alias("close"))
        .withColumn("source", F.lit("orders"))
    )
    return (
        t.unionByName(o_feed)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("date").alias("first_date"),
            F.max("date").alias("last_date"),
        )
    )


@register(
    "event_funnel",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click
    """,
)
def q_event_funnel(spark, sf_dir):
    """Ordered conversion funnel (view → click-after-view → purchase-after-
    click): per-stage first-timestamp joins, each stage conditioned on the
    previous stage's timestamp — the canonical product-analytics operator.
    Three grouped joins on user_id (one shuffle key reused); never a
    per-user collect or Python loop."""
    ev = load_events(spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    funnel = (
        v.join(c.select("user_id", "t_click"), "user_id", "left")
        .join(p.select("user_id", "t_purchase"), "user_id", "left")
    )
    return funnel.agg(
        F.count("t_view").cast("bigint").alias("n_viewed"),
        F.count("t_click").cast("bigint").alias("n_clicked_after_view"),
        F.count("t_purchase").cast("bigint").alias("n_purchased_after_click"),
    )


@register(
    "user_retention_cohorts",
    """
    WITH ev AS (
        SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
    ),
    firstwk AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY 1
    ),
    active AS (SELECT DISTINCT user_id, wk FROM ev)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS INTEGER)
               AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM active a JOIN firstwk f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_user_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-activity week,
    counted in each later week they were active — the standard retention
    analysis. Weekly truncation on both engines lands on Monday, so the
    day-diff is an exact multiple of 7."""
    ev = load_events(spark, sf_dir).select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    firstwk = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(firstwk, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


@register(
    "symbol_correlation",
    WITH_TICKS + """
    , rets AS (
        SELECT symbol, date,
               (close / LAG(close) OVER (PARTITION BY symbol ORDER BY date)
                - 1) * 100 AS ret
        FROM ticks WHERE symbol <= 10
    )
    SELECT a.symbol AS sym_a, b.symbol AS sym_b,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(corr(a.ret, b.ret), 6) AS return_corr
    FROM rets a JOIN rets b ON a.date = b.date AND a.symbol < b.symbol
    GROUP BY 1, 2
    """,
)
def q_symbol_correlation(spark, sf_dir):
    """Pairwise daily-return correlation between symbols (the pairs-trading
    screen): per-symbol returns from one lag window, date-aligned self-join
    restricted to a bounded symbol set (all-pairs across a 10-symbol
    universe is 45 pairs — the symbol filter, not the join, bounds the
    quadratic term), then corr() as a grouped aggregate. corr skips rows
    where either return is NULL (first trading day) in both engines."""
    t = ticks(spark, sf_dir).filter(F.col("symbol") <= 10)
    w = Window.partitionBy("symbol").orderBy("date")
    rets = t.select(
        "symbol", "date",
        ((F.col("close") / F.lag("close").over(w) - 1) * 100).alias("ret"),
    )
    a = rets.select(
        F.col("symbol").alias("sym_a"), "date", F.col("ret").alias("ret_a")
    )
    b = rets.select(
        F.col("symbol").alias("sym_b"), "date", F.col("ret").alias("ret_b")
    )
    return (
        a.join(b, ["date"])
        .filter(F.col("sym_a") < F.col("sym_b"))
        .groupBy("sym_a", "sym_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.corr("ret_a", "ret_b"), 6).alias("return_corr"),
        )
    )


@register(
    "price_anomalies",
    WITH_TICKS + """
    , rets AS (
        SELECT symbol, date, close,
               (close / LAG(close) OVER w - 1) * 100 AS dcp
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    ),
    scored AS (
        SELECT symbol, date, close,
               ROUND((dcp - AVG(dcp) OVER (PARTITION BY symbol))
                     / STDDEV_SAMP(dcp) OVER (PARTITION BY symbol), 6)
                   AS z_score
        FROM rets
    )
    SELECT symbol, date, close, z_score
    FROM scored WHERE abs(z_score) >= 2.5
    """,
)
def q_price_anomalies(spark, sf_dir):
    """Anomaly detection: daily moves beyond 2.5 sigma of the symbol's own
    return distribution — per-symbol mean/stddev as whole-partition window
    aggregates on the same symbol partitioning as the lag (one exchange),
    z rounded at the aggregate boundary per the float policy."""
    t = ticks(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("date")
    wp = Window.partitionBy("symbol")
    rets = t.select(
        "symbol", "date", "close",
        ((F.col("close") / F.lag("close").over(w) - 1) * 100).alias("dcp"),
    )
    scored = rets.select(
        "symbol", "date", "close",
        F.round(
            (F.col("dcp") - F.avg("dcp").over(wp))
            / F.stddev_samp("dcp").over(wp),
            6,
        ).alias("z_score"),
    )
    return scored.filter(F.abs(F.col("z_score")) >= 2.5)


@register(
    "nation_revenue_share",
    """
    WITH nrev AS (
        SELECT n.n_name AS nation,
               SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        GROUP BY 1
    )
    SELECT nation, revenue,
           ROUND(revenue / SUM(revenue) OVER (), 6) AS revenue_share
    FROM nrev
    """,
)
def q_nation_revenue_share(spark, sf_dir):
    """Ratio-to-report: each nation's share of total revenue via an
    unpartitioned window sum over the 25-row aggregate (the window runs on
    the tiny post-aggregation table, never the fact)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    nrev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(revenue_sum_dec().alias("revenue"))
    )
    w = Window.partitionBy()
    return nrev.select(
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "revenue_share"
        ),
    )


# ---------------------------------------------------------------------------
# Cumulative distinct users (growth curve)
# ---------------------------------------------------------------------------


@register(
    "cumulative_active_users",
    """
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY 1
    ),
    daily AS (
        SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY 1
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM daily
    """,
)
def q_cumulative_active_users(spark, sf_dir):
    """Cumulative-distinct growth curve: users ever seen, by day. The
    naive spelling — COUNT(DISTINCT user) OVER (ORDER BY day) — needs
    per-day distinct state and isn't even expressible as a Spark window;
    the scalable identity is first-seen decomposition: each user counts
    exactly once, on MIN(day), so the curve is a running SUM over the
    per-day first-seen counts. Plan: one shuffle on user_id (the min),
    one on day (tiny), and the only unpartitioned window runs over the
    ~days-sized daily table — cluster-bounded, like the enumeration
    prefix-sum (operators/enumerate.py)."""
    from .sources.events import load_events

    ev = load_events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


# ---------------------------------------------------------------------------
# Join-fanout distribution (skew diagnosis)
# ---------------------------------------------------------------------------


@register(
    "order_fanout_distribution",
    """
    WITH per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_lines
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(n_lines AS INTEGER) AS n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM per_order GROUP BY 1
    """,
)
def q_order_fanout_distribution(spark, sf_dir):
    """Lines-per-order histogram — the skew-diagnosis query behind every
    join-strategy decision at scale: its tail tells you whether the
    orders⋈lineitem key needs salting and what AQE's skew threshold
    should be (SCALING.md join strategy). Two-level combinable aggregate:
    both groupBys partial-aggregate map-side, the second over at most a
    few hundred distinct fanout values."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    return per_order.groupBy(
        F.col("n_lines").cast("int").alias("n_lines")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))


_PATH_TOPK = 20


@register(
    "event_paths_top",
    f"""
    WITH gaps AS (
        SELECT user_id, event_id, ts, event_type,
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
    tri AS (
        SELECT event_type || ' > ' || LEAD(event_type, 1) OVER s
                          || ' > ' || LEAD(event_type, 2) OVER s AS path
        FROM sessions
        WINDOW s AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM tri WHERE path IS NOT NULL
    GROUP BY path
    ORDER BY n_occurrences DESC, path
    LIMIT {_PATH_TOPK}
    """,
)
def q_event_paths_top(spark, sf_dir):
    """Path analysis: the top-20 3-event sequences users actually follow
    WITHIN a session (the funnel-discovery complement of `event_funnel`,
    which checks one predeclared order). Trigrams via two leads over the
    per-session event order — the same (user_id) exchange sessionization
    already established serves the session ids, the leads, and the
    per-session ordering; the top-20 is orderBy+limit
    (TakeOrderedAndProject, never a global-rank window). Deterministic
    at µs ties via the (ts, event_id) composite order; sequences
    crossing a session boundary are excluded by construction (lead
    within the session partition is NULL at the tail)."""
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
    s = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    path = F.concat_ws(
        " > ",
        F.col("event_type"),
        F.lead("event_type", 1).over(s),
        F.lead("event_type", 2).over(s),
    )
    tri = sessions.select(
        path.alias("path"),
        F.lead("event_type", 2).over(s).alias("__complete"),
    ).filter(F.col("__complete").isNotNull())
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(_PATH_TOPK)
    )

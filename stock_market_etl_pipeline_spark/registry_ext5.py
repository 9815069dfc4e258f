"""Events + corpus analytics, part 5: survival analysis, interval
self-join (range join), tokenizer fertility.

- ``user_lifetime_survival`` — a Kaplan-Meier-style life table with
  right-censoring: the survival-analysis shape (at-risk sets, hazard)
  none of the retention queries cover.
- ``session_overlap_counts`` — interval-overlap COUNTS without the
  interval self-join: the boundary-rank identity
  #(starts ≤ e) − #(ends < s) − 1 over one sorted boundary stream,
  with the quadratic DuckDB inequality join as the oracle (the
  semantic spec, not the plan — a bucketized pair join measured ×55
  for 10× rows once per-hour density grew).
- ``token_fertility_by_lang`` — chars/token and tokens/word by language
  (the tokenizer-budget planning table for an LLM corpus).

Exactness: everything integer except single correctly-rounded divisions
(NOTES rule 11's single-op exemption) — no rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.text import BPE_ISH_PATTERN, bpe_ish_tokens, ws_tokens
from .registry import register
from .sources.events import load_events
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# User-lifetime survival table (Kaplan-Meier life table, right-censored)
# ---------------------------------------------------------------------------

_CENSOR_DAYS = 7


@register(
    "user_lifetime_survival",
    f"""
    WITH u AS (
        SELECT user_id, MIN(ts) AS f, MAX(ts) AS l FROM events GROUP BY 1
    ),
    g AS (SELECT MAX(ts) AS m FROM events),
    lab AS (
        SELECT date_diff('day', CAST(f AS DATE), CAST(l AS DATE)) AS t_days,
               date_diff('day', CAST(l AS DATE), CAST(m AS DATE))
                   < {_CENSOR_DAYS} AS cens
        FROM u, g
    ),
    byt AS (
        SELECT t_days,
               SUM(CASE WHEN cens THEN 0 ELSE 1 END) AS ch,
               SUM(CASE WHEN cens THEN 1 ELSE 0 END) AS ce
        FROM lab GROUP BY 1
    ),
    cum AS (
        SELECT t_days, ch, ce,
               SUM(ch + ce) OVER (ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pri,
               SUM(ch + ce) OVER () AS tot
        FROM byt
    )
    SELECT CAST(t_days AS INTEGER)                  AS t_days,
           CAST(tot - COALESCE(pri, 0) AS BIGINT)   AS n_at_risk,
           CAST(ch AS BIGINT)                       AS n_churned,
           CAST(ce AS BIGINT)                       AS n_censored,
           CAST(ch AS BIGINT)
               / CAST(tot - COALESCE(pri, 0) AS DOUBLE) AS hazard
    FROM cum
    """,
)
def q_user_lifetime_survival(spark, sf_dir):
    """Kaplan-Meier life table over user lifetimes: t = days between a
    user's first and last event; users whose last event falls within
    7 days of the corpus max timestamp are right-CENSORED (still
    active — they attest survival to t but no churn). Output per
    distinct t: the at-risk count (users with lifetime ≥ t), churned
    and censored counts at t, and the discrete hazard churned/at_risk.

    All quantities are exact integers; the hazard is one int/int
    division (correctly rounded identically on both engines, emitted
    raw). The at-risk set is the covered-tail decomposition — total
    minus the running sum of earlier terminations — computed with ONE
    unpartitioned window over the per-t rollup, whose row count is
    bounded by the calendar span (days), not the user count: safe at
    any corpus scale. Reference: no survival surface (extension per
    SURVEY §2.12 events analytics); standard KM estimator semantics.
    """
    ev = load_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("f"), F.max("ts").alias("l")
    )
    gmax = ev.agg(F.max("ts").alias("m"))
    lab = per_user.crossJoin(F.broadcast(gmax)).select(
        F.datediff(F.to_date("l"), F.to_date("f")).alias("t_days"),
        (
            F.datediff(F.to_date("m"), F.to_date("l")) < _CENSOR_DAYS
        ).alias("cens"),
    )
    byt = lab.groupBy("t_days").agg(
        F.sum(F.when(F.col("cens"), 0).otherwise(1)).alias("ch"),
        F.sum(F.when(F.col("cens"), 1).otherwise(0)).alias("ce"),
    )
    w_prior = (
        Window.orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = byt.select(
        "t_days", "ch", "ce",
        F.sum(F.col("ch") + F.col("ce")).over(w_prior).alias("pri"),
        F.sum(F.col("ch") + F.col("ce")).over(w_all).alias("tot"),
    )
    at_risk = F.col("tot") - F.coalesce(F.col("pri"), F.lit(0))
    return cum.select(
        F.col("t_days").cast("int").alias("t_days"),
        at_risk.cast("bigint").alias("n_at_risk"),
        F.col("ch").cast("bigint").alias("n_churned"),
        F.col("ce").cast("bigint").alias("n_censored"),
        (F.col("ch").cast("bigint") / at_risk.cast("double")).alias(
            "hazard"
        ),
    )


# ---------------------------------------------------------------------------
# Session overlap counts — bucketized interval self-join (range join)
# ---------------------------------------------------------------------------

_HOUR_US = 3600 * 1_000_000

_SESSIONS_CTE = """
    gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                     OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid, ts
        FROM gaps
    ),
    iv AS (
        SELECT user_id, CAST(sid AS INTEGER) AS session_id,
               epoch_us(MIN(ts)) AS s, epoch_us(MAX(ts)) AS e
        FROM sess GROUP BY 1, 2
    )"""


@register(
    "session_overlap_counts",
    "WITH "
    + _SESSIONS_CTE
    + """,
    p AS (
        SELECT a.user_id AS ua, a.session_id AS sa,
               b.user_id AS ub, b.session_id AS sb
        FROM iv a JOIN iv b
          ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    ),
    c AS (
        SELECT ua AS user_id, sa AS session_id FROM p
        UNION ALL
        SELECT ub, sb FROM p
    ),
    g AS (SELECT user_id, session_id, COUNT(*) AS n FROM c GROUP BY 1, 2)
    SELECT iv.user_id, iv.session_id,
           CAST(COALESCE(g.n, 0) AS BIGINT) AS n_overlapping
    FROM iv LEFT JOIN g USING (user_id, session_id)
    """,
)
def q_session_overlap_counts(spark, sf_dir):
    """For every session (the 30-minute-gap windows of
    sessionize_events, closed intervals [first_ts, last_ts]): how many
    OTHER users' sessions overlap it in time — the per-entity form of
    peak_concurrency's capacity question ("who was I concurrent with",
    not just "how many at peak").

    This is an interval self-join by DEFINITION (the DuckDB oracle
    states the quadratic inequality join), but the COUNT needs no pair
    materialization: with closed intervals, session j fails to overlap
    i iff e_j < s_i or s_j > e_i, so

        n_overlap(i) = #(s_j <= e_i) - #(e_j < s_i) - 1

    (the -1 removes i itself; same-user sessions are gap-separated so
    the arithmetic excludes them automatically). Both counts come from
    ONE boundary stream (2 rows per session) ranked by a sweep
    decomposition: per-hour running counts (starts sort BEFORE ends at
    equal timestamps, making <= / < exact at microsecond ties) plus a
    cumulative per-hour rollup whose row count is the calendar span.
    An earlier bucketized pair-join plan went quadratic WITHIN the
    busiest hour as density grows (measured ×55 for 10× rows at the
    sf10 probe: 5.6 → 307 s; this formulation: O(n log n), 6.9 s).
    Nothing pair-sized is ever built — the oracle's n² join is the
    semantic spec, not the plan.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    iv = (
        ev.withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session")
            .over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("int"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("s"),
            F.unix_micros(F.max("ts")).alias("e"),
        )
        .localCheckpoint(eager=True)  # consumed by both boundary rows
    )
    # boundary stream: typ 0 = start, 1 = end; at equal val starts sort
    # first, so a running end-count read AT a start row is #(e < s)
    # strictly, and a running start-count read AT an end row is
    # #(s <= e) inclusively — the exact closed-interval tie semantics.
    b = iv.select(
        "user_id", "session_id",
        F.col("s").alias("val"), F.lit(0).alias("typ"),
    ).unionAll(
        iv.select(
            "user_id", "session_id",
            F.col("e").alias("val"), F.lit(1).alias("typ"),
        )
    ).withColumn("h", F.expr(f"val div {_HOUR_US}"))
    wh = (
        Window.partitionBy("h")
        .orderBy("val", "typ")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = b.select(
        "user_id", "session_id", "typ", "h",
        F.sum(F.lit(1) - F.col("typ")).over(wh).alias("run_starts"),
        F.sum("typ").over(wh).alias("run_ends"),
    )
    hourly = b.groupBy("h").agg(
        F.sum(F.lit(1) - F.col("typ")).alias("hs"),
        F.sum("typ").alias("he"),
    )
    wc = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, -1)
    cum = hourly.select(
        "h",
        F.coalesce(F.sum("hs").over(wc), F.lit(0)).alias("cs"),
        F.coalesce(F.sum("he").over(wc), F.lit(0)).alias("ce"),
    )
    j = ranked.join(F.broadcast(cum), "h")
    ends_lt_s = j.filter(F.col("typ") == 0).select(
        "user_id", "session_id",
        (F.col("ce") + F.col("run_ends")).alias("n_ends_lt"),
    )
    starts_le_e = j.filter(F.col("typ") == 1).select(
        F.col("user_id").alias("u2"), F.col("session_id").alias("s2"),
        (F.col("cs") + F.col("run_starts")).alias("n_starts_le"),
    )
    return ends_lt_s.join(
        starts_le_e,
        (F.col("user_id") == F.col("u2"))
        & (F.col("session_id") == F.col("s2")),
    ).select(
        "user_id", "session_id",
        (F.col("n_starts_le") - F.col("n_ends_lt") - 1)
        .cast("bigint")
        .alias("n_overlapping"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language
# ---------------------------------------------------------------------------


@register(
    "token_fertility_by_lang",
    rf"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)                              AS n_docs,
           CAST(SUM(length(text)) AS BIGINT)                     AS n_chars,
           CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                AS BIGINT)                                       AS n_words,
           CAST(SUM(len(regexp_extract_all(text,
                '{BPE_ISH_PATTERN}'))) AS BIGINT)                AS n_bpe_tokens,
           CAST(SUM(length(text)) AS BIGINT)
               / CAST(SUM(len(regexp_extract_all(text,
                     '{BPE_ISH_PATTERN}'))) AS DOUBLE)           AS chars_per_token,
           CAST(SUM(len(regexp_extract_all(text,
                '{BPE_ISH_PATTERN}'))) AS BIGINT)
               / CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                     AS DOUBLE)                                  AS tokens_per_word
    FROM documents
    GROUP BY lang
    """,
)
def q_token_fertility_by_lang(spark, sf_dir):
    """Tokenizer fertility table per language: characters per BPE-ish
    lexer token and lexer tokens per whitespace word — the numbers
    that size an LLM training-token budget from raw corpus bytes
    (fertility varies by language; this is the planning table).

    Composes the two registered tokenizers (functions/text.py
    ws_tokens / bpe_ish_tokens, both JVM regexp expressions inside
    codegen). All sums are exact int64; the two fertility ratios are
    single int/int divisions emitted raw (NOTES rule 11 single-op
    exemption). One |langs|-row output at any corpus size; partial
    aggregation makes the shuffle carry only per-partition sums.
    """
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.sum(F.size(ws_tokens(F.col("text"))))
        .cast("bigint")
        .alias("n_words"),
        F.sum(F.size(bpe_ish_tokens(F.col("text"))))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )
    return agg.select(
        "lang", "n_docs", "n_chars", "n_words", "n_bpe_tokens",
        (F.col("n_chars") / F.col("n_bpe_tokens").cast("double")).alias(
            "chars_per_token"
        ),
        (F.col("n_bpe_tokens") / F.col("n_words").cast("double")).alias(
            "tokens_per_word"
        ),
    )


# ---------------------------------------------------------------------------
# Open-order backlog per day — sweep line over order lifetimes
# ---------------------------------------------------------------------------


@register(
    "open_order_backlog",
    """
    WITH life AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS start_day,
               MAX(CAST(l.l_shipdate AS DATE)) AS end_day
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    deltas AS (
        SELECT start_day AS day, 1 AS d FROM life
        UNION ALL
        SELECT end_day + INTERVAL 1 DAY, -1 FROM life
    ),
    byday AS (SELECT day, SUM(d) AS d FROM deltas GROUP BY 1)
    SELECT CAST(day AS DATE) AS day,
           CAST(SUM(d) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_open_orders
    FROM byday
    """,
)
def q_open_order_backlog(spark, sf_dir):
    """Orders in flight per calendar day: an order is OPEN from its
    order date until its last lineitem ships — the operations dashboard
    number behind "how deep is the backlog?". The TPC-H-side sibling of
    peak_concurrency_by_day's sweep line.

    Sweep-line decomposition: each order contributes +1 at its start
    day and −1 the day after its last shipment; deltas aggregate per
    day (one day-keyed exchange over order-count rows), and the running
    backlog is ONE unpartitioned cumulative sum over the per-day rollup
    — whose row count is the calendar span (~2.5k days at any sf), not
    the order count, so the unpartitioned window is scale-safe by
    construction (same argument as user_lifetime_survival's life
    table). The orderkey join reuses lineitem's natural key; everything
    is exact integers. Days with zero delta between events carry the
    running value implicitly — emitted rows are CHANGE days only,
    matching the oracle's identical byday grid.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    life = (
        orders.select("o_orderkey", F.to_date("o_orderdate").alias("sd"))
        .join(
            li.select("l_orderkey", F.to_date("l_shipdate").alias("shd")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "sd")
        .agg(F.max("shd").alias("ed"))
    )
    # both deltas in ONE pass: a union would re-evaluate life (and its
    # orders⋈lineitem) per branch — explode a 2-element struct array
    # instead (plan audit: 4 scans → 2)
    deltas = life.select(
        F.explode(
            F.array(
                F.struct(F.col("sd").alias("day"), F.lit(1).alias("d")),
                F.struct(
                    F.date_add("ed", 1).alias("day"), F.lit(-1).alias("d")
                ),
            )
        ).alias("x")
    ).select("x.day", "x.d")
    byday = deltas.groupBy("day").agg(F.sum("d").alias("d"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return byday.select(
        "day", F.sum("d").over(w).cast("bigint").alias("n_open_orders")
    )


# ---------------------------------------------------------------------------
# EWMA control chart on daily event rates
# ---------------------------------------------------------------------------

_EWMA_N = 12  # taps; alpha = 1/4, weights 3^k·4^(N-1-k), D = 4^N - 3^N
_EWMA_D = 4 ** _EWMA_N - 3 ** _EWMA_N


def _ewma_terms_sql() -> str:
    return " + ".join(
        f"LAG(c, {k}) OVER w * {3 ** k * 4 ** (_EWMA_N - 1 - k)}"
        for k in range(_EWMA_N)
    )


@register(
    "daily_event_ewma",
    f"""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    conv AS (
        SELECT event_type, day, c,
               CAST({_ewma_terms_sql()} AS BIGINT) AS num
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, c AS n_events,
           num / {float(_EWMA_D)!r} AS ewma,
           c * {_EWMA_D} > 2 * num  AS is_burst
    FROM conv WHERE num IS NOT NULL
    """,
)
def q_daily_event_ewma(spark, sf_dir):
    """EWMA control chart on per-type daily event counts: the
    time-adaptive anomaly detector beside event_burst_days' day-of-week
    z-test (a z-test needs a stationary weekday profile; EWMA tracks a
    drifting level). ``is_burst`` flags days whose count exceeds 2× the
    trailing EWMA of the PREVIOUS 12 days.

    α = 1/4 as an exact rational: the truncated convolution weights are
    3^k·4^(11-k) (ints), denominator D = 4^12 − 3^12 exactly, so the
    numerator is an exact int64 (≤ 4^12·max_daily_count ≈ 1.7e7·c —
    int64-safe to ~5e11 events/day) and the emitted ewma is ONE double
    division. The burst flag never touches floats: c·D > 2·num is an
    exact integer comparison (the cross-multiplication idiom). NULL
    head per macd convention (first 12 days per type drop). One
    event_type exchange over the per-day rollup — rows bounded by
    types × calendar days at any sf."""
    ev = load_events(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("day")
    num = None
    for k in range(_EWMA_N):
        term = F.lag("c", k).over(w) * F.lit(
            3 ** k * 4 ** (_EWMA_N - 1 - k)
        )
        num = term if num is None else num + term
    conv = d.select(
        "event_type", "day", "c", num.cast("bigint").alias("num")
    )
    return conv.filter(F.col("num").isNotNull()).select(
        "event_type", "day", F.col("c").alias("n_events"),
        (F.col("num") / F.lit(float(_EWMA_D))).alias("ewma"),
        (F.col("c") * _EWMA_D > 2 * F.col("num")).alias("is_burst"),
    )


# ---------------------------------------------------------------------------
# Nation coverage — FULL OUTER join of one-sided rollups
# ---------------------------------------------------------------------------


@register(
    "nation_market_coverage",
    """
    WITH c AS (
        SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY 1
    ),
    s AS (
        SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM supplier GROUP BY 1
    ),
    f AS (
        SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
               COALESCE(c.n_customers, 0) AS n_customers,
               COALESCE(s.n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    )
    SELECT n.n_name AS nation, f.n_customers, f.n_suppliers,
           CASE WHEN f.n_customers > 0 AND f.n_suppliers > 0 THEN 'both'
                WHEN f.n_customers > 0 THEN 'customers_only'
                ELSE 'suppliers_only' END AS coverage
    FROM f JOIN nation n ON f.nationkey = n.n_nationkey
    """,
)
def q_nation_market_coverage(spark, sf_dir):
    """Market-coverage gap report: which nations have AUTOMOBILE-segment
    customers but no suppliers (unserved demand), suppliers but no such
    customers (stranded capacity), or both — the FULL OUTER JOIN shape
    (§2 join-family completion: J1-J4 cover left/broadcast/inner; this
    is the two-sided-preserving case) on two one-sided rollups, with
    the nation dim broadcast for names. Non-vacuity: suppliers number
    ~sf·100 over 25 nations, so supplier-less nations exist at the
    verify scales (pinned in tests/test_ext5.py); all counts exact."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    f = cust.join(supp, F.col("ck") == F.col("sk"), "full").select(
        F.coalesce("ck", "sk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )
    nation = load_table(spark, sf_dir, "nation")
    return f.join(
        F.broadcast(nation), F.col("nationkey") == F.col("n_nationkey")
    ).select(
        F.col("n_name").alias("nation"), "n_customers", "n_suppliers",
        F.when(
            (F.col("n_customers") > 0) & (F.col("n_suppliers") > 0), "both"
        )
        .when(F.col("n_customers") > 0, "customers_only")
        .otherwise("suppliers_only")
        .alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Event-type co-occurrence within sessions — market-basket on sessions
# ---------------------------------------------------------------------------


@register(
    "session_type_cooccurrence",
    "WITH "
    + _SESSIONS_CTE.replace(
        "SELECT user_id, ts,", "SELECT user_id, ts, event_type,"
    ).replace(
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid, ts",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid, ts,"
        " event_type",
    ).replace(
        """    iv AS (
        SELECT user_id, CAST(sid AS INTEGER) AS session_id,
               epoch_us(MIN(ts)) AS s, epoch_us(MAX(ts)) AS e
        FROM sess GROUP BY 1, 2
    )""",
        """    st AS (
        SELECT DISTINCT user_id, sid, event_type FROM sess
    ),
    n AS (SELECT COUNT(DISTINCT (user_id, sid)) AS n_sessions FROM sess),
    tf AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
           FROM st GROUP BY 1)""",
    )
    + """,
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM st a JOIN st b
          ON a.user_id = b.user_id AND a.sid = b.sid
         AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           ta.n_t AS n_a, tb.n_t AS n_b,
           CAST(n.n_sessions AS BIGINT) AS n_sessions,
           p.n_both * CAST(n.n_sessions AS BIGINT)
               / CAST(ta.n_t * tb.n_t AS DOUBLE) AS lift
    FROM pairs p
    JOIN tf ta ON p.type_a = ta.event_type
    JOIN tf tb ON p.type_b = tb.event_type
    CROSS JOIN n
    """,
)
def q_session_type_cooccurrence(spark, sf_dir):
    """Market-basket analysis where the basket is a SESSION: which
    event types co-occur within the 30-minute-gap sessions, with exact
    lift = P(a,b)/(P(a)·P(b)) = n_both·N/(n_a·n_b). The session-level
    sibling of part_cooccurrence (whose basket is an order).

    Scale shape: the per-session distinct-type set is bounded by the
    TYPE VOCABULARY (5 here), so the within-session pair fan-out is
    ≤ C(|types|,2) per session — linear in sessions, never quadratic
    in events; the pair join runs on the (user,sid)-keyed distinct-type
    table and everything downstream is |types|²-sized. Exact integers
    closed by one double division for the lift (int64 product n_a·n_b
    is safe to ~3e9 sessions per type). Reference: no session-basket
    surface (extension per SURVEY §2.12)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    st = (
        ev.withColumn("new_session", new_session)
        .withColumn(
            "sid",
            F.sum("new_session").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select("user_id", "sid", "event_type")
        .distinct()
        .localCheckpoint(eager=True)  # pairs (2 sides) + tf + n
    )
    n_sessions = st.select("user_id", "sid").distinct().count()
    tf = st.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t")
    )
    a = st.select(
        F.col("user_id").alias("u"), F.col("sid").alias("s1"),
        F.col("event_type").alias("type_a"),
    )
    b = st.select(
        F.col("user_id").alias("u2"), F.col("sid").alias("s2"),
        F.col("event_type").alias("type_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("u") == F.col("u2"))
            & (F.col("s1") == F.col("s2"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    ta = tf.select(
        F.col("event_type").alias("__ta"), F.col("n_t").alias("n_a")
    )
    tb = tf.select(
        F.col("event_type").alias("__tb"), F.col("n_t").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), F.col("type_a") == F.col("__ta"))
        .join(F.broadcast(tb), F.col("type_b") == F.col("__tb"))
        .select(
            "type_a", "type_b", "n_both", "n_a", "n_b",
            F.lit(n_sessions).cast("bigint").alias("n_sessions"),
            (
                F.col("n_both") * F.lit(n_sessions)
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Overnight price gaps — open vs previous close, exact threshold flags
# ---------------------------------------------------------------------------


@register(
    "price_gap_events",
    """
    WITH ticks AS (
        SELECT l_suppkey AS symbol, CAST(l_shipdate AS DATE) AS date,
               MIN(l_extendedprice) AS open,
               MAX(l_extendedprice) AS close
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT symbol, date,
               CAST(round(open * 100) AS BIGINT)  AS oc,
               LAG(CAST(round(close * 100) AS BIGINT))
                   OVER (PARTITION BY symbol ORDER BY date) AS pc
        FROM ticks
    ),
    flagged AS (
        SELECT symbol, date, oc, pc,
               (oc - pc) / (pc / 100.0) AS gap_pct,
               20 * oc > 21 * pc AS gap_up,
               20 * oc < 19 * pc AS gap_down
        FROM c WHERE pc IS NOT NULL AND pc > 0
    )
    SELECT symbol,
           CAST(COUNT(*) AS BIGINT)                             AS n_days,
           CAST(SUM(CASE WHEN gap_up   THEN 1 ELSE 0 END)
                AS BIGINT)                                      AS n_gap_up,
           CAST(SUM(CASE WHEN gap_down THEN 1 ELSE 0 END)
                AS BIGINT)                                      AS n_gap_down,
           MAX(gap_pct)                                         AS max_gap_pct,
           MIN(gap_pct)                                         AS min_gap_pct
    FROM flagged GROUP BY symbol
    """,
)
def q_price_gap_events(spark, sf_dir):
    """Overnight gap detection per symbol: today's open vs yesterday's
    close, counting ±5% gap days and the extreme gap sizes — the data
    feed for gap-trading scans and for data-quality review (a gap
    cluster often means a bad load, the reference's clean-step
    territory: ``src/transform.py`` price-consistency checks).

    The gap FLAGS never touch floats: 20·oc > 21·pc is the
    cross-multiplied exact-integer form of oc/pc − 1 > 5% (NOTES
    cross-multiplication idiom; int64-safe trivially). gap_pct itself
    is emitted for the MIN/MAX extremes only: (oc − pc)/(pc/100) is
    two sequential correctly-rounded ops on exact ints — deterministic
    doubles, and MIN/MAX are order-insensitive exact selections (rule
    10's safe class). One symbol exchange serves the lag window and
    the final group-by."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("symbol"),
        F.to_date("l_shipdate").alias("date"),
        "l_extendedprice",
    )
    t = (
        li.repartition(F.col("symbol"))
        .groupBy("symbol", "date")
        .agg(
            F.min("l_extendedprice").alias("open"),
            F.max("l_extendedprice").alias("close"),
        )
    )
    w = Window.partitionBy("symbol").orderBy("date")
    c = t.select(
        "symbol", "date",
        F.round(F.col("open") * 100, 0).cast("bigint").alias("oc"),
        F.lag(F.round(F.col("close") * 100, 0).cast("bigint"))
        .over(w)
        .alias("pc"),
    ).filter(F.col("pc").isNotNull() & (F.col("pc") > 0))
    flagged = c.select(
        "symbol",
        (
            (F.col("oc") - F.col("pc")) / (F.col("pc") / F.lit(100.0))
        ).alias("gap_pct"),
        (20 * F.col("oc") > 21 * F.col("pc")).alias("gap_up"),
        (20 * F.col("oc") < 19 * F.col("pc")).alias("gap_down"),
    )
    return flagged.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.when(F.col("gap_up"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_gap_up"),
        F.sum(F.when(F.col("gap_down"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_gap_down"),
        F.max("gap_pct").alias("max_gap_pct"),
        F.min("gap_pct").alias("min_gap_pct"),
    )


# ---------------------------------------------------------------------------
# Quantity distribution audit — exact integer histogram + share
# ---------------------------------------------------------------------------


@register(
    "quantity_distribution",
    """
    WITH h AS (
        SELECT CAST(l_quantity AS BIGINT) AS quantity,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h)
    SELECT h.quantity, h.n,
           h.n / CAST(t.total AS DOUBLE) AS share,
           CAST(SUM(h.n) OVER (ORDER BY h.quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n
    FROM h, t
    """,
)
def q_quantity_distribution(spark, sf_dir):
    """Order-quantity distribution audit: exact per-value counts,
    share of total, and the cumulative count — the uniformity check a
    data audit runs on any discrete column (TPC-H quantity is uniform
    1..50; a regenerated or corrupted load shows up as a skewed or
    truncated histogram immediately).

    All integers; share is one int/int division (raw); the cumulative
    sum is an unpartitioned window over the VALUE-DOMAIN-sized rollup
    (≤50 rows at any sf — the bounded-rollup argument again). The scan
    reads one column; partial aggregation means the shuffle carries at
    most |domain| rows per task."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("quantity")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = h.agg(F.sum("n").cast("bigint").alias("total"))
    w = Window.orderBy("quantity").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return h.crossJoin(F.broadcast(t)).select(
        "quantity", "n",
        (F.col("n") / F.col("total").cast("double")).alias("share"),
        F.sum("n").over(w).cast("bigint").alias("cum_n"),
    )

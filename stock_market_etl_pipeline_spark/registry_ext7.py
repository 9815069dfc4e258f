"""Extended coverage, part 7: embedding geometry, time-weighted pricing,
session depth, lexical profiles, drawdown stress, and run-length shape.

- ``embedding_norm_stats`` — per-label quartiles of the (quantized)
  embedding L2 norm²: the geometry sanity check before any cosine work
  (un-normalized clusters and dead vectors show up here first).
- ``twap_monthly`` — TIME-weighted average price per (symbol, month):
  each tick weighted by the days it was the latest print, the
  irregular-grid twin of the volume-weighted vwap_monthly.
- ``session_depth_curve`` — P(session reaches ≥ k events) for k = 1..10:
  the engagement funnel over sessionized events.
- ``word_length_profile`` — per-language mean/median/p90 whitespace-token
  length: the lexical fingerprint beside lang_id's trigram heuristic.
- ``ulcer_index`` — per-symbol Ulcer Index: RMS of the running-peak
  drawdown in basis points (the pain-weighted volatility measure;
  max_drawdown reports only the single worst point).
- ``updown_run_lengths`` — corpus-wide histogram of up/down run lengths
  (gaps-and-islands on the sign of the daily move): the shape detail
  behind runs_test_updown's single z statistic.

Float policy (NOTES rules 9-15): norms quantize each component via
FLOOR(x·10⁶ + 0.5) (floor is identical on both engines; round() is not
— Spark half-up vs DuckDB half-even) and close over exact int sums of
squares; TWAP is Σ(cents·days)/Σdays with ONE division; drawdowns
quantize to basis points by truncating integer division against the
running peak (rule 13) and the index closes with one division + one
sqrt; every quantile is a k·c ≥ m·n order statistic on a distinct-value
table; fractions are single divisions of exact counts, ROUND 6.

100 TB shape: norm² reduction is a per-row array fold (no explode, no
shuffle) followed by per-label value-table windows; TWAP's lead()
rides the same (symbol, month) exchange as the final rollup; the depth
curve's k-grid is a 10-row broadcast; run-length islands reuse the
symbol exchange; word-length explodes tokens once into a
(lang, len)-grouped combine (map-side partial agg keeps the shuffle at
|lang × len-domain|).

Reference lineage: extension scope per SURVEY §2.12.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import register
from .sources.events import load_events
from .sources.tables import load_table
from .sources.ticks import ticks

_DEC7 = "decimal(38,0)"

# ---------------------------------------------------------------------------
# Embedding norm² quartiles per label
# ---------------------------------------------------------------------------


@register(
    "embedding_norm_stats",
    """
    WITH q AS (
        SELECT label,
               CAST(list_sum(list_transform(
                   embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)
                        * CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                               AS BIGINT)
               )) AS BIGINT) AS nq
        FROM embeddings
    ),
    vt AS (
        SELECT label, nq AS v, CAST(COUNT(*) AS BIGINT) AS t
        FROM q GROUP BY 1, 2
    ),
    cum AS (
        SELECT label, v, t,
               SUM(t) OVER (PARTITION BY label ORDER BY v) AS c,
               SUM(t) OVER (PARTITION BY label)            AS n
        FROM vt
    )
    SELECT label,
           CAST(MAX(n) AS BIGINT)                        AS n_vectors,
           CAST(MIN(CASE WHEN 4 * c >= n THEN v END)
                AS BIGINT)                               AS q1_norm2,
           CAST(MIN(CASE WHEN 2 * c >= n THEN v END)
                AS BIGINT)                               AS median_norm2,
           CAST(MIN(CASE WHEN 4 * c >= 3 * n THEN v END)
                AS BIGINT)                               AS q3_norm2
    FROM cum GROUP BY 1
    """,
)
def q_embedding_norm_stats(spark, sf_dir):
    """Per-label quartiles of the squared L2 norm of each embedding,
    quantized at 10⁻⁶ per component — the pre-flight geometry check for
    every cosine/ANN operator (a label whose norm distribution collapses
    toward 0 or spreads wildly will dominate or vanish in dot products).

    Exactness: each component maps to FLOOR(x·10⁶ + 0.5) AFTER an
    explicit float→double cast (exact; without it the engines promote
    float·int differently — caught at registration) — floor of the
    identical double is identical on both engines, where round() is NOT
    (Spark half-up, DuckDB half-even — NOTES rule 5's sibling for
    arbitrary floats); norm² is then an exact int sum of squares
    (≤ dim·10¹² ≪ 2⁶³), and quartiles are order statistics on the
    per-label distinct-norm² table. Zero float arithmetic after the
    quantization.

    Plan: the fold is a per-row array aggregate inside the scan
    projection (no explode — the array never shuffles); one exchange on
    (label, norm²) for the value table; label-partitioned windows."""
    emb = load_table(spark, sf_dir, "embeddings")
    qx = (
        "CAST(floor(CAST(element_at(embedding, i) AS DOUBLE)"
        " * 1000000 + 0.5) AS BIGINT)"
    )
    nq = F.expr(
        "aggregate(sequence(1, size(embedding)), CAST(0 AS BIGINT),"
        f" (acc, i) -> acc + {qx} * {qx})"
    ).alias("nq")
    q = emb.select("label", nq)
    vt = q.groupBy("label", F.col("nq").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    wc = Window.partitionBy("label").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vt.select(
        "label", "v", "t",
        F.sum("t").over(wc).alias("c"),
        F.sum("t").over(Window.partitionBy("label")).alias("n"),
    )
    c, n, v = F.col("c"), F.col("n"), F.col("v")
    return cum.groupBy("label").agg(
        F.max(n).cast("bigint").alias("n_vectors"),
        F.min(F.when(4 * c >= n, v)).cast("bigint").alias("q1_norm2"),
        F.min(F.when(2 * c >= n, v)).cast("bigint")
        .alias("median_norm2"),
        F.min(F.when(4 * c >= 3 * n, v)).cast("bigint")
        .alias("q3_norm2"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average price per symbol-month
# ---------------------------------------------------------------------------


@register(
    "twap_monthly",
    WITH_TICKS
    + """,
    w AS (
        SELECT symbol,
               CAST(date_part('year', date) AS INT)  AS year,
               CAST(date_part('month', date) AS INT) AS month,
               CAST(round(close * 100) AS BIGINT)    AS cc,
               COALESCE(
                   date_diff('day', date,
                       LEAD(date) OVER (
                           PARTITION BY symbol,
                                        date_trunc('month', date)
                           ORDER BY date)),
                   1) AS days_held
        FROM ticks
    )
    SELECT symbol, year, month,
           CAST(SUM(days_held) AS BIGINT) AS days_covered,
           ROUND(CAST(SUM(cc * days_held) AS BIGINT)
                 / (100.0 * SUM(days_held)), 6) AS twap
    FROM w GROUP BY 1, 2, 3
    """,
)
def q_twap_monthly(spark, sf_dir):
    """TIME-weighted average price per (symbol, month): each tick's
    close is weighted by the number of days it remained the latest
    print (the month's final tick weights 1) — the irregular-grid
    average a plain AVG mis-states whenever ticks cluster, and the
    time-axis twin of the volume-weighted ``vwap_monthly``.

    Exactness: weights are exact day counts off the within-month lead;
    Σ(cents·days) and Σdays are exact ints; the TWAP is ONE division
    closed by ROUND 6 (avg_cents discipline, NOTES rule 10).

    Plan: one (symbol, month-grain) exchange serves the lead window and
    the rollup — the window partitions by (symbol, trunc(month)), so
    the groupBy reuses the partitioning."""
    t = ticks(spark, sf_dir)
    wm = Window.partitionBy("symbol", F.trunc("date", "month")).orderBy(
        "date"
    )
    cc = F.round(F.col("close") * 100, 0).cast("bigint")
    w = t.select(
        "symbol",
        F.year("date").cast("int").alias("year"),
        F.month("date").cast("int").alias("month"),
        cc.alias("cc"),
        F.coalesce(
            F.datediff(F.lead("date").over(wm), F.col("date")),
            F.lit(1),
        ).cast("bigint").alias("days_held"),
    )
    return w.groupBy("symbol", "year", "month").agg(
        F.sum("days_held").cast("bigint").alias("days_covered"),
        F.round(
            F.sum(F.col("cc") * F.col("days_held")).cast("bigint")
            / (F.lit(100.0) * F.sum("days_held")),
            6,
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# Session depth curve
# ---------------------------------------------------------------------------


@register(
    "session_depth_curve",
    """
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                         > 1800000000
                     OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM gaps
    ),
    depth AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS d
        FROM sess GROUP BY user_id, session_id
    ),
    vt AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS t FROM depth GROUP BY 1),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM vt),
    grid AS (SELECT UNNEST(range(1, 11)) AS k)
    SELECT CAST(grid.k AS BIGINT) AS k,
           CAST(COALESCE(SUM(vt.t), 0) AS BIGINT) AS sessions_ge_k,
           ROUND(CAST(COALESCE(SUM(vt.t), 0) AS BIGINT) * 1.0
                 / MAX(tot.n), 6) AS frac_ge_k
    FROM grid CROSS JOIN tot
    LEFT JOIN vt ON vt.d >= grid.k
    GROUP BY 1
    """,
)
def q_session_depth_curve(spark, sf_dir):
    """P(session reaches ≥ k events) for k = 1..10 — the engagement
    funnel over 30-minute-gap sessions (sessionize_events reports
    per-session rows; this is the retention-curve rollup a product
    dashboard actually plots).

    Exactness: depth counts and the ≥k tail sums are exact ints; each
    fraction is ONE division by the exact session total, ROUND 6.

    Plan: one user_id exchange sessionizes; depths collapse to a
    |depth-domain| value table; the k-grid (10 rows) broadcast
    non-equi-joins the value table — at any scale the join is
    10 × |depth domain|."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    # cumulative sum ordered by the SAME (ts, event_id) key as the lag
    # window (ADVICE r11): ts-only ordering makes session assignment of
    # ts-tied boundary rows nondeterministic across engines.
    sess = ev.withColumn("new_session", new_session).withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    depth = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    vt = depth.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    tot = vt.agg(F.sum("t").cast("bigint").alias("n"))
    grid = spark.range(1, 11).select(F.col("id").cast("bigint").alias("k"))
    return (
        grid.crossJoin(F.broadcast(tot))
        .join(F.broadcast(vt), vt.d >= grid.k, "left")
        .groupBy("k")
        .agg(
            F.coalesce(F.sum("t"), F.lit(0)).cast("bigint")
            .alias("sessions_ge_k"),
            F.round(
                F.coalesce(F.sum("t"), F.lit(0)).cast("bigint")
                * F.lit(1.0) / F.max("n"),
                6,
            ).alias("frac_ge_k"),
        )
    )


# ---------------------------------------------------------------------------
# Word-length profile per language
# ---------------------------------------------------------------------------


@register(
    "word_length_profile",
    r"""
    WITH toks AS (
        SELECT lang, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    tok AS (
        SELECT lang, length(u.tk) AS len
        FROM toks, UNNEST(t) AS u(tk)
        WHERE length(u.tk) > 0
    ),
    vt AS (
        SELECT lang, CAST(len AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT)  AS t
        FROM tok GROUP BY 1, 2
    ),
    cum AS (
        SELECT lang, v, t,
               SUM(t) OVER (PARTITION BY lang ORDER BY v) AS c,
               SUM(t) OVER (PARTITION BY lang)            AS n
        FROM vt
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT)                          AS n_tokens,
           ROUND(CAST(SUM(v * t) AS BIGINT) * 1.0
                 / MAX(n), 6)                              AS mean_len,
           CAST(MIN(CASE WHEN 2 * c >= n THEN v END)
                AS BIGINT)                                 AS median_len,
           CAST(MIN(CASE WHEN 10 * c >= 9 * n THEN v END)
                AS BIGINT)                                 AS p90_len
    FROM cum GROUP BY 1
    """,
)
def q_word_length_profile(spark, sf_dir):
    """Per-language mean / median / p90 whitespace-token length — the
    lexical fingerprint that separates scripts and registers (agglutinative
    vs analytic languages, prose vs code) beside lang_id's trigram
    heuristic. Empty tokens (leading/trailing whitespace artifacts)
    drop on both engines.

    Exactness: token lengths are exact ints; the mean is ONE division
    of Σ(len·count) by the exact token total (ROUND 6); median/p90 are
    k·c ≥ m·n order statistics on the per-language length table.

    Plan: tokens explode once into a (lang, len) map-side-combinable
    groupBy — the shuffle carries |lang × len-domain| rows, not tokens;
    windows run over that bounded value table."""
    from .functions.text import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(ws_tokens(F.col("text"))).alias("tk"),
    ).filter(F.length("tk") > 0)
    vt = tok.groupBy(
        "lang", F.length("tk").cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    wc = Window.partitionBy("lang").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vt.select(
        "lang", "v", "t",
        F.sum("t").over(wc).alias("c"),
        F.sum("t").over(Window.partitionBy("lang")).alias("n"),
    )
    c, n, v = F.col("c"), F.col("n"), F.col("v")
    return cum.groupBy("lang").agg(
        F.max(n).cast("bigint").alias("n_tokens"),
        F.round(
            F.sum(v * F.col("t")).cast("bigint") * F.lit(1.0) / F.max(n),
            6,
        ).alias("mean_len"),
        F.min(F.when(2 * c >= n, v)).cast("bigint").alias("median_len"),
        F.min(F.when(10 * c >= 9 * n, v)).cast("bigint")
        .alias("p90_len"),
    )


# ---------------------------------------------------------------------------
# Ulcer index per symbol
# ---------------------------------------------------------------------------


@register(
    "ulcer_index",
    WITH_TICKS
    + """,
    p AS (
        SELECT symbol,
               CAST(round(close * 100) AS BIGINT) AS cc,
               MAX(CAST(round(close * 100) AS BIGINT)) OVER (
                   PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS peak
        FROM ticks
    ),
    d AS (
        SELECT symbol,
               ((peak - cc) * 10000) // peak AS dd_bp
        FROM p
    )
    SELECT symbol,
           CAST(COUNT(*) AS BIGINT)  AS n_days,
           CAST(MAX(dd_bp) AS BIGINT) AS max_drawdown_bp,
           ROUND(sqrt(CAST(SUM(dd_bp * dd_bp) AS BIGINT)
                      * 1.0 / COUNT(*)), 6) AS ulcer_index_bp
    FROM d GROUP BY 1
    """,
)
def q_ulcer_index(spark, sf_dir):
    """Ulcer Index per symbol: the ROOT-MEAN-SQUARE of the running-peak
    drawdown, in basis points — the pain-weighted volatility measure
    (deep or long underwater stretches hurt quadratically) where
    ``max_drawdown`` reports only the single worst point and stddev
    ignores the peak entirely.

    Exactness: the running peak is an exact-int window max; each
    drawdown quantizes to basis points by ONE truncating integer
    division against its own peak (rule 13 — positive operands, both
    engines truncate); Σ(dd²) is exact (dd_bp ≤ 10⁴ → Σ ≤ n·10⁸ ≪ 2⁶³);
    the index closes with one division + one sqrt, ROUND 6.

    Plan: one symbol exchange serves the running-max window and the
    final aggregate."""
    t = ticks(spark, sf_dir)
    cc = F.round(F.col("close") * 100, 0).cast("bigint")
    wp = Window.partitionBy("symbol").orderBy("date").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = t.select(
        "symbol", cc.alias("cc"), F.max(cc).over(wp).alias("peak")
    )
    d = p.select(
        "symbol",
        F.expr("((peak - cc) * 10000) div peak").alias("dd_bp"),
    )
    return d.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("dd_bp").cast("bigint").alias("max_drawdown_bp"),
        F.round(
            F.sqrt(
                F.sum(F.col("dd_bp") * F.col("dd_bp")).cast("bigint")
                * F.lit(1.0) / F.count(F.lit(1))
            ),
            6,
        ).alias("ulcer_index_bp"),
    )


# ---------------------------------------------------------------------------
# Up/down run-length histogram
# ---------------------------------------------------------------------------


@register(
    "updown_run_lengths",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol, date,
               CAST(round(close * 100) AS BIGINT)
               - LAG(CAST(round(close * 100) AS BIGINT))
                     OVER (PARTITION BY symbol ORDER BY date) AS delta
        FROM ticks
    ),
    s AS (
        SELECT symbol, date,
               CASE WHEN delta > 0 THEN 1 ELSE -1 END AS sgn
        FROM d WHERE delta IS NOT NULL AND delta <> 0
    ),
    isl AS (
        SELECT symbol, sgn,
               ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date)
               - ROW_NUMBER() OVER (PARTITION BY symbol, sgn
                                    ORDER BY date) AS grp
        FROM s
    ),
    runs AS (
        SELECT symbol, sgn, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM isl GROUP BY symbol, sgn, grp
    )
    SELECT CASE WHEN sgn = 1 THEN 'up' ELSE 'down' END AS direction,
           run_len,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY 1, 2
    """,
)
def q_updown_run_lengths(spark, sf_dir):
    """Corpus-wide histogram of up/down run lengths (consecutive days
    the close moved the same direction; flat days break runs and are
    excluded) — the full run-length DISTRIBUTION behind
    runs_test_updown's single z statistic; a fat right tail here is
    what momentum strategies live on.

    Exactness: the double-row_number islands trick assigns each run a
    per-(symbol, sign) group id with exact ints; run lengths and the
    histogram are pure counts. No float ops at all.

    Plan: one symbol exchange serves the lag and both row_number
    windows (same partition key; the second adds sgn to the ORDER,
    not the exchange); runs collapse per symbol before the small
    (direction, run_len) rollup."""
    t = ticks(spark, sf_dir)
    cc = F.round(F.col("close") * 100, 0).cast("bigint")
    w = Window.partitionBy("symbol").orderBy("date")
    d = t.select(
        "symbol", "date", (cc - F.lag(cc).over(w)).alias("delta")
    ).filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
    s = d.select(
        "symbol", "date",
        F.when(F.col("delta") > 0, 1).otherwise(-1).alias("sgn"),
    )
    isl = s.select(
        "symbol", "sgn",
        (
            F.row_number().over(w)
            - F.row_number().over(
                Window.partitionBy("symbol", "sgn").orderBy("date")
            )
        ).alias("grp"),
    )
    runs = isl.groupBy("symbol", "sgn", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    return runs.groupBy(
        F.when(F.col("sgn") == 1, "up").otherwise("down")
        .alias("direction"),
        "run_len",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_runs"))


# ---------------------------------------------------------------------------
# Coefficient of variation of order value per market segment
# ---------------------------------------------------------------------------


@register(
    "order_value_cv_by_segment",
    """
    WITH j AS (
        SELECT c.c_mktsegment AS segment,
               CAST(round(o.o_totalprice * 100) AS HUGEINT) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    a AS (
        SELECT segment,
               CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(x)                    AS sx,
               SUM(x * x)                AS sxx
        FROM j GROUP BY 1
    )
    SELECT segment,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(CAST(sx AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)), 6)
               AS mean_value,
           ROUND(sqrt(CAST((n * sxx - sx * sx) // (n * (n - 1))
                           AS DOUBLE)) / 100.0, 6) AS std_value,
           ROUND(sqrt(CAST((n * sxx - sx * sx) // (n * (n - 1))
                           AS DOUBLE))
                 / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cv
    FROM a WHERE n > 1
    """,
)
def q_order_value_cv_by_segment(spark, sf_dir):
    """Coefficient of variation (std/mean) of order value per market
    segment — the scale-free dispersion that makes segments of very
    different typical ticket size comparable (raw stddev is dominated
    by the mean level).

    Exactness: cents sums and sums of squares are exact
    DECIMAL(38)/HUGEINT ints; the sample variance numerator
    n·Σx² − (Σx)² is quantized by ONE truncating division by n(n−1) at
    10⁹ scale (rule 13; products ≤ N·max² ·10⁹ — DECIMAL(38)-safe to
    ~sf100); mean, std and cv close over single correctly-rounded ops
    (divide, sqrt, divide) on identical operands — no FMA-contractable
    multiply-add chain anywhere (rule 11's actual hazard), ROUND 6.

    Plan: fact×broadcast(dim) join, one segment-grain aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast(_DEC7).alias("x"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    a = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast(_DEC7).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    # sub-mod decimal floor division (the mann_whitney lesson, ADVICE
    # r10): Spark `div` binds a BIGINT quotient and the variance in
    # cents-squared (~1e14 and scale-free) is fine, but the first draft
    # scaled by 1e9 first and the 1e23 quotient wrapped int64. No extra
    # scale is needed at all: truncating at whole cents-squared is
    # 1e-15 relative on these magnitudes.
    a = a.withColumn("vnum", F.expr("n * sxx - sx * sx")).withColumn(
        "vden", F.expr("n * (n - 1)")
    )
    varq = F.expr(
        "CAST((vnum - vnum % vden) / vden AS DECIMAL(38,0))"
    ).cast("double")
    mean_c = F.col("sx").cast("double") / F.col("n").cast("double")
    return a.filter(F.col("n") > 1).select(
        "segment",
        F.col("n").cast("long").alias("n_orders"),
        F.round(
            F.col("sx").cast("double")
            / (F.lit(100.0) * F.col("n").cast("double")),
            6,
        ).alias("mean_value"),
        F.round(F.sqrt(varq) / F.lit(100.0), 6).alias("std_value"),
        F.round(F.sqrt(varq) / mean_c, 6).alias("cv"),
    )


# ---------------------------------------------------------------------------
# Top-quintile users' share of event value (Pareto concentration)
# ---------------------------------------------------------------------------


@register(
    "user_value_pareto",
    """
    WITH uv AS (
        SELECT user_id,
               CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1
    ),
    rk AS (
        SELECT v,
               ROW_NUMBER() OVER (ORDER BY v DESC, user_id) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT)             AS n
        FROM uv
    )
    SELECT CAST(MAX(n) AS BIGINT)                          AS n_users,
           CAST(MAX(n) // 5 AS BIGINT)                     AS top_k,
           CAST(SUM(CASE WHEN rn <= n // 5 THEN v END)
                AS BIGINT)                                 AS top_value_cents,
           CAST(SUM(v) AS BIGINT)                          AS total_value_cents,
           ROUND(SUM(CASE WHEN rn <= n // 5 THEN v END)
                 * 1.0 / SUM(v), 6)                        AS top_share
    FROM rk
    """,
)
def q_user_value_pareto(spark, sf_dir):
    """Pareto concentration of event value: the share captured by the
    top 20% of users (by their summed event value) — the "80/20" number
    behind lorenz_revenue_deciles' full curve, on the events table.

    Exactness: per-user values quantize to cents via FLOOR(v·100 + 0.5)
    (identical on both engines; round() is not) and sum exactly; the
    quintile cut k = ⌊n/5⌋ and the tie-break (value DESC, user_id) make
    the top set deterministic; the share is ONE division of exact ints,
    ROUND 6.

    Plan: one user_id exchange builds per-user totals; the rank window
    runs over the USER table (|users| rows — already an aggregate, the
    documented bounded empty-partitionBy case; the two-level bucketed
    rank is the >10⁹-users escape hatch)."""
    ev = load_events(spark, sf_dir)
    uv = ev.groupBy("user_id").agg(
        F.sum(
            F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
            .cast("bigint")
        ).cast("bigint").alias("v")
    )
    wr = Window.orderBy(F.col("v").desc(), "user_id")
    rk = uv.select(
        "v",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("bigint").alias("n"),
    )
    top = F.when(F.col("rn") <= F.expr("n div 5"), F.col("v"))
    return rk.agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.expr("CAST(max(n) div 5 AS BIGINT)").alias("top_k"),
        F.sum(top).cast("bigint").alias("top_value_cents"),
        F.sum("v").cast("bigint").alias("total_value_cents"),
        F.round(
            F.sum(top) * F.lit(1.0) / F.sum("v"), 6
        ).alias("top_share"),
    )


# ---------------------------------------------------------------------------
# Turn-of-month return effect
# ---------------------------------------------------------------------------


@register(
    "turn_of_month_returns",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol, date,
               CAST(round(close * 100) AS BIGINT)
               - LAG(CAST(round(close * 100) AS BIGINT))
                     OVER (PARTITION BY symbol ORDER BY date) AS delta,
               LEAST(
                   CAST(date_part('day', date) AS BIGINT) - 1,
                   CAST(date_part('day',
                        last_day(date)) AS BIGINT)
                   - CAST(date_part('day', date) AS BIGINT)
               ) AS dist
        FROM ticks
    )
    SELECT LEAST(dist, 10)                    AS boundary_dist,
           CAST(COUNT(*) AS BIGINT)           AS n_moves,
           ROUND(CAST(SUM(delta) AS BIGINT)
                 / (100.0 * COUNT(*)), 6)     AS avg_move
    FROM d WHERE delta IS NOT NULL
    GROUP BY 1
    """,
)
def q_turn_of_month_returns(spark, sf_dir):
    """Turn-of-month effect: average daily close change bucketed by the
    trading day's distance from the NEAREST month boundary (0 = first
    or last calendar day, capped at 10+) — the calendar-anomaly lens
    beside dow_returns' weekday view.

    Exactness: boundary distance is exact calendar arithmetic; the
    average move is Σcents/(100·n) — ONE division of exact ints
    (avg_cents discipline, rule 10), ROUND 6.

    Plan: one symbol exchange for the lag; the bucket rollup is a
    ≤11-group aggregate."""
    t = ticks(spark, sf_dir)
    cc = F.round(F.col("close") * 100, 0).cast("bigint")
    w = Window.partitionBy("symbol").orderBy("date")
    d = t.select(
        "symbol", "date",
        (cc - F.lag(cc).over(w)).alias("delta"),
        F.least(
            F.dayofmonth("date").cast("bigint") - 1,
            F.dayofmonth(F.last_day("date")).cast("bigint")
            - F.dayofmonth("date").cast("bigint"),
        ).alias("dist"),
    ).filter(F.col("delta").isNotNull())
    return d.groupBy(
        F.least(F.col("dist"), F.lit(10)).alias("boundary_dist")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_moves"),
        F.round(
            F.sum("delta").cast("bigint")
            / (F.lit(100.0) * F.count(F.lit(1))),
            6,
        ).alias("avg_move"),
    )


# ---------------------------------------------------------------------------
# Overnight vs intraday move decomposition
# ---------------------------------------------------------------------------


@register(
    "overnight_intraday_split",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol,
               CAST(round(open * 100) AS BIGINT)
               - LAG(CAST(round(close * 100) AS BIGINT))
                     OVER (PARTITION BY symbol ORDER BY date)
                   AS overnight,
               CAST(round(close * 100) AS BIGINT)
               - CAST(round(open * 100) AS BIGINT) AS intraday
        FROM ticks
    )
    SELECT symbol,
           CAST(COUNT(overnight) AS BIGINT)  AS n_overnights,
           ROUND(CAST(SUM(overnight) AS BIGINT)
                 / (100.0 * COUNT(overnight)), 6) AS avg_overnight,
           ROUND(CAST(SUM(CASE WHEN overnight IS NOT NULL
                               THEN intraday END) AS BIGINT)
                 / (100.0 * COUNT(overnight)), 6) AS avg_intraday
    FROM d GROUP BY 1
    HAVING COUNT(overnight) > 0
    """,
)
def q_overnight_intraday_split(spark, sf_dir):
    """Decompose each day's total move into the OVERNIGHT gap
    (open_t − close_{t−1}) and the INTRADAY move (close_t − open_t),
    averaged per symbol — where does the drift actually accrue, while
    the market is open or while it is closed? (The classic answer:
    mostly overnight.) Both averages run over the SAME day set (days
    with a previous close) so they sum to the average close-to-close
    move.

    Exactness: both components are exact cents ints; each average is
    ONE division (avg_cents, rule 10), ROUND 6.

    Plan: one symbol exchange serves the lag and the rollup."""
    t = ticks(spark, sf_dir)
    oc = F.round(F.col("open") * 100, 0).cast("bigint")
    cc = F.round(F.col("close") * 100, 0).cast("bigint")
    w = Window.partitionBy("symbol").orderBy("date")
    d = t.select(
        "symbol",
        (oc - F.lag(cc).over(w)).alias("overnight"),
        (cc - oc).alias("intraday"),
    )
    n_ov = F.count("overnight")
    return (
        d.groupBy("symbol")
        .agg(
            n_ov.cast("bigint").alias("n_overnights"),
            F.round(
                F.sum("overnight").cast("bigint") / (F.lit(100.0) * n_ov),
                6,
            ).alias("avg_overnight"),
            F.round(
                F.sum(
                    F.when(
                        F.col("overnight").isNotNull(), F.col("intraday")
                    )
                ).cast("bigint") / (F.lit(100.0) * n_ov),
                6,
            ).alias("avg_intraday"),
        )
        .filter(F.col("n_overnights") > 0)
    )

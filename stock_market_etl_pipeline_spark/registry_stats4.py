"""Statistics family, part 4: k-group and paired rank tests, contingency
association, microstructure spread, session-gap and streak analytics,
robust dispersion.

- ``kruskal_wallis_length_by_source`` — the k-group generalization of
  mann_whitney_length_by_source: one tie-corrected H statistic over ALL
  sources at once (run this first; the pairwise U tests localize).
- ``wilcoxon_signed_rank_close`` — per-symbol PAIRED rank test of daily
  close changes against a zero median (the signed-rank sibling of the
  two-sample rank-sum).
- ``segment_priority_cramers_v`` — Cramér's V association between
  customer market segment and order priority: chi-square over the full
  5×5 contingency cross (including empty cells), normalized to [0, 1].
- ``roll_effective_spread`` — Roll's implied bid-ask spread per symbol:
  2·√(−autocov₁(Δp)) off exact integer cents deltas.
- ``intersession_gap_quartiles`` — quartiles of the time between a
  user's session END and their next session START (the idle-time
  distribution; sessionize_events measures within-session shape).
- ``consecutive_order_months`` — gaps-and-islands per customer over
  calendar months with ≥1 order, rolled up per market segment.
- ``mad_daily_moves`` — per-symbol median absolute deviation of daily
  close changes: the robust dispersion twin of rolling stddev.

Float policy (NOTES rules 9-15): every statistic closes over exact
integer aggregates. Tie-averaged ranks ride the spearman 2× trick;
Kruskal-Wallis' per-group R²/n quotients and the tie correction are
quantized by truncating integer division at 10⁹ scale (rule 13 — both
engines truncate toward zero; ≤ k units of 1e-9 absolute error, closed
by ROUND 6); chi-square cell terms quantize the same way; Wilcoxon's
variance ×48 and Roll's −C are exact ints consumed by one sqrt + one
division; quartiles/medians are order statistics via k·c ≥ m·n integer
rank inequalities on distinct-value tables.

100 TB shape: every rank/quantile window runs over a DISTINCT-VALUE
table (|value domain| rows, never the fact table); contingency margins
cross-join at 5×5; sessions shuffle once on user_id and the gap lag
rides the per-user session table; streak islands use the
row_number-difference trick inside the per-customer window.

Reference lineage: extension scope per SURVEY §2.12 (the reference's
stats stop at describe()).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import register
from .sources.events import load_events
from .sources.tables import load_table
from .sources.ticks import ticks

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Kruskal-Wallis H over document length by source
# ---------------------------------------------------------------------------


@register(
    "kruskal_wallis_length_by_source",
    """
    WITH vt AS (
        SELECT n_chars AS v, CAST(COUNT(*) AS HUGEINT) AS t
        FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    ),
    rk AS (
        SELECT v, 2 * SUM(t) OVER (ORDER BY v) - t + 1 AS r2
        FROM vt
    ),
    tot AS (
        SELECT SUM(t) AS nn, SUM(t * t * t - t) AS ties FROM vt
    ),
    sv AS (
        SELECT source, n_chars AS v, CAST(COUNT(*) AS HUGEINT) AS c
        FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
    ),
    per AS (
        SELECT sv.source,
               SUM(sv.c)         AS nj,
               SUM(sv.c * rk.r2) AS s2
        FROM sv JOIN rk USING (v)
        GROUP BY 1
    ),
    q AS (
        SELECT SUM((3 * s2 * s2 * 1000000000)
                   // (nj * nn * (nn + 1))) AS sq,
               CAST(COUNT(*) AS BIGINT)     AS k_groups,
               MAX(nn)                      AS nn,
               MAX(ties)                    AS ties
        FROM per, tot
    )
    SELECT k_groups,
           CAST(nn AS BIGINT) AS n_total,
           ROUND(CAST(((sq - 3 * (nn + 1) * 1000000000)
                       * (nn * nn * nn - nn))
                      // (nn * nn * nn - nn - ties) AS DOUBLE)
                 / 1000000000, 6) AS h_stat
    FROM q
    WHERE nn > 1 AND nn * nn * nn - nn > ties
    """,
)
def q_kruskal_wallis_length_by_source(spark, sf_dir):
    """Kruskal-Wallis H (tie-corrected) of document length across ALL
    sources at once — the k-group omnibus test whose pairwise follow-up
    is ``mann_whitney_length_by_source``. H ≈ χ²(k−1) under H0; a large
    H says at least one source's length profile differs.

    Exactness (rule 13 discipline): tie-averaged rank sums per source
    arrive as exact ints via the 2× trick (2·R_j = Σ c_jv·(2cum−t+1));
    H + 3(N+1) = 3/(N(N+1))·Σ (2R_j)²/(4·n_j) is quantized per group by
    ONE truncating division at 10⁹ scale (numerators ≤ 12N⁴·10⁹ — fits
    DECIMAL(38)/HUGEINT to ~sf100), the tie correction
    (N³−N)/((N³−N)−Σ(t³−t)) by one more (product ≤ ~6e35 at sf10,
    audited; beyond that the 38-digit product is the binding bound).
    Truncation ≤ 1e-9 per group; closure is ONE int→double cast
    (≤ ~1e15 ≪ 2⁵³) + one division + ROUND 6.

    Plan: ranks over the DISTINCT length table (the documented bounded
    empty-partitionBy window — |value domain| rows); per-source sums
    broadcast-join that table; one fact-wide exchange (the two
    groupBys share the scan)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    vt = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast(_DEC).alias("t")
    )
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = vt.select(
        "v",
        (F.lit(2).cast(_DEC) * F.sum("t").over(wv) - F.col("t")
         + F.lit(1).cast(_DEC)).alias("r2"),
    )
    tot = vt.agg(
        F.sum("t").alias("nn"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .alias("ties"),
    )
    sv = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast(_DEC).alias("c")
    )
    per = (
        sv.join(F.broadcast(rk), "v")
        .groupBy("source")
        .agg(
            F.sum("c").alias("nj"),
            F.sum(F.col("c") * F.col("r2")).alias("s2"),
        )
    )
    # Both quotients use the sub-mod decimal floor division
    # (num − num%den)/den instead of `div` (ADVICE r11; the
    # mann_whitney lesson): Spark IntegralDivide binds a BIGINT result
    # (2⁶³ ANSI-throw ceiling) even on DECIMAL(38,0) operands, and
    # sq ≈ 12N·10⁹ crosses 2⁶³ near N ≈ 7·10⁸ — well inside the
    # documented DECIMAL(38) numerator headroom — while DuckDB `//`
    # stays HUGEINT. Both forms truncate toward zero (rule 13 probe,
    # negatives included), so the engines still agree.
    q = (
        per.join(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "CAST((3 * s2 * s2 * 1000000000"
                    " - (3 * s2 * s2 * 1000000000)"
                    " % (nj * nn * (nn + 1)))"
                    " / (nj * nn * (nn + 1)) AS DECIMAL(38,0))"
                )
            ).alias("sq"),
            F.count(F.lit(1)).cast("bigint").alias("k_groups"),
            F.max("nn").alias("nn"),
            F.max("ties").alias("ties"),
        )
    )
    return (
        q.filter(
            (F.col("nn") > 1)
            & (
                F.col("nn") * F.col("nn") * F.col("nn") - F.col("nn")
                > F.col("ties")
            )
        )
        .withColumn(
            "hnum",
            F.expr(
                "(sq - 3 * (nn + 1) * 1000000000)"
                " * (nn * nn * nn - nn)"
            ),
        )
        .withColumn("hden", F.expr("nn * nn * nn - nn - ties"))
        .select(
            "k_groups",
            F.col("nn").cast("long").alias("n_total"),
            F.round(
                F.expr(
                    "CAST((hnum - hnum % hden) / hden"
                    " AS DECIMAL(38,0))"
                ).cast("double")
                / F.lit(1_000_000_000.0),
                6,
            ).alias("h_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank of daily close changes, per symbol
# ---------------------------------------------------------------------------


@register(
    "wilcoxon_signed_rank_close",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol,
               CAST(round(close * 100) AS BIGINT)
               - LAG(CAST(round(close * 100) AS BIGINT))
                     OVER (PARTITION BY symbol ORDER BY date) AS delta
        FROM ticks
    ),
    f AS (
        SELECT symbol, abs(delta) AS a,
               CASE WHEN delta > 0 THEN 1 ELSE 0 END AS pos
        FROM d WHERE delta IS NOT NULL AND delta <> 0
    ),
    vt AS (
        SELECT symbol, a,
               CAST(COUNT(*) AS BIGINT) AS t,
               CAST(SUM(pos) AS BIGINT) AS p
        FROM f GROUP BY 1, 2
    ),
    rk AS (
        SELECT symbol, a, t, p,
               2 * SUM(t) OVER (PARTITION BY symbol ORDER BY a)
               - t + 1 AS r2
        FROM vt
    ),
    agg AS (
        SELECT symbol,
               CAST(SUM(t) AS BIGINT)     AS n,
               CAST(SUM(p * r2) AS BIGINT) AS w2,
               CAST(SUM(t * t * t - t) AS BIGINT) AS ties
        FROM rk GROUP BY 1
    )
    SELECT symbol, n,
           CAST(w2 AS DOUBLE) / 2 AS w_plus,
           ROUND(CAST(2 * w2 - n * (n + 1) AS DOUBLE)
                 / sqrt(CAST((2 * n * (n + 1) * (2 * n + 1) - ties) // 3
                             AS DOUBLE)), 6) AS z_score
    FROM agg
    WHERE 2 * n * (n + 1) * (2 * n + 1) - ties > 0
    """,
)
def q_wilcoxon_signed_rank_close(spark, sf_dir):
    """Wilcoxon signed-rank per symbol on daily close changes (H0: the
    change median is zero) — the PAIRED rank test beside the two-sample
    rank-sum: drop zero deltas, rank |Δ| with tie-averaging, sum the
    ranks of the positive side.

    Exactness: 2W⁺ = Σ p_v·(2cum−t+1) is an exact int off the
    per-symbol distinct-|Δ| table; the normal-approximation z closes as
    (4W⁺ − n(n+1)) / √((48·Var)/3) where 48·Var = 2n(n+1)(2n+1) − Σ(t³−t)
    is an exact int PROVABLY divisible by 3 (n(n+1)(2n+1) ≡ 0 mod 6,
    t³−t ≡ 0 mod 6), so the quotient is exact — one cast each side
    (≪ 2⁵³ at any depth), one sqrt, one division, ROUND 6. w_plus is an
    exact half-integer (binary-exact). Constant-sign-free symbols with
    zero variance drop on both engines.

    Plan: one symbol exchange serves the lag, the distinct-|Δ| rollup,
    the rank window, and the final per-symbol aggregate."""
    t = ticks(spark, sf_dir)
    cexp = F.round(F.col("close") * 100, 0).cast("bigint")
    d = t.select(
        "symbol",
        (cexp - F.lag(cexp).over(
            Window.partitionBy("symbol").orderBy("date")
        )).alias("delta"),
    ).filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
    vt = d.groupBy(
        "symbol", F.abs("delta").alias("a")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0))
        .cast("bigint").alias("p"),
    )
    wr = Window.partitionBy("symbol").orderBy("a").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = vt.select(
        "symbol", "t", "p",
        (F.lit(2) * F.sum("t").over(wr) - F.col("t") + F.lit(1))
        .alias("r2"),
    )
    agg = rk.groupBy("symbol").agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("p") * F.col("r2")).cast("bigint").alias("w2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint").alias("ties"),
    )
    n, w2, ties = F.col("n"), F.col("w2"), F.col("ties")
    var48 = 2 * n * (n + 1) * (2 * n + 1) - ties
    return agg.filter(var48 > 0).select(
        "symbol", "n",
        (w2.cast("double") / F.lit(2)).alias("w_plus"),
        F.round(
            (2 * w2 - n * (n + 1)).cast("double")
            / F.sqrt(F.expr(
                "CAST((2 * n * (n + 1) * (2 * n + 1) - ties) div 3"
                " AS DOUBLE)"
            )),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Cramér's V: market segment × order priority
# ---------------------------------------------------------------------------


@register(
    "segment_priority_cramers_v",
    """
    WITH j AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT seg, pri, CAST(COUNT(*) AS HUGEINT) AS obs
        FROM j GROUP BY 1, 2
    ),
    rows_ AS (SELECT seg, CAST(SUM(obs) AS HUGEINT) AS r FROM cells GROUP BY 1),
    cols_ AS (SELECT pri, CAST(SUM(obs) AS HUGEINT) AS c FROM cells GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(obs) AS HUGEINT)                 AS nn,
               CAST((SELECT COUNT(*) FROM rows_) AS HUGEINT) AS nr,
               CAST((SELECT COUNT(*) FROM cols_) AS HUGEINT) AS nc
        FROM cells
    ),
    grid AS (
        SELECT rows_.seg, cols_.pri, rows_.r, cols_.c,
               COALESCE(cells.obs, 0) AS obs
        FROM rows_ CROSS JOIN cols_
        LEFT JOIN cells USING (seg, pri)
    ),
    q AS (
        SELECT SUM(((nn * obs - r * c) * (nn * obs - r * c) * 1000000000)
                   // (nn * r * c)) AS chi2q,
               MAX(nn) AS nn, MAX(nr) AS nr, MAX(nc) AS nc
        FROM grid, tot
    )
    SELECT CAST(nn AS BIGINT)            AS n_orders,
           CAST(nr AS BIGINT)            AS n_segments,
           CAST(nc AS BIGINT)            AS n_priorities,
           ROUND(CAST(chi2q AS DOUBLE) / 1000000000, 6) AS chi2,
           ROUND(sqrt(CAST(chi2q // (nn * LEAST(nr - 1, nc - 1))
                           AS DOUBLE) / 1000000000), 6) AS cramers_v
    FROM q
    """,
)
def q_segment_priority_cramers_v(spark, sf_dir):
    """Association between customer market segment and order priority:
    chi-square over the FULL segment×priority cross (empty cells
    included — they carry expected mass) and Cramér's V =
    √(χ²/(N·min(r−1, c−1))), the [0,1]-normalized effect size the raw
    χ² (which grows with N) is not.

    Exactness: each cell's (N·o − r·c)²/(N·r·c) is quantized by one
    truncating division at 10⁹ scale (rule 13; numerator ≤ N⁴·10⁹ —
    DECIMAL(38)/HUGEINT-safe to ~sf10, the audited bound), summed
    exactly; V quantizes once more by N·min(r−1,c−1) then closes with
    one cast + one division + one sqrt, ROUND 6.

    Plan: fact×broadcast(customer-dim) join, one (seg, pri) groupBy;
    margins and the 5×5 grid are driver-free broadcast cross joins of
    k-row tables."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderpriority").alias("pri")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    # ONE fact scan: every margin, total and the full grid derive from
    # the r×c cells table (≤ 25 rows), cut from its lineage by a LAZY
    # localCheckpoint (no job at construction; the first audit of this
    # query showed 12 scans / 13 exchanges from re-deriving each margin
    # back to the source join).
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("seg", "pri")
        .agg(F.count(F.lit(1)).cast(_DEC).alias("obs"))
        .localCheckpoint(eager=False)
    )
    rows_ = cells.groupBy("seg").agg(F.sum("obs").alias("r"))
    cols_ = cells.groupBy("pri").agg(F.sum("obs").alias("c"))
    tot = cells.agg(F.sum("obs").alias("nn"))
    # margin counts off the margin tables (exact, tiny)
    nr = rows_.agg(F.count(F.lit(1)).cast(_DEC).alias("nr"))
    nc = cols_.agg(F.count(F.lit(1)).cast(_DEC).alias("nc"))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .join(cells, ["seg", "pri"], "left")
        .select(
            "seg", "pri", "r", "c",
            F.coalesce("obs", F.lit(0).cast(_DEC)).alias("obs"),
        )
    )
    q = (
        grid.join(F.broadcast(tot.select("nn")))
        .agg(
            F.sum(
                F.expr(
                    "((nn * obs - r * c) * (nn * obs - r * c)"
                    " * 1000000000) div (nn * r * c)"
                )
            ).alias("chi2q"),
            F.max("nn").alias("nn"),
        )
        .join(F.broadcast(nr))
        .join(F.broadcast(nc))
    )
    return q.select(
        F.col("nn").cast("long").alias("n_orders"),
        F.col("nr").cast("long").alias("n_segments"),
        F.col("nc").cast("long").alias("n_priorities"),
        F.round(
            F.col("chi2q").cast("double") / F.lit(1_000_000_000.0), 6
        ).alias("chi2"),
        F.round(
            F.sqrt(
                F.expr(
                    "CAST(chi2q div (nn * least(nr - 1, nc - 1))"
                    " AS DOUBLE)"
                )
                / F.lit(1_000_000_000.0)
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Roll's implied effective spread, per symbol
# ---------------------------------------------------------------------------


@register(
    "roll_effective_spread",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol, date,
               CAST(round(close * 100) AS BIGINT)
               - LAG(CAST(round(close * 100) AS BIGINT))
                     OVER (PARTITION BY symbol ORDER BY date) AS x
        FROM ticks
    ),
    p AS (
        SELECT symbol, x,
               LAG(x) OVER (PARTITION BY symbol ORDER BY date) AS y
        FROM d WHERE x IS NOT NULL
    ),
    a AS (
        SELECT symbol,
               CAST(COUNT(*) AS BIGINT)    AS m,
               CAST(SUM(x * y) AS BIGINT)  AS sxy,
               CAST(SUM(x) AS BIGINT)      AS sx,
               CAST(SUM(y) AS BIGINT)      AS sy
        FROM p WHERE y IS NOT NULL GROUP BY 1
    )
    SELECT symbol, m,
           CASE WHEN m * sxy - sx * sy < 0
                THEN ROUND(2 * sqrt(CAST(-(m * sxy - sx * sy) AS DOUBLE))
                           / (m * 100.0), 6)
           END AS roll_spread
    FROM a WHERE m > 1
    """,
)
def q_roll_effective_spread(spark, sf_dir):
    """Roll (1984) implied effective spread per symbol: bid-ask bounce
    makes successive price CHANGES negatively autocorrelated, and the
    spread is 2·√(−cov(Δp_t, Δp_{t−1})). Positive autocovariance →
    NULL (the model is undefined there), the standard convention.

    Exactness: cents deltas are exact ints; the covariance numerator
    C = m·Σxy − Σx·Σy is exact int64 (|C| ≤ m²·maxΔ² — audited ≪ 2⁶³
    at any history depth since the time axis doesn't grow with sf).
    Closure: one cast, one sqrt, a ×2 (exact — power of two), one
    division by the exact int m·100 (cents→dollars folded in), ROUND 6.

    Plan: one symbol exchange serves both lags and the final
    aggregate."""
    t = ticks(spark, sf_dir)
    cexp = F.round(F.col("close") * 100, 0).cast("bigint")
    w = Window.partitionBy("symbol").orderBy("date")
    d = t.select(
        "symbol", "date", (cexp - F.lag(cexp).over(w)).alias("x")
    ).filter(F.col("x").isNotNull())
    p = d.select(
        "symbol", "x", F.lag("x").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    a = p.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    m, sxy, sx, sy = F.col("m"), F.col("sxy"), F.col("sx"), F.col("sy")
    cnum = m * sxy - sx * sy
    return a.filter(m > 1).select(
        "symbol", "m",
        F.when(
            cnum < 0,
            F.round(
                F.lit(2) * F.sqrt((-cnum).cast("double"))
                / (m * 100.0),
                6,
            ),
        ).alias("roll_spread"),
    )


# ---------------------------------------------------------------------------
# Inter-session gap quartiles (idle time between sessions)
# ---------------------------------------------------------------------------


@register(
    "intersession_gap_quartiles",
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
               ) AS session_id,
               ts
        FROM gaps
    ),
    bounds AS (
        SELECT user_id, session_id,
               MIN(epoch_us(ts)) AS start_us,
               MAX(epoch_us(ts)) AS end_us
        FROM sess GROUP BY 1, 2
    ),
    ig AS (
        SELECT (start_us
                - LAG(end_us) OVER (PARTITION BY user_id
                                    ORDER BY session_id))
               // 1000000 AS gap_s
        FROM bounds
    ),
    vt AS (
        SELECT gap_s, CAST(COUNT(*) AS BIGINT) AS t
        FROM ig WHERE gap_s IS NOT NULL GROUP BY 1
    ),
    cum AS (
        SELECT gap_s, t,
               SUM(t) OVER (ORDER BY gap_s) AS c,
               SUM(t) OVER ()               AS n
        FROM vt
    )
    SELECT CAST(MAX(n) AS BIGINT)                          AS n_gaps,
           CAST(MIN(CASE WHEN 4 * c >= n THEN gap_s END)
                AS BIGINT)                                 AS q1_s,
           CAST(MIN(CASE WHEN 2 * c >= n THEN gap_s END)
                AS BIGINT)                                 AS median_s,
           CAST(MIN(CASE WHEN 4 * c >= 3 * n THEN gap_s END)
                AS BIGINT)                                 AS q3_s
    FROM cum
    """,
)
def q_intersession_gap_quartiles(spark, sf_dir):
    """Quartiles of the IDLE time between a user's consecutive sessions
    (session end → next session start, 30-min gap sessionization) —
    the between-session complement of sessionize_events' within-session
    stats, and the duty-cycle number a capacity planner actually wants.

    Exactness: session bounds are exact microsecond ints; gaps floor to
    whole seconds by truncating integer division (both engines, rule
    13 — positive by construction since a new session starts > 30 min
    after the previous end); quartiles are order statistics via the
    k·c ≥ m·n integer rank inequalities on the distinct-gap table.
    No float ops anywhere.

    Plan: ONE user_id exchange serves the sessionizing lag, the
    session-id running sum, the per-session bounds aggregate, and the
    inter-session lag; the quartile window runs over the distinct-gap
    value table (the documented bounded empty-partitionBy case)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    # running sum ordered by the SAME (ts, event_id) key as the lag
    # window (ADVICE r11): ordering by ts alone leaves rows tied on ts
    # at a session boundary with a nondeterministic session_id — a
    # cross-engine parity hazard that can also emit gap_s <= 1800.
    sess = ev.withColumn("new_session", new_session).withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    bounds = sess.groupBy("user_id", "session_id").agg(
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
    )
    wb = Window.partitionBy("user_id").orderBy("session_id")
    ig = bounds.select(
        F.expr(
            "(start_us - lag(end_us) OVER (PARTITION BY user_id"
            " ORDER BY session_id)) div 1000000"
        ).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    vt = ig.groupBy("gap_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    wc = Window.orderBy("gap_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vt.select(
        "gap_s", "t",
        F.sum("t").over(wc).alias("c"),
        F.sum("t").over(
            Window.partitionBy()
            .rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    c, n, g = F.col("c"), F.col("n"), F.col("gap_s")
    return cum.agg(
        F.max(n).cast("bigint").alias("n_gaps"),
        F.min(F.when(4 * c >= n, g)).cast("bigint").alias("q1_s"),
        F.min(F.when(2 * c >= n, g)).cast("bigint").alias("median_s"),
        F.min(F.when(4 * c >= 3 * n, g)).cast("bigint").alias("q3_s"),
    )


# ---------------------------------------------------------------------------
# Consecutive-order-month streaks per market segment (gaps and islands)
# ---------------------------------------------------------------------------


@register(
    "consecutive_order_months",
    """
    WITH om AS (
        SELECT DISTINCT o_custkey AS ck,
               CAST(date_part('year', o_orderdate) * 12
                    + date_part('month', o_orderdate) AS BIGINT) AS mseq
        FROM orders
    ),
    isl AS (
        SELECT ck, mseq,
               mseq - ROW_NUMBER() OVER (PARTITION BY ck ORDER BY mseq)
                   AS grp
        FROM om
    ),
    streaks AS (
        SELECT ck, CAST(COUNT(*) AS BIGINT) AS len
        FROM isl GROUP BY ck, grp
    ),
    best AS (
        SELECT ck, MAX(len) AS best_streak FROM streaks GROUP BY 1
    )
    SELECT c.c_mktsegment                        AS segment,
           CAST(COUNT(*) AS BIGINT)              AS n_customers,
           CAST(MAX(best_streak) AS BIGINT)      AS max_streak_months,
           ROUND(CAST(SUM(best_streak) AS BIGINT) * 1.0
                 / COUNT(*), 6)                  AS avg_best_streak
    FROM best JOIN customer c ON best.ck = c.c_custkey
    GROUP BY 1
    """,
)
def q_consecutive_order_months(spark, sf_dir):
    """Longest run of CONSECUTIVE calendar months with ≥1 order, per
    customer, rolled up by market segment — the gaps-and-islands shape
    (island id = mseq − row_number) on the month axis; the engagement
    regularity metric beside repeat_purchase_rate's intensity.

    Exactness: month sequence numbers, island ids, streak lengths and
    their max/sum are all exact ints; the only float op is ONE division
    (Σ best / count) closed by ROUND 6 — O(1)-noise-free (identical
    int operands both sides, both ≪ 2⁵³).

    Plan: distinct (customer, month) shuffles once on o_custkey and the
    island window + both rollups reuse that partitioning; the segment
    dim joins broadcast; output is segment-sized."""
    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        F.col("o_custkey").alias("ck"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint").alias("mseq"),
    ).distinct()
    isl = om.select(
        "ck", "mseq",
        (F.col("mseq") - F.row_number().over(
            Window.partitionBy("ck").orderBy("mseq")
        )).alias("grp"),
    )
    streaks = isl.groupBy("ck", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    best = streaks.groupBy("ck").agg(F.max("len").alias("best_streak"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    return (
        best.join(F.broadcast(cust), best.ck == cust.c_custkey)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.max("best_streak").cast("bigint")
            .alias("max_streak_months"),
            F.round(
                F.sum("best_streak").cast("bigint") * F.lit(1.0)
                / F.count(F.lit(1)),
                6,
            ).alias("avg_best_streak"),
        )
    )


# ---------------------------------------------------------------------------
# Median absolute deviation of daily close changes, per symbol
# ---------------------------------------------------------------------------


@register(
    "mad_daily_moves",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol,
               CAST(round(close * 100) AS BIGINT)
               - LAG(CAST(round(close * 100) AS BIGINT))
                     OVER (PARTITION BY symbol ORDER BY date) AS delta
        FROM ticks
    ),
    f AS (SELECT symbol, delta FROM d WHERE delta IS NOT NULL),
    vt AS (
        SELECT symbol, delta AS v, CAST(COUNT(*) AS BIGINT) AS t
        FROM f GROUP BY 1, 2
    ),
    cum AS (
        SELECT symbol, v, t,
               SUM(t) OVER (PARTITION BY symbol ORDER BY v) AS c,
               SUM(t) OVER (PARTITION BY symbol)            AS n
        FROM vt
    ),
    med AS (
        SELECT symbol,
               CAST(MAX(n) AS BIGINT) AS n,
               MIN(CASE WHEN 2 * c >= n THEN v END) AS med
        FROM cum GROUP BY 1
    ),
    a AS (
        SELECT f.symbol, abs(f.delta - med.med) AS av
        FROM f JOIN med ON f.symbol = med.symbol
    ),
    avt AS (
        SELECT symbol, av, CAST(COUNT(*) AS BIGINT) AS t
        FROM a GROUP BY 1, 2
    ),
    acum AS (
        SELECT symbol, av, t,
               SUM(t) OVER (PARTITION BY symbol ORDER BY av) AS c,
               SUM(t) OVER (PARTITION BY symbol)             AS n
        FROM avt
    )
    SELECT acum.symbol,
           MAX(med.n)                                   AS n_moves,
           CAST(MAX(med.med) AS BIGINT)                 AS median_move_cents,
           CAST(MIN(CASE WHEN 2 * acum.c >= acum.n
                         THEN acum.av END) AS DOUBLE) / 100
                                                        AS mad_dollars
    FROM acum JOIN med ON acum.symbol = med.symbol
    GROUP BY 1
    """,
)
def q_mad_daily_moves(spark, sf_dir):
    """Per-symbol median absolute deviation of daily close changes —
    the robust dispersion estimate (breakdown point 50%) beside the
    rolling sample stddev (breakdown 0%): MAD = median(|Δ − median(Δ)|)
    on exact cents.

    Exactness: both medians are LOWER-median order statistics
    (2·cum ≥ n on distinct-value tables) over exact ints; the only
    float op is the final cents→dollars division by 100 of an exact
    int — identical single IEEE division both sides, emitted raw.

    Plan: two rounds of (distinct-value rollup → rank window →
    selection) on the SAME symbol partitioning; the per-symbol median
    table broadcast-joins back for the deviation pass. Never sorts the
    fact table globally."""
    t = ticks(spark, sf_dir)
    cexp = F.round(F.col("close") * 100, 0).cast("bigint")
    f = t.select(
        "symbol",
        (cexp - F.lag(cexp).over(
            Window.partitionBy("symbol").orderBy("date")
        )).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    vt = f.groupBy("symbol", F.col("delta").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    wc = Window.partitionBy("symbol").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vt.select(
        "symbol", "v", "t",
        F.sum("t").over(wc).alias("c"),
        F.sum("t").over(Window.partitionBy("symbol")).alias("n"),
    )
    # the per-symbol median table feeds TWO consumers (the deviation
    # pass's broadcast join and the final result join); a lazy
    # localCheckpoint runs pass 1 once instead of twice (r11 sf10
    # probe: x16.7 -> measured improvement below, see SCALING.md)
    med = cum.groupBy("symbol").agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(F.when(2 * F.col("c") >= F.col("n"), F.col("v")))
        .alias("med"),
    ).localCheckpoint(eager=False)
    a = f.join(
        F.broadcast(med.select(F.col("symbol").alias("msym"), "med")),
        f.symbol == F.col("msym"),
    ).select("symbol", F.abs(F.col("delta") - F.col("med")).alias("av"))
    avt = a.groupBy("symbol", "av").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    wa = Window.partitionBy("symbol").orderBy("av").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    acum = avt.select(
        "symbol", "av", "t",
        F.sum("t").over(wa).alias("c"),
        F.sum("t").over(Window.partitionBy("symbol")).alias("n"),
    )
    madsel = acum.groupBy("symbol").agg(
        F.min(
            F.when(2 * F.col("c") >= F.col("n"), F.col("av"))
        ).alias("mad_cents"),
    )
    return (
        madsel.join(med, "symbol")
        .select(
            "symbol",
            F.col("n").alias("n_moves"),
            F.col("med").cast("bigint").alias("median_move_cents"),
            (F.col("mad_cents").cast("double") / F.lit(100))
            .alias("mad_dollars"),
        )
    )

"""Finance indicators, part 6: mean-reversion AR(1), range-based
volatility estimators, and the Amihud illiquidity panel.

- ``ar1_mean_reversion`` — per-symbol AR(1) fit close_t = a + phi *
  close_{t-1}: the mean-reversion counterpart of
  ``linear_trend_forecast`` (trend on TIME) and the parametric cousin
  of ``variance_ratio`` (which only classifies momentum vs reversion —
  this measures the speed). Exact-integer OLS closed form.
- ``parkinson_gk_volatility`` — Parkinson (1980) and Garman-Klass
  (1980) range-based variance estimators per (symbol, year, month):
  the OHLC-native volatility measures (close-to-close stddev, which
  ``volatility_indicator`` already covers, throws away the intraday
  range the reference's OHLC rows carry; reference
  ``src/transform.py`` volatility block is close-to-close only).
- ``amihud_illiquidity`` — Amihud (2002) price-impact-per-dollar
  panel: mean(|return| / dollar volume), the standard illiquidity
  ranking for an execution-cost model.

Exactness policy (NOTES rules 9-15):

- AR(1) reuses the ``linear_trend_forecast`` recipe verbatim: y and
  x = lag(y) are int64 cents, all five moments accumulate in
  DECIMAL(38)/HUGEINT, phi and the intercept are QUANTIZED by exact
  truncating integer division (1e-9 / 1e-6) so no wide integer ever
  crosses the double boundary (rule 13). The half-life
  -ln(2)/ln(phi) is computed from the ALREADY-QUANTIZED phi
  (identical double in both engines) and ROUND(...,6): libm ln may
  differ in the last ulp across engines (the doc_keywords rule), so
  the 6dp round absorbs ~1e-15 relative noise — flip probability
  ~1e-9 per symbol, the BM25-idf argument.
- Parkinson/GK: high/low/open/close are pass-through parquet doubles;
  h/l and c/o are single exact divisions; ln is 1-ulp-exposed per row
  and the per-group AVG is order-sensitive, so every emitted variance
  and annualized vol is ROUND(...,6) computed from UNROUNDED
  intermediates (one final round, never round-then-divide, so the
  ln(2) constant's own possible ulp never compounds).
- Amihud: |r|/(close*volume) * 1e12 is three single IEEE ops on
  identical per-row inputs -> bit-identical rows; the per-row MAX is
  emitted RAW (max of identical doubles is identical), the AVG is
  ROUND(...,6).

100 TB shape: all three are ticks -> lag window -> groupBy(symbol)
(or (symbol, year, month), a strict refinement) — they reuse the ONE
HashPartitioning(symbol) exchange ticks() already paid for; output
is one row per symbol (or symbol-month). The axis that grows with sf
is SYMBOLS, so per-group state stays calendar-bounded; the DECIMAL
moment audit in the AR(1) docstring bounds n at 2e4 days/symbol.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import register
from .sources.ticks import ticks

_W = lambda: Window.partitionBy("symbol").orderBy("date")  # noqa: E731

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# AR(1) mean reversion: close_t = a + phi * close_{t-1}
# ---------------------------------------------------------------------------


@register(
    "ar1_mean_reversion",
    WITH_TICKS
    + """,
    yc AS (
        SELECT symbol,
               CAST(round(close * 100) AS BIGINT) AS y,
               LAG(CAST(round(close * 100) AS BIGINT))
                   OVER (PARTITION BY symbol ORDER BY date) AS x
        FROM ticks
    ),
    agg AS (
        SELECT symbol,
               CAST(COUNT(*) AS HUGEINT)                    AS n,
               CAST(SUM(x) AS HUGEINT)                      AS sx,
               CAST(SUM(y) AS HUGEINT)                      AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        FROM yc WHERE x IS NOT NULL GROUP BY 1
    ),
    f AS (
        SELECT symbol, n, sx, sy,
               n * sxy - sx * sy AS s_num,
               n * sxx - sx * sx AS den
        FROM agg
    ),
    p AS (
        SELECT symbol, n, sx, sy,
               s_num * 1000000000 // den AS phi9
        FROM f WHERE den != 0
          AND abs(s_num * 1000000000 // den) < 1000000000000
    ),
    q AS (
        SELECT symbol, CAST(n AS BIGINT) AS n_pairs,
               CAST(phi9 AS BIGINT) / 1e9 AS phi,
               CAST((sy * 1000000000 - phi9 * sx) * 1000000
                    // (n * 100000000000) AS BIGINT) / 1e6 AS intercept
        FROM p
    )
    SELECT symbol, n_pairs, phi, intercept,
           CASE WHEN phi > 0 AND phi < 1
                THEN ROUND(-ln(2) / ln(phi), 6) END AS half_life_days
    FROM q
    """,
)
def q_ar1_mean_reversion(spark, sf_dir):
    """Per-symbol AR(1) regression of close on the previous close:
    phi < 1 mean-reverts with half-life -ln2/ln(phi) days; phi ~ 1 is
    a random walk (half-life NULL outside (0,1)). The parametric
    counterpart of ``variance_ratio``'s classifier and the lag-space
    cousin of ``linear_trend_forecast``'s time-axis OLS (reference
    ``src/transform.py`` trend block — extension scope, SURVEY §2.12).

    Exactness: the linear_trend recipe on the (x = lag cents,
    y = cents) pairs — five DECIMAL(38) moments, phi quantized at 1e-9
    by truncating integer division (both engines' div/// truncate
    toward zero — probed in r6); the intercept is computed FROM the
    quantized phi as (sy*1e9 - phi9*sx) * 1e6 div (n*1e11) — exact
    integers throughout, consistent with the emitted phi, and (unlike
    the textbook (sy*den - s_num*sx) numerator, which overflows
    DECIMAL(38) here because x is CENTS, not a small rank) bounded.
    The half-life's two ln() calls run on the QUANTIZED phi so both
    engines see the identical argument, and the result is
    ROUND(...,6) to absorb the last-ulp libm exposure. Overflow
    audit: |y| <= 1e7 cents, n <= 2e4 days/symbol -> sxy <= 2e18,
    |s_num*1e9| <= n*sxy*1e9 = 4e31 < 1e38; the |phi9| < 1e12 guard
    (|phi| < 1000 — anything larger is a degenerate near-constant
    series, dropped on both sides) bounds |phi9*sx| <= 1e12 * 2e11 =
    2e23.

    Plan: the lag window and the groupBy(symbol) share the ONE
    HashPartitioning(symbol) exchange from ticks(); one row/symbol
    out. Degenerate guard: den = 0 (constant or single-row series)
    drops the symbol on both sides."""
    y = F.round(F.col("close") * 100, 0).cast("bigint")
    t = ticks(spark, sf_dir).select("symbol", "date", y.alias("y"))
    yc = t.select(
        "symbol", "y", F.lag("y").over(_W()).alias("x")
    ).filter(F.col("x").isNotNull())
    agg = yc.groupBy("symbol").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("x").cast(_DEC) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(_DEC) * F.col("x")).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    f = agg.select(
        "symbol", "n", "sx", "sy",
        (n * F.col("sxy") - sx * sy).alias("s_num"),
        (n * F.col("sxx") - sx * sx).alias("den"),
    ).filter(F.col("den") != F.lit(0).cast(_DEC))
    p = f.select(
        "symbol", "n", "sx", "sy",
        F.expr("s_num * 1000000000 div den").cast(_DEC).alias("phi9"),
    ).filter(F.abs(F.col("phi9")) < F.lit(10**12).cast(_DEC))
    q = p.select(
        "symbol",
        F.col("n").cast("bigint").alias("n_pairs"),
        (F.col("phi9").cast("bigint") / F.lit(1e9)).alias("phi"),
        (
            F.expr(
                "(sy * 1000000000 - phi9 * sx) * 1000000"
                " div (n * 100000000000)"
            ).cast("bigint")
            / F.lit(1e6)
        ).alias("intercept"),
    )
    phi = F.col("phi")
    return q.select(
        "symbol", "n_pairs", "phi", "intercept",
        F.when(
            (phi > 0) & (phi < 1),
            F.round(-F.log(F.lit(2.0)) / F.log(phi), 6),
        ).alias("half_life_days"),
    )


# ---------------------------------------------------------------------------
# Parkinson + Garman-Klass range-based volatility per (symbol, month)
# ---------------------------------------------------------------------------

_MIN_MONTH_DAYS = 5


@register(
    "parkinson_gk_volatility",
    WITH_TICKS
    + f""",
    r AS (
        SELECT symbol,
               CAST(year(date) AS INTEGER)  AS year,
               CAST(month(date) AS INTEGER) AS month,
               ln(high / low) * ln(high / low)     AS hl2,
               ln(close / open) * ln(close / open) AS co2
        FROM ticks
    ),
    g AS (
        SELECT symbol, year, month,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               AVG(hl2)                 AS m_hl2,
               AVG(0.5 * hl2 - (2.0 * ln(2) - 1.0) * co2) AS m_gk
        FROM r GROUP BY 1, 2, 3
        HAVING COUNT(*) >= {_MIN_MONTH_DAYS}
    )
    SELECT symbol, year, month, n_days,
           ROUND(m_hl2 / (4.0 * ln(2)), 6)                  AS parkinson_var,
           ROUND(sqrt(m_hl2 / (4.0 * ln(2)) * 252.0), 6)    AS parkinson_vol_ann,
           ROUND(m_gk, 6)                                   AS gk_var,
           CASE WHEN m_gk > 0
                THEN ROUND(sqrt(m_gk * 252.0), 6) END       AS gk_vol_ann
    FROM g
    """,
)
def q_parkinson_gk_volatility(spark, sf_dir):
    """Range-based volatility per (symbol, year, month): Parkinson's
    high-low estimator sigma^2 = mean(ln(h/l)^2) / (4 ln 2) and the
    Garman-Klass refinement mean(0.5 ln(h/l)^2 - (2 ln2 - 1)
    ln(c/o)^2), both annualized by sqrt(252 * var). These use the
    intraday range the close-to-close ``volatility_indicator``
    (reference ``src/transform.py`` volatility block) discards —
    5-8x more efficient per observation in the i.i.d. model.

    Exactness: h/l and c/o are single exact divisions of pass-through
    doubles; ln is last-ulp-exposed and the AVG order-sensitive, so
    ALL four emitted statistics are ROUND(...,6) applied ONCE to the
    final value (never round-then-divide — the ln(2) normalizer's own
    ulp must not compound). GK can go negative on wild open/close
    months: the variance is emitted as-is (a documented estimator
    property), the annualized vol is NULL-guarded on both sides.

    Plan: one groupBy(symbol, year, month) — a strict refinement of
    ticks()'s HashPartitioning(symbol), no second exchange. Months
    with < {_MIN_MONTH_DAYS} trading days are dropped (estimator
    meaningless) on both sides."""
    t = ticks(spark, sf_dir)
    ln2 = F.log(F.lit(2.0))
    hl = F.log(F.col("high") / F.col("low"))
    co = F.log(F.col("close") / F.col("open"))
    r = t.select(
        "symbol",
        F.year("date").cast("int").alias("year"),
        F.month("date").cast("int").alias("month"),
        (hl * hl).alias("hl2"),
        (co * co).alias("co2"),
    )
    g = (
        r.groupBy("symbol", "year", "month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.avg("hl2").alias("m_hl2"),
            F.avg(
                F.lit(0.5) * F.col("hl2")
                - (F.lit(2.0) * ln2 - F.lit(1.0)) * F.col("co2")
            ).alias("m_gk"),
        )
        .filter(F.col("n_days") >= _MIN_MONTH_DAYS)
    )
    park_var = F.col("m_hl2") / (F.lit(4.0) * ln2)
    return g.select(
        "symbol", "year", "month", "n_days",
        F.round(park_var, 6).alias("parkinson_var"),
        F.round(F.sqrt(park_var * F.lit(252.0)), 6).alias("parkinson_vol_ann"),
        F.round(F.col("m_gk"), 6).alias("gk_var"),
        F.when(
            F.col("m_gk") > 0,
            F.round(F.sqrt(F.col("m_gk") * F.lit(252.0)), 6),
        ).alias("gk_vol_ann"),
    )


# ---------------------------------------------------------------------------
# Amihud illiquidity: mean(|return| / dollar volume)
# ---------------------------------------------------------------------------


@register(
    "amihud_illiquidity",
    WITH_TICKS
    + """,
    r AS (
        SELECT symbol,
               abs(close / LAG(close) OVER w - 1)
                   / (close * volume) * 1e12 AS impact_e12
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    )
    SELECT symbol,
           CAST(COUNT(impact_e12) AS BIGINT) AS n_days,
           ROUND(AVG(impact_e12), 6)         AS amihud_e12,
           MAX(impact_e12)                   AS max_impact_e12
    FROM r GROUP BY 1
    """,
)
def q_amihud_illiquidity(spark, sf_dir):
    """Amihud (2002) illiquidity per symbol: the mean of
    |daily return| / dollar volume, scaled by 1e12 into a readable
    range — the standard price-impact ranking an execution-cost model
    sorts the universe by. Extension scope (SURVEY §2.12); the
    reference's volume analytics stop at the quartile buckets
    (``src/transform.py`` volume_category).

    Exactness: each per-row impact is |c_t/c_{t-1} - 1| / (close *
    volume) * 1e12 — four single IEEE ops on pass-through inputs, so
    the rows are bit-identical across engines; MAX of identical rows
    is emitted RAW, the order-sensitive AVG is ROUND(...,6). The
    first bar per symbol has no return and drops out of COUNT/AVG/MAX
    on both sides (NULL-skipping aggregates).

    Plan: lag window + groupBy(symbol) on the one ticks() exchange;
    one row per symbol."""
    t = ticks(spark, sf_dir)
    impact = (
        F.abs(F.col("close") / F.lag("close").over(_W()) - 1)
        / (F.col("close") * F.col("volume"))
        * F.lit(1e12)
    )
    r = t.select("symbol", impact.alias("impact_e12"))
    return r.groupBy("symbol").agg(
        F.count("impact_e12").cast("bigint").alias("n_days"),
        F.round(F.avg("impact_e12"), 6).alias("amihud_e12"),
        F.max("impact_e12").alias("max_impact_e12"),
    )


# ---------------------------------------------------------------------------
# Chaikin Accumulation/Distribution line — quantized CLV cumulative
# ---------------------------------------------------------------------------


@register(
    "chaikin_ad_line",
    WITH_TICKS
    + """,
    c0 AS (
        SELECT symbol, date, volume,
               CAST(round(high  * 100) AS BIGINT) AS hc,
               CAST(round(low   * 100) AS BIGINT) AS lc,
               CAST(round(close * 100) AS BIGINT) AS cc
        FROM ticks
    ),
    f AS (
        SELECT symbol, date,
               CASE WHEN hc > lc
                    THEN ((2 * cc - hc - lc) * 1000000 // (hc - lc))
                         * volume
                    ELSE 0 END AS flow_q
        FROM c0
    )
    SELECT symbol, date,
           CAST(SUM(flow_q) OVER (PARTITION BY symbol ORDER BY date
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT)
               / 1000000.0 AS ad_line
    FROM f
    """,
)
def q_chaikin_ad_line(spark, sf_dir):
    """Chaikin Accumulation/Distribution line: cumulative Close
    Location Value × volume — where in the day's range the close
    landed, signed and volume-weighted, accumulated over the symbol's
    history. The classic volume-flow confirmation panel beside obv
    (which only uses the close DIRECTION; CLV uses position in range).

    Exactness: a float CLV cumulative would be a rule-11 trap twice
    over (FMA contraction on clv·volume, and DuckDB's segment-tree
    window summation adds in a DIFFERENT ORDER than sequential — float
    cumulative windows are not portable at all). So CLV is QUANTIZED
    first: clv_q = (2·cc − hc − lc)·10⁶ div (hc − lc) — exact
    truncating integer division, identical on both engines (rule 13,
    negatives included), flat-range days contribute 0 by convention on
    both sides. flow_q = clv_q · volume stays int64 (≤ ~1e11/day), the
    cumulative sum of exact ints is order-free (≤ ~2.5e14 over a
    calendar, < 2⁵³), and the single closing division by 10⁶ is
    correctly rounded — emitted raw.

    Plan: one ticks exchange; the cumulative window reuses it."""
    t = ticks(spark, sf_dir)
    hc = F.round(F.col("high") * 100, 0).cast("bigint")
    lc = F.round(F.col("low") * 100, 0).cast("bigint")
    cc = F.round(F.col("close") * 100, 0).cast("bigint")
    c0 = t.select(
        "symbol", "date", "volume",
        hc.alias("hc"), lc.alias("lc"), cc.alias("cc"),
    )
    flow = F.when(
        F.col("hc") > F.col("lc"),
        F.expr("((2 * cc - hc - lc) * 1000000) div (hc - lc)")
        * F.col("volume"),
    ).otherwise(F.lit(0))
    f = c0.select("symbol", "date", flow.alias("flow_q"))
    wc = _W().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return f.select(
        "symbol", "date",
        (
            F.sum("flow_q").over(wc).cast("bigint") / F.lit(1000000.0)
        ).alias("ad_line"),
    )

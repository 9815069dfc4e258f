"""Finance time-series indicators, part 4: ADX, candlestick patterns,
52-week extremes, variance-ratio test, risk-adjusted return panel.

Continues ``registry_fin.py``/``fin2``/``fin3`` (reference indicator
surface: ``src/transform.py`` moving averages / volatility beside RSI)
with the chart and risk-report staples a quant user reaches for next.
No new plan shapes — every query is bounded trailing frames or one
grouped aggregate on ONE HashPartitioning(symbol) exchange. Exactness
techniques reused from fin3:

- **Pattern predicates stay on the integer cents grid**: candlestick
  body/shadow/gap comparisons are inequalities between int64 cents (and
  small integer multiples of them) — no division, no float, bit-exact
  booleans on both engines.
- **ADX is the one new float window reduction**: DX is a single exact
  division of int64 directional sums (dmi_14's identity), but averaging
  14 DX doubles is order-sensitive (Spark iterates the frame, DuckDB
  merges a segment tree) → the ADX output is rounded 6dp on both sides
  per the oracles.py policy — the same treatment as cmf_20.
- **Ratios of rounded aggregates are deterministic**: variance-ratio
  and Sharpe/Sortino close with one division of two values that are
  ROUND(...,6)-identical across engines (returns pre-scaled to percent
  so 6dp retains ~8 significant digits); Calmar needs no rounding at
  all because running-max drawdown and MIN are order-insensitive exact
  double ops.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import register
from .sources.ticks import ticks

_W = lambda: Window.partitionBy("symbol").orderBy("date")  # noqa: E731

_OC = lambda: F.round(F.col("open") * 100, 0).cast("long")  # noqa: E731
_HC = lambda: F.round(F.col("high") * 100, 0).cast("long")  # noqa: E731
_LC = lambda: F.round(F.col("low") * 100, 0).cast("long")  # noqa: E731
_CC = lambda: F.round(F.col("close") * 100, 0).cast("long")  # noqa: E731

_CENTS_SQL = """
    c AS (
        SELECT symbol, date,
               CAST(round(open  * 100) AS BIGINT) AS oc,
               CAST(round(high  * 100) AS BIGINT) AS hc,
               CAST(round(low   * 100) AS BIGINT) AS lc,
               CAST(round(close * 100) AS BIGINT) AS cc
        FROM ticks
    )"""


# ---------------------------------------------------------------------------
# ADX (14) — average directional index over dmi_14's DX
# ---------------------------------------------------------------------------

_ADX_N = 14


@register(
    f"adx_{_ADX_N}",
    WITH_TICKS
    + ","
    + _CENTS_SQL
    + f""",
    dm AS (
        SELECT symbol, date,
               CASE WHEN hc - LAG(hc) OVER w > LAG(lc) OVER w - lc
                         AND hc - LAG(hc) OVER w > 0
                    THEN hc - LAG(hc) OVER w ELSE 0 END AS pdm,
               CASE WHEN LAG(lc) OVER w - lc > hc - LAG(hc) OVER w
                         AND LAG(lc) OVER w - lc > 0
                    THEN LAG(lc) OVER w - lc ELSE 0 END AS mdm
        FROM c
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    ),
    s AS (
        SELECT symbol, date,
               CAST(SUM(pdm) OVER wf AS BIGINT) AS sp,
               CAST(SUM(mdm) OVER wf AS BIGINT) AS sm,
               COUNT(pdm)    OVER wf            AS n
        FROM dm
        WINDOW wf AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN {_ADX_N - 1} PRECEDING AND CURRENT ROW)
    ),
    dx AS (
        SELECT symbol, date,
               CASE WHEN n = {_ADX_N} AND sp + sm > 0
                    THEN CAST(100 * ABS(sp - sm) AS DOUBLE) / (sp + sm)
               END AS dx
        FROM s
    )
    SELECT symbol, date,
           CASE WHEN COUNT(dx) OVER wa = {_ADX_N}
                THEN ROUND(AVG(dx) OVER wa, 6) END AS adx
    FROM dx
    WINDOW wa AS (PARTITION BY symbol ORDER BY date
                  ROWS BETWEEN {_ADX_N - 1} PRECEDING AND CURRENT ROW)
    """,
)
def q_adx(spark, sf_dir):
    """Average Directional Index (14, SMA form): the 14-row mean of
    dmi_14's DX — the trend-STRENGTH half of Wilder's system (DI says
    direction, ADX says how decisively). Wilder's recursive smoothing is
    inexpressible as a bounded window (dmi_14's docstring), so both the
    DX sums and the ADX mean use the arithmetic 14-row variant.

    DX is a single exact division of int64 cent sums (ΣTR cancels —
    dmi_14's identity, reference ``src/transform.py`` volatility family);
    the 14-row AVG of those doubles is the one order-sensitive reduction
    → rounded 6dp both sides. NULL until 14 COMPLETE DX values sit in
    the frame (dx is NULL for the first 13 bars and on flat fortnights,
    and AVG must not average a partial set) — so the first ADX appears
    at bar 27 of a gapless series, the classic warm-up. Plan: both
    window layers ride one HashPartitioning(symbol) exchange."""
    t = ticks(spark, sf_dir)
    w = _W()
    c = t.select(
        "symbol", "date", _HC().alias("hc"), _LC().alias("lc")
    )
    up = F.col("hc") - F.lag("hc").over(w)
    dn = F.lag("lc").over(w) - F.col("lc")
    dm = c.select(
        "symbol", "date",
        F.when((up > dn) & (up > 0), up).otherwise(F.lit(0)).alias("pdm"),
        F.when((dn > up) & (dn > 0), dn).otherwise(F.lit(0)).alias("mdm"),
    )
    wf = _W().rowsBetween(-(_ADX_N - 1), 0)
    s = dm.select(
        "symbol", "date",
        F.sum("pdm").over(wf).alias("sp"),
        F.sum("mdm").over(wf).alias("sm"),
        F.count("pdm").over(wf).alias("n"),
    )
    dx = s.select(
        "symbol", "date",
        F.when(
            (F.col("n") == _ADX_N) & (F.col("sp") + F.col("sm") > 0),
            (100 * F.abs(F.col("sp") - F.col("sm"))).cast("double")
            / (F.col("sp") + F.col("sm")),
        ).alias("dx"),
    )
    wa = _W().rowsBetween(-(_ADX_N - 1), 0)
    return dx.select(
        "symbol", "date",
        F.when(
            F.count("dx").over(wa) == _ADX_N,
            F.round(F.avg("dx").over(wa), 6),
        ).alias("adx"),
    )


# ---------------------------------------------------------------------------
# Candlestick pattern detection
# ---------------------------------------------------------------------------


@register(
    "candlestick_patterns",
    WITH_TICKS
    + ","
    + _CENTS_SQL
    + """,
    b AS (
        SELECT symbol, date, oc, hc, lc, cc,
               ABS(cc - oc)            AS body,
               hc - lc                 AS rng,
               hc - GREATEST(oc, cc)   AS ush,
               LEAST(oc, cc) - lc      AS lsh,
               LAG(oc) OVER w AS poc, LAG(cc) OVER w AS pcc,
               LAG(hc) OVER w AS phc, LAG(lc) OVER w AS plc
        FROM c
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    ),
    f AS (
        SELECT symbol, date,
               rng > 0 AND body * 10 <= rng                          AS doji,
               body > 0 AND lsh >= 2 * body AND ush <= body          AS hammer,
               body > 0 AND ush >= 2 * body AND lsh <= body
                   AS shooting_star,
               COALESCE(pcc < poc AND cc > oc
                        AND oc < pcc AND cc > poc, FALSE)
                   AS bullish_engulfing,
               COALESCE(pcc > poc AND cc < oc
                        AND oc > pcc AND cc < poc, FALSE)
                   AS bearish_engulfing,
               COALESCE(oc > phc, FALSE)                             AS gap_up,
               COALESCE(oc < plc, FALSE)                             AS gap_down
        FROM b
    )
    SELECT * FROM f
    WHERE doji OR hammer OR shooting_star OR bullish_engulfing
          OR bearish_engulfing OR gap_up OR gap_down
    """,
)
def q_candlestick_patterns(spark, sf_dir):
    """Classic candlestick pattern screen over the OHLC bars the
    reference charts (``dashboard/app.py`` candlestick plot): doji
    (body ≤ 10% of range), hammer (lower shadow ≥ 2× body, upper ≤
    body), shooting star (mirror), bullish/bearish engulfing (opposite
    colors, strict body engulf of the previous bar), and gap up/down
    (open beyond the previous bar's high/low). Emits only bars that
    fire ≥1 pattern.

    Every predicate is an inequality between int64 cents and small
    integer multiples of them — no division, no float, so the booleans
    are bit-exact across engines. First bar per symbol: the lag-based
    flags COALESCE to FALSE (no previous bar ⇒ no engulf/gap claim);
    the single-bar shapes still apply. Plan: one scan, the lags ride
    one HashPartitioning(symbol) exchange, the filter is a post-window
    predicate (cannot push below the lag, correctly so)."""
    t = ticks(spark, sf_dir)
    w = _W()
    c = t.select(
        "symbol", "date",
        _OC().alias("oc"), _HC().alias("hc"),
        _LC().alias("lc"), _CC().alias("cc"),
    )
    b = c.select(
        "symbol", "date", "oc", "hc", "lc", "cc",
        F.abs(F.col("cc") - F.col("oc")).alias("body"),
        (F.col("hc") - F.col("lc")).alias("rng"),
        (F.col("hc") - F.greatest("oc", "cc")).alias("ush"),
        (F.least("oc", "cc") - F.col("lc")).alias("lsh"),
        F.lag("oc").over(w).alias("poc"),
        F.lag("cc").over(w).alias("pcc"),
        F.lag("hc").over(w).alias("phc"),
        F.lag("lc").over(w).alias("plc"),
    )
    f = b.select(
        "symbol", "date",
        ((F.col("rng") > 0) & (F.col("body") * 10 <= F.col("rng")))
        .alias("doji"),
        (
            (F.col("body") > 0)
            & (F.col("lsh") >= 2 * F.col("body"))
            & (F.col("ush") <= F.col("body"))
        ).alias("hammer"),
        (
            (F.col("body") > 0)
            & (F.col("ush") >= 2 * F.col("body"))
            & (F.col("lsh") <= F.col("body"))
        ).alias("shooting_star"),
        F.coalesce(
            (F.col("pcc") < F.col("poc"))
            & (F.col("cc") > F.col("oc"))
            & (F.col("oc") < F.col("pcc"))
            & (F.col("cc") > F.col("poc")),
            F.lit(False),
        ).alias("bullish_engulfing"),
        F.coalesce(
            (F.col("pcc") > F.col("poc"))
            & (F.col("cc") < F.col("oc"))
            & (F.col("oc") > F.col("pcc"))
            & (F.col("cc") < F.col("poc")),
            F.lit(False),
        ).alias("bearish_engulfing"),
        F.coalesce(F.col("oc") > F.col("phc"), F.lit(False)).alias("gap_up"),
        F.coalesce(F.col("oc") < F.col("plc"), F.lit(False)).alias(
            "gap_down"
        ),
    )
    return f.filter(
        F.col("doji")
        | F.col("hammer")
        | F.col("shooting_star")
        | F.col("bullish_engulfing")
        | F.col("bearish_engulfing")
        | F.col("gap_up")
        | F.col("gap_down")
    )


# ---------------------------------------------------------------------------
# 52-week high/low distance (calendar RANGE frame)
# ---------------------------------------------------------------------------


@register(
    "dist_52w_extremes",
    WITH_TICKS
    + """
    SELECT symbol, date, close,
           hi52, lo52,
           (close - hi52) / hi52 * 100 AS pct_from_52w_high,
           (close - lo52) / lo52 * 100 AS pct_from_52w_low,
           close >= hi52               AS is_new_52w_high,
           close <= lo52               AS is_new_52w_low
    FROM (
        SELECT symbol, date, close,
               MAX(high) OVER wr AS hi52,
               MIN(low)  OVER wr AS lo52
        FROM ticks
        WINDOW wr AS (PARTITION BY symbol ORDER BY date
                      RANGE BETWEEN INTERVAL 364 DAYS PRECEDING
                            AND CURRENT ROW)
    )
    """,
)
def q_dist_52w_extremes(spark, sf_dir):
    """Distance from the trailing 52-WEEK (365 calendar days) high and
    low — the screener staple the reference's dashboard shows as
    "52w range" (``dashboard/app.py`` price panels). A CALENDAR range
    frame, not 252 rows: series with date gaps must not stretch the
    lookback (range_frame_avg's distinction).

    Rolling MAX/MIN are order-insensitive exact double aggregates, and
    each percent distance is per-row IEEE arithmetic on pass-through
    doubles → everything emitted raw, no rounding needed. The new-high/
    new-low flags compare close to the extreme *including today* (close
    ≥ max(high) is rare but possible when close == high). Spark
    expresses the calendar range as rangeBetween over a day-index
    ordering column; both extremes share one frame on one
    HashPartitioning(symbol) exchange."""
    t = ticks(spark, sf_dir)
    day_idx = F.datediff(F.col("date"), F.lit("1990-01-01").cast("date"))
    wr = (
        Window.partitionBy("symbol").orderBy(day_idx).rangeBetween(-364, 0)
    )
    x = t.select(
        "symbol", "date", "close",
        F.max("high").over(wr).alias("hi52"),
        F.min("low").over(wr).alias("lo52"),
    )
    return x.select(
        "symbol", "date", "close", "hi52", "lo52",
        ((F.col("close") - F.col("hi52")) / F.col("hi52") * 100).alias(
            "pct_from_52w_high"
        ),
        ((F.col("close") - F.col("lo52")) / F.col("lo52") * 100).alias(
            "pct_from_52w_low"
        ),
        (F.col("close") >= F.col("hi52")).alias("is_new_52w_high"),
        (F.col("close") <= F.col("lo52")).alias("is_new_52w_low"),
    )


# ---------------------------------------------------------------------------
# Variance-ratio test (random-walk diagnostic)
# ---------------------------------------------------------------------------

_VR_KS = (5, 20)


def _vr_oracle() -> str:
    rk_cols = ",\n               ".join(
        f"(close / LAG(close, {k}) OVER w - 1) * 100 AS r{k}"
        for k in _VR_KS
    )
    vr_cols = ",\n           ".join(
        f"""CASE WHEN ROUND(VAR_SAMP(r1), 6) > 0
                THEN ROUND(VAR_SAMP(r{k}), 6)
                     / ({k} * ROUND(VAR_SAMP(r1), 6)) END AS vr_{k}"""
        for k in _VR_KS
    )
    return (
        WITH_TICKS
        + f""",
    r AS (
        SELECT symbol,
               (close / LAG(close) OVER w - 1) * 100 AS r1,
               {rk_cols}
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    )
    SELECT symbol,
           CAST(COUNT(r1) AS BIGINT) AS n_returns,
           {vr_cols}
    FROM r GROUP BY symbol
    """
    )


@register("variance_ratio", _vr_oracle())
def q_variance_ratio(spark, sf_dir):
    """Lo-MacKinlay variance-ratio diagnostic per symbol: VR(k) =
    Var(k-day return) / (k · Var(1-day return)) with overlapping k-day
    returns (no small-sample bias correction — documented). VR ≈ 1 is a
    random walk; VR > 1 momentum; VR < 1 mean reversion — the
    statistical counterpart of the reference's trend classifier
    (``src/transform.py`` trend buckets).

    Simple percent returns, NOT log returns: libm ln() is a 1-ulp trap
    across engines (doc_keywords' rule), and each simple return is one
    exact double division. Returns are pre-scaled ×100 so the 6dp
    rounding of VAR_SAMP keeps ~8 significant digits. Both variances
    are ROUND(...,6) per the float policy (group-aggregate summation
    order differs across engines); the final VR is one division of two
    rounded-identical doubles → deterministic, emitted raw. NULL when
    the 1-day variance rounds to 0 (degenerate flat series). Plan: the
    lags and the grouped aggregate share one
    HashPartitioning(symbol) exchange."""
    t = ticks(spark, sf_dir)
    w = _W()
    r = t.select(
        "symbol",
        ((F.col("close") / F.lag("close").over(w) - 1) * 100).alias("r1"),
        *[
            ((F.col("close") / F.lag("close", k).over(w) - 1) * 100).alias(
                f"r{k}"
            )
            for k in _VR_KS
        ],
    )
    v1 = F.round(F.var_samp("r1"), 6)
    aggs = [F.count("r1").alias("n_returns")]
    for k in _VR_KS:
        aggs.append(F.round(F.var_samp(f"r{k}"), 6).alias(f"__v{k}"))
    g = r.groupBy("symbol").agg(v1.alias("__v1"), *aggs)
    return g.select(
        "symbol",
        "n_returns",
        *[
            F.when(
                F.col("__v1") > 0,
                F.col(f"__v{k}") / (k * F.col("__v1")),
            ).alias(f"vr_{k}")
            for k in _VR_KS
        ],
    )


# ---------------------------------------------------------------------------
# Risk-adjusted return panel (Sharpe / Sortino / Calmar)
# ---------------------------------------------------------------------------


@register(
    "risk_adjusted_returns",
    WITH_TICKS
    + """,
    r AS (
        SELECT symbol, date, close,
               (close / LAG(close) OVER w - 1) * 100 AS r1,
               MAX(close) OVER (PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    ),
    g AS (
        SELECT symbol,
               CAST(COUNT(r1) AS BIGINT)                  AS n_returns,
               ROUND(AVG(r1), 6)                          AS mean_r,
               ROUND(STDDEV_SAMP(r1), 6)                  AS sd_r,
               ROUND(AVG(CASE WHEN r1 < 0 THEN r1 * r1
                              WHEN r1 IS NOT NULL THEN 0 END), 6) AS dsq,
               MIN((close / peak - 1.0) * 100)            AS mdd_pct,
               (MAX_BY(close, date) / MIN_BY(close, date) - 1.0) * 100
                   AS total_return_pct
        FROM r GROUP BY symbol
    )
    SELECT symbol, n_returns, mean_r, sd_r, mdd_pct, total_return_pct,
           CASE WHEN sd_r > 0
                THEN mean_r / sd_r * SQRT(252.0) END AS sharpe_ann,
           CASE WHEN dsq > 0
                THEN mean_r / SQRT(dsq) * SQRT(252.0) END AS sortino_ann,
           CASE WHEN mdd_pct < 0
                THEN total_return_pct / (-mdd_pct) END AS calmar
    FROM g
    """,
)
def q_risk_adjusted_returns(spark, sf_dir):
    """Per-symbol risk-adjusted performance panel: annualized Sharpe
    (mean/σ·√252, rf = 0), Sortino (downside deviation = √avg(min(r,0)²)
    over the RETURN observations — zeros for up days included, the
    first bar's undefined return excluded, so the divisor is n_returns
    not n_bars), and Calmar (total return /
    |max drawdown|) — the risk columns next to the reference's
    ``total_return_pct`` summary (``src/transform.py``
    performance_summary).

    Float policy split: mean/stddev/downside-square averages are
    order-sensitive group reductions → ROUND(...,6) both sides (percent
    returns keep 6dp meaningful); running-peak drawdown and its MIN are
    order-INsensitive exact double ops, and first/last close via
    min_by/max_by(date) are exact pass-throughs → raw. Each headline
    ratio is then one arithmetic chain over rounded-identical or exact
    doubles (√ is correctly-rounded IEEE, so √252 and √dsq are
    bit-identical cross-engine) → deterministic, emitted raw. Guards:
    σ = 0, no downside days, or flat-peak series → NULL. Plan: lags,
    running max, and the grouped aggregate all ride one
    HashPartitioning(symbol) exchange."""
    t = ticks(spark, sf_dir)
    w = _W()
    w_cum = _W().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = t.select(
        "symbol", "date", "close",
        ((F.col("close") / F.lag("close").over(w) - 1) * 100).alias("r1"),
        F.max("close").over(w_cum).alias("peak"),
    )
    g = r.groupBy("symbol").agg(
        F.count("r1").alias("n_returns"),
        F.round(F.avg("r1"), 6).alias("mean_r"),
        F.round(F.stddev_samp("r1"), 6).alias("sd_r"),
        F.round(
            F.avg(
                F.when(F.col("r1") < 0, F.col("r1") * F.col("r1"))
                .when(F.col("r1").isNotNull(), F.lit(0.0))
            ),
            6,
        ).alias("dsq"),
        F.min((F.col("close") / F.col("peak") - 1.0) * 100).alias("mdd_pct"),
        (
            (F.max_by("close", "date") / F.min_by("close", "date") - 1.0)
            * 100
        ).alias("total_return_pct"),
    )
    sqrt252 = F.sqrt(F.lit(252.0))
    return g.select(
        "symbol", "n_returns", "mean_r", "sd_r", "mdd_pct",
        "total_return_pct",
        F.when(
            F.col("sd_r") > 0, F.col("mean_r") / F.col("sd_r") * sqrt252
        ).alias("sharpe_ann"),
        F.when(
            F.col("dsq") > 0,
            F.col("mean_r") / F.sqrt(F.col("dsq")) * sqrt252,
        ).alias("sortino_ann"),
        F.when(
            F.col("mdd_pct") < 0,
            F.col("total_return_pct") / (-F.col("mdd_pct")),
        ).alias("calmar"),
    )


# ---------------------------------------------------------------------------
# Whole-series linear trend forecast (exact OLS closed form)
# ---------------------------------------------------------------------------


@register(
    "linear_trend_forecast",
    WITH_TICKS
    + """,
    yc AS (
        SELECT symbol,
               CAST(round(close * 100) AS BIGINT) AS y,
               ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date) AS rn
        FROM ticks
    ),
    agg AS (
        SELECT symbol,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(rn AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM yc GROUP BY 1
    ),
    m AS (
        SELECT symbol, n, sy, sxy, syy,
               n * (n + 1) // 2 AS sx,
               n * (n + 1) * (2 * n + 1) // 6 AS sxx
        FROM agg
    ),
    f AS (
        SELECT symbol, n, sy, syy, sx,
               n * sxy - sx * sy AS s_num,
               n * sxx - sx * sx AS den
        FROM m
    )
    SELECT symbol,
           CAST(n AS BIGINT) AS n_days,
           CAST(s_num * 1000000000 // (den * 100) AS BIGINT) / 1e9
               AS slope,
           CAST((sy * den - s_num * sx + n * (n + 1) * s_num) * 1000000
                // (n * den * 100) AS BIGINT) / 1e6
               AS forecast_next_close,
           CAST(s_num * 1000000000 // den AS BIGINT)
             * CAST(s_num * 1000000000 // (n * syy - sy * sy) AS BIGINT)
             / 1e18 AS r2
    FROM f
    WHERE den != 0 AND n * syy - sy * sy != 0
    """,
)
def q_linear_trend_forecast(spark, sf_dir):
    """Per-symbol least-squares trend over the full price history, with
    the next-day forecast — the closed-form cousin of the reference's
    moving-average predictor (reference ``src/transform.py`` prediction
    block): ŷ = intercept + slope·(n+1).

    Exactness (NOTES rule 11 — intercept + slope·x is exactly the FMA
    multiply-add shape that can NOT hash-match in floats): every moment
    is an exact wide integer. x is the per-symbol day rank, so Σx and
    Σx² come from closed forms n(n+1)/2 and n(n+1)(2n+1)/6 (exact
    integer — DuckDB HUGEINT division by 2/6 is exact because the
    products are divisible); y is int64 cents; Σxy and Σy² accumulate in
    DECIMAL(38)/HUGEINT. slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and
    forecast = (Σy·den − s_num·Σx + n(n+1)·s_num)/(n·den). Outputs are
    QUANTIZED by exact truncating integer division (slope at 1e-9,
    forecast at 1e-6 dollars, r² as a product of two 1e-9-quantized
    factors s_num/den · s_num/syy_den): r6 at sf1 measured that a
    >2⁵³ numerator cast to double rounds DIFFERENTLY in DuckDB's
    HUGEINT path than in Spark's BigDecimal path (1-ulp forecast
    flips), so no wide integer may cross the double boundary — the
    quantized integers are small (< 2⁵³), their casts exact, and both
    engines' `div`/`//` truncate toward zero (probed). Overflow audit:
    n ≤ 2e4 days/symbol keeps the widest term (Σy·den)·10⁶ under 10³⁸
    (testdata n ≈ 600/symbol; the axis that grows with sf is SYMBOLS,
    not days).

    Plan: ROW_NUMBER and the groupBy share ONE HashPartitioning(symbol)
    exchange; output is one row per symbol. Degenerate guards: den = 0
    (single-row series) and zero price variance drop the row on both
    sides."""
    dec = "decimal(38,0)"
    t = ticks(spark, sf_dir).select(
        "symbol", "date",
        F.round(F.col("close") * 100, 0).cast("bigint").alias("y"),
    )
    yc = t.select(
        "symbol", "y",
        F.row_number().over(_W()).cast("long").alias("rn"),
    )
    agg = yc.groupBy("symbol").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("rn").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    n, sy, sxy, syy = (F.col(c) for c in ("n", "sy", "sxy", "syy"))
    sx = n * (n + F.lit(1)) / F.lit(2)
    sxx = n * (n + F.lit(1)) * (F.lit(2) * n + F.lit(1)) / F.lit(6)
    m = agg.select(
        "symbol", "n", "sy", "sxy", "syy",
        sx.cast(dec).alias("sx"), sxx.cast(dec).alias("sxx"),
    )
    f = m.select(
        "symbol", "n", "sy", "syy", "sx",
        (n * sxy - F.col("sx") * sy).alias("s_num"),
        (n * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
    )
    s_num, den = F.col("s_num"), F.col("den")
    syy_den = n * syy - sy * sy
    zero = F.lit(0).cast(dec)
    q9 = F.lit(1000000000).cast(dec)
    q6 = F.lit(1000000).cast(dec)
    base = f.filter((den != zero) & (syy_den != zero)).select(
        "symbol", "n", "sx", "sy", "syy", "s_num", "den",
        (s_num * q9).alias("s9"),
        ((sy * den - s_num * F.col("sx") + n * (n + F.lit(1)) * s_num)
         * q6).alias("f6"),
        (n * den * F.lit(100)).alias("fden"),
        syy_den.alias("syyd"),
    )
    div = lambda a, b: F.expr(f"{a} div {b}").cast("bigint")  # noqa: E731
    return base.select(
        "symbol",
        n.cast("long").alias("n_days"),
        (div("s9", "(den * 100)").cast("double") / F.lit(1e9)).alias(
            "slope"
        ),
        (div("f6", "fden").cast("double") / F.lit(1e6)).alias(
            "forecast_next_close"
        ),
        (
            div("s9", "den").cast("double")
            * div("s9", "syyd").cast("double")
            / F.lit(1e18)
        ).alias("r2"),
    )

"""Finance time-series indicator queries over the ticks series.

Extends the reference's indicator surface (reference ``src/transform.py``
moving averages / volatility, ``dashboard/app.py`` price charts) with the
standard technical-analysis family a quant user would expect next: max
drawdown, EMA, RSI, Bollinger bands, market beta, weekly resample, VWAP,
ATR, Donchian channels (+breakout flags), OBV, stochastic %K/%D.
All are expressed as window/agg plans that share ONE
HashPartitioning(symbol) exchange with the rest of the enrich spine — no
self-joins, no per-symbol collects — so the shapes hold at 100 TB.

Float policy (oracles.py): window AVG/STDDEV and cross-row SUM outputs are
ROUND(..., 6) on both sides; pass-through doubles and exact MIN/MAX stay
raw.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import register
from .sources.ticks import ticks

_W = lambda: Window.partitionBy("symbol").orderBy("date")  # noqa: E731


# ---------------------------------------------------------------------------
# Max drawdown
# ---------------------------------------------------------------------------

@register(
    "max_drawdown",
    WITH_TICKS
    + """,
    dd AS (
        SELECT symbol, date, close,
               MAX(close) OVER (PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_close
        FROM ticks
    ),
    ranked AS (
        SELECT symbol, date, close, peak_close,
               (close / peak_close - 1.0) * 100 AS drawdown_pct,
               ROW_NUMBER() OVER (PARTITION BY symbol
                   ORDER BY (close / peak_close - 1.0) * 100 ASC, date ASC) AS rn
        FROM dd
    )
    SELECT symbol, date AS trough_date, close AS trough_close, peak_close,
           ROUND(drawdown_pct, 6) AS max_drawdown_pct
    FROM ranked WHERE rn = 1
    """,
)
def q_max_drawdown(spark, sf_dir):
    """Per-symbol maximum drawdown: running peak (cumulative max window),
    per-row drawdown %, then the deterministic trough row (worst drawdown,
    earliest date as tiebreak).

    Plan: running-max window and row_number share the same
    HashPartitioning(symbol) — one exchange, no join. Running MAX and the
    close/peak division are exact doubles on both engines, so the ranking
    (and the tiebreak) is deterministic; only the output % is rounded.
    """
    t = ticks(spark, sf_dir)
    w_cum = _W().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd = t.select(
        "symbol", "date", "close",
        F.max("close").over(w_cum).alias("peak_close"),
    ).withColumn(
        "drawdown_pct", (F.col("close") / F.col("peak_close") - 1.0) * 100
    )
    w_rank = Window.partitionBy("symbol").orderBy(
        F.col("drawdown_pct").asc(), F.col("date").asc()
    )
    return (
        dd.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "symbol",
            F.col("date").alias("trough_date"),
            F.col("close").alias("trough_close"),
            "peak_close",
            F.round("drawdown_pct", 6).alias("max_drawdown_pct"),
        )
    )


# ---------------------------------------------------------------------------
# EMA (finite-window, lag-term formulation)
# ---------------------------------------------------------------------------

_EMA_SPAN = 10
_EMA_ALPHA = 2.0 / (_EMA_SPAN + 1)
# Truncated EMA: weights (1-alpha)^j for the last `span` rows, normalized
# over the lags that exist (shrinking head, like pandas ewm(adjust=True)).
_EMA_WEIGHTS = [(1.0 - _EMA_ALPHA) ** j for j in range(_EMA_SPAN)]
# α = 2/(span+1) = 2/11 ⇒ (1-α)^j = (9/11)^j. Scaling all weights by 11⁹
# makes them exact integers 9ʲ·11⁹⁻ʲ — the whole weighted sum becomes
# exact int64 arithmetic over price-cents (max |term| ≈ 1.1e7·11⁹ ≈ 2.6e16,
# ×10 terms < 2^62), closed by ONE double division that both engines
# evaluate identically. Float-weight formulations differ by 1 ulp between
# Spark and DuckDB (observed at every sf), so exactness is load-bearing.
_EMA_INT_WEIGHTS = [
    9**j * 11 ** (_EMA_SPAN - 1 - j) for j in range(_EMA_SPAN)
]


def _ema_oracle() -> str:
    num = " + ".join(
        f"COALESCE(CAST(round(LAG(close, {j}) OVER w * 100) AS BIGINT)"
        f" * {w}, 0)"
        for j, w in enumerate(_EMA_INT_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN LAG(close, {j}) OVER w IS NULL THEN 0 ELSE {w} END"
        for j, w in enumerate(_EMA_INT_WEIGHTS)
    )
    return (
        WITH_TICKS
        + f"""
    SELECT symbol, date, close,
           CAST({num} AS BIGINT)
               / CAST({den} AS BIGINT) / 100.0 AS ema_{_EMA_SPAN}
    FROM ticks
    WINDOW w AS (PARTITION BY symbol ORDER BY date)
    """
    )


@register(f"ema_{_EMA_SPAN}", _ema_oracle())
def q_ema(spark, sf_dir):
    """Exponential moving average, span 10, truncated to a 10-row window.

    The recursive EMA definition is not window-expressible; the truncated
    form is: ema_t = Σⱼ wʲ·close_{t-j} / Σⱼ wʲ over the last 10 rows
    (w = 1-α, α = 2/(span+1)), normalized over existing lags (pandas
    ewm(adjust=True) head semantics). Computed in EXACT integer arithmetic
    (price-cents × 11⁹-scaled integer weights — see _EMA_INT_WEIGHTS) so
    Spark and DuckDB agree bit-for-bit; emitted unrounded. All 10 lag()
    terms share one window spec → a single Window node over one exchange,
    no shuffle growth with span.
    """
    t = ticks(spark, sf_dir)
    return t.select(
        "symbol", "date", "close",
        _ema_expr(_W()).alias(f"ema_{_EMA_SPAN}"),
    )


def _ema_expr(w):
    """The span-10 truncated EMA of close as a Column over window spec
    ``w`` — exact integer numerator/denominator closed by one double
    division (see _EMA_INT_WEIGHTS). Shared by ema_10 and the Keltner
    channel."""
    num = None
    den = None
    for j, wt in enumerate(_EMA_INT_WEIGHTS):
        lg = F.lag("close", j).over(w)
        cents = F.round(lg * 100, 0).cast("bigint")
        term_n = F.coalesce(cents * F.lit(wt), F.lit(0).cast("bigint"))
        term_d = (
            F.when(lg.isNull(), F.lit(0)).otherwise(F.lit(wt)).cast("bigint")
        )
        num = term_n if num is None else num + term_n
        den = term_d if den is None else den + term_d
    return num.cast("bigint") / den.cast("bigint") / 100.0


# ---------------------------------------------------------------------------
# RSI
# ---------------------------------------------------------------------------

_RSI_N = 14


@register(
    f"rsi_{_RSI_N}",
    WITH_TICKS
    + f""",
    chg AS (
        SELECT symbol, date, close,
               close - LAG(close) OVER (PARTITION BY symbol ORDER BY date) AS diff
        FROM ticks
    ),
    gl AS (
        SELECT symbol, date, close,
               CASE WHEN diff > 0 THEN diff ELSE 0.0 END  AS gain,
               CASE WHEN diff < 0 THEN -diff ELSE 0.0 END AS loss
        FROM chg
    ),
    av AS (
        SELECT symbol, date, close,
               AVG(gain) OVER w AS avg_gain,
               AVG(loss) OVER w AS avg_loss
        FROM gl
        WINDOW w AS (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date, close,
           ROUND(CASE WHEN avg_loss = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss)
                 END, 6) AS rsi_{_RSI_N}
    FROM av
    """,
)
def q_rsi(spark, sf_dir):
    """RSI(14), simple-moving-average variant (Cutler's RSI): average gain
    and loss over a trailing 14-row frame, RSI = 100 − 100/(1+RS); 100 when
    the window has no losses.

    (Wilder's smoothed RSI is recursive — same reason as EMA — so the SMA
    variant is the window-expressible form.) Both windows + the lag share
    HashPartitioning(symbol): one exchange. Sliding-frame AVG is
    order-sensitive across engines → rounded at 6dp on both sides.
    """
    t = ticks(spark, sf_dir)
    w = _W()
    wf = _W().rowsBetween(-(_RSI_N - 1), 0)
    diff = F.col("close") - F.lag("close").over(w)
    gl = t.select(
        "symbol", "date", "close",
        F.when(diff > 0, diff).otherwise(F.lit(0.0)).alias("gain"),
        F.when(diff < 0, -diff).otherwise(F.lit(0.0)).alias("loss"),
    )
    av = gl.select(
        "symbol", "date", "close",
        F.avg("gain").over(wf).alias("avg_gain"),
        F.avg("loss").over(wf).alias("avg_loss"),
    )
    rsi = F.when(F.col("avg_loss") == 0, F.lit(100.0)).otherwise(
        100.0 - 100.0 / (1.0 + F.col("avg_gain") / F.col("avg_loss"))
    )
    return av.select(
        "symbol", "date", "close",
        F.round(rsi, 6).alias(f"rsi_{_RSI_N}"),
    )


# ---------------------------------------------------------------------------
# Bollinger bands
# ---------------------------------------------------------------------------

@register(
    "bollinger_bands",
    WITH_TICKS
    + """,
    cents AS (
        SELECT symbol, date, close,
               CAST(round(close * 100) AS BIGINT) AS c
        FROM ticks
    ),
    st AS (
        SELECT symbol, date, close,
               SUM(c)     OVER w AS s1,
               SUM(c * c) OVER w AS s2,
               COUNT(*)   OVER w AS n
        FROM cents
        WINDOW w AS (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    bands AS (
        SELECT symbol, date, close,
               s1 / (n * 100.0) AS mid,
               CASE WHEN n < 2 THEN NULL
                    ELSE sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0))
                         / 100.0 END AS sd
        FROM st
    )
    SELECT symbol, date, close,
           mid          AS bb_mid,
           mid + 2 * sd AS bb_upper,
           mid - 2 * sd AS bb_lower,
           CASE WHEN sd = 0 THEN NULL
                ELSE (close - (mid - 2 * sd)) / (4 * sd) END AS pct_b
    FROM bands
    """,
)
def q_bollinger_bands(spark, sf_dir):
    """Bollinger bands (20, 2): trailing mean ± 2×sample-stddev and %B.

    Built-in sliding AVG/STDDEV accumulate in engine-specific order, which
    flips 6dp rounding ties between Spark and DuckDB (NOTES rule 9) — so
    the moments are computed EXACTLY instead: closes sit on a 2-decimal
    money grid, so Σcents and Σcents² over the 20-row frame are exact
    int64 (≤2e15 < 2^53) in ANY accumulation order, and mean/variance
    derive from them with an identical per-row IEEE expression tree on
    both engines — bit-identical outputs, no rounding needed. NULL sd for
    <2 obs (stddev_samp semantics), NULL %B for zero-width bands.
    One window spec → one Window node over the shared symbol exchange.
    """
    t = ticks(spark, sf_dir)
    wf = _W().rowsBetween(-19, 0)
    cents = t.select(
        "symbol", "date", "close",
        F.round(F.col("close") * 100, 0).cast("bigint").alias("c"),
    )
    st = cents.select(
        "symbol", "date", "close",
        F.sum("c").over(wf).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(wf).alias("s2"),
        F.count(F.lit(1)).over(wf).alias("n"),
    )
    s1, s2, n = F.col("s1"), F.col("s2"), F.col("n")
    mid = s1 / (n * 100.0)
    sd = F.when(n < 2, F.lit(None).cast("double")).otherwise(
        F.sqrt(F.greatest((s2 - s1 * s1 / n) / (n - 1), F.lit(0.0))) / 100.0
    )
    bands = st.select(
        "symbol", "date", "close", mid.alias("mid"), sd.alias("sd")
    )
    mid, sd = F.col("mid"), F.col("sd")
    pct_b = F.when(sd == 0, F.lit(None).cast("double")).otherwise(
        (F.col("close") - (mid - 2 * sd)) / (4 * sd)
    )
    return bands.select(
        "symbol", "date", "close",
        mid.alias("bb_mid"),
        (mid + 2 * sd).alias("bb_upper"),
        (mid - 2 * sd).alias("bb_lower"),
        pct_b.alias("pct_b"),
    )


# ---------------------------------------------------------------------------
# Market beta
# ---------------------------------------------------------------------------

@register(
    "beta_vs_market",
    WITH_TICKS
    + """,
    ret AS (
        SELECT symbol, date,
               close / LAG(close) OVER (PARTITION BY symbol ORDER BY date) - 1.0 AS ret
        FROM ticks
    ),
    mkt AS (
        SELECT date, AVG(ret) AS mret
        FROM ret WHERE ret IS NOT NULL GROUP BY date
    )
    SELECT r.symbol,
           CAST(COUNT(*) AS BIGINT)                       AS n_days,
           ROUND(COVAR_SAMP(r.ret, m.mret)
                 / VAR_SAMP(m.mret), 6)                   AS beta,
           ROUND(CORR(r.ret, m.mret), 6)                  AS mkt_corr
    FROM ret r JOIN mkt m USING (date)
    WHERE r.ret IS NOT NULL
    GROUP BY r.symbol
    """,
)
def q_beta_vs_market(spark, sf_dir):
    """CAPM beta per symbol against an equal-weight market factor:
    β = cov(ret, mkt_ret) / var(mkt_ret), plus the return correlation.

    Plan: per-symbol returns ride the symbol exchange; the market factor is
    a tiny per-date aggregate (one row per trading day — thousands of rows
    at any corpus size) broadcast back onto the return rows, then one
    groupBy(symbol) agg. No date-keyed shuffle of the fact. Covariance /
    variance accumulate order-sensitively → β and ρ rounded at 6dp.
    """
    t = ticks(spark, sf_dir)
    w = _W()
    ret = t.select(
        "symbol", "date",
        (F.col("close") / F.lag("close").over(w) - 1.0).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    mkt = ret.groupBy("date").agg(F.avg("ret").alias("mret"))
    return (
        ret.join(F.broadcast(mkt), "date")
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(
                F.covar_samp("ret", "mret") / F.var_samp("mret"), 6
            ).alias("beta"),
            F.round(F.corr("ret", "mret"), 6).alias("mkt_corr"),
        )
    )


# ---------------------------------------------------------------------------
# Weekly resample + VWAP
# ---------------------------------------------------------------------------

@register(
    "weekly_ohlcv",
    WITH_TICKS
    + """
    SELECT symbol,
           CAST(date_trunc('week', date) AS DATE) AS week_start,
           arg_min(open, date)                    AS open,
           MAX(high)                              AS high,
           MIN(low)                               AS low,
           arg_max(close, date)                   AS close,
           CAST(SUM(volume) AS BIGINT)            AS volume,
           CAST(COUNT(*) AS BIGINT)               AS trading_days
    FROM ticks GROUP BY 1, 2
    """,
)
def q_weekly_ohlcv(spark, sf_dir):
    """ISO-week resample (pandas resample('W') equivalent): both engines
    truncate to the Monday of the week; open/close are first/last-by-date
    (min_by/max_by — exact, order-independent)."""
    t = ticks(spark, sf_dir)
    return t.groupBy(
        "symbol",
        F.date_trunc("week", F.col("date")).cast("date").alias("week_start"),
    ).agg(
        F.min_by("open", "date").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "date").alias("close"),
        F.sum("volume").cast("bigint").alias("volume"),
        F.count(F.lit(1)).alias("trading_days"),
    )


@register(
    "vwap_monthly",
    WITH_TICKS
    + """
    SELECT symbol,
           CAST(year(date) AS INTEGER)  AS year,
           CAST(month(date) AS INTEGER) AS month,
           CAST(SUM(CAST(round(close * 100) AS BIGINT) * volume) AS BIGINT)
               / CAST(SUM(volume) AS BIGINT) / 100.0 AS vwap,
           CAST(SUM(volume) AS BIGINT)  AS volume
    FROM ticks GROUP BY 1, 2, 3
    """,
)
def q_vwap_monthly(spark, sf_dir):
    """Volume-weighted average price per symbol-month.

    SUM(close·volume) as doubles is order-sensitive and its 6dp rounding
    flips at scale (NOTES rule 10) — so the numerator is summed as exact
    integer price-CENTS × volume (int64, headroom to ~sf10), and vwap is
    one deterministic double division — bit-identical on both engines with
    no rounding."""
    t = ticks(spark, sf_dir)
    cents = F.round(F.col("close") * 100, 0).cast("bigint")
    return t.groupBy(
        "symbol",
        F.year("date").cast("int").alias("year"),
        F.month("date").cast("int").alias("month"),
    ).agg(
        (
            F.sum(cents * F.col("volume")).cast("bigint")
            / F.sum("volume").cast("bigint") / 100.0
        ).alias("vwap"),
        F.sum("volume").cast("bigint").alias("volume"),
    )


# ---------------------------------------------------------------------------
# ATR (average true range, SMA form)
# ---------------------------------------------------------------------------

_ATR_N = 14


@register(
    f"atr_{_ATR_N}",
    WITH_TICKS
    + f""",
    cents AS (
        SELECT symbol, date,
               CAST(round(high * 100) AS BIGINT)  AS hc,
               CAST(round(low * 100) AS BIGINT)   AS lc,
               LAG(CAST(round(close * 100) AS BIGINT))
                   OVER (PARTITION BY symbol ORDER BY date) AS pc
        FROM ticks
    ),
    tr AS (
        SELECT symbol, date,
               CASE WHEN pc IS NULL THEN hc - lc
                    ELSE GREATEST(hc - lc, ABS(hc - pc), ABS(lc - pc))
               END AS tr_cents
        FROM cents
    )
    SELECT symbol, date,
           tr_cents / 100.0 AS true_range,
           CAST(SUM(tr_cents) OVER w AS BIGINT)
               / (100.0 * COUNT(tr_cents) OVER w) AS atr_{_ATR_N}
    FROM tr
    WINDOW w AS (PARTITION BY symbol ORDER BY date
                 ROWS BETWEEN {_ATR_N - 1} PRECEDING AND CURRENT ROW)
    """,
)
def q_atr(spark, sf_dir):
    """Average True Range (14-row SMA form; Wilder's recursive smoothing
    is not window-expressible — same truncation rationale as ema_10).
    TR_t = max(high−low, |high−prev_close|, |low−prev_close|), first row
    falls back to high−low.

    All arithmetic in exact integer price-CENTS (NOTES rule 10): the
    greatest/abs lattice and the rolling SUM are int64-exact, and the ATR
    is ONE double division both engines evaluate identically — no
    rounding policy needed, emitted unrounded. One Window partition
    spec shared by the lag and the rolling frame → single exchange."""
    t = ticks(spark, sf_dir)
    w = _W()
    hc = F.round(F.col("high") * 100, 0).cast("bigint")
    lc = F.round(F.col("low") * 100, 0).cast("bigint")
    pc = F.lag(F.round(F.col("close") * 100, 0).cast("bigint")).over(w)
    tr_cents = F.when(pc.isNull(), hc - lc).otherwise(
        F.greatest(hc - lc, F.abs(hc - pc), F.abs(lc - pc))
    )
    base = t.select("symbol", "date", tr_cents.alias("tr_cents"))
    wf = _W().rowsBetween(-(_ATR_N - 1), 0)
    return base.select(
        "symbol",
        "date",
        (F.col("tr_cents") / 100.0).alias("true_range"),
        (
            F.sum("tr_cents").over(wf).cast("bigint")
            / (100.0 * F.count("tr_cents").over(wf))
        ).alias(f"atr_{_ATR_N}"),
    )


# ---------------------------------------------------------------------------
# Donchian channels + breakout flags
# ---------------------------------------------------------------------------

_DONCHIAN_N = 20


@register(
    f"donchian_{_DONCHIAN_N}",
    WITH_TICKS
    + f""",
    chan AS (
        SELECT symbol, date, close,
               MAX(high) OVER w AS upper_band,
               MIN(low)  OVER w AS lower_band
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN {_DONCHIAN_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date, close, upper_band, lower_band,
           (upper_band + lower_band) / 2.0 AS mid_band,
           COALESCE(close > LAG(upper_band)
               OVER (PARTITION BY symbol ORDER BY date), FALSE) AS breakout_up,
           COALESCE(close < LAG(lower_band)
               OVER (PARTITION BY symbol ORDER BY date), FALSE) AS breakout_down
    FROM chan
    """,
)
def q_donchian(spark, sf_dir):
    """Donchian channels (20-row high/low envelope) with breakout flags:
    close crossing the PREVIOUS row's channel edge (the classic
    channel-breakout entry signal; lag avoids the self-inclusion that
    would make an upward close never 'break' the channel it just raised).

    MIN/MAX are order-insensitive selections of existing doubles and the
    midpoint is one add + one divide — everything is bit-exact across
    engines with no rounding. The rolling envelope, the lag, and the
    breakout comparison all share one HashPartitioning(symbol) exchange."""
    t = ticks(spark, sf_dir)
    wf = _W().rowsBetween(-(_DONCHIAN_N - 1), 0)
    chan = t.select(
        "symbol", "date", "close",
        F.max("high").over(wf).alias("upper_band"),
        F.min("low").over(wf).alias("lower_band"),
    )
    w = _W()
    return chan.select(
        "symbol", "date", "close", "upper_band", "lower_band",
        ((F.col("upper_band") + F.col("lower_band")) / 2.0).alias("mid_band"),
        F.coalesce(
            F.col("close") > F.lag("upper_band").over(w), F.lit(False)
        ).alias("breakout_up"),
        F.coalesce(
            F.col("close") < F.lag("lower_band").over(w), F.lit(False)
        ).alias("breakout_down"),
    )


# ---------------------------------------------------------------------------
# OBV (on-balance volume)
# ---------------------------------------------------------------------------

@register(
    "obv",
    WITH_TICKS
    + """,
    signed AS (
        SELECT symbol, date, close, volume,
               CASE
                   WHEN LAG(close) OVER w IS NULL THEN 0
                   WHEN close > LAG(close) OVER w THEN CAST(volume AS BIGINT)
                   WHEN close < LAG(close) OVER w THEN -CAST(volume AS BIGINT)
                   ELSE 0
               END AS sv
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    )
    SELECT symbol, date, close,
           CAST(SUM(sv) OVER (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS obv
    FROM signed
    """,
)
def q_obv(spark, sf_dir):
    """On-balance volume: running sum of volume signed by the close-to-
    close direction (up day +v, down day −v, unchanged/first 0). Pure
    int64 cumulative sum — exact at any scale, no float policy. The sign
    lag and the running sum share one HashPartitioning(symbol)."""
    t = ticks(spark, sf_dir)
    w = _W()
    prev = F.lag("close").over(w)
    sv = (
        F.when(prev.isNull(), F.lit(0))
        .when(F.col("close") > prev, F.col("volume").cast("bigint"))
        .when(F.col("close") < prev, -F.col("volume").cast("bigint"))
        .otherwise(F.lit(0))
    )
    base = t.select("symbol", "date", "close", sv.alias("sv"))
    wc = _W().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return base.select(
        "symbol", "date", "close",
        F.sum("sv").over(wc).cast("bigint").alias("obv"),
    )


# ---------------------------------------------------------------------------
# Stochastic oscillator %K / %D
# ---------------------------------------------------------------------------

_STOCH_N = 14


@register(
    f"stochastic_{_STOCH_N}",
    WITH_TICKS
    + f""",
    chan AS (
        SELECT symbol, date, close,
               MIN(low)  OVER w AS lo_n,
               MAX(high) OVER w AS hi_n
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN {_STOCH_N - 1} PRECEDING AND CURRENT ROW)
    ),
    k AS (
        SELECT symbol, date, close, lo_n, hi_n,
               CASE WHEN hi_n = lo_n THEN 50.0
                    ELSE (close - lo_n) / (hi_n - lo_n) * 100.0
               END AS pct_k
        FROM chan
    )
    SELECT symbol, date, close,
           ROUND(pct_k, 6) AS pct_k,
           ROUND(AVG(pct_k) OVER (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS pct_d
    FROM k
    """,
)
def q_stochastic(spark, sf_dir):
    """Stochastic oscillator: %K = position of the close inside the
    14-row low/high channel (degenerate flat channel → 50), %D = 3-row
    SMA of %K. The channel min/max are exact selections and %K is one
    subtraction/division chain → identical doubles both engines; %K and
    the %D average are rounded at 6dp per the float policy (AVG of a
    derived O(1) ratio — NOTES rule 10 headroom to ~sf1000). Channel,
    %K, and %D share one HashPartitioning(symbol) exchange."""
    t = ticks(spark, sf_dir)
    wf = _W().rowsBetween(-(_STOCH_N - 1), 0)
    chan = t.select(
        "symbol", "date", "close",
        F.min("low").over(wf).alias("lo_n"),
        F.max("high").over(wf).alias("hi_n"),
    )
    pct_k = F.when(F.col("hi_n") == F.col("lo_n"), F.lit(50.0)).otherwise(
        (F.col("close") - F.col("lo_n"))
        / (F.col("hi_n") - F.col("lo_n")) * 100.0
    )
    k = chan.select("symbol", "date", "close", pct_k.alias("pct_k"))
    wd = _W().rowsBetween(-2, 0)
    return k.select(
        "symbol", "date", "close",
        F.round("pct_k", 6).alias("pct_k"),
        F.round(F.avg("pct_k").over(wd), 6).alias("pct_d"),
    )


# ---------------------------------------------------------------------------
# Keltner channels (EMA mid ± 2·ATR)
# ---------------------------------------------------------------------------

def _keltner_oracle() -> str:
    num = " + ".join(
        f"COALESCE(CAST(round(LAG(close, {j}) OVER w * 100) AS BIGINT)"
        f" * {w}, 0)"
        for j, w in enumerate(_EMA_INT_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN LAG(close, {j}) OVER w IS NULL THEN 0 ELSE {w} END"
        for j, w in enumerate(_EMA_INT_WEIGHTS)
    )
    return (
        WITH_TICKS
        + f""",
    cents AS (
        SELECT symbol, date, close,
               CAST(round(high * 100) AS BIGINT)  AS hc,
               CAST(round(low * 100) AS BIGINT)   AS lc,
               LAG(CAST(round(close * 100) AS BIGINT))
                   OVER (PARTITION BY symbol ORDER BY date) AS pc
        FROM ticks
    ),
    tr AS (
        SELECT symbol, date, close,
               CASE WHEN pc IS NULL THEN hc - lc
                    ELSE GREATEST(hc - lc, ABS(hc - pc), ABS(lc - pc))
               END AS tr_cents
        FROM cents
    ),
    k AS (
        SELECT symbol, date, close,
               CAST({num} AS BIGINT) / CAST({den} AS BIGINT) / 100.0 AS mid,
               CAST(SUM(tr_cents) OVER wf AS BIGINT)
                   / (100.0 * COUNT(tr_cents) OVER wf) AS atr
        FROM tr
        WINDOW w AS (PARTITION BY symbol ORDER BY date),
               wf AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN {_ATR_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date, close, mid,
           mid + 2.0 * atr AS keltner_upper,
           mid - 2.0 * atr AS keltner_lower
    FROM k
    """
    )


@register("keltner_channels", _keltner_oracle())
def q_keltner(spark, sf_dir):
    """Keltner channels: span-10 EMA midline ± 2·ATR(14) — a volatility
    envelope that composes the two exact primitives already registered
    (`ema_10`'s integer-weight EMA and `atr_14`'s cents true-range). Both
    components are exact-integer arithmetic closed by one double division
    each; the bands are two double add/multiplies on identical doubles —
    bit-exact cross-engine, emitted unrounded. All windows (EMA lags, TR
    lag, ATR frame) share one HashPartitioning(symbol) exchange."""
    t = ticks(spark, sf_dir)
    w = _W()
    hc = F.round(F.col("high") * 100, 0).cast("bigint")
    lc = F.round(F.col("low") * 100, 0).cast("bigint")
    pc = F.lag(F.round(F.col("close") * 100, 0).cast("bigint")).over(w)
    tr_cents = F.when(pc.isNull(), hc - lc).otherwise(
        F.greatest(hc - lc, F.abs(hc - pc), F.abs(lc - pc))
    )
    base = t.select("symbol", "date", "close", tr_cents.alias("tr_cents"))
    wf = _W().rowsBetween(-(_ATR_N - 1), 0)
    k = base.select(
        "symbol", "date", "close",
        _ema_expr(_W()).alias("mid"),
        (
            F.sum("tr_cents").over(wf).cast("bigint")
            / (100.0 * F.count("tr_cents").over(wf))
        ).alias("atr"),
    )
    return k.select(
        "symbol", "date", "close", "mid",
        (F.col("mid") + 2.0 * F.col("atr")).alias("keltner_upper"),
        (F.col("mid") - 2.0 * F.col("atr")).alias("keltner_lower"),
    )


# ---------------------------------------------------------------------------
# Volume profile (price-bucket volume histogram)
# ---------------------------------------------------------------------------

_VP_BUCKET_CENTS = 500  # $5-wide price buckets


@register(
    "volume_profile",
    WITH_TICKS
    + f"""
    SELECT symbol,
           CAST(CAST(round(close * 100) AS BIGINT) // {_VP_BUCKET_CENTS}
                AS BIGINT)                       AS price_bucket,
           CAST(CAST(round(close * 100) AS BIGINT) // {_VP_BUCKET_CENTS}
                * {_VP_BUCKET_CENTS} AS BIGINT) / 100.0 AS bucket_lo,
           CAST(SUM(volume) AS BIGINT)           AS total_volume,
           CAST(COUNT(*) AS BIGINT)              AS n_days
    FROM ticks
    GROUP BY 1, 2, 3
    """,
)
def q_volume_profile(spark, sf_dir):
    """Volume profile: total traded volume per $5 close-price bucket per
    symbol — the volume-at-price histogram behind support/resistance
    charts. Bucketing by integer floor-division of exact price-cents
    (identical in both engines; float bucketing would 1-ulp-flip at
    bucket edges), one combinable aggregate, exact int64 sums."""
    t = ticks(spark, sf_dir)
    cents = F.round(F.col("close") * 100, 0).cast("bigint")
    bucket = F.floor(cents / _VP_BUCKET_CENTS).cast("bigint")
    return t.groupBy(
        "symbol",
        bucket.alias("price_bucket"),
        (bucket * _VP_BUCKET_CENTS / 100.0).alias("bucket_lo"),
    ).agg(
        F.sum("volume").cast("bigint").alias("total_volume"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )


# ---------------------------------------------------------------------------
# MACD (12/26/9) — exact-integer convolutions, null head
# ---------------------------------------------------------------------------

_MACD_Q = 1 << 16  # weight quantization scale (see q_macd docstring)


def _q_weights(span: int) -> list[int]:
    """Truncated-EMA weights (1-α)^j quantized to integers at scale 2¹⁶.

    ema_10 scales its rational weights (9/11)^j to EXACT integers 9ʲ·11⁹⁻ʲ,
    but that trick overflows for spans 12/26 (27²⁵ ≈ 6e35 exceeds both
    int64 and DECIMAL(38)). The quantized weights — not the ideal reals —
    ARE the operator spec (relative error 2⁻¹⁶ ≈ 1.5e-5), identical in
    both engines, chosen small enough that the nested signal convolution
    stays inside int64 (see q_macd overflow audit)."""
    alpha = 2.0 / (span + 1)
    return [round((1.0 - alpha) ** j * _MACD_Q) for j in range(span)]


_MACD_FAST, _MACD_SLOW, _MACD_SIG = 12, 26, 9
_W12, _W26, _W9 = (
    _q_weights(_MACD_FAST), _q_weights(_MACD_SLOW), _q_weights(_MACD_SIG)
)
_D12, _D26, _D9 = sum(_W12), sum(_W26), sum(_W9)


def _conv_cents_expr(weights, w):
    """Σⱼ wⱼ·lag(c, j) over window spec ``w`` for a pre-computed cents
    column ``c`` — exact int64, NULL until all lags exist (null head: a
    null term nulls the sum). The cents conversion is hoisted OUT of the
    convolution (one round/cast per row, not one per lag term — measured
    3.4× faster at sf0.1 across the 38 first-layer terms)."""
    acc = None
    for j, wt in enumerate(weights):
        term = F.lag("c", j).over(w) * F.lit(wt)
        acc = term if acc is None else acc + term
    return acc


def _conv_cents_sql(weights) -> str:
    return " + ".join(
        f"LAG(c, {j}) OVER w * {wt}" for j, wt in enumerate(weights)
    )


def _conv_col_sql(col: str, weights) -> str:
    return " + ".join(
        f"LAG({col}, {j}) OVER w * {wt}" for j, wt in enumerate(weights)
    )


def _macd_oracle() -> str:
    return (
        WITH_TICKS
        + f""",
    c0 AS (
        SELECT symbol, date, close,
               CAST(round(close * 100) AS BIGINT) AS c
        FROM ticks
    ),
    conv AS (
        SELECT symbol, date, close,
               {_conv_cents_sql(_W12)} AS n12,
               {_conv_cents_sql(_W26)} AS n26
        FROM c0
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    )
    SELECT symbol, date, close,
           CAST(n12 AS BIGINT) / {float(_D12 * 100)!r}
         - CAST(n26 AS BIGINT) / {float(_D26 * 100)!r}            AS macd,
           CAST({_conv_col_sql("n12", _W9)} AS BIGINT)
               / {float(_D9 * _D12 * 100)!r}
         - CAST({_conv_col_sql("n26", _W9)} AS BIGINT)
               / {float(_D9 * _D26 * 100)!r}                      AS macd_signal,
           (CAST(n12 AS BIGINT) / {float(_D12 * 100)!r}
            - CAST(n26 AS BIGINT) / {float(_D26 * 100)!r})
         - (CAST({_conv_col_sql("n12", _W9)} AS BIGINT)
               / {float(_D9 * _D12 * 100)!r}
            - CAST({_conv_col_sql("n26", _W9)} AS BIGINT)
               / {float(_D9 * _D26 * 100)!r})                     AS macd_histogram
    FROM conv
    WINDOW w AS (PARTITION BY symbol ORDER BY date)
    """
    )


@register("macd_12_26", _macd_oracle())
def q_macd(spark, sf_dir):
    """MACD(12, 26, 9): fast-minus-slow EMA, its 9-span signal line, and
    the histogram — talib-style NULL head (each output is NULL until its
    full lag window exists; no shrinking-head normalization).

    Exactness is the whole design: a float signal line is a multiply-add
    chain whose result differs by 1 ulp between engines (DuckDB contracts
    a·b+c to FMA; measured on 98% of rows at sf0.01), and 6dp rounding of
    near-grid values still half-step-flips at volume. Instead everything
    is EXACT int64 convolution over price cents: n12 = Σw12ⱼ·centsⱼ and
    n26 = Σw26ⱼ·centsⱼ (weights quantized at 2¹⁶ — _q_weights), and by
    LINEARITY the signal line's convolution distributes over the macd
    difference: signal = conv9(n12)/(D9·D12·100) − conv9(n26)/(D9·D26·100)
    — two nested integer convolutions, each closed by ONE double division
    whose divisor is an exact-double constant (< 2⁵³). Overflow audit:
    max close cents ~1.05e7 (close = MAX(l_extendedprice) ≤ 104950) ×
    D26(765117) × D9(283700) ≈ 2.3e18 < 2⁶³ — int64-safe up to
    close ≈ $425k, 4× the domain max. All outputs are bit-identical
    doubles, emitted raw. NULL heads propagate automatically (a null lag
    nulls the whole sum — no COALESCE). Both window layers hash on
    symbol: ONE exchange, two Window nodes, no join, linear at scale.
    """
    t = ticks(spark, sf_dir).withColumn(
        "c", F.round(F.col("close") * 100, 0).cast("bigint")
    )
    w = _W()
    conv = t.select(
        "symbol", "date", "close",
        _conv_cents_expr(_W12, w).alias("n12"),
        _conv_cents_expr(_W26, w).alias("n26"),
    )

    def conv9(col: str):
        acc = None
        for j, wt in enumerate(_W9):
            term = F.lag(col, j).over(w) * F.lit(wt)
            acc = term if acc is None else acc + term
        return acc

    macd = (
        F.col("n12") / F.lit(float(_D12 * 100))
        - F.col("n26") / F.lit(float(_D26 * 100))
    )
    signal = (
        conv9("n12") / F.lit(float(_D9 * _D12 * 100))
        - conv9("n26") / F.lit(float(_D9 * _D26 * 100))
    )
    return conv.select(
        "symbol", "date", "close",
        macd.alias("macd"),
        signal.alias("macd_signal"),
        (macd - signal).alias("macd_histogram"),
    )


# ---------------------------------------------------------------------------
# Underwater streaks (drawdown durations)
# ---------------------------------------------------------------------------


@register(
    "underwater_streaks",
    WITH_TICKS
    + """,
    flagged AS (
        SELECT symbol, date, close,
               close < MAX(close) OVER (PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS under,
               ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date) AS rn
        FROM ticks
    ),
    uw AS (
        SELECT symbol, date, rn,
               rn - ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date)
                   AS island
        FROM flagged WHERE under
    ),
    streaks AS (
        SELECT symbol, island,
               CAST(COUNT(*) AS BIGINT) AS streak_days,
               MIN(date) AS start_date,
               MAX(date) AS end_date
        FROM uw GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY symbol
                   ORDER BY streak_days DESC, start_date ASC) AS pick,
               CAST(COUNT(*) OVER (PARTITION BY symbol) AS BIGINT)
                   AS n_streaks,
               CAST(SUM(streak_days) OVER (PARTITION BY symbol) AS BIGINT)
                   AS underwater_days
        FROM streaks
    )
    SELECT symbol, streak_days AS longest_streak_days, start_date, end_date,
           n_streaks, underwater_days
    FROM ranked WHERE pick = 1
    """,
)
def q_underwater_streaks(spark, sf_dir):
    """Drawdown durations: per symbol, the longest consecutive-row run
    with close strictly below its running peak, plus how many underwater
    streaks there were and the total days spent underwater.

    The gap-islands identity: among underwater rows, (global row_number −
    underwater row_number) is constant exactly within a consecutive run.
    Every comparison is exact (running MAX of doubles, integer row
    numbers, MIN/MAX dates) — no floats leave the plan, so the output is
    hash-exact with no rounding. All five windows hash on symbol: ONE
    exchange; the streak aggregate and per-symbol rollup ride the same
    partitioning. Ties (equal-length streaks) resolve to the earliest
    start date deterministically.
    """
    t = ticks(spark, sf_dir)
    w_cum = _W().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = t.select(
        "symbol", "date", "close",
        (F.col("close") < F.max("close").over(w_cum)).alias("under"),
        F.row_number().over(_W()).alias("rn"),
    )
    uw = flagged.filter("under").select(
        "symbol", "date", "rn",
        (F.col("rn") - F.row_number().over(_W())).alias("island"),
    )
    streaks = uw.groupBy("symbol", "island").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("date").alias("start_date"),
        F.max("date").alias("end_date"),
    )
    w_sym = Window.partitionBy("symbol")
    ranked = streaks.select(
        "symbol", "streak_days", "start_date", "end_date",
        F.row_number()
        .over(
            Window.partitionBy("symbol").orderBy(
                F.col("streak_days").desc(), F.col("start_date").asc()
            )
        )
        .alias("pick"),
        F.count(F.lit(1)).over(w_sym).alias("n_streaks"),
        F.sum("streak_days").over(w_sym).alias("underwater_days"),
    )
    return ranked.filter(F.col("pick") == 1).select(
        "symbol",
        F.col("streak_days").alias("longest_streak_days"),
        "start_date", "end_date", "n_streaks", "underwater_days",
    )


# ---------------------------------------------------------------------------
# Rolling beta vs market composite (exact windowed regression)
# ---------------------------------------------------------------------------

_BETA_N = 20


@register(
    "rolling_beta_20",
    WITH_TICKS
    + f""",
    yc AS (
        SELECT symbol, date,
               CAST(round(close * 100) AS BIGINT) AS y
        FROM ticks
    ),
    comp AS (
        SELECT date, CAST(SUM(y) AS BIGINT) AS x FROM yc GROUP BY date
    ),
    j AS (SELECT yc.symbol, yc.date, yc.y, comp.x FROM yc JOIN comp USING (date)),
    s AS (
        SELECT symbol, date, x, y,
               COUNT(*) OVER w AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(y) OVER w AS BIGINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) OVER w AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) OVER w AS HUGEINT) AS sxx
        FROM j
        WINDOW w AS (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN {_BETA_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date,
           CASE WHEN n = {_BETA_N}
                 AND n * sxx - CAST(sx AS HUGEINT) * sx != 0
                THEN CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000000
                          // (n * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT)
                     / 1e9
           END AS beta_20
    FROM s
    """,
)
def q_rolling_beta(spark, sf_dir):
    """Rolling 20-day regression beta of each symbol's close against the
    market composite (per-date sum of all closes) — windowed two-series
    regression in EXACT arithmetic.

    A float rolling covariance can't hash-match across engines (NOTES
    rule 11: FMA + order noise), so every moment is exact: prices become
    int64 cents, the composite is an exact int64 per-date sum (one tiny
    date shuffle joined back), and the window accumulates Σx, Σy (int64)
    and Σxy, Σx² (DECIMAL(38)/HUGEINT — a cents×composite-cents product
    clears int64 at scale: 1e7·1e12·20·20 ≈ 4e21 needs ~72 bits, well
    inside 38 digits). β = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) closes by exact
    truncating integer division at 1e-9 (NOTES rule 13: the moments
    exceed 2⁶⁴ where DuckDB's wide→double cast double-rounds — caught
    r6 at sf1 in linear_trend_forecast; the quantized closure keeps
    every double-crossing integer under 2⁵³), emitted as nanos/1e9;
    NULL until the window holds {_BETA_N} rows or when the
    composite is constant (zero variance). Plan: one date aggregate
    (broadcast back) + the shared HashPartitioning(symbol) window — no
    self-join, linear at any scale.
    """
    t = ticks(spark, sf_dir)
    yc = t.select(
        "symbol", "date",
        F.round(F.col("close") * 100, 0).cast("bigint").alias("y"),
    )
    comp = yc.groupBy("date").agg(F.sum("y").alias("x"))
    j = yc.join(F.broadcast(comp), "date")
    wf = _W().rowsBetween(-(_BETA_N - 1), 0)
    dec = "decimal(38,0)"
    xd = F.col("x").cast(dec)
    s = j.select(
        "symbol", "date",
        F.count(F.lit(1)).over(wf).alias("n"),
        F.sum("x").over(wf).alias("sx"),
        F.sum("y").over(wf).alias("sy"),
        F.sum(xd * F.col("y")).over(wf).alias("sxy"),
        F.sum(xd * F.col("x")).over(wf).alias("sxx"),
    )
    n_d = F.col("n").cast(dec)
    num = n_d * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy").cast(dec)
    den = n_d * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx").cast(dec)
    q9 = F.lit(1000000000).cast(dec)
    pre = s.select(
        "symbol", "date", "n",
        (num * q9).alias("num9"), den.alias("den"),
    )
    return pre.select(
        "symbol", "date",
        F.when(
            (F.col("n") == _BETA_N) & (F.col("den") != F.lit(0).cast(dec)),
            F.expr("num9 div den").cast("double") / F.lit(1e9),
        ).alias("beta_20"),
    )


@register(
    "rolling_corr_20",
    WITH_TICKS
    + f""",
    yc AS (
        SELECT symbol, date,
               CAST(round(close * 100) AS BIGINT) AS y
        FROM ticks
    ),
    comp AS (
        SELECT date, CAST(SUM(y) AS BIGINT) AS x FROM yc GROUP BY date
    ),
    j AS (SELECT yc.symbol, yc.date, yc.y, comp.x FROM yc JOIN comp USING (date)),
    s AS (
        SELECT symbol, date,
               COUNT(*) OVER w AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(y) OVER w AS BIGINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) OVER w AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) OVER w AS HUGEINT) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) OVER w AS HUGEINT) AS syy
        FROM j
        WINDOW w AS (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN {_BETA_N - 1} PRECEDING AND CURRENT ROW)
    ),
    q AS (
        SELECT symbol, date, n,
               n * sxy - CAST(sx AS HUGEINT) * sy AS num,
               n * sxx - CAST(sx AS HUGEINT) * sx AS va,
               n * syy - CAST(sy AS HUGEINT) * sy AS vb
        FROM s
    )
    SELECT symbol, date,
           CASE WHEN n = {_BETA_N} AND va != 0 AND vb != 0
                THEN (CASE WHEN num < 0 THEN -1.0 ELSE 1.0 END)
                   * sqrt(CAST(num * 1000000000 // va AS BIGINT)
                          * CAST(num * 1000000000 // vb AS BIGINT))
                   / 1e9 + 0.0
           END AS corr_20
    FROM q
    """,
)
def q_rolling_corr(spark, sf_dir):
    """Rolling 20-day Pearson correlation of each symbol against the
    market composite — the sibling of rolling_beta_20, closing through
    sqrt.

    Same exact-moment accumulation (int64 cents, DECIMAL(38)/HUGEINT
    cross-product window sums); the closure quantizes each factor
    EXACTLY before any double exists (NOTES rule 13 — the raw moments
    exceed 2⁶⁴, where DuckDB's wide→double cast double-rounds):
    corr = sign(num) · sqrt((num·10⁹ div va) · (num·10⁹ div vb)) / 10⁹
    — the two truncating divisions are exact integers < 2⁵³ on both
    engines, and the remaining mul/sqrt/div are single correctly-
    rounded IEEE ops on identical doubles. (The denominators can't be
    squared inside DECIMAL(38): (4e21)² overflows — which is why the
    closure multiplies the two quantized FACTORS instead.)
    NULL until the window fills or either variance is zero.
    """
    t = ticks(spark, sf_dir)
    yc = t.select(
        "symbol", "date",
        F.round(F.col("close") * 100, 0).cast("bigint").alias("y"),
    )
    comp = yc.groupBy("date").agg(F.sum("y").alias("x"))
    j = yc.join(F.broadcast(comp), "date")
    wf = _W().rowsBetween(-(_BETA_N - 1), 0)
    dec = "decimal(38,0)"
    xd = F.col("x").cast(dec)
    yd = F.col("y").cast(dec)
    s = j.select(
        "symbol", "date",
        F.count(F.lit(1)).over(wf).alias("n"),
        F.sum("x").over(wf).alias("sx"),
        F.sum("y").over(wf).alias("sy"),
        F.sum(xd * F.col("y")).over(wf).alias("sxy"),
        F.sum(xd * F.col("x")).over(wf).alias("sxx"),
        F.sum(yd * F.col("y")).over(wf).alias("syy"),
    )
    n_d = F.col("n").cast(dec)
    sx_d = F.col("sx").cast(dec)
    sy_d = F.col("sy").cast(dec)
    num = n_d * F.col("sxy") - sx_d * sy_d
    den_x = n_d * F.col("sxx") - sx_d * sx_d
    den_y = n_d * F.col("syy") - sy_d * sy_d
    zero = F.lit(0).cast(dec)
    q9 = F.lit(1000000000).cast(dec)
    pre = s.select(
        "symbol", "date", "n",
        (num * q9).alias("num9"), num.alias("num"),
        den_x.alias("va"), den_y.alias("vb"),
    )
    sign = F.when(F.col("num") < zero, F.lit(-1.0)).otherwise(F.lit(1.0))
    return pre.select(
        "symbol", "date",
        F.when(
            (F.col("n") == _BETA_N)
            & (F.col("va") != zero)
            & (F.col("vb") != zero),
            sign
            * F.sqrt(
                F.expr("num9 div va").cast("double")
                * F.expr("num9 div vb").cast("double")
            )
            / F.lit(1e9)
            + F.lit(0.0),
        ).alias("corr_20"),
    )


# ---------------------------------------------------------------------------
# PPO (percentage price oscillator) — macd's ratio sibling, exact ints
# ---------------------------------------------------------------------------


@register(
    "ppo_12_26",
    WITH_TICKS
    + f""",
    c0 AS (
        SELECT symbol, date, close,
               CAST(round(close * 100) AS BIGINT) AS c
        FROM ticks
    ),
    conv AS (
        SELECT symbol, date, close,
               {_conv_cents_sql(_W12)} AS n12,
               {_conv_cents_sql(_W26)} AS n26
        FROM c0
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    )
    SELECT symbol, date, close,
           CASE WHEN n26 != 0 THEN
               100.0 * CAST(n12 * {_D26} - n26 * {_D12} AS DOUBLE)
                     / CAST(n26 * {_D12} AS DOUBLE)
           END AS ppo
    FROM conv
    """,
)
def q_ppo(spark, sf_dir):
    """PPO(12, 26): the MACD difference expressed as a percentage of the
    slow EMA — comparable across price levels, which raw MACD is not.

    Exactness rides q_macd's machinery unchanged: with the talib NULL
    head both EMA denominators are constants, so
    100·(E12−E26)/E26 = 100·(n12·D26 − n26·D12)/(n26·D12) — the floats
    cancel into a ratio of exact int64s closed by ONE double division
    (the 100· multiplier is exact). Overflow audit: n12 ≤ maxc·D12 ≈
    1.05e7·419 130 ≈ 4.4e12, ×D26(765 117) ≈ 3.4e18 < 2⁶³ — int64-safe
    to the same $425k close bound as macd_12_26. NULL head propagates
    through the lag sums; a zero slow-EMA (impossible for positive
    prices, but the guard is free) nulls the row on both sides.
    Plan: identical to macd — ONE symbol exchange, one Window node."""
    t = ticks(spark, sf_dir).withColumn(
        "c", F.round(F.col("close") * 100, 0).cast("bigint")
    )
    w = _W()
    conv = t.select(
        "symbol", "date", "close",
        _conv_cents_expr(_W12, w).alias("n12"),
        _conv_cents_expr(_W26, w).alias("n26"),
    )
    num = F.col("n12") * F.lit(_D26) - F.col("n26") * F.lit(_D12)
    den = F.col("n26") * F.lit(_D12)
    return conv.select(
        "symbol", "date", "close",
        F.when(
            F.col("n26") != 0,
            F.lit(100.0) * num.cast("double") / den.cast("double"),
        ).alias("ppo"),
    )


# ---------------------------------------------------------------------------
# TRIX — triple-smoothed EMA rate of change, exact wide-int convolution
# ---------------------------------------------------------------------------

_TRIX_SPAN = 15
_WT = _q_weights(_TRIX_SPAN)


def _triple_conv_weights(w: list[int]) -> list[int]:
    """The triple EMA of a truncated kernel IS convolution by w∗w∗w
    (linearity): a single kernel of length 3·span−2, exact ints."""
    def conv(a, b):
        out = [0] * (len(a) + len(b) - 1)
        for i, x in enumerate(a):
            for j, y in enumerate(b):
                out[i + j] += x * y
        return out

    return conv(conv(w, w), w)


_K3 = _triple_conv_weights(_WT)


@register(
    "trix_15",
    WITH_TICKS
    + f""",
    c0 AS (
        SELECT symbol, date, close,
               CAST(round(close * 100) AS HUGEINT) AS c
        FROM ticks
    ),
    conv AS (
        SELECT symbol, date, close,
               {_conv_cents_sql(_K3)} AS n3
        FROM c0
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    )
    SELECT symbol, date, close,
           CASE WHEN LAG(n3, 1) OVER w != 0 THEN
               CAST((n3 - LAG(n3, 1) OVER w) * 100000000000
                    // LAG(n3, 1) OVER w AS BIGINT) / 1e9
           END AS trix
    FROM conv
    WINDOW w AS (PARTITION BY symbol ORDER BY date)
    """,
)
def q_trix(spark, sf_dir):
    """TRIX(15): percent rate of change of the triple-smoothed EMA —
    the classic momentum filter that cancels short noise three times
    over (reference ``src/transform.py`` smooths once; this is the
    third-order member of that family).

    Exactness: by LINEARITY the triple EMA is one convolution with the
    self-convolved kernel w∗w∗w (43 exact integer taps, computed in
    Python ints at import). The ÷D³ normalizations CANCEL in the
    percent change — trix quantizes
    100·(N_t − N_{t−1})/N_{t−1} at 1e-9 by exact truncating integer
    division (NOTES rule 13: N sits at 2⁷⁸-2⁸⁰ where DuckDB's
    wide→double cast 1-ulp-flips ~1/100k values — measured 50 flips in
    4.9M casts at sf1; under the driver's round(·,9) canon each flip is
    a small half-step-crossing risk, so none may survive). N needs ~78 bits
    (maxc·ΣK3 ≈ 1.05e7·1.4e16 ≈ 1.5e23), so the sum accumulates in
    DECIMAL(38,0)/HUGEINT — headroom to 10³⁸ ≈ close of $7·10²¹.
    NULL head: the first 43 rows (and the lagged first after them) are
    NULL on both sides.

    Plan/perf: the engine evaluates the convolution NESTED — two int64
    15-tap passes (n1 ≤ maxc·D ≈ 2.5e12, n2 ≤ maxc·D² ≈ 6e17, both
    int64-safe) and ONE 15-tap DECIMAL pass for the final layer — 30
    cheap integer terms + 15 wide ones instead of 43 wide ones (measured
    5.7 → 2.3 s at sf0.1; NOTES: DECIMAL window arithmetic costs ~2-4×
    int64). By associativity of convolution the nested result equals the
    oracle's flat 43-tap kernel on the same integers EXACTLY, so the
    nesting is a pure plan choice, not a semantics one — the flat-kernel
    test pins that identity. All four window layers share one symbol
    exchange."""
    dec = "decimal(38,0)"
    t = ticks(spark, sf_dir).withColumn(
        "c", F.round(F.col("close") * 100, 0).cast("bigint")
    )
    w = _W()

    def conv15(col: str, widen: bool = False):
        acc = None
        for j, wt in enumerate(_WT):
            term = F.lag(col, j).over(w) * F.lit(wt)
            if widen:
                term = F.lag(F.col(col).cast(dec), j).over(w) * F.lit(
                    wt
                ).cast(dec)
            acc = term if acc is None else acc + term
        return acc

    l1 = t.select("symbol", "date", "close", conv15("c").alias("n1"))
    l2 = l1.select(
        "symbol", "date", "close", conv15("n1").alias("n2")
    )
    conv = l2.select(
        "symbol", "date", "close", conv15("n2", widen=True).alias("n3")
    )
    prev = F.lag("n3", 1).over(w)
    q11 = F.lit(100000000000).cast(dec)
    pre = conv.select(
        "symbol", "date", "close",
        ((F.col("n3") - prev) * q11).alias("dq"),
        prev.alias("prev"),
    )
    return pre.select(
        "symbol", "date", "close",
        F.when(
            F.col("prev") != F.lit(0).cast(dec),
            F.expr("dq div prev").cast("double") / F.lit(1e9),
        ).alias("trix"),
    )

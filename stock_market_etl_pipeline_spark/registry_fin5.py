"""Finance time-series, part 5: Heikin-Ashi candles and a momentum
decile backtest.

Continues the ``registry_fin*`` family (reference indicator surface:
``src/transform.py`` moving averages / returns / volatility) with two
shapes the earlier parts don't cover:

- **A recursive candle transform** (Heikin-Ashi's ha_open feeds on its
  own previous value). The recursion unrolls into a geometric 2^-k
  convolution — binary-exact weights, so unlike macd's 2^16-quantized
  EMA weights there is no quantization at all: the 20-tap re-seeded
  recursion is exact int64 arithmetic closed by one double division.
- **A cross-sectional portfolio composition** (rank this month, hold
  next month): window spine per symbol for the signal, a month-keyed
  rank for the portfolio, and a grouped forward-return average — the
  first query whose groups are PORTFOLIOS rather than symbols/dates.

Exactness policy per NOTES rules 10-13: integer cents spine, single
correctly-rounded double divisions, 6dp rounds only at O(1)-ratio
aggregate boundaries, no wide-int→double casts above 2^63.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import register
from .sources.ticks import ticks

_W = lambda: Window.partitionBy("symbol").orderBy("date")  # noqa: E731


# ---------------------------------------------------------------------------
# Heikin-Ashi candles — exact binary-weight unrolled recursion
# ---------------------------------------------------------------------------

_HA_N = 20  # re-seed horizon: ha_open(t-N+1) := ha_close(t-N)
# unrolled weights on q = oc+hc+lc+cc (ha_close*400): 2^(N-1-k) for lag
# k=1..N-1 plus weight 1 at lag N; they sum to exactly 2^(N-1)
_HA_DEN = float((1 << (_HA_N - 1)) * 400)


def _ha_num_expr(w):
    acc = None
    for k in range(1, _HA_N):
        term = F.lag("q", k).over(w) * F.lit(1 << (_HA_N - 1 - k))
        acc = term if acc is None else acc + term
    return acc + F.lag("q", _HA_N).over(w)


def _ha_num_sql() -> str:
    terms = [
        f"LAG(q, {k}) OVER w * {1 << (_HA_N - 1 - k)}"
        for k in range(1, _HA_N)
    ]
    terms.append(f"LAG(q, {_HA_N}) OVER w")
    return " + ".join(terms)


@register(
    "heikin_ashi",
    WITH_TICKS
    + f""",
    c0 AS (
        SELECT symbol, date,
               CAST(round(open  * 100) AS BIGINT)
             + CAST(round(high  * 100) AS BIGINT)
             + CAST(round(low   * 100) AS BIGINT)
             + CAST(round(close * 100) AS BIGINT) AS q,
               CAST(round(high * 100) AS BIGINT)  AS hc,
               CAST(round(low  * 100) AS BIGINT)  AS lc
        FROM ticks
    ),
    conv AS (
        SELECT symbol, date, hc, lc,
               q / 400.0            AS ha_close,
               ({_ha_num_sql()}) / {_HA_DEN!r} AS ha_open
        FROM c0
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    )
    SELECT symbol, date, ha_open, ha_close,
           GREATEST(hc / 100.0, ha_open, ha_close) AS ha_high,
           LEAST(lc / 100.0, ha_open, ha_close)    AS ha_low
    FROM conv WHERE ha_open IS NOT NULL
    """,
)
def q_heikin_ashi(spark, sf_dir):
    """Heikin-Ashi candles: ha_close = (O+H+L+C)/4 and the recursive
    ha_open = (prev ha_open + prev ha_close)/2, re-seeded at a 20-bar
    horizon (ha_open 20 bars back := its previous ha_close — the same
    talib-style bounded-warmup convention as macd's NULL head; the first
    20 rows per symbol are dropped).

    The recursion unrolls by linearity into ha_open_t =
    Σ_{{k=1..19}} 2^-k·ha_close_{{t-k}} + 2^-19·ha_close_{{t-20}} —
    BINARY weights, so with q = oc+hc+lc+cc (int64 quarter-cents·4,
    ha_close = q/400) the numerator Σ 2^(19-k)·q_{{t-k}} + q_{{t-20}} is
    exact int64 (max 2^19·4.4e7 ≈ 2.3e13, far under 2^63 — no DECIMAL,
    no rule-13 wide-cast exposure) and weights sum to exactly 2^19.
    Both outputs close with ONE correctly-rounded double division by an
    exact-double constant; ha_high/ha_low are GREATEST/LEAST of those
    identical doubles against the cents-grid high/low — bit-exact on
    both engines, emitted raw. One symbol exchange, one Window node.
    Reference semantics: candle transform family beside
    ``src/transform.py`` OHLC derivations (file:line cited in SURVEY §2
    F-family); HA itself is a standard charting extension.
    """
    t = ticks(spark, sf_dir).select(
        "symbol", "date",
        (
            F.round(F.col("open") * 100, 0).cast("bigint")
            + F.round(F.col("high") * 100, 0).cast("bigint")
            + F.round(F.col("low") * 100, 0).cast("bigint")
            + F.round(F.col("close") * 100, 0).cast("bigint")
        ).alias("q"),
        F.round(F.col("high") * 100, 0).cast("bigint").alias("hc"),
        F.round(F.col("low") * 100, 0).cast("bigint").alias("lc"),
    )
    w = _W()
    conv = t.select(
        "symbol", "date", "hc", "lc",
        (F.col("q") / F.lit(400.0)).alias("ha_close"),
        (_ha_num_expr(w) / F.lit(_HA_DEN)).alias("ha_open"),
    )
    return conv.filter(F.col("ha_open").isNotNull()).select(
        "symbol", "date", "ha_open", "ha_close",
        F.greatest(
            F.col("hc") / F.lit(100.0), F.col("ha_open"), F.col("ha_close")
        ).alias("ha_high"),
        F.least(
            F.col("lc") / F.lit(100.0), F.col("ha_open"), F.col("ha_close")
        ).alias("ha_low"),
    )


# ---------------------------------------------------------------------------
# Momentum decile backtest — rank on trailing 3-month return, hold 1 month
# ---------------------------------------------------------------------------


@register(
    "momentum_decile_backtest",
    WITH_TICKS
    + """,
    me AS (
        SELECT symbol,
               CAST(year(date) * 12 + month(date) AS BIGINT) AS mseq,
               CAST(year(date) AS INTEGER)  AS year,
               CAST(month(date) AS INTEGER) AS month,
               arg_max(CAST(round(close * 100) AS BIGINT), date) AS cc
        FROM ticks GROUP BY 1, 2, 3, 4
    ),
    sig AS (
        SELECT symbol, mseq, year, month,
               CASE WHEN mseq - LAG(mseq, 3) OVER w = 3
                    THEN cc / CAST(LAG(cc, 3) OVER w AS DOUBLE) - 1
               END AS mom,
               CASE WHEN LEAD(mseq, 1) OVER w = mseq + 1
                    THEN (LEAD(cc, 1) OVER w / CAST(cc AS DOUBLE) - 1) * 100
               END AS fwd_ret_pct
        FROM me
        WINDOW w AS (PARTITION BY symbol ORDER BY mseq)
    ),
    ranked AS (
        SELECT year, month, mom, fwd_ret_pct,
               ROW_NUMBER() OVER (PARTITION BY mseq
                                  ORDER BY mom DESC, symbol) AS rn,
               COUNT(*)     OVER (PARTITION BY mseq)          AS n
        FROM sig WHERE mom IS NOT NULL AND fwd_ret_pct IS NOT NULL
    )
    SELECT year, month,
           CAST((rn - 1) * 10 // n AS INTEGER)   AS decile,
           CAST(COUNT(*) AS BIGINT)              AS n_symbols,
           ROUND(AVG(fwd_ret_pct), 6)            AS avg_fwd_ret_pct
    FROM ranked
    GROUP BY 1, 2, 3
    """,
)
def q_momentum_decile_backtest(spark, sf_dir):
    """Cross-sectional momentum backtest: each month, rank symbols by
    trailing 3-month return (month-end close cents ratio), cut into
    deciles, and measure each decile's average NEXT-month return — the
    classic Jegadeesh-Titman long-short table, fully distributed.

    Exactness: month-end closes are max_by(cents, date) int64; the
    trailing and forward returns are single divisions of those ints
    (minus-1 and ×100 are single correctly-rounded ops on identical
    doubles — deterministic per NOTES rule 11's single-op exemption);
    month continuity is enforced with integer month-sequence lags so a
    symbol absent from a month never silently compares across a gap.
    Decile = ((rank-1)·10) div n — exact truncating integer division on
    both engines (rule 12: DuckDB ``//``). The per-decile forward-return
    AVG is the one float aggregate: O(1)-percent ratios rounded 6dp
    (rule 10's documented ~sf1000 headroom class). Plan: one symbol
    exchange for month-ends + window spine, one month-keyed exchange for
    the rank, one grouped agg — no joins; portfolio groups are months×10
    rows regardless of corpus size.
    """
    t = ticks(spark, sf_dir)
    me = (
        t.groupBy(
            "symbol",
            (F.year("date") * 12 + F.month("date"))
            .cast("bigint")
            .alias("mseq"),
            F.year("date").cast("int").alias("year"),
            F.month("date").cast("int").alias("month"),
        )
        .agg(
            F.max_by(
                F.round(F.col("close") * 100, 0).cast("bigint"), F.col("date")
            ).alias("cc")
        )
    )
    w = Window.partitionBy("symbol").orderBy("mseq")
    sig = me.select(
        "year", "month", "mseq", "symbol",
        F.when(
            F.col("mseq") - F.lag("mseq", 3).over(w) == 3,
            F.col("cc") / F.lag("cc", 3).over(w).cast("double") - 1,
        ).alias("mom"),
        F.when(
            F.lead("mseq", 1).over(w) == F.col("mseq") + 1,
            (F.lead("cc", 1).over(w) / F.col("cc").cast("double") - 1) * 100,
        ).alias("fwd_ret_pct"),
    ).filter(F.col("mom").isNotNull() & F.col("fwd_ret_pct").isNotNull())
    wm = Window.partitionBy("mseq")
    ranked = sig.select(
        "year", "month", "fwd_ret_pct",
        F.row_number()
        .over(wm.orderBy(F.col("mom").desc(), "symbol"))
        .alias("rn"),
        F.count(F.lit(1)).over(wm).alias("n"),
    )
    return (
        ranked.select(
            "year", "month", "fwd_ret_pct",
            F.expr("CAST((rn - 1) * 10 div n AS INT)").alias("decile"),
        )
        .groupBy("year", "month", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_symbols"),
            F.round(F.avg("fwd_ret_pct"), 6).alias("avg_fwd_ret_pct"),
        )
    )

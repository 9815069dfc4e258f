"""Finance time-series indicators, part 2: Williams %R, ROC, CCI, Aroon.

Continues ``registry_fin.py`` (reference indicator surface:
``src/transform.py`` moving averages / volatility) with four more
standard technical indicators.  The new implementation idea here is the
WINDOW-ARRAY pattern: CCI's mean deviation and Aroon's days-since-
extreme both depend on the CURRENT row's window aggregate applied to
EVERY element of the window — not expressible as a plain window
aggregate of a precomputed column — so the trailing window is collected
as a bounded array (≤ 26 elements) and reduced with JVM higher-order
functions (transform/aggregate), never Python.

Float policy (oracles.py): CCI runs on exact integer cents until one
final double division (emitted raw — identical ints ⇒ identical
doubles); Aroon is pure integer (multiples of 4); %R and ROC are
single-expression float chains rounded 6dp like stochastic/pct-change.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import register
from .sources.ticks import ticks

_W = lambda: Window.partitionBy("symbol").orderBy("date")  # noqa: E731


# ---------------------------------------------------------------------------
# Williams %R (14)
# ---------------------------------------------------------------------------

_WR_N = 14


@register(
    f"williams_r_{_WR_N}",
    WITH_TICKS
    + f""",
    chan AS (
        SELECT symbol, date, close,
               MIN(low)  OVER w AS lo_n,
               MAX(high) OVER w AS hi_n
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN {_WR_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date, close,
           ROUND(CASE WHEN hi_n = lo_n THEN -50.0
                      ELSE (close - hi_n) / (hi_n - lo_n) * 100.0
                 END, 6) AS williams_r
    FROM chan
    """,
)
def q_williams_r(spark, sf_dir):
    """Williams %R: position of the close inside the 14-row high/low
    channel, scaled to [-100, 0] (flat channel → -50, mirroring the
    stochastic's degenerate-case convention).

    Same plan as stochastic_14 minus the %D smoothing: channel min/max
    are exact selections sharing ONE HashPartitioning(symbol) exchange,
    %R is a single subtraction/division chain (identical doubles both
    engines) rounded 6dp per the float policy."""
    t = ticks(spark, sf_dir)
    wf = _W().rowsBetween(-(_WR_N - 1), 0)
    chan = t.select(
        "symbol", "date", "close",
        F.min("low").over(wf).alias("lo_n"),
        F.max("high").over(wf).alias("hi_n"),
    )
    # (close-hi)·100, not (hi-close)·-100: the latter emits IEEE -0.0
    # when close == hi_n and the two engines disagree on the zero's sign
    wr = F.when(F.col("hi_n") == F.col("lo_n"), F.lit(-50.0)).otherwise(
        (F.col("close") - F.col("hi_n"))
        / (F.col("hi_n") - F.col("lo_n")) * 100.0
    )
    return chan.select(
        "symbol", "date", "close", F.round(wr, 6).alias("williams_r")
    )


# ---------------------------------------------------------------------------
# Rate of change (12)
# ---------------------------------------------------------------------------

_ROC_N = 12


@register(
    f"roc_{_ROC_N}",
    WITH_TICKS
    + f"""
    SELECT symbol, date, close,
           ROUND((close / LAG(close, {_ROC_N})
                      OVER (PARTITION BY symbol ORDER BY date) - 1.0)
                 * 100.0, 6) AS roc
    FROM ticks
    """,
)
def q_roc(spark, sf_dir):
    """12-period rate of change: (close / close₁₂-ago − 1) · 100, NULL
    for the first 12 rows per symbol (talib-style NULL head — see the
    macd_12_26 docstring for why the head must be NULL, not shrinking).

    One lag on the shared symbol partitioning; the three-op float chain
    (divide, subtract, multiply — no multiply-add for FMA contraction to
    bite, NOTES rule 11) is identical across engines, rounded 6dp."""
    t = ticks(spark, sf_dir)
    roc = (
        F.col("close") / F.lag("close", _ROC_N).over(_W()) - F.lit(1.0)
    ) * F.lit(100.0)
    return t.select("symbol", "date", "close", F.round(roc, 6).alias("roc"))


# ---------------------------------------------------------------------------
# Commodity Channel Index (20) — exact-integer window-array form
# ---------------------------------------------------------------------------

_CCI_N = 20


@register(
    f"cci_{_CCI_N}",
    WITH_TICKS
    + f""",
    tp AS (
        SELECT symbol, date, close,
               CAST(round(high * 100) AS BIGINT)
               + CAST(round(low * 100) AS BIGINT)
               + CAST(round(close * 100) AS BIGINT) AS tp3
        FROM ticks
    ),
    arr AS (
        SELECT symbol, date, close, tp3,
               list(tp3) OVER (PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN {_CCI_N - 1} PRECEDING AND CURRENT ROW)
                   AS a
        FROM tp
    ),
    stats AS (
        SELECT symbol, date, close, tp3,
               CAST(len(a) AS BIGINT) AS n,
               CAST(list_sum(a) AS BIGINT) AS s3,
               CAST(list_sum(list_transform(a,
                   x -> abs(x * CAST(len(a) AS BIGINT)
                            - CAST(list_sum(a) AS BIGINT))))
                   AS BIGINT) AS dev
        FROM arr
    )
    SELECT symbol, date, close,
           CASE WHEN dev = 0 THEN 0.0
                ELSE CAST((tp3 * n - s3) * n AS DOUBLE)
                     / (0.015 * CAST(dev AS DOUBLE))
           END AS cci
    FROM stats
    """,
)
def q_cci(spark, sf_dir):
    """20-period Commodity Channel Index, computed EXACTLY:
    CCI = (tp − SMA(tp)) / (0.015 · meandev(tp)).

    The mean deviation averages |tp_i − SMA_t| — every window element
    against the CURRENT row's SMA — which no plain window aggregate of a
    precomputed column can express.  The trailing window is collected as
    a ≤20-element array and reduced with JVM higher-order functions.
    All arithmetic is integer until the last step: with tp3 = cents sum
    of (high, low, close) — tp·300 — the identity
    ``CCI = (tp3·n − Σtp3) · n / (0.015 · Σ|tp3ᵢ·n − Σtp3|)`` clears
    every fraction (|tp3| ≤ ~3·10⁷ cents ⇒ products ≤ ~10¹⁰, int64-safe
    at any corpus scale since n is the FIXED window width), so both
    engines divide the same two exact numbers — output emitted raw.
    Degenerate flat window (dev = 0) → 0.  Shrinking head (n < 20)
    keeps the same identity, mirroring the rolling-mean W3 convention.
    One symbol exchange; the array never exceeds 20 elements per row.
    """
    t = ticks(spark, sf_dir)
    tp3 = (
        F.round(F.col("high") * 100, 0).cast("long")
        + F.round(F.col("low") * 100, 0).cast("long")
        + F.round(F.col("close") * 100, 0).cast("long")
    )
    wf = _W().rowsBetween(-(_CCI_N - 1), 0)
    arr = t.select(
        "symbol", "date", "close", tp3.alias("tp3")
    ).withColumn("a", F.collect_list("tp3").over(wf))
    # n/s3 first, dev in a second projection REFERENCING them: a lambda
    # that re-derived the sum per element would be O(n²) per row (the
    # sf1 sweep measured it at ×4 for 10× rows; this form is O(n))
    stats = (
        arr.withColumn("n", F.size("a").cast("long"))
        .withColumn(
            "s3", F.expr("aggregate(a, 0L, (acc, x) -> acc + x)")
        )
        .withColumn(
            "dev",
            F.expr("aggregate(a, 0L, (acc, x) -> acc + abs(x * n - s3))"),
        )
    )
    cci = F.when(F.col("dev") == 0, F.lit(0.0)).otherwise(
        ((F.col("tp3") * F.col("n") - F.col("s3")) * F.col("n")).cast(
            "double"
        )
        / (F.lit(0.015) * F.col("dev").cast("double"))
    )
    return stats.select("symbol", "date", "close", cci.alias("cci"))


# ---------------------------------------------------------------------------
# Aroon (25) — pure-integer days-since-extreme via reversed window array
# ---------------------------------------------------------------------------

_AROON_N = 25


@register(
    f"aroon_{_AROON_N}",
    WITH_TICKS
    + f""",
    c AS (
        SELECT symbol, date, close,
               CAST(round(high * 100) AS BIGINT) AS hc,
               CAST(round(low * 100) AS BIGINT)  AS lc
        FROM ticks
    ),
    arr AS (
        SELECT symbol, date, close,
               list(hc) OVER w AS ha,
               list(lc) OVER w AS la
        FROM c
        WINDOW w AS (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN {_AROON_N} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date, close,
           CASE WHEN len(ha) = {_AROON_N + 1} THEN
               ({_AROON_N} - (list_position(list_reverse(ha),
                                 list_aggregate(ha, 'max')) - 1)) * 4
           END AS aroon_up,
           CASE WHEN len(la) = {_AROON_N + 1} THEN
               ({_AROON_N} - (list_position(list_reverse(la),
                                 list_aggregate(la, 'min')) - 1)) * 4
           END AS aroon_down
    FROM arr
    """,
)
def q_aroon(spark, sf_dir):
    """Aroon up/down (25): 100 · (25 − days since the 25-bar high/low)
    / 25 — which with N = 25 is the exact INTEGER (25 − d) · 4, so the
    whole indicator is integer arithmetic with no float policy needed.

    Days-since-extreme is an argmax-POSITION window question with no
    direct window function — but it needs no array either: the NATIVE
    window aggregate ``max(struct(value, rn))`` orders structs
    lexicographically, so its rn field IS the most-recent argmax (ties
    break to the larger rn = the standard most-recent-tie-wins
    convention); for the low the rn is negated so MIN also tie-breaks
    recent.  This replaced the r5 first-cut reversed-array scan
    (collect_list + reverse + array_position per row, interpreted
    higher-order functions): 7.3 s → 2.5 s at sf1, ×6.73 → ×1.4
    scaling, with bit-identical output against the unchanged
    list-based oracle.
    Integer equality only — no float compare.  Head rows with fewer
    than 26 bars emit NULL (talib convention).  One symbol exchange;
    row_number and both argmax windows share it."""
    t = ticks(spark, sf_dir)
    wf = _W().rowsBetween(-_AROON_N, 0)
    c = t.select(
        "symbol",
        "date",
        "close",
        F.round(F.col("high") * 100, 0).cast("long").alias("hc"),
        F.round(F.col("low") * 100, 0).cast("long").alias("lc"),
    ).withColumn("rn", F.row_number().over(_W()))
    arr = c.select(
        "symbol",
        "date",
        "close",
        "rn",
        F.count(F.lit(1)).over(wf).alias("n"),
        F.max(F.struct(F.col("hc"), F.col("rn"))).over(wf)["rn"].alias(
            "rn_hi"
        ),
        (
            -F.min(
                F.struct(F.col("lc"), (-F.col("rn")).alias("nrn"))
            ).over(wf)["nrn"]
        ).alias("rn_lo"),
    )
    full = _AROON_N + 1

    def _aroon(rn_ext):
        return F.when(
            F.col("n") == full,
            (F.lit(_AROON_N) - (F.col("rn") - rn_ext)).cast("int")
            * F.lit(4),
        )

    return arr.select(
        "symbol",
        "date",
        "close",
        _aroon(F.col("rn_hi")).alias("aroon_up"),
        _aroon(F.col("rn_lo")).alias("aroon_down"),
    )


# ---------------------------------------------------------------------------
# Robust (median/MAD) rolling anomaly detection — pure-integer
# ---------------------------------------------------------------------------

_ROB_N = 20   # trailing bars before current → 21-row window
_ROB_K = 3    # flag beyond 3 × MAD


@register(
    "robust_price_anomalies",
    WITH_TICKS
    + f""",
    c AS (
        SELECT symbol, date, close,
               CAST(round(close * 100) AS BIGINT) AS cc
        FROM ticks
    ),
    arr AS (
        SELECT symbol, date, close, cc,
               list_sort(list(cc) OVER (PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN {_ROB_N} PRECEDING AND CURRENT ROW)) AS s
        FROM c
    ),
    med AS (
        SELECT symbol, date, close, cc, s, len(s) AS n,
               CASE WHEN len(s) % 2 = 1 THEN 2 * s[(len(s) + 1) // 2]
                    ELSE s[len(s) // 2] + s[len(s) // 2 + 1]
               END AS med2
        FROM arr
    ),
    dev AS (
        SELECT symbol, date, close, cc, n, med2,
               abs(2 * cc - med2) AS dev2,
               list_sort(list_transform(s, v -> abs(2 * v - med2))) AS d
        FROM med
    ),
    mad AS (
        SELECT symbol, date, close, med2, dev2,
               CASE WHEN n % 2 = 1 THEN 2 * d[(n + 1) // 2]
                    ELSE d[n // 2] + d[n // 2 + 1]
               END AS mad4
        FROM dev
    )
    SELECT symbol, date, close,
           med2 / 200.0 AS rolling_median,
           mad4 / 400.0 AS rolling_mad,
           CASE WHEN mad4 > 0 THEN (2.0 * dev2) / mad4 END AS robust_score
    FROM mad
    WHERE (mad4 > 0 AND 2 * dev2 > {_ROB_K} * mad4)
       OR (mad4 = 0 AND dev2 > 0)
    """,
)
def q_robust_price_anomalies(spark, sf_dir):
    """Robust rolling anomaly detection: closes more than 3 rolling MADs
    from the trailing 21-bar rolling MEDIAN — the outlier-resistant
    complement to price_anomalies' mean/σ z-score (a single spike
    inflates σ and masks itself; it cannot move the median).

    PURE INTEGER end to end: cents are exact int64; the median is kept
    ×2 (odd n → 2·mid, even n → sum of the two mids — no halves), the
    MAD ×4, and the flag predicate cross-multiplies to
    ``2·dev2 > k·mad4`` — so the flag decision is integer-exact and the
    emitted score/median/MAD are single divisions of identical
    integers (raw).  A flat window (MAD = 0) flags ANY deviation, the
    standard degenerate-case convention.  Median-of-window is a third
    current-row-relative window question (rank WITHIN the current
    frame): the PRICE median rides the native ``percentile`` window
    aggregate (whole-stage-codegen'd, no array; its (a+b)/2
    interpolation over ints is exactly med2/2, so ×2 recovers the exact
    integer), and only the DEVIATION median — whose input depends on
    the current row's med2 — needs the CCI/Aroon window-array pattern
    (one transform + one sort over ≤21 elements; higher-order functions
    evaluate interpreted, so dropping the first sort + the per-element
    median re-derivation took the query 21.7 s → 3.4 s at sf0.1 and
    ×2.79 → ×1.64 at sf1, measured in the r5 sweep).  One symbol
    exchange, no self-join, bounded per-row work at any corpus scale.
    """
    t = ticks(spark, sf_dir)
    wf = _W().rowsBetween(-_ROB_N, 0)
    arr = (
        t.select(
            "symbol",
            "date",
            "close",
            F.round(F.col("close") * 100, 0).cast("long").alias("cc"),
        )
        .withColumn("a", F.collect_list("cc").over(wf))
        .withColumn(
            "med2",
            F.round(F.expr("percentile(cc, 0.5)").over(wf) * 2, 0).cast(
                "long"
            ),
        )
    )
    med = arr.withColumn("n", F.size("a"))
    dev = med.withColumn("dev2", F.abs(2 * F.col("cc") - F.col("med2"))).withColumn(
        "d", F.expr("array_sort(transform(a, v -> abs(2 * v - med2)))")
    )
    mad = dev.withColumn(
        "mad4",
        F.expr(
            "CASE WHEN n % 2 = 1"
            " THEN 2 * element_at(d, CAST((n + 1) div 2 AS INT))"
            " ELSE element_at(d, CAST(n div 2 AS INT))"
            " + element_at(d, CAST(n div 2 + 1 AS INT)) END"
        ).cast("long"),
    )
    return (
        mad.filter(
            ((F.col("mad4") > 0) & (2 * F.col("dev2") > _ROB_K * F.col("mad4")))
            | ((F.col("mad4") == 0) & (F.col("dev2") > 0))
        )
        .select(
            "symbol",
            "date",
            "close",
            (F.col("med2") / 200.0).alias("rolling_median"),
            (F.col("mad4") / 400.0).alias("rolling_mad"),
            F.when(
                F.col("mad4") > 0, (2.0 * F.col("dev2")) / F.col("mad4")
            ).alias("robust_score"),
        )
    )


# ---------------------------------------------------------------------------
# Money Flow Index (14) — volume-weighted RSI
# ---------------------------------------------------------------------------

_MFI_N = 14


@register(
    f"mfi_{_MFI_N}",
    WITH_TICKS
    + f""",
    tp AS (
        SELECT symbol, date, volume,
               CAST(round(high * 100) AS BIGINT)
               + CAST(round(low * 100) AS BIGINT)
               + CAST(round(close * 100) AS BIGINT) AS tp3
        FROM ticks
    ),
    flow AS (
        SELECT symbol, date,
               CASE WHEN tp3 > LAG(tp3) OVER w THEN tp3 * volume
                    ELSE 0 END AS pos_mf,
               CASE WHEN tp3 < LAG(tp3) OVER w THEN tp3 * volume
                    ELSE 0 END AS neg_mf,
               CASE WHEN LAG(tp3) OVER w IS NULL THEN NULL ELSE 1 END
                   AS has_prev
        FROM tp
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    ),
    agg AS (
        SELECT symbol, date,
               CAST(SUM(pos_mf) OVER wf AS BIGINT) AS pos_sum,
               CAST(SUM(neg_mf) OVER wf AS BIGINT) AS neg_sum,
               CAST(COUNT(has_prev) OVER wf AS BIGINT) AS n_flows
        FROM flow
        WINDOW wf AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN {_MFI_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date,
           CASE WHEN n_flows >= {_MFI_N} AND pos_sum + neg_sum > 0
                THEN CAST(100 * pos_sum AS DOUBLE) / (pos_sum + neg_sum)
           END AS mfi
    FROM agg
    """,
)
def q_mfi(spark, sf_dir):
    """Money Flow Index (14): the volume-weighted RSI — 100·ΣposMF /
    (ΣposMF + ΣnegMF) over a 14-day frame, where a day's raw money flow
    (typical price × volume) counts as positive/negative by comparison
    with the PREVIOUS day's typical price (unchanged days count neither,
    the classic definition).

    Exactness: typical price rides as ×3 integer cents (hc+lc+cc — never
    /3, which would leave the integer grid); money flow tp3·volume is
    int64 (≈3e7 cents · 1e6 volume · 14 days ≈ 4e14 ≪ 2⁶³ at any
    plausible per-key day volume); the single closing division converts
    two exactly-representable ints (< 2⁵³) — bit-identical cross-engine,
    emitted raw. Rows without a full 14-flow frame or with zero total
    flow are NULL (head warm-up, constant stretches).

    Plan: both windows (the direction lag, the 14-row frame) share ONE
    HashPartitioning(symbol) exchange; bounded frames, no whole-partition
    buffering. Reference src/transform.py has RSI (registry_fin.q_rsi);
    MFI is its volume-weighted sibling users chart beside it.
    """
    t = ticks(spark, sf_dir)
    w = _W()
    tp3 = (
        F.round(F.col("high") * 100, 0).cast("long")
        + F.round(F.col("low") * 100, 0).cast("long")
        + F.round(F.col("close") * 100, 0).cast("long")
    )
    base = t.select("symbol", "date", "volume", tp3.alias("tp3"))
    prev = F.lag("tp3").over(w)
    flow = base.select(
        "symbol",
        "date",
        F.when(F.col("tp3") > prev, F.col("tp3") * F.col("volume"))
        .otherwise(F.lit(0))
        .alias("pos_mf"),
        F.when(F.col("tp3") < prev, F.col("tp3") * F.col("volume"))
        .otherwise(F.lit(0))
        .alias("neg_mf"),
        F.when(prev.isNull(), F.lit(None)).otherwise(F.lit(1)).alias(
            "has_prev"
        ),
    )
    wf = _W().rowsBetween(-(_MFI_N - 1), 0)
    agg = flow.select(
        "symbol",
        "date",
        F.sum("pos_mf").over(wf).alias("pos_sum"),
        F.sum("neg_mf").over(wf).alias("neg_sum"),
        F.count("has_prev").over(wf).alias("n_flows"),
    )
    return agg.select(
        "symbol",
        "date",
        F.when(
            (F.col("n_flows") >= _MFI_N)
            & (F.col("pos_sum") + F.col("neg_sum") > 0),
            (100 * F.col("pos_sum")).cast("double")
            / (F.col("pos_sum") + F.col("neg_sum")),
        ).alias("mfi"),
    )


# ---------------------------------------------------------------------------
# Force Index (SMA-13 smoothed)
# ---------------------------------------------------------------------------

_FI_N = 13


@register(
    f"force_index_{_FI_N}",
    WITH_TICKS
    + f""",
    fi AS (
        SELECT symbol, date,
               (CAST(round(close * 100) AS BIGINT)
                - LAG(CAST(round(close * 100) AS BIGINT)) OVER w) * volume
                   AS fi_cents
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    )
    SELECT symbol, date,
           CAST(fi_cents AS BIGINT) / 100.0 AS force_index,
           CASE WHEN COUNT(fi_cents) OVER wf > 0
                THEN CAST(SUM(fi_cents) OVER wf AS BIGINT)
                     / (100.0 * COUNT(fi_cents) OVER wf)
           END AS force_index_sma
    FROM fi
    WINDOW wf AS (PARTITION BY symbol ORDER BY date
                  ROWS BETWEEN {_FI_N - 1} PRECEDING AND CURRENT ROW)
    """,
)
def q_force_index(spark, sf_dir):
    """Force Index: (close − prev close) × volume — the price-move ×
    participation oscillator — plus its 13-day SMA (the smoothed variant;
    Elder's original uses EMA-13, the SMA form is the common charting
    default and keeps the arithmetic exact without the integer-weight
    convolution machinery macd_12_26 needs).

    Exactness: the move is exact integer cents, ×volume stays int64;
    both outputs close with ONE double division each (Σcents/(100·n) is
    the avg_cents rule). Head row's force_index is NULL (no prev close);
    the SMA shrinks over the warm-up like the enrich spine's ma_5/ma_20.

    Plan: lag window and SMA frame share one HashPartitioning(symbol)
    exchange; bounded frame, linear at any scale.
    """
    t = ticks(spark, sf_dir)
    w = _W()
    cc = F.round(F.col("close") * 100, 0).cast("long")
    fi = t.select(
        "symbol",
        "date",
        ((cc - F.lag(cc).over(w)) * F.col("volume")).alias("fi_cents"),
    )
    wf = _W().rowsBetween(-(_FI_N - 1), 0)
    return fi.select(
        "symbol",
        "date",
        (F.col("fi_cents").cast("bigint") / 100.0).alias("force_index"),
        F.when(
            F.count("fi_cents").over(wf) > 0,
            F.sum("fi_cents").over(wf).cast("bigint")
            / (100.0 * F.count("fi_cents").over(wf)),
        ).alias("force_index_sma"),
    )


# ---------------------------------------------------------------------------
# Ichimoku cloud
# ---------------------------------------------------------------------------

_ICH_TENKAN, _ICH_KIJUN, _ICH_SENKOU = 9, 26, 52


@register(
    "ichimoku_cloud",
    WITH_TICKS
    + f""",
    bands AS (
        SELECT symbol, date, close,
               (MAX(high) OVER w9 + MIN(low) OVER w9) / 2.0   AS tenkan,
               (MAX(high) OVER w26 + MIN(low) OVER w26) / 2.0 AS kijun,
               (MAX(high) OVER w52 + MIN(low) OVER w52) / 2.0 AS senkou_raw
        FROM ticks
        WINDOW w9 AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN {_ICH_TENKAN - 1} PRECEDING AND CURRENT ROW),
               w26 AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN {_ICH_KIJUN - 1} PRECEDING AND CURRENT ROW),
               w52 AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN {_ICH_SENKOU - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date, close, tenkan, kijun,
           LAG((tenkan + kijun) / 2.0, {_ICH_KIJUN}) OVER w AS senkou_a,
           LAG(senkou_raw, {_ICH_KIJUN}) OVER w             AS senkou_b,
           LEAD(close, {_ICH_KIJUN}) OVER w                 AS chikou
    FROM bands
    WINDOW w AS (PARTITION BY symbol ORDER BY date)
    """,
)
def q_ichimoku(spark, sf_dir):
    """Ichimoku cloud: tenkan (9-row midline), kijun (26), senkou A
    ((tenkan+kijun)/2 displaced 26 forward — i.e. row t shows the value
    computed at t−26), senkou B (52-row midline displaced 26), chikou
    (close displaced 26 BACKWARD = lead). Head warm-up uses shrinking
    envelopes like donchian_20; the displaced columns are NULL until the
    lag/lead exists — the cloud's plotted shape, stated as offsets.

    Float parity: every value is built from order-insensitive MIN/MAX
    selections of existing doubles closed by single adds and divides
    with IDENTICAL parenthesization on both sides — no multiply-add
    chain, so no FMA-contraction risk (NOTES rule 11), no rounding
    applied or needed.

    Plan: all five windows (three frames + displacement lag/lead) are on
    one HashPartitioning(symbol) ordered by date — ONE exchange, ONE
    sort; frames are bounded (≤52 rows of running min/max state).
    """
    t = ticks(spark, sf_dir)
    w9 = _W().rowsBetween(-(_ICH_TENKAN - 1), 0)
    w26 = _W().rowsBetween(-(_ICH_KIJUN - 1), 0)
    w52 = _W().rowsBetween(-(_ICH_SENKOU - 1), 0)
    bands = t.select(
        "symbol", "date", "close",
        ((F.max("high").over(w9) + F.min("low").over(w9)) / 2.0).alias(
            "tenkan"
        ),
        ((F.max("high").over(w26) + F.min("low").over(w26)) / 2.0).alias(
            "kijun"
        ),
        ((F.max("high").over(w52) + F.min("low").over(w52)) / 2.0).alias(
            "senkou_raw"
        ),
    )
    w = _W()
    return bands.select(
        "symbol", "date", "close", "tenkan", "kijun",
        F.lag((F.col("tenkan") + F.col("kijun")) / 2.0, _ICH_KIJUN)
        .over(w)
        .alias("senkou_a"),
        F.lag("senkou_raw", _ICH_KIJUN).over(w).alias("senkou_b"),
        F.lead("close", _ICH_KIJUN).over(w).alias("chikou"),
    )

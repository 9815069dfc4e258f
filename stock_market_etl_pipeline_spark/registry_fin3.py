"""Finance time-series indicators, part 3: Chaikin Money Flow, Ultimate
Oscillator, DMI/DX, Vortex, floor pivot points.

Continues ``registry_fin.py`` / ``registry_fin2.py`` (reference
indicator surface: ``src/transform.py`` moving averages / volatility
beside RSI) with five more chart-standard indicators. No new plan
shapes — every query is bounded trailing frames on ONE
HashPartitioning(symbol) exchange — but two exactness techniques recur:

- **Range sums stay on the integer cents grid** (NOTES rule 10/11):
  true range, directional movement, vortex movement and pivot bases are
  differences of ``round(price*100)`` int64 cents, window-summed
  exactly; each indicator closes with ONE double division of identical
  ints (bit-exact cross-engine, emitted raw).
- **The Ultimate Oscillator's three-timeframe weighted average of
  ratios** cannot be closed by one division — so the fractions are
  cleared over the common denominator t7·t14·t28 in DECIMAL(38)
  (Spark) / HUGEINT (DuckDB): ≤ ~2·10²⁶ ≪ 10³⁸, far beyond int64 but
  exact in both engines, and the final value is a single
  multiply+divide of the two correctly-rounded decimal→double casts —
  identical, emitted raw. This is macd_12_26's clear-the-denominator
  idea applied across THREE window widths.

CMF is the one float-summation indicator here: money-flow volume is a
per-row exact ratio scaled by volume, but its 20-row window SUM is
order-sensitive (Spark iterates the frame, DuckDB merges a segment
tree), so the final O(1) ratio is rounded 6dp on both sides per the
oracles.py policy — same treatment as the enrich spine's window AVGs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import register
from .sources.ticks import ticks

_W = lambda: Window.partitionBy("symbol").orderBy("date")  # noqa: E731

# Shared cents projections (the cci_20/mfi_14 idiom). Built lazily —
# Columns can't be constructed at import time (no active SparkContext
# when the registry package loads under the driver).
_HC = lambda: F.round(F.col("high") * 100, 0).cast("long")  # noqa: E731
_LC = lambda: F.round(F.col("low") * 100, 0).cast("long")  # noqa: E731
_CC = lambda: F.round(F.col("close") * 100, 0).cast("long")  # noqa: E731

_CENTS_SQL = """
    c AS (
        SELECT symbol, date, volume,
               CAST(round(high  * 100) AS BIGINT) AS hc,
               CAST(round(low   * 100) AS BIGINT) AS lc,
               CAST(round(close * 100) AS BIGINT) AS cc
        FROM ticks
    )"""


# ---------------------------------------------------------------------------
# Chaikin Money Flow (20)
# ---------------------------------------------------------------------------

_CMF_N = 20


@register(
    f"cmf_{_CMF_N}",
    WITH_TICKS
    + ","
    + _CENTS_SQL
    + f""",
    mf AS (
        SELECT symbol, date, volume,
               CASE WHEN hc > lc
                    THEN CAST((2*cc - hc - lc) * volume AS DOUBLE)
                         / CAST(hc - lc AS DOUBLE)
                    ELSE 0.0 END AS mfv
        FROM c
    )
    SELECT symbol, date,
           ROUND(SUM(mfv) OVER w
                 / CAST(CAST(SUM(volume) OVER w AS BIGINT) AS DOUBLE),
                 6) AS cmf
    FROM mf
    WINDOW w AS (PARTITION BY symbol ORDER BY date
                 ROWS BETWEEN {_CMF_N - 1} PRECEDING AND CURRENT ROW)
    """,
)
def q_cmf(spark, sf_dir):
    """20-period Chaikin Money Flow: ΣMFV / Σvolume where MFV =
    close-location value · volume, CLV = ((close−low)−(high−close)) /
    (high−low) = (2c−h−l)/(h−l).

    The per-row MFV is exact — an int64 numerator (2c−h−l cents ·
    volume) over an int64 denominator, one correctly-rounded division —
    but the 20-row float SUM is order-sensitive across engines, so the
    closing ratio (O(1) by construction: |CLV| ≤ 1) is rounded 6dp on
    both sides. Flat bars (high == low) contribute 0, the standard
    convention. Shrinking head like the W3 rolling mean. One symbol
    exchange, bounded frame."""
    t = ticks(spark, sf_dir)
    c = t.select(
        "symbol", "date", "volume",
        _HC().alias("hc"), _LC().alias("lc"), _CC().alias("cc"),
    )
    mfv = F.when(
        F.col("hc") > F.col("lc"),
        ((2 * F.col("cc") - F.col("hc") - F.col("lc")) * F.col("volume"))
        .cast("double") / (F.col("hc") - F.col("lc")).cast("double"),
    ).otherwise(F.lit(0.0))
    wf = _W().rowsBetween(-(_CMF_N - 1), 0)
    mf = c.select("symbol", "date", "volume", mfv.alias("mfv"))
    return mf.select(
        "symbol", "date",
        F.round(
            F.sum("mfv").over(wf)
            / F.sum("volume").over(wf).cast("double"),
            6,
        ).alias("cmf"),
    )


# ---------------------------------------------------------------------------
# Ultimate Oscillator (7/14/28)
# ---------------------------------------------------------------------------


@register(
    "ultimate_oscillator",
    WITH_TICKS
    + ","
    + _CENTS_SQL
    + """,
    tr AS (
        SELECT symbol, date,
               cc - LEAST(lc, LAG(cc) OVER w)                       AS bp,
               GREATEST(hc, LAG(cc) OVER w)
                   - LEAST(lc, LAG(cc) OVER w)                      AS tr
        FROM c
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    ),
    s AS (
        SELECT symbol, date,
               CAST(SUM(bp) OVER w7  AS BIGINT) AS b7,
               CAST(SUM(tr) OVER w7  AS BIGINT) AS t7,
               CAST(SUM(bp) OVER w14 AS BIGINT) AS b14,
               CAST(SUM(tr) OVER w14 AS BIGINT) AS t14,
               CAST(SUM(bp) OVER w28 AS BIGINT) AS b28,
               CAST(SUM(tr) OVER w28 AS BIGINT) AS t28,
               COUNT(tr)    OVER w28            AS n28
        FROM tr
        WINDOW w7  AS (PARTITION BY symbol ORDER BY date
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
               w14 AS (PARTITION BY symbol ORDER BY date
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
               w28 AS (PARTITION BY symbol ORDER BY date
                       ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date,
           CASE WHEN n28 = 28 AND t7 > 0 AND t14 > 0 AND t28 > 0
                THEN CAST((4 * CAST(b7 AS HUGEINT) * t14 * t28
                           + 2 * CAST(b14 AS HUGEINT) * t7 * t28
                           + CAST(b28 AS HUGEINT) * t7 * t14)
                          * 100000000000
                          // (7 * CAST(t7 AS HUGEINT) * t14 * t28)
                          AS BIGINT) / 1e9
           END AS uo
    FROM s
    """,
)
def q_ultimate_oscillator(spark, sf_dir):
    """Ultimate Oscillator: 100 · (4·Σ₇BP/Σ₇TR + 2·Σ₁₄BP/Σ₁₄TR +
    Σ₂₈BP/Σ₂₈TR) / 7, with buying pressure BP = close − min(low,
    prev_close) and true range TR = max(high, prev_close) − min(low,
    prev_close).

    Exactness: BP/TR are int64 cents differences, window-summed
    exactly; the three ratios are cleared over the common denominator
    7·t7·t14·t28 in DECIMAL(38)/HUGEINT (≤ ~2·10²⁶ — overflows int64,
    exact in both engines' wide type), and the closure QUANTIZES at
    1e-9 via exact truncating integer division (num·10¹¹ div den, then
    /1e9 — NOTES rule 13: mid-range TR products land in the
    [2⁶⁴, 2⁷⁶] window where DuckDB's wide→double cast double-rounds, so
    no wide integer may cross the double boundary). First-bar
    convention: GREATEST/LEAST skip the NULL previous close, giving
    TR₁ = H₁ − L₁ and BP₁ = C₁ − L₁ (the classic seed), so the warm-up
    is simply the first 27 bars per symbol (NULL), plus a NULL guard on
    zero TR sums (degenerate flat month). Plan: the lag and the three
    frames all ride one symbol exchange."""
    t = ticks(spark, sf_dir)
    w = _W()
    c = t.select(
        "symbol", "date",
        _HC().alias("hc"), _LC().alias("lc"), _CC().alias("cc"),
    )
    pc = F.lag("cc").over(w)
    tr = c.select(
        "symbol", "date",
        (F.col("cc") - F.least(F.col("lc"), pc)).alias("bp"),
        (F.greatest("hc", pc) - F.least("lc", pc)).alias("tr"),
    )
    w7 = _W().rowsBetween(-6, 0)
    w14 = _W().rowsBetween(-13, 0)
    w28 = _W().rowsBetween(-27, 0)
    s = tr.select(
        "symbol", "date",
        F.sum("bp").over(w7).alias("b7"),
        F.sum("tr").over(w7).alias("t7"),
        F.sum("bp").over(w14).alias("b14"),
        F.sum("tr").over(w14).alias("t14"),
        F.sum("bp").over(w28).alias("b28"),
        F.sum("tr").over(w28).alias("t28"),
        F.count("tr").over(w28).alias("n28"),
    )
    d38 = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    num = (
        4 * d38("b7") * d38("t14") * d38("t28")
        + 2 * d38("b14") * d38("t7") * d38("t28")
        + d38("b28") * d38("t7") * d38("t14")
    )
    den = 7 * d38("t7") * d38("t14") * d38("t28")
    pre = s.select(
        "symbol", "date", "n28", "t7", "t14", "t28",
        (num * F.lit(100000000000).cast("decimal(38,0)")).alias("numq"),
        den.alias("den"),
    )
    uo = F.when(
        (F.col("n28") == 28)
        & (F.col("t7") > 0) & (F.col("t14") > 0) & (F.col("t28") > 0),
        F.expr("numq div den").cast("double") / F.lit(1e9),
    )
    return pre.select("symbol", "date", uo.alias("uo"))


# ---------------------------------------------------------------------------
# Directional Movement (14): +DI / -DI / DX
# ---------------------------------------------------------------------------

_DMI_N = 14


@register(
    f"dmi_{_DMI_N}",
    WITH_TICKS
    + ","
    + _CENTS_SQL
    + f""",
    dm AS (
        SELECT symbol, date,
               CASE WHEN hc - LAG(hc) OVER w > LAG(lc) OVER w - lc
                         AND hc - LAG(hc) OVER w > 0
                    THEN hc - LAG(hc) OVER w ELSE 0 END             AS pdm,
               CASE WHEN LAG(lc) OVER w - lc > hc - LAG(hc) OVER w
                         AND LAG(lc) OVER w - lc > 0
                    THEN LAG(lc) OVER w - lc ELSE 0 END             AS mdm,
               GREATEST(hc, LAG(cc) OVER w)
                   - LEAST(lc, LAG(cc) OVER w)                      AS tr
        FROM c
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    ),
    s AS (
        SELECT symbol, date,
               CAST(SUM(pdm) OVER wf AS BIGINT) AS sp,
               CAST(SUM(mdm) OVER wf AS BIGINT) AS sm,
               CAST(SUM(tr)  OVER wf AS BIGINT) AS st,
               COUNT(tr)     OVER wf            AS n
        FROM dm
        WINDOW wf AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN {_DMI_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date,
           CASE WHEN n = {_DMI_N} AND st > 0
                THEN CAST(100 * sp AS DOUBLE) / st END AS plus_di,
           CASE WHEN n = {_DMI_N} AND st > 0
                THEN CAST(100 * sm AS DOUBLE) / st END AS minus_di,
           CASE WHEN n = {_DMI_N} AND sp + sm > 0
                THEN CAST(100 * ABS(sp - sm) AS DOUBLE) / (sp + sm)
           END AS dx
    FROM s
    """,
)
def q_dmi(spark, sf_dir):
    """Directional movement (14, SMA form): +DI = 100·Σ+DM/ΣTR,
    −DI = 100·Σ−DM/ΣTR, DX = 100·|Σ+DM − Σ−DM| / (Σ+DM + Σ−DM) — the
    last identity because the ΣTR denominators cancel, so DX needs no
    true range at all.

    First-bar conventions: ±DM count as 0 (the NULL comparison falls to
    the ELSE branch in both engines) and TR₁ = H₁ − L₁ — GREATEST/LEAST
    skip the NULL previous close, which IS the classic first-bar true
    range.

    Wilder's recursive smoothing has infinite memory (inexpressible as
    a bounded window — the same reason macd uses the talib NULL-head
    convolution form); the 14-row arithmetic sum is the standard
    non-recursive variant. All movements are int64 cents; each output is
    one division of exact ints, emitted raw. NULL until 14 complete
    flows; zero denominators → NULL (flat fortnight). One symbol
    exchange shared by the lags and the frame."""
    t = ticks(spark, sf_dir)
    w = _W()
    c = t.select(
        "symbol", "date",
        _HC().alias("hc"), _LC().alias("lc"), _CC().alias("cc"),
    )
    up = F.col("hc") - F.lag("hc").over(w)
    dn = F.lag("lc").over(w) - F.col("lc")
    pc = F.lag("cc").over(w)
    dm = c.select(
        "symbol", "date",
        F.when((up > dn) & (up > 0), up).otherwise(F.lit(0)).alias("pdm"),
        F.when((dn > up) & (dn > 0), dn).otherwise(F.lit(0)).alias("mdm"),
        (F.greatest("hc", pc) - F.least("lc", pc)).alias("tr"),
    )
    wf = _W().rowsBetween(-(_DMI_N - 1), 0)
    s = dm.select(
        "symbol", "date",
        F.sum("pdm").over(wf).alias("sp"),
        F.sum("mdm").over(wf).alias("sm"),
        F.sum("tr").over(wf).alias("st"),
        F.count("tr").over(wf).alias("n"),
    )
    full = F.col("n") == _DMI_N
    return s.select(
        "symbol", "date",
        F.when(full & (F.col("st") > 0),
               (100 * F.col("sp")).cast("double") / F.col("st"))
        .alias("plus_di"),
        F.when(full & (F.col("st") > 0),
               (100 * F.col("sm")).cast("double") / F.col("st"))
        .alias("minus_di"),
        F.when(full & (F.col("sp") + F.col("sm") > 0),
               (100 * F.abs(F.col("sp") - F.col("sm"))).cast("double")
               / (F.col("sp") + F.col("sm")))
        .alias("dx"),
    )


# ---------------------------------------------------------------------------
# Vortex Indicator (14)
# ---------------------------------------------------------------------------

_VI_N = 14


@register(
    f"vortex_{_VI_N}",
    WITH_TICKS
    + ","
    + _CENTS_SQL
    + f""",
    vm AS (
        SELECT symbol, date,
               ABS(hc - LAG(lc) OVER w)                             AS vmp,
               ABS(lc - LAG(hc) OVER w)                             AS vmm,
               GREATEST(hc, LAG(cc) OVER w)
                   - LEAST(lc, LAG(cc) OVER w)                      AS tr
        FROM c
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    ),
    s AS (
        SELECT symbol, date,
               CAST(SUM(vmp) OVER wf AS BIGINT) AS sp,
               CAST(SUM(vmm) OVER wf AS BIGINT) AS sm,
               CAST(SUM(tr)  OVER wf AS BIGINT) AS st,
               COUNT(vmp)    OVER wf            AS n
        FROM vm
        WINDOW wf AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN {_VI_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, date,
           CASE WHEN n = {_VI_N} AND st > 0
                THEN CAST(sp AS DOUBLE) / st END AS vi_plus,
           CASE WHEN n = {_VI_N} AND st > 0
                THEN CAST(sm AS DOUBLE) / st END AS vi_minus
    FROM s
    """,
)
def q_vortex(spark, sf_dir):
    """Vortex indicator (14): VI+ = Σ|high_t − low_{t−1}| / ΣTR and
    VI− = Σ|low_t − high_{t−1}| / ΣTR — crossing VI+/VI− lines signal
    trend reversals; users chart it beside the DMI family.

    Same exactness shape as dmi_14: vortex movements are absolute int64
    cents differences, the 14-row sums are exact, each output is one
    division, raw. The warm-up counts COMPLETE vortex movements (vmp
    needs a previous bar), so the first emitted value's frame holds
    exactly 14 defined (vm, tr) pairs — TR₁'s bar-range value never
    mixes into a ratio whose numerator skipped it."""
    t = ticks(spark, sf_dir)
    w = _W()
    c = t.select(
        "symbol", "date",
        _HC().alias("hc"), _LC().alias("lc"), _CC().alias("cc"),
    )
    pc = F.lag("cc").over(w)
    vm = c.select(
        "symbol", "date",
        F.abs(F.col("hc") - F.lag("lc").over(w)).alias("vmp"),
        F.abs(F.col("lc") - F.lag("hc").over(w)).alias("vmm"),
        (F.greatest("hc", pc) - F.least("lc", pc)).alias("tr"),
    )
    wf = _W().rowsBetween(-(_VI_N - 1), 0)
    s = vm.select(
        "symbol", "date",
        F.sum("vmp").over(wf).alias("sp"),
        F.sum("vmm").over(wf).alias("sm"),
        F.sum("tr").over(wf).alias("st"),
        # count COMPLETE vortex movements (vmp needs a previous bar; tr
        # alone is defined from bar 1 via the greatest/least null-skip)
        F.count("vmp").over(wf).alias("n"),
    )
    ok = (F.col("n") == _VI_N) & (F.col("st") > 0)
    return s.select(
        "symbol", "date",
        F.when(ok, F.col("sp").cast("double") / F.col("st")).alias("vi_plus"),
        F.when(ok, F.col("sm").cast("double") / F.col("st")).alias("vi_minus"),
    )


# ---------------------------------------------------------------------------
# Floor-trader pivot points
# ---------------------------------------------------------------------------


@register(
    "pivot_points",
    WITH_TICKS
    + ","
    + _CENTS_SQL
    + """,
    prev AS (
        SELECT symbol, date,
               LAG(hc) OVER w AS ph,
               LAG(lc) OVER w AS pl,
               LAG(cc) OVER w AS pc
        FROM c
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    )
    SELECT symbol, date,
           CAST(ph + pl + pc AS DOUBLE) / 300.0                   AS pivot,
           CAST(2*(ph + pl + pc) - 3*pl AS DOUBLE) / 300.0        AS r1,
           CAST(2*(ph + pl + pc) - 3*ph AS DOUBLE) / 300.0        AS s1,
           CAST(ph + pl + pc + 3*ph - 3*pl AS DOUBLE) / 300.0     AS r2,
           CAST(ph + pl + pc - 3*ph + 3*pl AS DOUBLE) / 300.0     AS s2
    FROM prev
    """,
)
def q_pivot_points(spark, sf_dir):
    """Classic floor-trader pivots from the PREVIOUS bar: P = (H+L+C)/3,
    R1 = 2P − L, S1 = 2P − H, R2 = P + (H − L), S2 = P − (H − L).

    Every level is algebraically a rational with denominator 300 over
    the previous bar's cents — e.g. R1 = (2(H+L+C) − 3L)·cents/300 — so
    each output is ONE division of an int64 numerator: bit-exact raw,
    with no 2P−L float chain for FMA contraction to perturb (NOTES rule
    11). First bar per symbol is NULL (no previous session). One lag,
    one symbol exchange."""
    t = ticks(spark, sf_dir)
    w = _W()
    c = t.select(
        "symbol", "date",
        _HC().alias("hc"), _LC().alias("lc"), _CC().alias("cc"),
    )
    prev = c.select(
        "symbol", "date",
        F.lag("hc").over(w).alias("ph"),
        F.lag("lc").over(w).alias("pl"),
        F.lag("cc").over(w).alias("pc"),
    )
    base = F.col("ph") + F.col("pl") + F.col("pc")
    div = lambda e: e.cast("double") / F.lit(300.0)  # noqa: E731
    return prev.select(
        "symbol", "date",
        div(base).alias("pivot"),
        div(2 * base - 3 * F.col("pl")).alias("r1"),
        div(2 * base - 3 * F.col("ph")).alias("s1"),
        div(base + 3 * F.col("ph") - 3 * F.col("pl")).alias("r2"),
        div(base - 3 * F.col("ph") + 3 * F.col("pl")).alias("s2"),
    )

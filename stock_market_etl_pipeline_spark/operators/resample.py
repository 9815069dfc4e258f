"""Calendar gap-filling with forward-fill (time-series resampling).

Market series have holes (weekends, halts); downstream features that
assume a dense date axis need gap rows synthesized and carried values
forward. Plan shape: per-key bounds → exploded date sequence → left join
back → `last(ignorenulls)` running window. All of it shares ONE hash
partitioning on the key; the only data growth is the calendar rows
(bounded by days-per-key, not data size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calendar_fill(
    df: DataFrame,
    key: str = "symbol",
    date_col: str = "date",
    fill_cols: tuple[str, ...] = ("close",),
    keep_cols: tuple[str, ...] = ("volume",),
) -> DataFrame:
    """Densify each key's date range to every calendar day; forward-fill
    fill_cols from the most recent real row; keep_cols pass through as
    null on synthesized rows. Adds ``is_gap`` marking synthesized rows.
    """
    bounds = df.groupBy(key).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    calendar = bounds.select(
        key,
        F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias(date_col),
    )
    joined = calendar.join(df, [key, date_col], "left")
    w = (
        Window.partitionBy(key)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn(
        "is_gap", F.col(fill_cols[0]).isNull()
    )
    for c in fill_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.select(key, date_col, *fill_cols, *keep_cols, "is_gap")


def calendar_interpolate(
    df: DataFrame,
    key: str = "symbol",
    date_col: str = "date",
    value_col: str = "close",
) -> DataFrame:
    """Densify each key's date range and LINEARLY interpolate
    ``value_col`` across gaps — the time-series repair step where
    forward-fill's step function biases downstream returns/volatility
    (a 3-day gap becomes two zero-returns and one jump; interpolation
    spreads the move). Trailing gaps (no later real row) fall back to
    forward-fill; leading gaps cannot exist (the range starts at the
    key's first real row). Adds ``is_gap``.

    Exactness: with integer cents p (previous real value), q (next),
    gap position k of n days, the interpolated value is the single
    division (p·n + (q−p)·k) / (100·n) — an exact int64 numerator, so
    both engines produce the identical double. Real rows pass through
    untouched.

    Plan: same shape as :func:`calendar_fill` — bounds aggregate,
    calendar explode (growth bounded by days-per-key), one key
    exchange serving both direction windows."""
    bounds = df.groupBy(key).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    calendar = bounds.select(
        key,
        F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias(date_col),
    )
    joined = calendar.join(
        df.select(key, date_col, value_col), [key, date_col], "left"
    )
    real_c = F.when(
        F.col(value_col).isNotNull(),
        F.round(F.col(value_col) * 100, 0).cast("long"),
    )
    real_d = F.when(F.col(value_col).isNotNull(), F.col(date_col))
    wp = (
        Window.partitionBy(key)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next real value" = FIRST ignore-nulls over [current, unbounded
    # FOLLOWING] — but Spark executes an UnboundedFollowing frame by
    # rescanning current→end for EVERY row: O(rows²) per partition
    # (measured 69.6 s at sf0.1 vs gap_fill_forward's 1.9 s — the r8
    # sweep's worst absolute cost). The mirror formulation — running
    # LAST ignore-nulls over the DESCENDING order with an
    # [unboundedPreceding, current] frame — is the O(rows) streaming
    # RunningWindowFrame and computes the identical value (69.6 → 2.0 s).
    wn = (
        Window.partitionBy(key)
        .orderBy(F.col(date_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = joined.select(
        key, date_col, value_col,
        F.last(real_c, ignorenulls=True).over(wp).alias("__pc"),
        F.last(real_d, ignorenulls=True).over(wp).alias("__pd"),
        F.last(real_c, ignorenulls=True).over(wn).alias("__nc"),
        F.last(real_d, ignorenulls=True).over(wn).alias("__nd"),
    )
    k = F.datediff(F.col(date_col), F.col("__pd"))
    n = F.datediff(F.col("__nd"), F.col("__pd"))
    interp = (
        F.col("__pc") * n + (F.col("__nc") - F.col("__pc")) * k
    ) / (F.lit(100.0) * n)
    return x.select(
        key, date_col,
        F.when(F.col(value_col).isNotNull(), F.col(value_col))
        .when(F.col("__nc").isNull(), F.col("__pc") / F.lit(100.0))
        .otherwise(interp)
        .alias(value_col),
        F.col(value_col).isNull().alias("is_gap"),
    )

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

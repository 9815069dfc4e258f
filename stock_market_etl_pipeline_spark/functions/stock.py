"""Stock-domain scalar expressions as native Columns (no Python UDFs).

Each function mirrors a reference formula (file:line cited per function);
all are `when`-chains / arithmetic, so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def categorize_volatility(vol: Column) -> Column:
    """5-way volatility bucket; null → 'Unknown'.

    Reference ``src/transform.py:20-42``: <1 Very Low, <2 Low, <3.5 Medium,
    <5 High, else Very High; NaN → Unknown. The null check MUST come first:
    Spark's `when` on a null comparison is null (not False), so without it
    nulls would fall through to 'Very High' (SURVEY.md §7.4).
    """
    return (
        F.when(vol.isNull(), F.lit("Unknown"))
        .when(vol < 1.0, F.lit("Very Low"))
        .when(vol < 2.0, F.lit("Low"))
        .when(vol < 3.5, F.lit("Medium"))
        .when(vol < 5.0, F.lit("High"))
        .otherwise(F.lit("Very High"))
    )


def volume_category_expr(volume: Column, q1: Column, q2: Column, q3: Column) -> Column:
    """4-way bucket against per-symbol volume quartiles.

    Reference ``src/transform.py:237-257``: ≤Q1 Low, ≤Q2 Medium, ≤Q3 High,
    else Very High; null volume → 'Unknown'.
    """
    return (
        F.when(volume.isNull() | q1.isNull(), F.lit("Unknown"))
        .when(volume <= q1, F.lit("Low"))
        .when(volume <= q2, F.lit("Medium"))
        .when(volume <= q3, F.lit("High"))
        .otherwise(F.lit("Very High"))
    )


def trend_expr(ma5: Column, ma20: Column) -> Column:
    """'BULLISH' if ma5 > ma20 else 'BEARISH' (``src/predictions.py:41-46``)."""
    return F.when(ma5 > ma20, F.lit("BULLISH")).otherwise(F.lit("BEARISH"))


def trend_strength_expr(ma5: Column, ma20: Column) -> Column:
    """|ma5 − ma20| / ma20 · 100 (``src/predictions.py:46``)."""
    return F.abs(ma5 - ma20) / ma20 * F.lit(100.0)


def predicted_change_percent_expr(trend: Column, strength: Column,
                                  avg_change: Column) -> Column:
    """Capped next-day change prediction (``src/predictions.py:49-57``).

    bullish: min(strength·0.3 + avg_change·0.7, 5.0)
    bearish: max(−strength·0.3 + avg_change·0.7, −5.0)
    """
    bullish = F.least(strength * 0.3 + avg_change * 0.7, F.lit(5.0))
    bearish = F.greatest(-strength * 0.3 + avg_change * 0.7, F.lit(-5.0))
    return F.when(trend == "BULLISH", bullish).otherwise(bearish)


def confidence_expr(strength: Column, volatility: Column) -> Column:
    """HIGH / MEDIUM / LOW confidence bucket (``src/predictions.py:59-65``).

    Null volatility (single-row history) fails both `<` tests in pandas
    (NaN comparisons are False), landing in LOW — the coalesce reproduces
    that.
    """
    vol = F.coalesce(volatility, F.lit(float("inf")))
    return (
        F.when((strength > 5.0) & (vol < 2.0), F.lit("HIGH"))
        .when((strength > 2.0) & (vol < 4.0), F.lit("MEDIUM"))
        .otherwise(F.lit("LOW"))
    )

"""Explicit StructTypes for the engine's core tables (SURVEY.md §1.2).

The raw quote schema models the flattened Alpha-Vantage payload
(reference ``src/extract.py:114-125``, fixture ``tests/conftest.py:36-58``):
all value fields arrive as strings and are cast-with-null-on-error during
cleaning. The enriched schema is the engine's central table
(reference ``src/load.py:26-92``; column order ``src/transform.py:292-321``).
"""

from __future__ import annotations

from pyspark.sql import types as T

RAW_QUOTE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("open", T.StringType(), True),
        T.StructField("high", T.StringType(), True),
        T.StructField("low", T.StringType(), True),
        T.StructField("close", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),
        T.StructField("extracted_at", T.TimestampType(), True),
        T.StructField("data_source", T.StringType(), True),
    ]
)

# Canonical enriched column order (reference src/transform.py:292-313).
ENRICHED_COLUMNS = [
    "symbol", "date", "open", "high", "low", "close", "volume",
    "daily_change", "daily_change_percent",
    "price_range", "price_range_percent",
    "year", "month", "quarter", "day_of_week", "week_of_year",
    "is_positive_day", "is_negative_day",
    "volume_category", "volatility_indicator", "volatility_category",
    "ma_5", "ma_20", "price_vs_ma5", "price_vs_ma20",
]

ENRICHED_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("daily_change", T.DoubleType(), True),
        T.StructField("daily_change_percent", T.DoubleType(), True),
        T.StructField("price_range", T.DoubleType(), True),
        T.StructField("price_range_percent", T.DoubleType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("quarter", T.IntegerType(), True),
        T.StructField("day_of_week", T.IntegerType(), True),
        T.StructField("week_of_year", T.IntegerType(), True),
        T.StructField("is_positive_day", T.BooleanType(), True),
        T.StructField("is_negative_day", T.BooleanType(), True),
        T.StructField("volume_category", T.StringType(), True),
        T.StructField("volatility_indicator", T.DoubleType(), True),
        T.StructField("volatility_category", T.StringType(), True),
        T.StructField("ma_5", T.DoubleType(), True),
        T.StructField("ma_20", T.DoubleType(), True),
        T.StructField("price_vs_ma5", T.DoubleType(), True),
        T.StructField("price_vs_ma20", T.DoubleType(), True),
    ]
)

PREDICTION_COLUMNS = [
    "symbol", "current_price", "predicted_price", "predicted_change",
    "predicted_change_percent", "trend", "trend_strength", "confidence",
    "ma_5", "ma_20", "recent_volatility", "prediction_date",
]

SIGNAL_COLUMNS = [
    "symbol", "signal", "signal_type", "date", "price",
    "ma_5", "ma_20", "days_ago",
]

"""DuckDB oracle SQL fragments shared across `__spark_entry__.py::oracle_sql()`.

Rules that keep the driver's value-hash comparison exact (see sources/ticks.py):

- pass-through doubles (parquet values, min/max aggregates, per-row IEEE
  arithmetic on them) are bit-identical between Spark and DuckDB → emit raw;
- anything downstream of an order-sensitive float computation (window AVG /
  STDDEV, multi-row SUM/AVG of doubles, interpolated quantiles) is rounded
  to 6 decimals on BOTH sides;
- integer aggregates are CAST(... AS BIGINT) in DuckDB (its SUM returns
  HUGEINT) to match Spark's LongType; date parts are INTEGER on both sides.
"""

from .sources.ticks import TICKS_CTE

# Enrichment chain — DuckDB twin of operators/enrich.py::enrich().
ENRICH_CTES = """
base AS (
    SELECT
        t.*,
        close - LAG(close) OVER w                   AS daily_change,
        (close / LAG(close) OVER w - 1) * 100       AS daily_change_percent,
        high - low                                  AS price_range,
        (high - low) / close * 100                  AS price_range_percent,
        CAST(year(date) AS INTEGER)                 AS year,
        CAST(month(date) AS INTEGER)                AS month,
        CAST(quarter(date) AS INTEGER)              AS quarter,
        CAST((dayofweek(date) + 6) % 7 AS INTEGER)  AS day_of_week,
        CAST(weekofyear(date) AS INTEGER)           AS week_of_year,
        AVG(close) OVER (PARTITION BY symbol ORDER BY date
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)   AS ma_5,
        AVG(close) OVER (PARTITION BY symbol ORDER BY date
            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)  AS ma_20
    FROM ticks t
    WINDOW w AS (PARTITION BY symbol ORDER BY date)
),
vol AS (
    SELECT b.*,
        STDDEV_SAMP(daily_change_percent) OVER (PARTITION BY symbol ORDER BY date
            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)  AS volatility_indicator
    FROM base b
),
q AS (
    SELECT symbol,
        quantile_cont(volume, 0.25) AS q1,
        quantile_cont(volume, 0.50) AS q2,
        quantile_cont(volume, 0.75) AS q3
    FROM ticks GROUP BY symbol
),
enriched AS (
    SELECT
        v.symbol, v.date, v.open, v.high, v.low, v.close, v.volume,
        v.daily_change, v.daily_change_percent,
        v.price_range, v.price_range_percent,
        v.year, v.month, v.quarter, v.day_of_week, v.week_of_year,
        COALESCE(v.daily_change > 0, FALSE)  AS is_positive_day,
        COALESCE(v.daily_change < 0, FALSE)  AS is_negative_day,
        CASE WHEN v.volume IS NULL OR q.q1 IS NULL THEN 'Unknown'
             WHEN v.volume <= q.q1 THEN 'Low'
             WHEN v.volume <= q.q2 THEN 'Medium'
             WHEN v.volume <= q.q3 THEN 'High'
             ELSE 'Very High' END            AS volume_category,
        v.volatility_indicator,
        CASE WHEN v.volatility_indicator IS NULL THEN 'Unknown'
             WHEN v.volatility_indicator < 1.0 THEN 'Very Low'
             WHEN v.volatility_indicator < 2.0 THEN 'Low'
             WHEN v.volatility_indicator < 3.5 THEN 'Medium'
             WHEN v.volatility_indicator < 5.0 THEN 'High'
             ELSE 'Very High' END            AS volatility_category,
        v.ma_5, v.ma_20,
        (v.close - v.ma_5) / v.ma_5 * 100    AS price_vs_ma5,
        (v.close - v.ma_20) / v.ma_20 * 100  AS price_vs_ma20
    FROM vol v JOIN q USING (symbol)
)
"""

# WITH-clause preludes
WITH_TICKS = "WITH " + TICKS_CTE
WITH_ENRICHED = "WITH " + TICKS_CTE + ", " + ENRICH_CTES

RANKED_DESC_CTE = """
ranked AS (
    SELECT e.*,
        ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date DESC) AS rn,
        COUNT(*)     OVER (PARTITION BY symbol)                    AS cnt
    FROM enriched e
)
"""

"""Cleaning stage: rename → cast → null-drop → logic filters → keep-last dedup.

Mirrors reference ``src/transform.py:112-204`` (P1-P7, O6 in SURVEY.md §2.2/§2.6)
as one narrow stage + one filter stage — no shuffle until the dedup, and the
dedup's window shuffle on (symbol, date) is reused by every downstream
window operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Alpha-Vantage raw keys → canonical names (reference src/transform.py:112-123).
RAW_RENAME_MAP = {
    "1. open": "open",
    "2. high": "high",
    "3. low": "low",
    "4. close": "close",
    "5. volume": "volume",
}

CRITICAL_COLUMNS = ["open", "high", "low", "close", "volume", "date", "symbol"]


def ohlc_consistency_predicate(df: DataFrame) -> Column:
    """Rows to KEEP: high ≥ low, high ≥ open, high ≥ close, low ≤ open, low ≤ close.

    Reference removes the violating rows (src/transform.py:174-184).
    """
    c = F.col
    return ~(
        (c("high") < c("low"))
        | (c("high") < c("open"))
        | (c("high") < c("close"))
        | (c("low") > c("open"))
        | (c("low") > c("close"))
    )


def positive_price_predicate(df: DataFrame) -> Column:
    """Rows to KEEP: all prices > 0 and volume ≥ 0 (src/transform.py:187-197)."""
    c = F.col
    return (
        (c("open") > 0) & (c("high") > 0) & (c("low") > 0)
        & (c("close") > 0) & (c("volume") >= 0)
    )


def clean_quotes(raw: DataFrame) -> DataFrame:
    """Full cleaning pass over raw string-typed quote rows (RAW_QUOTE_SCHEMA).

    Cast-with-null-on-error matches pandas ``to_numeric(errors='coerce')``
    (src/transform.py:133-136): Spark's cast of an invalid string is null,
    then the null-drop removes the row.
    """
    df = raw
    renames = {k: v for k, v in RAW_RENAME_MAP.items() if k in df.columns}
    if renames:
        df = df.withColumnsRenamed(renames)
    # try_cast, not cast: Spark 4 runs in ANSI mode where a malformed string
    # cast THROWS; pandas to_numeric(errors='coerce') semantics need
    # null-on-error, which try_cast provides.
    df = df.withColumns(
        {
            "date": F.to_date("date"),
            "open": F.col("open").try_cast("double"),
            "high": F.col("high").try_cast("double"),
            "low": F.col("low").try_cast("double"),
            "close": F.col("close").try_cast("double"),
            "volume": F.col("volume").try_cast("bigint"),
        }
    )
    df = df.na.drop(subset=CRITICAL_COLUMNS)
    df = df.filter(ohlc_consistency_predicate(df))
    df = df.filter(positive_price_predicate(df))
    return dedup_keep_last(df, keys=["symbol", "date"], order_by=["extracted_at"])


def dedup_keep_last(df: DataFrame, keys: list[str], order_by: list[str],
                    tiebreak: list[str] | None = None) -> DataFrame:
    """Keep-LAST dedup with a deterministic tiebreak.

    pandas ``drop_duplicates(keep='last')`` keeps the last occurrence in
    input order (reference src/transform.py:199-204). Spark has no stable
    input order after a shuffle, so the winner must be picked by explicit
    ordering columns (SURVEY.md §7.2) — plain ``dropDuplicates`` would be
    an arbitrary-winner dedup.

    Scale note: row_number over (keys) is a single hash-shuffle on the
    keys; with AQE skew handling a hot key splits fine. No global sort.
    """
    order_cols = [F.col(c).desc() for c in order_by]
    order_cols += [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def nan_to_null(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """P13: NaN → NULL normalization (reference ``src/load.py:228``,
    ``df.where(pd.notnull(df), None)``). Spark keeps NaN and NULL distinct
    for doubles; sinks and aggregates that expect SQL semantics need real
    NULLs."""
    targets = cols or [
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in ("double", "float")
    ]
    return df.withColumns(
        {c: F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
         for c in targets}
    )


def with_defaults(df: DataFrame, defaults: dict | None = None) -> DataFrame:
    """P14: fill the bookkeeping columns if absent/null (reference
    ``src/load.py:210-215``: extracted_at ← now, data_source ← constant)."""
    defaults = defaults or {
        "extracted_at": F.current_timestamp(),
        "data_source": F.lit("Alpha Vantage"),
    }
    out = df
    for name, default in defaults.items():
        if name in out.columns:
            out = out.withColumn(name, F.coalesce(F.col(name), default))
        else:
            out = out.withColumn(name, default)
    return out

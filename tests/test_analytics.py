"""Analytics-plan tests: golden expectations recomputed from the
reference's formulas (src/predictions.py) over deterministic fixtures."""

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark.operators.clean import clean_quotes
from stock_market_etl_pipeline_spark.operators.enrich import enrich
from stock_market_etl_pipeline_spark.plans.analytics import (
    db_summary,
    performance_summary,
    predictions,
    top_movers,
    trading_signals,
)


@pytest.fixture(scope="module")
def enriched(raw_quotes):
    return enrich(clean_quotes(raw_quotes).drop("extracted_at", "data_source")).cache()


def test_predictions_min_history_gate(enriched):
    out = predictions(enriched).collect()
    # only AAPL has >= 20 rows
    assert [r["symbol"] for r in out] == ["AAPL"]


def test_prediction_values_match_reference_formula(enriched):
    row = predictions(enriched).collect()[0]
    # AAPL: close ascends 153..177; ma5 > ma20 -> BULLISH
    assert row["trend"] == "BULLISH"
    assert row["current_price"] == 177.0
    ma5 = sum([173, 174, 175, 176, 177]) / 5
    ma20 = sum(range(158, 178)) / 20
    assert row["ma_5"] == pytest.approx(ma5, abs=0.01)
    assert row["ma_20"] == pytest.approx(ma20, abs=0.01)
    strength = (ma5 - ma20) / ma20 * 100
    assert row["trend_strength"] == pytest.approx(strength, abs=0.01)
    # ascending +1/day on ~175 -> avg change ~0.57%/day; capped formula
    changes = [(c / (c - 1) - 1) * 100 for c in [173, 174, 175, 176, 177]]
    avg_change = sum(changes) / len(changes)
    pcp = min(strength * 0.3 + avg_change * 0.7, 5.0)
    assert row["predicted_change_percent"] == pytest.approx(pcp, abs=0.01)
    assert row["predicted_price"] == pytest.approx(177 * (1 + pcp / 100), abs=0.01)
    assert row["prediction_date"] == "2024-01-26"
    assert row["asof_date"] == "2024-01-25"


def test_trading_signals_crossover(spark):
    # hand-built series: ma_5 crosses above ma_20 at row 3, below at row 6
    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = []
    ma5s = [1.0, 1.5, 2.0, 3.0, 3.5, 2.9, 2.0, 1.0]
    ma20s = [2.0, 2.0, 2.5, 2.5, 2.5, 2.5, 2.5, 2.5]
    for i, (m5, m20) in enumerate(zip(ma5s, ma20s)):
        rows.append(("X", base + dt.timedelta(days=i), 10.0 + i, m5, m20))
    df = spark.createDataFrame(
        rows, "symbol string, date date, close double, ma_5 double, ma_20 double"
    )
    out = trading_signals(df).collect()
    got = [(r["signal"], r["date"].day, r["days_ago"]) for r in out]
    assert ("BUY", 4, 4) in got  # crossed above on day 4
    assert ("SELL", 7, 1) in got  # crossed below on day 7
    assert len(got) == 2
    types = {r["signal"]: r["signal_type"] for r in out}
    assert types == {"BUY": "Golden Cross", "SELL": "Death Cross"}


def test_top_movers_orders_and_limits(enriched):
    g = top_movers(enriched, top_n=5, kind="gainers").collect()
    l_ = top_movers(enriched, top_n=5, kind="losers").collect()
    assert len(g) <= 5 and len(l_) <= 5
    if g and l_:
        assert g[0]["predicted_change_percent"] >= l_[0]["predicted_change_percent"]


def test_performance_summary_total_return(enriched):
    rows = {r["symbol"]: r for r in performance_summary(enriched).collect()}
    aapl = rows["AAPL"]
    assert aapl["start_price"] == 153.0
    assert aapl["latest_price"] == 177.0
    assert aapl["total_return_pct"] == pytest.approx((177 - 153) / 153 * 100)
    assert aapl["min_price"] == 153.0 and aapl["max_price"] == 177.0


def test_db_summary_counts(enriched):
    row = db_summary(enriched).collect()[0]
    assert row["total_records"] == 25 + 8 + 1 + 1  # AAPL+MSFT+DUP+ONE
    assert row["unique_symbols"] == 4

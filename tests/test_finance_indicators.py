"""Finance-indicator family (registry_fin.py): semantics + plan shapes.

Oracle parity is covered by tools/verify_oracle.py; these tests pin the
indicator MATH on a hand-computed series and freeze the one-exchange plan
shapes that make the family scale.
"""

import math

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark import registry
from stock_market_etl_pipeline_spark.registry_fin import (
    _EMA_SPAN,
    _EMA_WEIGHTS,
)

from conftest import SF_DIR
from test_plan_shapes import count_nodes, plan_of


@pytest.fixture(scope="module")
def qs():
    return registry.queries()


# ---------------------------------------------------------------------------
# Semantics on tiny hand-built series
# ---------------------------------------------------------------------------


def _series(spark, closes, symbol="S"):
    rows = [
        (symbol, f"2024-01-{d + 1:02d}", float(c)) for d, c in enumerate(closes)
    ]
    return spark.createDataFrame(rows, "symbol string, date string, close double").select(
        "symbol", F.to_date("date").alias("date"), "close"
    )


def test_max_drawdown_hand_case(spark, qs, tmp_path, monkeypatch):
    # peak 100 → trough 60: -40%; later partial recovery must not matter
    import stock_market_etl_pipeline_spark.registry_fin as fin

    closes = [100, 90, 95, 60, 80, 85]
    monkeypatch.setattr(fin, "ticks", lambda s, d: _series(s, closes))
    row = fin.q_max_drawdown(spark, SF_DIR).collect()[0]
    assert row.peak_close == 100.0 and row.trough_close == 60.0
    assert row.max_drawdown_pct == -40.0
    assert str(row.trough_date) == "2024-01-04"


def test_max_drawdown_tie_breaks_to_earliest_date(spark, monkeypatch):
    import stock_market_etl_pipeline_spark.registry_fin as fin

    # two equal troughs (50 twice): earliest date wins deterministically
    monkeypatch.setattr(
        fin, "ticks", lambda s, d: _series(s, [100, 50, 80, 50])
    )
    row = fin.q_max_drawdown(spark, SF_DIR).collect()[0]
    assert str(row.trough_date) == "2024-01-02"


def test_ema_matches_pandas_ewm_adjust(spark, monkeypatch):
    import pandas as pd

    import stock_market_etl_pipeline_spark.registry_fin as fin

    closes = [10.0, 12.0, 11.0, 13.0, 14.0, 12.5, 13.5, 15.0]
    monkeypatch.setattr(fin, "ticks", lambda s, d: _series(s, closes))
    got = {
        str(r.date): r.ema_10
        for r in fin.q_ema(spark, SF_DIR).collect()
    }
    # pandas ewm(adjust=True) equals the truncated form exactly while
    # len(series) <= span
    exp = pd.Series(closes).ewm(span=_EMA_SPAN, adjust=True).mean()
    for i, e in enumerate(exp):
        assert got[f"2024-01-{i + 1:02d}"] == pytest.approx(e, abs=1e-6)


def test_ema_weights_are_geometric(spark):
    alpha = 2.0 / (_EMA_SPAN + 1)
    for j, w in enumerate(_EMA_WEIGHTS):
        assert w == pytest.approx((1 - alpha) ** j)


def test_rsi_all_gains_is_100_all_losses_0(spark, monkeypatch):
    import stock_market_etl_pipeline_spark.registry_fin as fin

    monkeypatch.setattr(
        fin, "ticks", lambda s, d: _series(s, [10, 11, 12, 13, 14])
    )
    rows = fin.q_rsi(spark, SF_DIR).collect()
    assert all(r.rsi_14 == 100.0 for r in rows)

    monkeypatch.setattr(
        fin, "ticks", lambda s, d: _series(s, [14, 13, 12, 11, 10])
    )
    rows = sorted(fin.q_rsi(spark, SF_DIR).collect(), key=lambda r: r.date)
    # first row: no diff yet → gain=loss=0 → RSI 100 by the zero-loss rule
    assert rows[0].rsi_14 == 100.0
    assert all(r.rsi_14 == 0.0 for r in rows[1:])


def test_bollinger_constant_series_degenerate_band(spark, monkeypatch):
    import stock_market_etl_pipeline_spark.registry_fin as fin

    monkeypatch.setattr(fin, "ticks", lambda s, d: _series(s, [50.0] * 6))
    rows = sorted(
        fin.q_bollinger_bands(spark, SF_DIR).collect(), key=lambda r: r.date
    )
    assert rows[0].pct_b is None  # n=1 → sd NULL
    for r in rows[1:]:
        assert r.bb_mid == 50.0 and r.bb_upper == 50.0 and r.bb_lower == 50.0
        assert r.pct_b is None  # zero-width band


def test_bollinger_exact_moments_match_statistics(spark, monkeypatch):
    import statistics

    import stock_market_etl_pipeline_spark.registry_fin as fin

    closes = [10.25, 11.75, 9.5, 12.0, 10.0]
    monkeypatch.setattr(fin, "ticks", lambda s, d: _series(s, closes))
    last = sorted(
        fin.q_bollinger_bands(spark, SF_DIR).collect(), key=lambda r: r.date
    )[-1]
    mid = statistics.mean(closes)
    sd = statistics.stdev(closes)
    assert last.bb_mid == pytest.approx(mid, abs=1e-9)
    assert last.bb_upper == pytest.approx(mid + 2 * sd, abs=1e-9)
    assert last.pct_b == pytest.approx(
        (closes[-1] - (mid - 2 * sd)) / (4 * sd), abs=1e-9
    )


def test_beta_of_market_average_is_centered(spark, qs):
    # equal-weight construction: volume-weighted mean of betas isn't fixed,
    # but each symbol's beta must be finite and the market's own beta ~1 on
    # average across symbols (Σ w_i β_i = 1 for the equal-weight factor).
    rows = qs["beta_vs_market"](spark, SF_DIR).collect()
    assert rows and all(r.beta is not None for r in rows)
    assert all(abs(r.mkt_corr) <= 1.0 + 1e-9 for r in rows)


def test_weekly_ohlcv_week_starts_are_mondays(spark, qs):
    wk = qs["weekly_ohlcv"](spark, SF_DIR)
    bad = wk.filter(F.dayofweek("week_start") != 2).count()  # 2 = Monday
    assert bad == 0


def test_vwap_bounded_by_low_high_of_closes(spark, monkeypatch):
    import stock_market_etl_pipeline_spark.registry_fin as fin

    closes = [10.0, 20.0, 30.0]

    def fake_ticks(s, d):
        df = _series(s, closes)
        return df.withColumn(
            "volume", F.when(F.col("close") == 20.0, 100).otherwise(1).cast("bigint")
        )

    monkeypatch.setattr(fin, "ticks", fake_ticks)
    row = fin.q_vwap_monthly(spark, SF_DIR).collect()[0]
    # dominated by the 100-lot at 20
    assert 19.5 < row.vwap < 20.5
    assert row.volume == 102
    exp = (10 * 1 + 20 * 100 + 30 * 1) / 102
    assert row.vwap == pytest.approx(exp, abs=1e-9)


# ---------------------------------------------------------------------------
# Plan shapes: the whole family rides ONE symbol exchange
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["max_drawdown", "ema_10", "rsi_14", "bollinger_bands"]
)
def test_indicator_single_scan_single_exchange(spark, qs, name):
    plan = plan_of(qs[name](spark, SF_DIR))
    assert count_nodes(plan, "Scan parquet") == 1
    assert count_nodes(plan, "Exchange") == 1


def test_ema_all_lags_in_one_window_node(spark, qs):
    # 10 lag terms must share one window spec — not 10 Window nodes
    plan = plan_of(qs["ema_10"](spark, SF_DIR))
    assert count_nodes(plan, "Window") == 1


def test_max_drawdown_rank_pushes_window_group_limit(spark, qs):
    # rn=1 filter must push a WindowGroupLimit below the rank window
    plan = plan_of(qs["max_drawdown"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan


def test_beta_market_factor_is_broadcast(spark, qs):
    plan = plan_of(qs["beta_vs_market"](spark, SF_DIR))
    assert count_nodes(plan, "BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", ["weekly_ohlcv", "vwap_monthly"])
def test_resamples_single_exchange_partial_agg(spark, qs, name):
    plan = plan_of(qs[name](spark, SF_DIR))
    assert count_nodes(plan, "Scan parquet") == 1
    assert count_nodes(plan, "Exchange") == 1
    # map-side partial aggregation must be present
    assert plan.count("HashAggregate") >= 2


def _ohlc(spark, bars, symbol="S"):
    rows = [
        (symbol, f"2024-01-{d + 1:02d}", float(h), float(lo), float(c))
        for d, (h, lo, c) in enumerate(bars)
    ]
    return spark.createDataFrame(
        rows, "symbol string, date string, high double, low double, close double"
    ).select("symbol", F.to_date("date").alias("date"), "high", "low", "close")


def test_atr_hand_case(spark, monkeypatch):
    """TR lattice: first row high-low; a gap-up day's TR is |high-prev_close|;
    ATR is the shrinking-head mean of TRs (exact cents arithmetic)."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    bars = [
        (105, 95, 100),   # day 1: TR = 10 (no prev close)
        (104, 101, 102),  # day 2: TR = max(3, |104-100|, |101-100|) = 4
        (120, 115, 118),  # day 3 gap-up: TR = max(5, |120-102|, |115-102|) = 18
    ]
    monkeypatch.setattr(fin, "ticks", lambda s, d: _ohlc(s, bars))
    rows = sorted(fin.q_atr(spark, SF_DIR).collect(), key=lambda r: r["date"])
    assert [r["true_range"] for r in rows] == [10.0, 4.0, 18.0]
    assert rows[0][f"atr_{fin._ATR_N}"] == 10.0
    assert rows[1][f"atr_{fin._ATR_N}"] == 7.0            # (10+4)/2
    assert rows[2][f"atr_{fin._ATR_N}"] == (10 + 4 + 18) / 3

def test_donchian_breakout_uses_previous_channel(spark, monkeypatch):
    """A new high must break the PREVIOUS channel (lagged edge), not the
    channel it just raised; first row has no previous channel → False."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    bars = [
        (105, 95, 100),
        (106, 96, 101),   # inside prior channel (105/95)? close 101 < 105 → no
        (112, 100, 111),  # close 111 > prev upper 106 → breakout_up
        (108, 90, 92),    # close 92 < prev lower 95 → breakout_down
    ]
    monkeypatch.setattr(fin, "ticks", lambda s, d: _ohlc(s, bars))
    rows = sorted(
        fin.q_donchian(spark, SF_DIR).collect(), key=lambda r: r["date"]
    )
    assert [r["breakout_up"] for r in rows] == [False, False, True, False]
    assert [r["breakout_down"] for r in rows] == [False, False, False, True]
    assert rows[2]["upper_band"] == 112.0 and rows[2]["lower_band"] == 95.0
    assert rows[3]["mid_band"] == (112.0 + 90.0) / 2


def test_atr_donchian_single_exchange(spark, qs):
    for name in ("atr_14", "donchian_20"):
        plan = plan_of(qs[name](spark, SF_DIR))
        assert count_nodes(plan, "Scan parquet") == 1
        assert count_nodes(plan, "Exchange") == 1


def test_obv_hand_case(spark, monkeypatch):
    """up +v, down -v, unchanged 0, first row 0 — running int sum."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    rows = [
        ("S", "2024-01-01", 100.0, 1000),
        ("S", "2024-01-02", 101.0, 2000),   # up   → +2000
        ("S", "2024-01-03", 99.0, 3000),    # down → -3000
        ("S", "2024-01-04", 99.0, 4000),    # flat → 0
        ("S", "2024-01-05", 100.0, 500),    # up   → +500
    ]
    df = spark.createDataFrame(
        rows, "symbol string, date string, close double, volume long"
    ).select("symbol", F.to_date("date").alias("date"), "close", "volume")
    monkeypatch.setattr(fin, "ticks", lambda s, d: df)
    out = sorted(fin.q_obv(spark, SF_DIR).collect(), key=lambda r: r["date"])
    assert [r["obv"] for r in out] == [0, 2000, -1000, -1000, -500]


def test_stochastic_hand_case(spark, monkeypatch):
    """%K positions the close inside the rolling channel; flat channel
    degenerates to 50; %D is the 3-row shrinking-head mean of %K."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    bars = [
        (100, 100, 100),  # flat channel → %K = 50
        (110, 100, 105),  # channel 100-110, close 105 → %K = 50
        (110, 100, 110),  # channel 100-110, close 110 → %K = 100
    ]
    monkeypatch.setattr(fin, "ticks", lambda s, d: _ohlc(s, bars))
    out = sorted(
        fin.q_stochastic(spark, SF_DIR).collect(), key=lambda r: r["date"]
    )
    assert [r["pct_k"] for r in out] == [50.0, 50.0, 100.0]
    assert out[2]["pct_d"] == round((50 + 50 + 100) / 3, 6)


def test_keltner_bands_compose_ema_and_atr(spark, monkeypatch):
    """keltner_upper/lower must equal mid ± 2·atr where mid equals the
    registered ema_10 and atr equals the registered atr_14 on the same
    series (composition of the two exact primitives)."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    bars = [
        (105, 95, 100), (104, 101, 102), (120, 115, 118), (119, 110, 112),
    ]
    monkeypatch.setattr(fin, "ticks", lambda s, d: _ohlc(s, bars))
    kelt = {str(r["date"]): r for r in fin.q_keltner(spark, SF_DIR).collect()}
    ema = {str(r["date"]): r["ema_10"] for r in fin.q_ema(spark, SF_DIR).collect()}
    atr = {str(r["date"]): r[f"atr_{fin._ATR_N}"]
           for r in fin.q_atr(spark, SF_DIR).collect()}
    for d, r in kelt.items():
        assert r["mid"] == ema[d]
        assert r["keltner_upper"] == r["mid"] + 2.0 * atr[d]
        assert r["keltner_lower"] == r["mid"] - 2.0 * atr[d]


def test_volume_profile_buckets_exact_cents(spark, monkeypatch):
    """$5 buckets by integer cents floor-division: 104.99 and 100.00 share
    bucket 20 [100, 105); 105.00 opens bucket 21."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    rows = [
        ("S", "2024-01-01", 100.00, 10),
        ("S", "2024-01-02", 104.99, 20),
        ("S", "2024-01-03", 105.00, 40),
    ]
    df = spark.createDataFrame(
        rows, "symbol string, date string, close double, volume long"
    ).select("symbol", F.to_date("date").alias("date"), "close", "volume")
    monkeypatch.setattr(fin, "ticks", lambda s, d: df)
    got = {
        r["price_bucket"]: (r["bucket_lo"], r["total_volume"], r["n_days"])
        for r in fin.q_volume_profile(spark, SF_DIR).collect()
    }
    assert got == {20: (100.0, 30, 2), 21: (105.0, 40, 1)}


def test_macd_null_head_and_exact_convolution(spark, monkeypatch):
    """talib-style head: macd NULL until 26 closes exist, signal/histogram
    NULL until 34. Full rows must EQUAL the quantized-integer-weight
    reference convolution bit-for-bit, and sit within 1e-3 relative of
    the ideal real-weight MACD (the 2^-16 quantization bound)."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    import datetime as dt

    closes = [100.0 + 3.0 * math.sin(i / 3.0) + 0.17 * i for i in range(40)]
    rows = [
        ("S", dt.date(2024, 1, 1) + dt.timedelta(days=i), float(c))
        for i, c in enumerate(closes)
    ]
    series = spark.createDataFrame(
        rows, "symbol string, date date, close double"
    )
    monkeypatch.setattr(fin, "ticks", lambda s, d: series)
    out = sorted(fin.q_macd(spark, SF_DIR).collect(), key=lambda r: r["date"])
    assert len(out) == 40
    for i, r in enumerate(out):
        assert (r["macd"] is None) == (i < fin._MACD_SLOW - 1)
        is_head = i < fin._MACD_SLOW + fin._MACD_SIG - 2
        assert (r["macd_signal"] is None) == is_head
        assert (r["macd_histogram"] is None) == is_head

    cents = [round(c * 100) for c in closes]

    def conv(vals, weights, i):
        return sum(w * vals[i - j] for j, w in enumerate(weights))

    for i in range(fin._MACD_SLOW + fin._MACD_SIG - 2, 40):
        n12 = [conv(cents, fin._W12, k) for k in range(len(cents))]
        n26 = [conv(cents, fin._W26, k) for k in range(len(cents))]
        macd = n12[i] / float(fin._D12 * 100) - n26[i] / float(fin._D26 * 100)
        signal = conv(n12, fin._W9, i) / float(
            fin._D9 * fin._D12 * 100
        ) - conv(n26, fin._W9, i) / float(fin._D9 * fin._D26 * 100)
        assert out[i]["macd"] == macd
        assert out[i]["macd_signal"] == signal
        assert out[i]["macd_histogram"] == macd - signal

    # ideal real-weight MACD (truncated, null-head) for the last row
    def ideal_ema(span, i):
        a = 2.0 / (span + 1)
        ws = [(1 - a) ** j for j in range(span)]
        return sum(w * closes[i - j] for j, w in enumerate(ws)) / sum(ws)

    i = 39
    ideal = ideal_ema(12, i) - ideal_ema(26, i)
    assert abs(out[i]["macd"] - ideal) <= 1e-3 * max(1.0, abs(ideal))


def test_underwater_streaks_hand_series(spark, monkeypatch):
    """closes 10,9,8,11,10,9,9,12: streaks are rows 2-3 (len 2, below the
    10-peak) and rows 5-7 (len 3, below the 11-peak); day 1 and new-peak
    days are not underwater. Longest = 3 starting at day 6; 2 streaks,
    5 underwater days total."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    closes = [10.0, 9.0, 8.0, 11.0, 10.0, 9.0, 9.0, 12.0]
    monkeypatch.setattr(fin, "ticks", lambda s, d: _series(spark, closes))
    out = fin.q_underwater_streaks(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.longest_streak_days == 3
    assert str(r.start_date) == "2024-01-05"
    assert str(r.end_date) == "2024-01-07"
    assert r.n_streaks == 2
    assert r.underwater_days == 5


def test_rolling_beta_matches_numpy_reference(spark, monkeypatch):
    """Two symbols over 25 days: beta NULL until the 20-row window fills,
    then equals the numpy least-squares slope of y-cents vs
    composite-cents within float tolerance (the exact-integer form is
    the spec; numpy validates the regression math)."""
    import datetime as dt

    import numpy as np

    import stock_market_etl_pipeline_spark.registry_fin as fin

    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(25)]
    a = [100.0 + 3.0 * math.sin(i / 2.0) + 0.3 * i for i in range(25)]
    b = [50.0 + 1.5 * math.sin(i / 2.0 + 0.4) + 0.1 * i for i in range(25)]
    rows = [("A", d, c) for d, c in zip(days, a)] + [
        ("B", d, c) for d, c in zip(days, b)
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    monkeypatch.setattr(fin, "ticks", lambda s, d: df)
    out = {
        (r.symbol, str(r.date)): r.beta_20
        for r in fin.q_rolling_beta(spark, SF_DIR).collect()
    }
    assert len(out) == 50
    ya = np.array([round(c * 100) for c in a], dtype=np.float64)
    yb = np.array([round(c * 100) for c in b], dtype=np.float64)
    x = ya + yb  # composite cents
    for i in range(25):
        key = ("A", str(days[i]))
        if i < fin._BETA_N - 1:
            assert out[key] is None
        else:
            xa, yw = x[i - 19 : i + 1], ya[i - 19 : i + 1]
            slope = np.polyfit(xa, yw, 1)[0]
            # beta is quantized at 1e-9 by the exact div closure
            assert out[key] == pytest.approx(slope, abs=2e-9)
    # betas of A and B against the same composite sum to 1 exactly in the
    # real numbers; allow float closure noise
    for i in range(fin._BETA_N - 1, 25):
        sa = out[("A", str(days[i]))]
        sb = out[("B", str(days[i]))]
        assert sa + sb == pytest.approx(1.0, abs=3e-9)  # 2 quantized betas


def test_rolling_corr_matches_numpy_and_is_bounded(spark, monkeypatch):
    import datetime as dt

    import numpy as np

    import stock_market_etl_pipeline_spark.registry_fin as fin

    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(25)]
    a = [100.0 + 3.0 * math.sin(i / 2.0) + 0.3 * i for i in range(25)]
    b = [50.0 + 1.5 * math.sin(i / 2.0 + 0.4) + 0.1 * i for i in range(25)]
    rows = [("A", d, c) for d, c in zip(days, a)] + [
        ("B", d, c) for d, c in zip(days, b)
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    monkeypatch.setattr(fin, "ticks", lambda s, d: df)
    out = {
        (r.symbol, str(r.date)): r.corr_20
        for r in fin.q_rolling_corr(spark, SF_DIR).collect()
    }
    ya = np.array([round(c * 100) for c in a], dtype=np.float64)
    yb = np.array([round(c * 100) for c in b], dtype=np.float64)
    x = ya + yb
    for i in range(25):
        key = ("A", str(days[i]))
        if i < fin._BETA_N - 1:
            assert out[key] is None
        else:
            c = np.corrcoef(x[i - 19 : i + 1], ya[i - 19 : i + 1])[0, 1]
            assert out[key] == pytest.approx(c, rel=1e-9)
            assert -1.0 - 1e-12 <= out[key] <= 1.0 + 1e-12


def test_ppo_matches_integer_reference_and_ideal(spark, monkeypatch):
    """PPO full rows equal 100·(n12·D26 − n26·D12)/(n26·D12) on the
    quantized weights bit-for-bit, and sit within the 2^-16 quantization
    band of the ideal real-weight PPO."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    import datetime as dt

    closes = [95.0 + 4.0 * math.sin(i / 4.0) + 0.21 * i for i in range(40)]
    rows = [
        ("S", dt.date(2024, 1, 1) + dt.timedelta(days=i), float(c))
        for i, c in enumerate(closes)
    ]
    series = spark.createDataFrame(
        rows, "symbol string, date date, close double"
    )
    monkeypatch.setattr(fin, "ticks", lambda s, d: series)
    out = sorted(fin.q_ppo(spark, SF_DIR).collect(), key=lambda r: r["date"])
    cents = [round(c * 100) for c in closes]

    def conv(vals, weights, i):
        return sum(w * vals[i - j] for j, w in enumerate(weights))

    for i, r in enumerate(out):
        if i < fin._MACD_SLOW - 1:
            assert r["ppo"] is None
            continue
        n12, n26 = conv(cents, fin._W12, i), conv(cents, fin._W26, i)
        want = 100.0 * float(n12 * fin._D26 - n26 * fin._D12) / float(
            n26 * fin._D12
        )
        assert r["ppo"] == want
        e12 = n12 / (fin._D12 * 100.0)
        e26 = n26 / (fin._D26 * 100.0)
        assert r["ppo"] == pytest.approx(100 * (e12 - e26) / e26, rel=1e-3)


def test_trix_matches_sequential_triple_ema(spark, monkeypatch):
    """TRIX full rows equal the rate of change of the triple-convolved
    integer kernel exactly, and approximate the sequentially-computed
    truncated triple EMA."""
    import stock_market_etl_pipeline_spark.registry_fin as fin

    import datetime as dt

    n = 60
    closes = [80.0 + 5.0 * math.sin(i / 5.0) + 0.13 * i for i in range(n)]
    rows = [
        ("S", dt.date(2024, 1, 1) + dt.timedelta(days=i), float(c))
        for i, c in enumerate(closes)
    ]
    series = spark.createDataFrame(
        rows, "symbol string, date date, close double"
    )
    monkeypatch.setattr(fin, "ticks", lambda s, d: series)
    out = sorted(fin.q_trix(spark, SF_DIR).collect(), key=lambda r: r["date"])
    cents = [round(c * 100) for c in closes]
    k3 = fin._K3
    head = len(k3)  # first n3 at index len(k3)-1; trix needs the lag too
    n3 = [
        sum(w * cents[i - j] for j, w in enumerate(k3))
        if i >= len(k3) - 1 else None
        for i in range(n)
    ]
    for i, r in enumerate(out):
        if i < head:
            assert r["trix"] is None
        else:
            # exact 1e-9-quantized spec: trunc((d*1e11) // prev) / 1e9
            want_q = ((n3[i] - n3[i - 1]) * 10**11) // n3[i - 1] \
                if n3[i] >= n3[i - 1] else -((-(n3[i] - n3[i - 1]) * 10**11) // n3[i - 1])
            assert r["trix"] == want_q / 1e9
            want = 100.0 * float(n3[i] - n3[i - 1]) / float(n3[i - 1])
            assert r["trix"] == pytest.approx(want, abs=2e-9)
    # triple EMA via three sequential truncated-kernel passes must agree
    # (same kernel by associativity of convolution) to float tolerance
    w1 = fin._WT

    def pass_once(vals):
        return [
            sum(w * vals[i - j] for j, w in enumerate(w1))
            if i >= len(w1) - 1
            and all(vals[i - j] is not None for j in range(len(w1)))
            else None
            for i in range(len(vals))
        ]

    t3 = pass_once(pass_once(pass_once(cents)))
    for i in range(head, n):
        assert t3[i] == n3[i]

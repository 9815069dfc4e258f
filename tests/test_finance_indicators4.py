"""Finance-indicator family part 4 (registry_fin4.py): ADX, candlestick
patterns, 52-week extremes, variance ratio, risk-adjusted panel —
semantics against sequential Python references on hand series + plan
shapes. Oracle parity is covered by tools/verify_oracle.py / -m oracle."""

import statistics

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark import registry
import stock_market_etl_pipeline_spark.registry_fin4 as fin4

from conftest import SF_DIR
from test_plan_shapes import count_nodes, plan_of


@pytest.fixture(scope="module")
def qs():
    return registry.queries()


def _ohlc(spark, bars, symbol="S", dates=None):
    """bars: list of (open, high, low, close). Sequential 2024 dates
    unless explicit ISO ``dates`` are given (for calendar-gap tests)."""
    if dates is None:
        dates = [
            f"2024-{1 + d // 28:02d}-{d % 28 + 1:02d}"
            for d in range(len(bars))
        ]
    rows = [
        (symbol, dt, float(o), float(h), float(lo), float(c), 1000)
        for dt, (o, h, lo, c) in zip(dates, bars)
    ]
    return spark.createDataFrame(
        rows,
        "symbol string, date string, open double, high double, "
        "low double, close double, volume bigint",
    ).select(
        "symbol", F.to_date("date").alias("date"),
        "open", "high", "low", "close", "volume",
    )


def _walk(n, seed=7):
    """Deterministic OHLC walk; open = previous close."""
    bars = []
    p = 100.0
    for i in range(n):
        o = p
        step = ((seed * (i + 1) * 2654435761) % 997) / 997.0 - 0.5
        p = round(p + step * 4, 2)
        rng = ((i * 31 + seed) % 7) / 4.0 + 0.25
        hi = round(max(o, p) + rng, 2)
        lo = round(min(o, p) - rng, 2)
        bars.append((o, hi, lo, p))
    return bars


def _c(x):
    return round(x * 100)


# ---------------------------------------------------------------------------
# ADX
# ---------------------------------------------------------------------------


def _adx_reference(bars):
    """Sequential SMA-form ADX over cents, mirroring the registry docs."""
    n = len(bars)
    hc = [_c(h) for _, h, _, _ in bars]
    lc = [_c(lo) for _, _, lo, _ in bars]
    pdm, mdm = [0] * n, [0] * n
    for t in range(1, n):
        up, dn = hc[t] - hc[t - 1], lc[t - 1] - lc[t]
        if up > dn and up > 0:
            pdm[t] = up
        if dn > up and dn > 0:
            mdm[t] = dn
    dx = [None] * n
    for t in range(13, n):
        sp = sum(pdm[t - 13: t + 1])
        sm = sum(mdm[t - 13: t + 1])
        if sp + sm > 0:
            dx[t] = 100.0 * abs(sp - sm) / (sp + sm)
    adx = [None] * n
    for t in range(13, n):
        w = dx[max(0, t - 13): t + 1]
        if len(w) == 14 and all(v is not None for v in w):
            adx[t] = round(sum(w) / 14.0, 6)
    return adx


def test_adx_matches_sequential_reference(spark, monkeypatch):
    bars = _walk(45)
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    rows = sorted(
        fin4.q_adx(spark, SF_DIR).collect(), key=lambda r: r.date
    )
    want = _adx_reference(bars)
    assert len(rows) == len(bars)
    fired = 0
    for r, w in zip(rows, want):
        if w is None:
            assert r.adx is None
        else:
            assert r.adx == pytest.approx(w, abs=2e-6)
            fired += 1
    assert fired >= 10  # the walk must actually exercise ADX


def test_adx_warmup_is_null(spark, monkeypatch):
    bars = _walk(30, seed=3)
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    rows = sorted(
        fin4.q_adx(spark, SF_DIR).collect(), key=lambda r: r.date
    )
    # dx starts at bar 14 (index 13); 14 dx values first complete at
    # index 26 — everything before must be NULL
    assert all(r.adx is None for r in rows[:26])
    assert rows[26].adx is not None


# ---------------------------------------------------------------------------
# Candlestick patterns
# ---------------------------------------------------------------------------


def test_candlestick_hand_cases(spark, monkeypatch):
    bars = [
        (100.00, 102.00, 98.00, 100.10),  # 0: doji (body 10 ≤ range/10=40)
        (100.00, 100.50, 97.00, 100.40),  # 1: hammer (lsh 300 ≥ 2*40, ush 10)
        (100.00, 103.50, 99.90, 100.40),  # 2: shooting star (ush 310, lsh 10)
        (101.00, 101.60, 99.90, 100.00),  # 3: red bar (body 100)
        (99.80, 102.00, 99.70, 101.20),   # 4: bullish engulfing of 3
        (101.00, 102.50, 100.90, 102.00), # 5: green bar
        (102.30, 102.60, 100.50, 100.80), # 6: bearish engulfing of 5
        (103.00, 104.00, 102.80, 103.50), # 7: gap up (open > prev high)
        (99.00, 99.50, 98.00, 98.50),     # 8: gap down (open < prev low)
    ]
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    got = {
        r.date.day: r
        for r in fin4.q_candlestick_patterns(spark, SF_DIR).collect()
    }
    assert got[1].doji and not got[1].hammer
    assert got[2].hammer and not got[2].shooting_star
    assert got[3].shooting_star and not got[3].hammer
    assert got[5].bullish_engulfing and not got[5].bearish_engulfing
    assert got[7].bearish_engulfing and not got[7].bullish_engulfing
    assert got[8].gap_up
    assert got[9].gap_down
    assert 4 not in got  # plain red bar fires nothing


def test_candlestick_first_bar_lag_flags_false(spark, monkeypatch):
    # first bar: engulfing/gap flags must COALESCE to FALSE, while
    # single-bar shapes still fire
    bars = [(100.00, 102.00, 98.00, 100.05)]  # doji
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    rows = fin4.q_candlestick_patterns(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.doji
    assert not (
        r.bullish_engulfing or r.bearish_engulfing or r.gap_up or r.gap_down
    )


# ---------------------------------------------------------------------------
# 52-week extremes
# ---------------------------------------------------------------------------


def test_dist_52w_calendar_semantics(spark, monkeypatch):
    # a >364-day calendar gap must drop the old extreme even though it is
    # only 1 ROW back — the RANGE-vs-ROWS distinction
    bars = [
        (100, 200.0, 90.0, 150.0),
        (100, 120.0, 95.0, 110.0),   # +366 days: old high 200 out of range
        (100, 125.0, 94.0, 120.0),   # +30 more days: sees bar 2's extremes
    ]
    dates = ["2022-01-01", "2023-01-02", "2023-02-01"]
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars, dates=dates))
    rows = sorted(
        fin4.q_dist_52w_extremes(spark, SF_DIR).collect(),
        key=lambda r: r.date,
    )
    assert rows[0].hi52 == 200.0 and rows[0].lo52 == 90.0
    assert rows[1].hi52 == 120.0 and rows[1].lo52 == 95.0  # gap dropped it
    assert rows[2].hi52 == 125.0 and rows[2].lo52 == 94.0
    assert rows[1].is_new_52w_high is False
    # close 120 >= hi52 125? no; check pct arithmetic
    assert rows[2].pct_from_52w_high == pytest.approx(
        (120.0 - 125.0) / 125.0 * 100
    )
    assert rows[2].pct_from_52w_low == pytest.approx(
        (120.0 - 94.0) / 94.0 * 100
    )


def test_dist_52w_new_high_flag(spark, monkeypatch):
    # close == rolling max(high) when the bar closes at its high
    bars = [(100, 101.0, 99.0, 100.0), (100, 105.0, 100.0, 105.0)]
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    rows = sorted(
        fin4.q_dist_52w_extremes(spark, SF_DIR).collect(),
        key=lambda r: r.date,
    )
    assert rows[1].is_new_52w_high is True
    assert rows[1].pct_from_52w_high == 0.0


# ---------------------------------------------------------------------------
# Variance ratio
# ---------------------------------------------------------------------------


def test_variance_ratio_matches_sequential_reference(spark, monkeypatch):
    bars = _walk(60, seed=5)
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    row = fin4.q_variance_ratio(spark, SF_DIR).collect()[0]
    close = [c for *_, c in bars]
    r1 = [(close[t] / close[t - 1] - 1) * 100 for t in range(1, len(close))]
    assert row.n_returns == len(r1)
    v1 = round(statistics.variance(r1), 6)
    for k in (5, 20):
        rk = [
            (close[t] / close[t - k] - 1) * 100
            for t in range(k, len(close))
        ]
        want = round(statistics.variance(rk), 6) / (k * v1)
        assert getattr(row, f"vr_{k}") == pytest.approx(want, rel=1e-9)


def test_variance_ratio_flat_series_null(spark, monkeypatch):
    bars = [(100.0, 100.0, 100.0, 100.0)] * 30
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    row = fin4.q_variance_ratio(spark, SF_DIR).collect()[0]
    assert row.vr_5 is None and row.vr_20 is None


# ---------------------------------------------------------------------------
# Risk-adjusted panel
# ---------------------------------------------------------------------------


def test_risk_adjusted_matches_sequential_reference(spark, monkeypatch):
    bars = _walk(50, seed=9)
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    row = fin4.q_risk_adjusted_returns(spark, SF_DIR).collect()[0]
    close = [c for *_, c in bars]
    r1 = [(close[t] / close[t - 1] - 1) * 100 for t in range(1, len(close))]
    mean_r = round(statistics.fmean(r1), 6)
    sd_r = round(statistics.stdev(r1), 6)
    dsq = round(sum(r * r for r in r1 if r < 0) / len(r1), 6)
    peak, mdd = close[0], 0.0
    for c in close:
        peak = max(peak, c)
        mdd = min(mdd, (c / peak - 1) * 100)
    total = (close[-1] / close[0] - 1) * 100
    assert row.mean_r == pytest.approx(mean_r, abs=2e-6)
    assert row.sd_r == pytest.approx(sd_r, abs=2e-6)
    assert row.mdd_pct == pytest.approx(mdd, rel=1e-12)
    assert row.total_return_pct == pytest.approx(total, rel=1e-12)
    assert row.sharpe_ann == pytest.approx(
        mean_r / sd_r * 252 ** 0.5, abs=1e-4
    )
    assert row.sortino_ann == pytest.approx(
        mean_r / dsq ** 0.5 * 252 ** 0.5, abs=1e-4
    )
    assert row.calmar == pytest.approx(total / -mdd, rel=1e-6)


def test_risk_adjusted_monotone_series_guards(spark, monkeypatch):
    # strictly rising series: no drawdown, no downside days →
    # calmar and sortino are NULL, sharpe is positive
    bars = [(100 + i, 101.0 + i, 99.0 + i, 100.5 + i * 1.0) for i in range(20)]
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    row = fin4.q_risk_adjusted_returns(spark, SF_DIR).collect()[0]
    assert row.mdd_pct == 0.0
    assert row.calmar is None and row.sortino_ann is None
    assert row.sharpe_ann is not None and row.sharpe_ann > 0


# ---------------------------------------------------------------------------
# Plan shapes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["adx_14", "candlestick_patterns", "dist_52w_extremes",
     "variance_ratio", "risk_adjusted_returns"],
)
def test_single_exchange_plans(qs, spark, name):
    plan = plan_of(qs[name](spark, SF_DIR))
    assert count_nodes(plan, "Scan parquet") == 1
    # windows and the grouped aggregate share one symbol exchange
    assert count_nodes(plan, "Exchange") == 1


# ---------------------------------------------------------------------------
# Linear trend forecast (exact OLS closed form)
# ---------------------------------------------------------------------------


def test_linear_trend_matches_numpy_lstsq(spark, monkeypatch):
    import numpy as np

    bars = _walk(60, seed=11)
    monkeypatch.setattr(fin4, "ticks", lambda s, d: _ohlc(s, bars))
    row = fin4.q_linear_trend_forecast(spark, SF_DIR).collect()[0]

    # numpy reference on the same cents grid the query uses
    y = np.array([round(c * 100) for (_, _, _, c) in bars]) / 100.0
    x = np.arange(1, len(y) + 1, dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    assert row.n_days == len(bars)
    # outputs are quantized by exact integer division (slope 1e-9,
    # forecast 1e-6, r2 via two 1e-9 factors) — tolerances match
    assert row.slope == pytest.approx(slope, abs=2e-9)
    assert row.forecast_next_close == pytest.approx(
        intercept + slope * (len(y) + 1), abs=2e-6
    )
    r = np.corrcoef(x, y)[0, 1]
    assert row.r2 == pytest.approx(r * r, abs=1e-6)


def test_linear_trend_degenerate_series_dropped(spark, monkeypatch):
    # single-row series (den = 0) and a flat series (zero price variance)
    # must both drop rather than divide by zero
    bars_one = [(10.0, 10.5, 9.5, 10.0)]
    bars_flat = [(10.0, 10.5, 9.5, 10.0)] * 5
    one = _ohlc(spark, bars_one, symbol="A")
    flat = _ohlc(spark, bars_flat, symbol="B")
    monkeypatch.setattr(fin4, "ticks", lambda s, d: one.unionAll(flat))
    assert fin4.q_linear_trend_forecast(spark, SF_DIR).count() == 0

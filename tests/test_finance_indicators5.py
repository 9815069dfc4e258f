"""Finance-indicator family part 6 (registry_fin6.py): AR(1) mean
reversion, Parkinson/Garman-Klass range volatility, Amihud illiquidity —
semantics against sequential Python references on hand series. Oracle
parity is covered by tools/verify_oracle.py / -m oracle."""

import math

import pytest
from pyspark.sql import functions as F

import stock_market_etl_pipeline_spark.registry_fin6 as fin6

from conftest import SF_DIR


def _ohlcv(spark, bars, symbol="S"):
    """bars: list of (open, high, low, close, volume)."""
    dates = [
        f"2024-{1 + d // 28:02d}-{d % 28 + 1:02d}" for d in range(len(bars))
    ]
    rows = [
        (symbol, dt, float(o), float(h), float(lo), float(c), int(v))
        for dt, (o, h, lo, c, v) in zip(dates, bars)
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
    closes = []
    p = 100.0
    for i in range(n):
        step = ((seed * (i + 1) * 2654435761) % 997) / 997.0 - 0.5
        p = round(p + step * 4, 2)
        closes.append(p)
    return closes


def _tdiv(a, b):
    """Truncating integer division (Spark `div` / DuckDB `//` on wide ints)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


# ---------------------------------------------------------------------------
# AR(1)
# ---------------------------------------------------------------------------


def _ar1_reference(closes):
    """Exact-integer OLS of cents_t on cents_{t-1}, with the registry's
    quantization: phi at 1e-9, intercept (dollars) from the quantized phi."""
    y = [round(c * 100) for c in closes]
    pairs = [(y[i - 1], y[i]) for i in range(1, len(y))]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(v for _, v in pairs)
    sxy = sum(x * v for x, v in pairs)
    sxx = sum(x * x for x, _ in pairs)
    s_num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    if den == 0:
        return None
    phi9 = _tdiv(s_num * 10**9, den)
    if abs(phi9) >= 10**12:
        return None
    phi = phi9 / 1e9
    intercept = _tdiv((sy * 10**9 - phi9 * sx) * 10**6, n * 10**11) / 1e6
    half = None
    if 0 < phi < 1:
        half = round(-math.log(2) / math.log(phi), 6)
    return n, phi, intercept, half


def _bars_from_closes(closes, vol=1000):
    return [(c, c, c, c, vol) for c in closes]


def test_ar1_recovers_planted_coefficients(spark, monkeypatch):
    # exact AR(1) data: cents_t = 500000 + 0.5 * cents_{t-1}, varied start
    cents = [2000000]
    for _ in range(20):
        cents.append(500000 + cents[-1] // 2)
    closes = [c / 100 for c in cents]
    monkeypatch.setattr(
        fin6, "ticks", lambda s, d: _ohlcv(s, _bars_from_closes(closes))
    )
    row = fin6.q_ar1_mean_reversion(spark, SF_DIR).collect()[0]
    # the series follows the recurrence exactly until it parks at the
    # fixed point; OLS over the moving prefix still identifies phi=0.5
    assert row.phi == pytest.approx(0.5, abs=1e-6)
    # intercept is defined against the QUANTIZED phi, so a ~1e-8 phi
    # offset shifts it by delta_phi * mean(x) ~ cents
    assert row.intercept == pytest.approx(5000.0, abs=0.05)
    # half-life of phi=0.5 is 1 day (phi itself carries ~1e-9
    # quantization + integer-floor recurrence noise)
    assert row.half_life_days == pytest.approx(1.0, abs=1e-5)


def test_ar1_matches_integer_reference_on_walk(spark, monkeypatch):
    closes = _walk(60, seed=11)
    monkeypatch.setattr(
        fin6, "ticks", lambda s, d: _ohlcv(s, _bars_from_closes(closes))
    )
    row = fin6.q_ar1_mean_reversion(spark, SF_DIR).collect()[0]
    n, phi, intercept, half = _ar1_reference(closes)
    assert row.n_pairs == n
    assert row.phi == phi
    assert row.intercept == intercept
    if half is None:
        assert row.half_life_days is None
    else:
        assert row.half_life_days == pytest.approx(half, abs=1e-6)


def test_ar1_constant_series_dropped(spark, monkeypatch):
    closes = [50.0] * 10
    monkeypatch.setattr(
        fin6, "ticks", lambda s, d: _ohlcv(s, _bars_from_closes(closes))
    )
    assert fin6.q_ar1_mean_reversion(spark, SF_DIR).count() == 0


def test_ar1_random_walk_phi_near_one(spark, monkeypatch):
    # a pure unit-root walk: phi estimate should sit near 1, half-life
    # defined (large) or NULL — never a small mean-reversion reading
    closes = _walk(200, seed=3)
    monkeypatch.setattr(
        fin6, "ticks", lambda s, d: _ohlcv(s, _bars_from_closes(closes))
    )
    row = fin6.q_ar1_mean_reversion(spark, SF_DIR).collect()[0]
    assert row.phi > 0.8


# ---------------------------------------------------------------------------
# Parkinson / Garman-Klass
# ---------------------------------------------------------------------------


def _pgk_reference(bars):
    hl2 = [math.log(h / lo) ** 2 for _, h, lo, _, _ in bars]
    co2 = [math.log(c / o) ** 2 for o, _, _, c, _ in bars]
    m_hl2 = sum(hl2) / len(bars)
    k = 2.0 * math.log(2) - 1.0
    m_gk = sum(0.5 * a - k * b for a, b in zip(hl2, co2)) / len(bars)
    pv = m_hl2 / (4.0 * math.log(2))
    return (
        round(pv, 6),
        round(math.sqrt(pv * 252.0), 6),
        round(m_gk, 6),
        round(math.sqrt(m_gk * 252.0), 6) if m_gk > 0 else None,
    )


def test_parkinson_gk_matches_reference(spark, monkeypatch):
    bars = [
        (100.0, 104.0, 98.0, 102.0, 500),
        (102.0, 103.0, 99.0, 100.5, 600),
        (100.5, 106.0, 100.0, 105.0, 700),
        (105.0, 107.5, 101.0, 101.5, 800),
        (101.5, 102.5, 97.5, 98.0, 900),
        (98.0, 101.0, 96.0, 100.0, 400),
    ]
    monkeypatch.setattr(fin6, "ticks", lambda s, d: _ohlcv(s, bars))
    rows = fin6.q_parkinson_gk_volatility(spark, SF_DIR).collect()
    assert len(rows) == 1  # six bars, all January
    r = rows[0]
    pv, pva, gv, gva = _pgk_reference(bars)
    assert r.n_days == 6
    assert r.parkinson_var == pytest.approx(pv, abs=2e-6)
    assert r.parkinson_vol_ann == pytest.approx(pva, abs=2e-6)
    assert r.gk_var == pytest.approx(gv, abs=2e-6)
    assert r.gk_vol_ann == pytest.approx(gva, abs=2e-6)


def test_parkinson_zero_range_is_zero(spark, monkeypatch):
    bars = [(100.0, 100.0, 100.0, 100.0, 100)] * 6
    monkeypatch.setattr(fin6, "ticks", lambda s, d: _ohlcv(s, bars))
    r = fin6.q_parkinson_gk_volatility(spark, SF_DIR).collect()[0]
    assert r.parkinson_var == 0.0
    assert r.gk_var == 0.0
    assert r.gk_vol_ann is None  # m_gk = 0 fails the > 0 guard


def test_parkinson_short_month_dropped(spark, monkeypatch):
    bars = [(100.0, 101.0, 99.0, 100.5, 100)] * 4  # 4 < _MIN_MONTH_DAYS
    monkeypatch.setattr(fin6, "ticks", lambda s, d: _ohlcv(s, bars))
    assert fin6.q_parkinson_gk_volatility(spark, SF_DIR).count() == 0


# ---------------------------------------------------------------------------
# Amihud
# ---------------------------------------------------------------------------


def test_amihud_matches_reference(spark, monkeypatch):
    bars = [
        (100.0, 101.0, 99.0, 100.0, 1000),
        (100.0, 102.0, 99.5, 101.0, 2000),
        (101.0, 101.5, 98.0, 99.0, 500),
        (99.0, 100.0, 98.5, 99.5, 4000),
    ]
    monkeypatch.setattr(fin6, "ticks", lambda s, d: _ohlcv(s, bars))
    r = fin6.q_amihud_illiquidity(spark, SF_DIR).collect()[0]
    closes = [c for _, _, _, c, _ in bars]
    vols = [v for *_, v in bars]
    impacts = [
        abs(closes[i] / closes[i - 1] - 1) / (closes[i] * vols[i]) * 1e12
        for i in range(1, len(bars))
    ]
    assert r.n_days == 3  # first bar has no return
    assert r.amihud_e12 == pytest.approx(
        round(sum(impacts) / len(impacts), 6), abs=2e-6
    )
    assert r.max_impact_e12 == pytest.approx(max(impacts), rel=1e-12)


def test_amihud_single_bar_yields_empty_stats(spark, monkeypatch):
    bars = [(100.0, 101.0, 99.0, 100.0, 1000)]
    monkeypatch.setattr(fin6, "ticks", lambda s, d: _ohlcv(s, bars))
    r = fin6.q_amihud_illiquidity(spark, SF_DIR).collect()[0]
    assert r.n_days == 0
    assert r.amihud_e12 is None
    assert r.max_impact_e12 is None


# ---------------------------------------------------------------------------
# Chaikin A/D line
# ---------------------------------------------------------------------------


def test_chaikin_ad_matches_reference(spark, monkeypatch):
    bars = [
        (10.0, 11.0, 9.0, 10.8, 100),   # closes near high: accumulation
        (10.8, 11.5, 10.5, 10.6, 200),  # mid-range
        (10.6, 10.6, 10.6, 10.6, 300),  # flat range: contributes 0
        (10.6, 12.0, 10.0, 10.1, 150),  # closes near low: distribution
    ]
    df = _ohlcv(spark, bars)
    monkeypatch.setattr(fin6, "ticks", lambda sp, d: df)
    rows = sorted(
        fin6.q_chaikin_ad_line(spark, SF_DIR).collect(),
        key=lambda r: r.date,
    )
    # sequential reference with the SAME quantization (truncating
    # integer division toward zero at 1e6 scale)
    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    acc = 0
    want = []
    for o, h, lo, c, v in bars:
        hc, lc, cc = round(h * 100), round(lo * 100), round(c * 100)
        if hc > lc:
            acc += trunc_div((2 * cc - hc - lc) * 1_000_000, hc - lc) * v
        want.append(acc / 1_000_000.0)
    got = [r.ad_line for r in rows]
    assert got == want
    assert got[0] > 0            # accumulation day
    assert got[2] == got[1]      # flat-range day adds nothing
    assert got[3] < got[2]       # distribution day pulls it down

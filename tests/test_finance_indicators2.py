"""Finance-indicator family part 2 (registry_fin2.py): Williams %R, ROC,
CCI, Aroon — semantics on hand/reference series + one-exchange plan
shapes. Oracle parity is covered by tools/verify_oracle.py."""

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark import registry
import stock_market_etl_pipeline_spark.registry_fin2 as fin2

from conftest import SF_DIR
from test_plan_shapes import count_nodes, plan_of


@pytest.fixture(scope="module")
def qs():
    return registry.queries()


def _ohlc(spark, bars, symbol="S"):
    rows = [
        (symbol, f"2024-{1 + d // 28:02d}-{d % 28 + 1:02d}",
         float(h), float(lo), float(c))
        for d, (h, lo, c) in enumerate(bars)
    ]
    return spark.createDataFrame(
        rows, "symbol string, date string, high double, low double, close double"
    ).select("symbol", F.to_date("date").alias("date"), "high", "low", "close")


def _series(spark, closes, symbol="S"):
    return _ohlc(spark, [(c, c, c) for c in closes], symbol)


# ---------------------------------------------------------------------------
# Williams %R
# ---------------------------------------------------------------------------


def test_williams_r_hand_case(spark, monkeypatch):
    bars = [
        (110, 90, 100),   # channel [90,110] → %R = (100-110)/20·100 = -50
        (105, 95, 105),   # channel [90,110] → close=105 → -25
        (104, 96, 90),    # channel still [90,110] → close at min seen... -100? close=90 → (90-110)/20·100 = -100
    ]
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _ohlc(s, bars))
    rows = sorted(fin2.q_williams_r(spark, SF_DIR).collect(), key=lambda r: r["date"])
    assert [r.williams_r for r in rows] == [-50.0, -25.0, -100.0]


def test_williams_r_flat_channel_is_minus_50_not_negative_zero(spark, monkeypatch):
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _series(s, [100.0, 100.0]))
    vals = [r.williams_r for r in fin2.q_williams_r(spark, SF_DIR).collect()]
    assert vals == [-50.0, -50.0]
    # at the channel top the zero must be +0.0 (engine-portable sign)
    monkeypatch.setattr(
        fin2, "ticks", lambda s, d: _ohlc(s, [(110, 90, 100), (110, 95, 110)])
    )
    rows = sorted(fin2.q_williams_r(spark, SF_DIR).collect(), key=lambda r: r["date"])
    assert str(rows[1].williams_r) == "0.0"


# ---------------------------------------------------------------------------
# ROC
# ---------------------------------------------------------------------------


def test_roc_null_head_then_exact_ratio(spark, monkeypatch):
    closes = [100.0] * 12 + [125.0]
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _series(s, closes))
    rows = sorted(fin2.q_roc(spark, SF_DIR).collect(), key=lambda r: r["date"])
    assert [r.roc for r in rows[:12]] == [None] * 12
    assert rows[12].roc == 25.0


# ---------------------------------------------------------------------------
# CCI
# ---------------------------------------------------------------------------


def test_cci_matches_float_reference(spark, monkeypatch):
    """The exact-integer identity must agree with the classic float
    formula (tp − sma) / (0.015 · meandev) on a random-walk series."""
    import random

    rng = random.Random(7)
    bars = []
    px = 100.0
    for _ in range(40):
        px = round(max(1.0, px + rng.uniform(-2, 2)), 2)
        hi = round(px + rng.uniform(0, 1), 2)
        lo = round(max(0.5, px - rng.uniform(0, 1)), 2)
        bars.append((hi, lo, px))
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _ohlc(s, bars))
    rows = sorted(fin2.q_cci(spark, SF_DIR).collect(), key=lambda r: r["date"])

    tps = [(h + lo + c) / 3.0 for h, lo, c in bars]
    for i, r in enumerate(rows):
        w = tps[max(0, i - fin2._CCI_N + 1): i + 1]
        sma = sum(w) / len(w)
        md = sum(abs(x - sma) for x in w) / len(w)
        exp = 0.0 if md == 0 else (tps[i] - sma) / (0.015 * md)
        assert r.cci == pytest.approx(exp, abs=1e-6), i


def test_cci_constant_series_is_zero(spark, monkeypatch):
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _series(s, [50.0] * 25))
    assert {r.cci for r in fin2.q_cci(spark, SF_DIR).collect()} == {0.0}


# ---------------------------------------------------------------------------
# Aroon
# ---------------------------------------------------------------------------


def test_aroon_hand_positions(spark, monkeypatch):
    """Plant the 26-bar high d bars back and the low elsewhere; Aroon
    must be (25 − d)·4, with the most-recent tie winning."""
    n = fin2._AROON_N  # 25
    bars = [(100.0, 50.0, 75.0)] * 40
    bars[30] = (120.0, 50.0, 75.0)   # spike high at index 30
    bars[35] = (100.0, 20.0, 75.0)   # spike low at index 35
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _ohlc(s, bars))
    rows = sorted(fin2.q_aroon(spark, SF_DIR).collect(), key=lambda r: r["date"])
    # head: fewer than 26 bars → NULL
    assert rows[n - 1].aroon_up is None and rows[n - 1].aroon_down is None
    # at index 39: high spike 9 bars back → (25-9)·4 = 64
    assert rows[39].aroon_up == 64
    # low spike 4 bars back → (25-4)·4 = 84
    assert rows[39].aroon_down == 84
    # flat stretch before the spike enters: most-recent tie wins → 100
    assert rows[n].aroon_up == 100 and rows[n].aroon_down == 100


def test_aroon_spike_exits_window(spark, monkeypatch):
    bars = [(100.0, 50.0, 75.0)] * 60
    bars[10] = (120.0, 50.0, 75.0)
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _ohlc(s, bars))
    rows = sorted(fin2.q_aroon(spark, SF_DIR).collect(), key=lambda r: r["date"])
    # at index 36 the spike (26 bars back) has just left the 26-bar window;
    # ties on the flat 100s resolve to the current bar → 100
    assert rows[36].aroon_up == 100
    # at index 35 the spike is exactly 25 back → (25-25)·4 = 0
    assert rows[35].aroon_up == 0


# ---------------------------------------------------------------------------
# Plan shapes: one scan, one symbol exchange, bounded arrays
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["williams_r_14", "roc_12", "cci_20", "aroon_25"])
def test_fin2_single_scan_single_exchange(spark, qs, name):
    plan = plan_of(qs[name](spark, SF_DIR))
    assert count_nodes(plan, "Scan parquet") == 1
    assert count_nodes(plan, "Exchange") == 1
    # aroon chains row_number → framed argmax windows: 2 Window nodes,
    # still one shared symbol partitioning (the single Exchange above)
    assert count_nodes(plan, "Window") <= 2
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Robust median/MAD anomalies
# ---------------------------------------------------------------------------


def test_robust_anomalies_flag_spike_but_not_drift(spark, monkeypatch):
    """A single spike in an otherwise wiggling series must be flagged;
    the spike must NOT mask itself (median resistance — the failure
    mode of the mean/sigma z-score this op exists to fix)."""
    closes = [100.0, 100.02, 99.98, 100.01, 99.99] * 5
    closes[20] = 130.0  # spike
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _series(s, closes))
    rows = sorted(
        fin2.q_robust_price_anomalies(spark, SF_DIR).collect(),
        key=lambda r: r["date"],
    )
    flagged = {r.close for r in rows}
    assert 130.0 in flagged
    for r in rows:
        if r.close == 130.0:
            # median unmoved by its own spike: stays at the 100-ish level
            assert 99.9 < r.rolling_median < 100.1
            assert r.robust_score > 3.0


def test_robust_anomalies_flat_window_flags_any_move(spark, monkeypatch):
    """MAD = 0 (flat history) → any deviation flags, with NULL score."""
    closes = [50.0] * 10 + [50.01]
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _series(s, closes))
    rows = fin2.q_robust_price_anomalies(spark, SF_DIR).collect()
    assert len(rows) == 1
    assert rows[0].close == 50.01 and rows[0].robust_score is None
    assert rows[0].rolling_mad == 0.0


def test_robust_anomalies_median_exactness_even_window(spark, monkeypatch):
    """Even-count window: median is the exact mean of the two mid cents
    (the ×2 trick — no float halves)."""
    closes = [10.0, 20.0]  # window at row 2 = [1000, 2000] cents → med 15.00
    monkeypatch.setattr(fin2, "ticks", lambda s, d: _series(s, closes))
    rows = sorted(
        fin2.q_robust_price_anomalies(spark, SF_DIR).collect(),
        key=lambda r: r["date"],
    )
    # row 2: dev2 = |2·2000 − 3000| = 1000; d = [1000,1000] → mad4 = 2000
    # 2·dev2 = 2000 ≤ 3·mad4 → NOT flagged; row 1 dev2=0 → not flagged
    assert rows == []


def test_robust_anomalies_plan_single_exchange(spark, qs):
    plan = plan_of(qs["robust_price_anomalies"](spark, SF_DIR))
    assert count_nodes(plan, "Scan parquet") == 1
    assert count_nodes(plan, "Exchange") == 1
    assert count_nodes(plan, "Window") == 1
    assert "SortMergeJoin" not in plan

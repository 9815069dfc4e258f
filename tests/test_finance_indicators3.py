"""Finance-indicator family part 3 (registry_fin3.py): CMF, Ultimate
Oscillator, DMI/DX, Vortex, pivot points — semantics against sequential
Python references on hand series + one-exchange plan shapes. Oracle
parity is covered by tools/verify_oracle.py / the -m oracle marker."""

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark import registry
import stock_market_etl_pipeline_spark.registry_fin3 as fin3

from conftest import SF_DIR
from test_plan_shapes import count_nodes, plan_of


@pytest.fixture(scope="module")
def qs():
    return registry.queries()


def _ohlcv(spark, bars, symbol="S"):
    """bars: list of (high, low, close, volume)."""
    rows = [
        (symbol, f"2024-{1 + d // 28:02d}-{d % 28 + 1:02d}",
         float(h), float(lo), float(c), int(v))
        for d, (h, lo, c, v) in enumerate(bars)
    ]
    return spark.createDataFrame(
        rows,
        "symbol string, date string, high double, low double, "
        "close double, volume bigint",
    ).select(
        "symbol", F.to_date("date").alias("date"),
        "high", "low", "close", "volume",
    )


def _walk(n, seed=7):
    """Deterministic OHLCV walk with varied ranges and volumes."""
    bars = []
    p = 100.0
    for i in range(n):
        step = ((seed * (i + 1) * 2654435761) % 997) / 997.0 - 0.5
        p = round(p + step * 4, 2)
        rng = ((i * 31 + seed) % 7) / 4.0
        hi = round(p + rng, 2)
        lo = round(p - rng - 0.25, 2)
        close = round(lo + ((i * 17) % 5) / 4.0 * (hi - lo), 2)
        bars.append((hi, lo, close, 1000 + (i * 137) % 500))
    return bars


def _cents(bars):
    return [
        (round(h * 100), round(lo * 100), round(c * 100), v)
        for h, lo, c, v in bars
    ]


# ---------------------------------------------------------------------------
# CMF
# ---------------------------------------------------------------------------


def test_cmf_matches_sequential_reference(spark, monkeypatch):
    bars = _walk(40)
    monkeypatch.setattr(fin3, "ticks", lambda s, d: _ohlcv(s, bars))
    got = {
        r.date.day + r.date.month * 100: r.cmf
        for r in fin3.q_cmf(spark, SF_DIR).collect()
    }
    cb = _cents(bars)
    mfv = [
        ((2 * c - h - lo) * v) / (h - lo) if h > lo else 0.0
        for h, lo, c, v in cb
    ]
    for t in range(len(bars)):
        w = slice(max(0, t - 19), t + 1)
        want = round(sum(mfv[w]) / float(sum(v for *_, v in cb[w])), 6)
        day = t % 28 + 1 + (1 + t // 28) * 100
        assert got[day] == pytest.approx(want, abs=2e-6)


def test_cmf_flat_bar_contributes_zero(spark, monkeypatch):
    # one flat bar (high == low) inside the frame must not divide by zero
    bars = [(101, 99, 100, 1000), (100, 100, 100, 500), (102, 98, 101, 800)]
    monkeypatch.setattr(fin3, "ticks", lambda s, d: _ohlcv(s, bars))
    rows = sorted(fin3.q_cmf(spark, SF_DIR).collect(), key=lambda r: r.date)
    # flat bar adds volume but zero flow
    assert rows[1].cmf == pytest.approx(rows[0].cmf * 1000 / 1500, abs=1e-6)


# ---------------------------------------------------------------------------
# Ultimate Oscillator
# ---------------------------------------------------------------------------


def test_ultimate_oscillator_matches_sequential_reference(spark, monkeypatch):
    bars = _walk(45, seed=11)
    monkeypatch.setattr(fin3, "ticks", lambda s, d: _ohlcv(s, bars))
    got = sorted(
        fin3.q_ultimate_oscillator(spark, SF_DIR).collect(),
        key=lambda r: r.date,
    )
    cb = _cents(bars)
    # first-bar seed: TR1 = H1-L1, BP1 = C1-L1 (engines' null-skipping
    # GREATEST/LEAST = the classic convention)
    bp, tr = [cb[0][2] - cb[0][1]], [cb[0][0] - cb[0][1]]
    for t in range(1, len(cb)):
        h, lo, c, _ = cb[t]
        pc = cb[t - 1][2]
        bp.append(c - min(lo, pc))
        tr.append(max(h, pc) - min(lo, pc))
    for t, row in enumerate(got):
        flows = list(range(max(0, t - 27), t + 1))
        if len(flows) < 28:
            assert row.uo is None
            continue
        s = lambda xs, k: sum(xs[i] for i in flows[-k:])  # noqa: E731
        b7, t7 = s(bp, 7), s(tr, 7)
        b14, t14 = s(bp, 14), s(tr, 14)
        b28, t28 = s(bp, 28), s(tr, 28)
        want = (
            100.0
            * (4 * b7 * t14 * t28 + 2 * b14 * t7 * t28 + b28 * t7 * t14)
            / (7 * t7 * t14 * t28)
        )
        assert row.uo == pytest.approx(want, abs=2e-9)  # 1e-9-quantized
        assert 0.0 <= row.uo <= 100.0


def test_ultimate_oscillator_warmup_is_null(spark, monkeypatch):
    bars = _walk(20, seed=3)  # < 28 complete flows everywhere
    monkeypatch.setattr(fin3, "ticks", lambda s, d: _ohlcv(s, bars))
    assert all(
        r.uo is None
        for r in fin3.q_ultimate_oscillator(spark, SF_DIR).collect()
    )


# ---------------------------------------------------------------------------
# DMI / DX
# ---------------------------------------------------------------------------


def test_dmi_matches_sequential_reference(spark, monkeypatch):
    bars = _walk(40, seed=5)
    monkeypatch.setattr(fin3, "ticks", lambda s, d: _ohlcv(s, bars))
    got = sorted(fin3.q_dmi(spark, SF_DIR).collect(), key=lambda r: r.date)
    cb = _cents(bars)
    # first bar: zero directional movement, TR1 = H1-L1
    pdm, mdm, tr = [0], [0], [cb[0][0] - cb[0][1]]
    for t in range(1, len(cb)):
        up = cb[t][0] - cb[t - 1][0]
        dn = cb[t - 1][1] - cb[t][1]
        pdm.append(up if (up > dn and up > 0) else 0)
        mdm.append(dn if (dn > up and dn > 0) else 0)
        tr.append(max(cb[t][0], cb[t - 1][2]) - min(cb[t][1], cb[t - 1][2]))
    for t, row in enumerate(got):
        flows = list(range(max(0, t - 13), t + 1))
        if len(flows) < 14:
            assert row.plus_di is None and row.dx is None
            continue
        sp = sum(pdm[i] for i in flows)
        sm = sum(mdm[i] for i in flows)
        st = sum(tr[i] for i in flows)
        assert row.plus_di == pytest.approx(100 * sp / st, rel=1e-12)
        assert row.minus_di == pytest.approx(100 * sm / st, rel=1e-12)
        if sp + sm:
            assert row.dx == pytest.approx(
                100 * abs(sp - sm) / (sp + sm), rel=1e-12
            )


def test_dx_needs_no_true_range(spark, monkeypatch):
    """DX's TR denominators cancel: an all-up series has DX = 100
    regardless of range sizes."""
    bars = [(100 + 2 * i, 99 + 2 * i, 100 + 2 * i, 10) for i in range(20)]
    monkeypatch.setattr(fin3, "ticks", lambda s, d: _ohlcv(s, bars))
    rows = sorted(fin3.q_dmi(spark, SF_DIR).collect(), key=lambda r: r.date)
    assert all(r.dx == 100.0 for r in rows if r.dx is not None)
    assert any(r.dx is not None for r in rows)


# ---------------------------------------------------------------------------
# Vortex
# ---------------------------------------------------------------------------


def test_vortex_matches_sequential_reference(spark, monkeypatch):
    bars = _walk(40, seed=13)
    monkeypatch.setattr(fin3, "ticks", lambda s, d: _ohlcv(s, bars))
    got = sorted(fin3.q_vortex(spark, SF_DIR).collect(), key=lambda r: r.date)
    cb = _cents(bars)
    # vortex movements need a previous bar (NULL on bar 0 — the frame's
    # warm-up counts vm, not tr); tr[0] exists but never enters a frame
    # that passes the completeness guard
    vmp, vmm, tr = [None], [None], [cb[0][0] - cb[0][1]]
    for t in range(1, len(cb)):
        vmp.append(abs(cb[t][0] - cb[t - 1][1]))
        vmm.append(abs(cb[t][1] - cb[t - 1][0]))
        tr.append(max(cb[t][0], cb[t - 1][2]) - min(cb[t][1], cb[t - 1][2]))
    for t, row in enumerate(got):
        flows = [i for i in range(max(0, t - 13), t + 1) if vmp[i] is not None]
        if len(flows) < 14:
            assert row.vi_plus is None and row.vi_minus is None
            continue
        st = sum(tr[i] for i in flows)
        assert row.vi_plus == pytest.approx(
            sum(vmp[i] for i in flows) / st, rel=1e-12
        )
        assert row.vi_minus == pytest.approx(
            sum(vmm[i] for i in flows) / st, rel=1e-12
        )


# ---------------------------------------------------------------------------
# Pivot points
# ---------------------------------------------------------------------------


def test_pivot_points_hand_case(spark, monkeypatch):
    bars = [(110, 90, 100, 10), (105, 95, 102, 10)]
    monkeypatch.setattr(fin3, "ticks", lambda s, d: _ohlcv(s, bars))
    rows = sorted(
        fin3.q_pivot_points(spark, SF_DIR).collect(), key=lambda r: r.date
    )
    assert rows[0].pivot is None  # no previous session
    # P = (110+90+100)/3 = 100; R1 = 2P−L = 110; S1 = 2P−H = 90;
    # R2 = P+(H−L) = 120; S2 = P−(H−L) = 80
    r = rows[1]
    assert (r.pivot, r.r1, r.s1, r.r2, r.s2) == (100.0, 110.0, 90.0, 120.0, 80.0)
    # ordering invariant: S2 ≤ S1 ≤ P ≤ R1 ≤ R2 by construction
    assert r.s2 <= r.s1 <= r.pivot <= r.r1 <= r.r2


# ---------------------------------------------------------------------------
# Plan shapes: one symbol exchange each, no extra shuffles
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["cmf_20", "ultimate_oscillator", "dmi_14", "vortex_14",
             "pivot_points"]
)
def test_single_exchange_plans(qs, spark, name):
    plan = plan_of(qs[name](spark, SF_DIR))
    # one shuffle for the ticks groupBy; the window stack reuses it
    assert count_nodes(plan, "Exchange") == 1
    assert "Window" in plan

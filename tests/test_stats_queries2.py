"""Stats part 2 (registry_stats2.py): weighted median selection and the
Wald-Wolfowitz runs test — semantics against Python references on hand
data. Oracle parity is covered by tools/verify_oracle.py / -m oracle."""

import math

import pytest
from pyspark.sql import functions as F

import stock_market_etl_pipeline_spark.registry_stats2 as st2

from conftest import SF_DIR


# ---------------------------------------------------------------------------
# Weighted median
# ---------------------------------------------------------------------------


def _tables(spark, lineitem_rows):
    """lineitem rows: (suppkey, price, qty). Two suppliers -> two nations."""
    li = spark.createDataFrame(
        lineitem_rows, "l_suppkey long, l_extendedprice double, l_quantity long"
    )
    sup = spark.createDataFrame(
        [(1, 10), (2, 20)], "s_suppkey long, s_nationkey long"
    )
    nat = spark.createDataFrame(
        [(10, "FRANCE"), (20, "KENYA")], "n_nationkey long, n_name string"
    )
    return {"lineitem": li, "supplier": sup, "nation": nat}


def _wmedian(rows):
    """rows: (price, w) — first row (by price, w) where 2*cum >= tot."""
    rows = sorted(rows)
    tot = sum(w for _, w in rows)
    cum = 0
    for p, w in rows:
        cum += w
        if 2 * cum >= tot:
            return p, tot
    raise AssertionError


def test_weighted_median_matches_reference(spark, monkeypatch):
    li = [
        (1, 10.0, 1), (1, 20.0, 1), (1, 30.0, 8),   # weight mass at 30
        (2, 5.0, 3), (2, 50.0, 2), (2, 7.0, 1),
    ]
    tabs = _tables(spark, li)
    monkeypatch.setattr(st2, "load_table", lambda s, d, n: tabs[n])
    out = {
        r.nation: r
        for r in st2.q_weighted_median_price_by_nation(spark, SF_DIR).collect()
    }
    p1, t1 = _wmedian([(p, w) for k, p, w in li if k == 1])
    p2, t2 = _wmedian([(p, w) for k, p, w in li if k == 2])
    assert out["FRANCE"].weighted_median_price == p1 == 30.0
    assert out["FRANCE"].total_quantity == t1 == 10
    assert out["KENYA"].weighted_median_price == p2 == 5.0  # 2*3 >= 6
    assert out["KENYA"].total_quantity == t2 == 6


def test_weighted_median_differs_from_unweighted(spark, monkeypatch):
    # unweighted median of prices {1, 2, 100} is 2; quantity mass sits
    # on 100, so the weighted median must be 100
    li = [(1, 1.0, 1), (1, 2.0, 1), (1, 100.0, 10)]
    tabs = _tables(spark, li)
    monkeypatch.setattr(st2, "load_table", lambda s, d, n: tabs[n])
    r = st2.q_weighted_median_price_by_nation(spark, SF_DIR).collect()[0]
    assert r.weighted_median_price == 100.0


# ---------------------------------------------------------------------------
# Runs test
# ---------------------------------------------------------------------------


def _ohlcv_from_closes(spark, closes, symbol="S"):
    dates = [
        f"2024-{1 + d // 28:02d}-{d % 28 + 1:02d}" for d in range(len(closes))
    ]
    rows = [
        (symbol, dt, float(c), float(c), float(c), float(c), 100)
        for dt, c in zip(dates, closes)
    ]
    return spark.createDataFrame(
        rows,
        "symbol string, date string, open double, high double, "
        "low double, close double, volume bigint",
    ).select(
        "symbol", F.to_date("date").alias("date"),
        "open", "high", "low", "close", "volume",
    )


def _runs_reference(closes):
    signs = []
    for a, b in zip(closes, closes[1:]):
        if b > a:
            signs.append(1)
        elif b < a:
            signs.append(-1)
    n1 = signs.count(1)
    n2 = signs.count(-1)
    runs = 0
    prev = None
    for s in signs:
        if s != prev:
            runs += 1
        prev = s
    n = n1 + n2
    if n1 == 0 or n2 == 0 or n <= 1:
        return None
    two = 2.0 * n1 * n2
    if two * (two - n) <= 0:
        return None
    mu = 1.0 + two / n
    var = two * (two - n) / (float(n) * float(n) * (n - 1.0))
    return n1, n2, runs, round((runs - mu) / math.sqrt(var), 6)


def test_runs_test_matches_reference_with_flat_days(spark, monkeypatch):
    # up up FLAT up down down up — the flat day must NOT split run 1
    closes = [10, 11, 12, 12, 13, 12, 11, 12]
    monkeypatch.setattr(
        st2, "ticks", lambda s, d: _ohlcv_from_closes(spark, closes)
    )
    r = st2.q_runs_test_updown(spark, SF_DIR).collect()[0]
    n1, n2, runs, z = _runs_reference(closes)
    assert (r.n_up, r.n_down, r.n_runs) == (n1, n2, runs)
    assert runs == 3  # [up up up up] [down down] [up]
    assert r.z_score == pytest.approx(z, abs=2e-6)


def test_runs_test_alternating_reads_positive_z(spark, monkeypatch):
    # perfect alternation: maximum number of runs -> strongly positive z
    closes = [10 + (i % 2) for i in range(40)]
    monkeypatch.setattr(
        st2, "ticks", lambda s, d: _ohlcv_from_closes(spark, closes)
    )
    r = st2.q_runs_test_updown(spark, SF_DIR).collect()[0]
    assert r.n_runs == 39
    assert r.z_score > 1.96


def test_runs_test_trending_reads_negative_z(spark, monkeypatch):
    # two long runs -> far fewer runs than expected -> negative z
    closes = list(range(10, 30)) + list(range(30, 10, -1))
    monkeypatch.setattr(
        st2, "ticks", lambda s, d: _ohlcv_from_closes(spark, closes)
    )
    r = st2.q_runs_test_updown(spark, SF_DIR).collect()[0]
    assert r.n_runs == 2
    assert r.z_score < -1.96
    n1, n2, runs, z = _runs_reference(closes)
    assert r.z_score == pytest.approx(z, abs=2e-6)


def test_runs_test_degenerate_dropped(spark, monkeypatch):
    closes = [10, 11, 12, 13]  # all up: n_down = 0
    monkeypatch.setattr(
        st2, "ticks", lambda s, d: _ohlcv_from_closes(spark, closes)
    )
    assert st2.q_runs_test_updown(spark, SF_DIR).count() == 0


# ---------------------------------------------------------------------------
# Segment migration
# ---------------------------------------------------------------------------


def _orders(spark, rows):
    """rows: (custkey, date_iso, totalprice)."""
    return spark.createDataFrame(
        [(i, c, d, float(p)) for i, (c, d, p) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderdate string, "
        "o_totalprice double",
    )


def test_segment_migration_hand_case(spark, monkeypatch):
    # 2023: c1 spends most (seg 1), c2 (seg 2), c3 (seg 3), c4 (seg 4)
    # 2024: c4 jumps to the top, c1 drops to the bottom; c5 is new
    rows = [
        (1, "2023-03-01", 400.0), (2, "2023-03-01", 300.0),
        (3, "2023-03-01", 200.0), (4, "2023-03-01", 100.0),
        (1, "2024-03-01", 100.0), (2, "2024-03-01", 300.0),
        (3, "2024-03-01", 200.0), (4, "2024-03-01", 400.0),
        (5, "2024-03-01", 50.0),
    ]
    tabs = {"orders": _orders(spark, rows)}
    monkeypatch.setattr(st2, "load_table", lambda s, d, n: tabs[n])
    out = {
        (r.seg_from, r.seg_to): r
        for r in st2.q_customer_segment_migration(spark, SF_DIR).collect()
    }
    # 2023 segments with 4 customers: ranks 1-4 -> 4*(r-1)//4+1 = 1..4
    # 2024 has 5 customers: seg = 4*(rank-1)//5 + 1:
    # c4: rank 1 -> seg 1; c2: rank 2 -> 4//5+1 = 1; c3: rank 3 ->
    # 8//5+1 = 2; c1: rank 4 -> 12//5+1 = 3; c5: rank 5 -> seg 4
    # (c5 not in 2023: excluded from the matrix)
    assert out[(1, 3)].n_customers == 1        # c1 fell 1 -> 3
    assert out[(4, 1)].n_customers == 1        # c4 rose 4 -> 1
    assert out[(2, 1)].n_customers == 1        # c2 rose into the top band
    assert out[(3, 2)].n_customers == 1        # c3 nudged up
    for r in out.values():
        assert r.year_from == 2023
        assert r.migration_prob == 1.0  # every from-segment had 1 customer


def test_segment_migration_probs_sum_to_one(spark, monkeypatch):
    rows = []
    for c in range(12):
        rows.append((c, "2023-06-01", 100.0 + 7 * c))
        rows.append((c, "2024-06-01", 100.0 + 7 * ((c * 5) % 12)))
    tabs = {"orders": _orders(spark, rows)}
    monkeypatch.setattr(st2, "load_table", lambda s, d, n: tabs[n])
    out = st2.q_customer_segment_migration(spark, SF_DIR).collect()
    by_from = {}
    for r in out:
        by_from.setdefault((r.year_from, r.seg_from), 0.0)
        by_from[(r.year_from, r.seg_from)] += r.migration_prob
    for s in by_from.values():
        assert s == pytest.approx(1.0, rel=1e-12)


# ---------------------------------------------------------------------------
# Hill estimator
# ---------------------------------------------------------------------------


def test_hill_recovers_planted_pareto_exponent(spark, monkeypatch):
    # exact Pareto(alpha=2) quantile grid: x_i = (n/i)^(1/2), scaled
    n = 2000
    alpha = 2.0
    rows = [
        (c, "2023-01-01", 100.0 * (n / (i + 1)) ** (1 / alpha))
        for i, c in enumerate(range(n))
    ]
    tabs = {"orders": _orders(spark, rows)}
    monkeypatch.setattr(st2, "load_table", lambda s, d, n_: tabs[n_])
    r = st2.q_hill_tail_index(spark, SF_DIR).collect()[0]
    assert r.k_order_stats == 500
    # Hill on the exact quantile grid reads close to 1/alpha
    assert r.hill_estimate == pytest.approx(1 / alpha, rel=0.05)
    assert r.pareto_alpha == pytest.approx(alpha, rel=0.05)


def test_hill_matches_python_reference(spark, monkeypatch):
    import random

    rng = random.Random(11)
    rows = [
        (c, "2023-01-01", round(100.0 * (1.0 / rng.random()) ** 0.7, 2))
        for c in range(1500)
    ]
    tabs = {"orders": _orders(spark, rows)}
    monkeypatch.setattr(st2, "load_table", lambda s, d, n_: tabs[n_])
    r = st2.q_hill_tail_index(spark, SF_DIR).collect()[0]
    cents = sorted(
        (round(p * 100) for _, _, p in rows), reverse=True
    )
    cmin = cents[500]
    hill = sum(math.log(c / cmin) for c in cents[:500]) / 500
    assert r.x_min == cmin / 100.0
    assert r.hill_estimate == pytest.approx(round(hill, 6), abs=2e-6)
    assert r.pareto_alpha == pytest.approx(round(1 / hill, 6), abs=2e-6)

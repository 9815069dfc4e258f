"""Event-analytics semantics on hand-built streams (registry_ext3):
transition-matrix estimation and inter-event gap distributions."""

import datetime as dt

from pyspark.sql import functions as F

import stock_market_etl_pipeline_spark.registry_ext3 as ext3
from stock_market_etl_pipeline_spark import registry

from conftest import SF_DIR


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, seconds_offset)"""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    data = [
        (eid, base + dt.timedelta(seconds=s), uid, et, 1.0, "{}")
        for eid, uid, et, s in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_transition_matrix_counts_and_probs(spark, monkeypatch):
    """u1: A→B→A (pairs AB, BA); u2: A→B (pair AB). From A: 2×→B, prob 1;
    from B: 1×→A, prob 1. Cross-user pairs must NOT count."""
    ev = _events(
        spark,
        [
            (1, 1, "A", 0), (2, 1, "B", 10), (3, 1, "A", 20),
            (4, 2, "A", 5), (5, 2, "B", 6),
        ],
    )
    monkeypatch.setattr(ext3, "load_events", lambda s, d: ev)
    got = {
        (r.from_event, r.to_event): (r.n_transitions, r.transition_prob)
        for r in registry.queries()["event_transition_matrix"](
            spark, SF_DIR
        ).collect()
    }
    assert got == {("A", "B"): (2, 1.0), ("B", "A"): (1, 1.0)}


def test_transition_probs_sum_to_one_on_testdata(spark):
    rows = registry.queries()["event_transition_matrix"](
        spark, SF_DIR
    ).collect()
    assert len(rows) > 0
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_event, []).append(r.transition_prob)
    for probs in by_from.values():
        assert abs(sum(probs) - 1.0) < 1e-12


def test_inter_event_gaps_same_type_same_user_only(spark, monkeypatch):
    """u1 type A at t=0,10,40 → gaps 10s, 30s; u1 type B at t=5 (no gap);
    u2 type A at t=100 (no gap — other user's As must not chain in)."""
    ev = _events(
        spark,
        [
            (1, 1, "A", 0), (2, 1, "B", 5), (3, 1, "A", 10), (4, 1, "A", 40),
            (5, 2, "A", 100),
        ],
    )
    monkeypatch.setattr(ext3, "load_events", lambda s, d: ev)
    got = {
        r.event_type: r
        for r in registry.queries()["inter_event_gaps"](spark, SF_DIR).collect()
    }
    assert set(got) == {"A"}
    a = got["A"]
    assert (a.n_gaps, a.min_gap_us, a.max_gap_us) == (2, 10_000_000, 30_000_000)
    assert a.median_gap_s == 20.0
    assert a.p90_gap_s == 28.0  # 10 + 0.9*(30-10)


def test_rolling_active_users_covered_day_identity(spark, monkeypatch):
    """u1 active day 1; u2 active day 1 and day 40: day 1 → 2 users;
    days 2-30 → 2 (both windows cover); day 31+ only if u2's day-40
    event covers... day 40-69 covers u2; but the curve is cut at the
    max observed day (40). Hand-check a few days."""
    ev = _events(
        spark,
        [
            (1, 1, "view", 0),
            (2, 2, "view", 0),
            (3, 2, "click", 39 * 86400),
        ],
    )
    monkeypatch.setattr(ext3, "load_events", lambda s, d: ev)
    got = {
        str(r.day): r.mau_30d
        for r in registry.queries()["rolling_active_users"](
            spark, SF_DIR
        ).collect()
    }
    assert got["2024-01-01"] == 2
    assert got["2024-01-30"] == 2      # day 30 of both users' windows
    assert "2024-01-31" not in got     # nobody's window covers day 31..38
    assert got["2024-02-09"] == 1      # u2's second event (day 40)
    assert max(got) == "2024-02-09"    # cut at max observed day

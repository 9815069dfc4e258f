"""peak_concurrency_by_day: planted interval cases (midnight carry, µs
boundary ties, simultaneous boundaries) + brute-force agreement on a
pseudo-random event set. Oracle parity is covered by -m oracle."""

from __future__ import annotations

import datetime as dt

import pytest

import stock_market_etl_pipeline_spark.registry_ext3 as ext3

from conftest import SF_DIR


def _events(spark, rows):
    """rows: (user_id, ts) — value/props filled with constants."""
    data = [
        (i, ts, int(uid), "view", 1.0, "{}")
        for i, (uid, ts) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def _got(spark, monkeypatch, rows):
    monkeypatch.setattr(ext3, "load_events", lambda s, d: _events(spark, rows))
    return {
        r.day: (r.peak_concurrency, r.n_sessions_started)
        for r in ext3.q_peak_concurrency_by_day(spark, SF_DIR).collect()
    }


T = dt.datetime


def test_two_overlapping_one_disjoint(spark, monkeypatch):
    rows = [
        (1, T(2024, 1, 1, 10, 0)), (1, T(2024, 1, 1, 10, 20)),   # u1 10:00-10:20
        (2, T(2024, 1, 1, 10, 10)), (2, T(2024, 1, 1, 10, 30)),  # u2 overlaps u1
        (3, T(2024, 1, 1, 15, 0)),                               # point session
    ]
    got = _got(spark, monkeypatch, rows)
    assert got == {dt.date(2024, 1, 1): (2, 3)}


def test_closed_interval_touching_endpoints_overlap(spark, monkeypatch):
    # u2 starts at the exact instant u1 ends: closed intervals -> both open
    rows = [
        (1, T(2024, 1, 2, 9, 0)), (1, T(2024, 1, 2, 9, 10)),
        (2, T(2024, 1, 2, 9, 10)), (2, T(2024, 1, 2, 9, 20)),
    ]
    got = _got(spark, monkeypatch, rows)
    assert got[dt.date(2024, 1, 2)][0] == 2
    # one microsecond later there is no overlap
    rows_apart = [
        (1, T(2024, 1, 2, 9, 0)), (1, T(2024, 1, 2, 9, 10)),
        (2, T(2024, 1, 2, 9, 10, 0, 1)), (2, T(2024, 1, 2, 9, 20)),
    ]
    got = _got(spark, monkeypatch, rows_apart)
    assert got[dt.date(2024, 1, 2)][0] == 1


def test_midnight_carry_counts_on_next_day(spark, monkeypatch):
    # session spans midnight (23:50 -> 00:10 via 20-min gap): day 2's
    # peak includes it even though no session STARTS on day 2 before it
    # closes; a second day-2 session overlaps nothing
    rows = [
        (1, T(2024, 1, 1, 23, 50)), (1, T(2024, 1, 2, 0, 10)),
        (2, T(2024, 1, 2, 6, 0)),
    ]
    got = _got(spark, monkeypatch, rows)
    assert got[dt.date(2024, 1, 1)] == (1, 1)
    assert got[dt.date(2024, 1, 2)] == (1, 1)
    # and a day-2 session OVERLAPPING the carried one peaks at 2
    rows.append((3, T(2024, 1, 2, 0, 5)))
    got = _got(spark, monkeypatch, rows)
    assert got[dt.date(2024, 1, 2)] == (2, 2)


def test_session_ending_before_midnight_not_carried(spark, monkeypatch):
    rows = [
        (1, T(2024, 1, 1, 23, 40)), (1, T(2024, 1, 1, 23, 59, 59, 999999)),
    ]
    got = _got(spark, monkeypatch, rows)
    assert dt.date(2024, 1, 2) not in got
    assert got[dt.date(2024, 1, 1)] == (1, 1)
    # ...but ending AT midnight is open at midnight -> carried to day 2
    rows2 = [
        (1, T(2024, 1, 1, 23, 40)), (1, T(2024, 1, 2, 0, 0, 0, 0)),
    ]
    got = _got(spark, monkeypatch, rows2)
    assert got[dt.date(2024, 1, 2)] == (1, 0)


def test_brute_force_agreement(spark, monkeypatch):
    # pseudo-random bursts across 4 days and 7 users
    rows = []
    for u in range(7):
        t = T(2024, 3, 1, (u * 3) % 24, 0)
        for k in range(40):
            step_min = ((u * 7919 + k * 104729) % 90) + 1   # 1..90 min
            t = t + dt.timedelta(minutes=step_min)
            rows.append((u, t))
    got = _got(spark, monkeypatch, rows)

    # sequential reference: same 30-min gap sessionization
    ivals = []
    by_user: dict[int, list[dt.datetime]] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        for ts in tss[1:]:
            if (ts - prev).total_seconds() > 1800:
                ivals.append((start, prev))
                start = ts
            prev = ts
        ivals.append((start, prev))
    days = sorted(
        {s.date() for s, _ in ivals}
        | {e.date() for _, e in ivals}
    )
    want = {}
    for d in days:
        d0 = dt.datetime.combine(d, dt.time())
        d1 = d0 + dt.timedelta(days=1)
        instants = {d0} | {
            s for s, _ in ivals if d0 <= s < d1
        } | {
            e + dt.timedelta(microseconds=1)
            for _, e in ivals
            if d0 <= e + dt.timedelta(microseconds=1) < d1
        }
        peak = max(
            sum(1 for s, e in ivals if s <= t <= e) for t in instants
        )
        n_starts = sum(1 for s, _ in ivals if d0 <= s < d1)
        if peak > 0 or n_starts > 0:
            want[d] = (peak, n_starts)
    # engine emits only days touched by a boundary or carry; a day with
    # peak 0 and no starts shouldn't appear on either side
    want = {d: v for d, v in want.items() if v != (0, 0)}
    got = {d: v for d, v in got.items() if v != (0, 0)}
    assert got == want


def test_nonvacuous_on_testdata(spark):
    from stock_market_etl_pipeline_spark import registry

    rows = registry.queries()["peak_concurrency_by_day"](spark, SF_DIR).collect()
    assert rows and max(r.peak_concurrency for r in rows) >= 1

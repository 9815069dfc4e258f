"""Stats part 4 (registry_stats4.py): Kruskal-Wallis, Wilcoxon
signed-rank, Cramér's V, Roll spread, inter-session gaps, order-month
streaks, MAD — semantics against Python references on hand data.
Oracle parity is covered by tools/verify_oracle.py."""

import math
from datetime import date, datetime

from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

import stock_market_etl_pipeline_spark.registry_stats4 as st4

from conftest import SF_DIR


def _docs(spark, rows):
    """rows: (doc_id, n_chars, source)."""
    return spark.createDataFrame(
        [(i, "x", "xx", s, n) for i, n, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _ticks_df(spark, rows):
    """rows: (symbol, date, close, volume)."""
    return spark.createDataFrame(
        [(s, dt, c, c, c, c, v) for s, dt, c, v in rows],
        "symbol long, date date, open double, high double, low double, "
        "close double, volume bigint",
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis
# ---------------------------------------------------------------------------


def _avg_ranks(pooled):
    """value -> 1-based tie-averaged rank over the sorted pool."""
    s = sorted(pooled)
    ranks, i = {}, 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2
        i = j
    return ranks


def _kw_reference(groups):
    """Tie-corrected Kruskal-Wallis H (float reference; the query's
    quantized closure agrees to ≲1e-8, far inside the 6dp round)."""
    pooled = [v for vs in groups.values() for v in vs]
    n = len(pooled)
    ranks = _avg_ranks(pooled)
    h = sum(
        (sum(ranks[v] for v in vs)) ** 2 / len(vs)
        for vs in groups.values()
    ) * 12 / (n * (n + 1)) - 3 * (n + 1)
    ties = 0
    for v in set(pooled):
        t = pooled.count(v)
        ties += t ** 3 - t
    return h / (1 - ties / (n ** 3 - n))


def test_kruskal_wallis_matches_reference(spark, monkeypatch):
    data = {
        "s1": [10, 20, 20, 30, 40, 55],
        "s2": [50, 60, 20, 70, 80],
        "s3": [15, 25, 35, 35],
    }
    rows, i = [], 0
    for s, vs in data.items():
        for v in vs:
            rows.append((i, v, s))
            i += 1
    monkeypatch.setattr(
        st4, "load_table", lambda sp, d, n: _docs(spark, rows)
    )
    out = st4.q_kruskal_wallis_length_by_source(spark, SF_DIR).collect()[0]
    assert out.k_groups == 3 and out.n_total == 15
    assert abs(out.h_stat - _kw_reference(data)) < 1e-6


def test_kruskal_wallis_all_tied_drops(spark, monkeypatch):
    rows = [(i, 42, f"s{i % 3}") for i in range(9)]  # one value: undefined
    monkeypatch.setattr(
        st4, "load_table", lambda sp, d, n: _docs(spark, rows)
    )
    assert st4.q_kruskal_wallis_length_by_source(spark, SF_DIR).count() == 0


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank
# ---------------------------------------------------------------------------


def _wilcoxon_reference(deltas):
    """(n, w_plus, z) over nonzero integer deltas, tie-averaged."""
    nz = [d for d in deltas if d != 0]
    n = len(nz)
    ranks = _avg_ranks([abs(d) for d in nz])
    w_plus = sum(ranks[abs(d)] for d in nz if d > 0)
    ties = 0
    for v in set(abs(d) for d in nz):
        t = sum(1 for d in nz if abs(d) == v)
        ties += t ** 3 - t
    var = n * (n + 1) * (2 * n + 1) / 24 - ties / 48
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
    return n, w_plus, round(z, 6)


def test_wilcoxon_signed_rank_matches_reference(spark, monkeypatch):
    closes = [10.00, 10.05, 10.02, 10.02, 10.10, 10.05, 10.13, 10.08]
    rows = [
        (1, date(2024, 1, 1 + i), c, 100) for i, c in enumerate(closes)
    ]
    monkeypatch.setattr(st4, "ticks", lambda sp, d: _ticks_df(spark, rows))
    deltas = [
        round(closes[i] * 100) - round(closes[i - 1] * 100)
        for i in range(1, len(closes))
    ]
    n_ref, w_ref, z_ref = _wilcoxon_reference(deltas)
    out = st4.q_wilcoxon_signed_rank_close(spark, SF_DIR).collect()[0]
    assert out.n == n_ref
    assert out.w_plus == w_ref
    assert out.z_score == z_ref  # exact: identical int closure both sides


def test_wilcoxon_constant_series_drops(spark, monkeypatch):
    rows = [(1, date(2024, 1, 1 + i), 10.0, 100) for i in range(6)]
    monkeypatch.setattr(st4, "ticks", lambda sp, d: _ticks_df(spark, rows))
    # every delta is zero -> filtered out -> no variance row survives
    assert st4.q_wilcoxon_signed_rank_close(spark, SF_DIR).count() == 0


# ---------------------------------------------------------------------------
# Cramér's V
# ---------------------------------------------------------------------------


def test_cramers_v_matches_reference(spark, monkeypatch):
    # 2 segments x 2 priorities with a known association, plus an
    # EMPTY cell (seg B never files LOW) to pin the full-cross term
    cells = {
        ("A", "HIGH"): 30, ("A", "LOW"): 10,
        ("B", "HIGH"): 5,  # (B, LOW) = 0
    }
    orders, custs, ck = [], [], 0
    for (seg, pri), cnt in cells.items():
        for _ in range(cnt):
            custs.append((ck, seg))
            orders.append((ck, pri))
            ck += 1
    odf = spark.createDataFrame(orders, "o_custkey long, o_orderpriority string")
    cdf = spark.createDataFrame(custs, "c_custkey long, c_mktsegment string")
    tabs = {"orders": odf, "customer": cdf}
    monkeypatch.setattr(st4, "load_table", lambda sp, d, n: tabs[n])

    n = sum(cells.values())
    rows_ = {"A": 40, "B": 5}
    cols_ = {"HIGH": 35, "LOW": 10}
    chi2 = sum(
        (cells.get((s, p), 0) - rows_[s] * cols_[p] / n) ** 2
        / (rows_[s] * cols_[p] / n)
        for s in rows_ for p in cols_
    )
    v = math.sqrt(chi2 / (n * 1))  # min(r-1, c-1) = 1
    out = st4.q_segment_priority_cramers_v(spark, SF_DIR).collect()[0]
    assert (out.n_orders, out.n_segments, out.n_priorities) == (n, 2, 2)
    assert abs(out.chi2 - chi2) < 1e-6
    assert abs(out.cramers_v - v) < 1e-6
    assert 0.0 <= out.cramers_v <= 1.0


# ---------------------------------------------------------------------------
# Roll spread
# ---------------------------------------------------------------------------


def test_roll_spread_matches_reference(spark, monkeypatch):
    # alternating bounce: strongly negative autocovariance
    closes = [10.00, 10.10, 10.00, 10.10, 10.00, 10.10, 10.00]
    rows = [(1, date(2024, 1, 1 + i), c, 100) for i, c in enumerate(closes)]
    # symbol 2: trending (positive autocov) -> NULL spread
    rows += [(2, date(2024, 1, 1 + i), 10.0 + i, 100) for i in range(7)]
    monkeypatch.setattr(st4, "ticks", lambda sp, d: _ticks_df(spark, rows))

    deltas = [
        round(closes[i] * 100) - round(closes[i - 1] * 100)
        for i in range(1, len(closes))
    ]
    pairs = list(zip(deltas[1:], deltas[:-1]))
    m = len(pairs)
    c_num = m * sum(x * y for x, y in pairs) - sum(x for x, _ in pairs) * sum(
        y for _, y in pairs
    )
    ref = round(2 * math.sqrt(-c_num) / (m * 100.0), 6)
    out = {r.symbol: r for r in
           st4.q_roll_effective_spread(spark, SF_DIR).collect()}
    assert out[1].roll_spread == ref
    assert out[2].roll_spread is None  # positive autocov: model undefined


# ---------------------------------------------------------------------------
# Inter-session gaps
# ---------------------------------------------------------------------------


def _events(spark, rows):
    """rows: (event_id, user_id, ts, type, value)."""
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double"
    )


def test_intersession_gaps_match_hand_sessions(spark, monkeypatch):
    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def at(mins):
        return datetime(2024, 1, 1, 12 + mins // 60, mins % 60, 0)

    rows = [
        # user 1: session [0..10], gap 50 min, session [60..65],
        # gap 95 min, session [160]
        (1, 1, at(0), "a", 1.0), (2, 1, at(10), "a", 1.0),
        (3, 1, at(60), "a", 1.0), (4, 1, at(65), "a", 1.0),
        (5, 1, at(160), "a", 1.0),
        # user 2: one session only -> no gaps
        (6, 2, at(0), "a", 1.0), (7, 2, at(5), "a", 1.0),
    ]
    monkeypatch.setattr(st4, "load_events", lambda sp, d: _events(spark, rows))
    out = st4.q_intersession_gap_quartiles(spark, SF_DIR).collect()[0]
    # gaps: 50*60=3000s and 95*60=5700s
    assert out.n_gaps == 2
    assert out.q1_s == 3000
    assert out.median_s == 3000   # lower median of {3000, 5700}
    assert out.q3_s == 5700


# ---------------------------------------------------------------------------
# Consecutive order months
# ---------------------------------------------------------------------------


def test_consecutive_order_months_streaks(spark, monkeypatch):
    orders = [
        # cust 1: Jan, Feb, Mar, (skip), May -> best streak 3
        (1, date(2024, 1, 5)), (1, date(2024, 1, 20)),
        (1, date(2024, 2, 1)), (1, date(2024, 3, 1)),
        (1, date(2024, 5, 1)),
        # cust 2: Dec 2023, Jan 2024 -> year boundary joins: streak 2
        (2, date(2023, 12, 15)), (2, date(2024, 1, 2)),
        # cust 3: single month -> streak 1
        (3, date(2024, 6, 1)),
    ]
    custs = [(1, "AUTO"), (2, "AUTO"), (3, "RETAIL")]
    odf = spark.createDataFrame(orders, "o_custkey long, o_orderdate date")
    cdf = spark.createDataFrame(custs, "c_custkey long, c_mktsegment string")
    tabs = {"orders": odf, "customer": cdf}
    monkeypatch.setattr(st4, "load_table", lambda sp, d, n: tabs[n])
    out = {r.segment: r for r in
           st4.q_consecutive_order_months(spark, SF_DIR).collect()}
    assert out["AUTO"].n_customers == 2
    assert out["AUTO"].max_streak_months == 3
    assert out["AUTO"].avg_best_streak == 2.5  # (3 + 2) / 2
    assert out["RETAIL"].max_streak_months == 1


# ---------------------------------------------------------------------------
# MAD
# ---------------------------------------------------------------------------


def test_mad_matches_reference(spark, monkeypatch):
    closes = [10.00, 10.02, 10.01, 10.10, 10.06, 10.06, 10.20]
    rows = [(1, date(2024, 1, 1 + i), c, 100) for i, c in enumerate(closes)]
    monkeypatch.setattr(st4, "ticks", lambda sp, d: _ticks_df(spark, rows))
    deltas = [
        round(closes[i] * 100) - round(closes[i - 1] * 100)
        for i in range(1, len(closes))
    ]

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    med = lower_median(deltas)
    mad = lower_median([abs(d - med) for d in deltas])
    out = st4.q_mad_daily_moves(spark, SF_DIR).collect()[0]
    assert out.n_moves == len(deltas)
    assert out.median_move_cents == med
    assert out.mad_dollars == mad / 100.0

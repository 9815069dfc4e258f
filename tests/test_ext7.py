"""Extended coverage part 7 (registry_ext7.py): embedding norms, TWAP,
session depth curve, word lengths, ulcer index, run lengths — semantics
against Python references on hand data. Oracle parity is covered by
tools/verify_oracle.py."""

import math
from datetime import date, datetime

import stock_market_etl_pipeline_spark.registry_ext7 as x7

from conftest import SF_DIR


def _ticks_df(spark, rows):
    """rows: (symbol, date, close, volume)."""
    return spark.createDataFrame(
        [(s, dt, c, c, c, c, v) for s, dt, c, v in rows],
        "symbol long, date date, open double, high double, low double, "
        "close double, volume bigint",
    )


def test_embedding_norm_stats_quantized(spark, monkeypatch):
    vecs = [
        (1, [0.6, 0.8], 0),        # norm2 = 0.36 + 0.64 = 1.0 exactly
        (2, [1.0, 0.0], 0),
        (3, [0.5, 0.5], 0),        # 0.5e6^2 * 2 = 5e11
        (4, [0.1, -0.2], 1),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(x7, "load_table", lambda sp, d, n: df)

    def q(x):
        return int(math.floor(float(x) * 1_000_000 + 0.5))

    def n2(v):
        return sum(q(x) * q(x) for x in v)

    # label 0 norms sorted: [5e11 (v3), 1e12 (v1), 1e12 (v2)]
    exp0 = sorted(n2(v) for _, v, lb in vecs if lb == 0)
    out = {r.label: r for r in
           x7.q_embedding_norm_stats(spark, SF_DIR).collect()}
    assert out[0].n_vectors == 3
    assert out[0].q1_norm2 == exp0[0]
    assert out[0].median_norm2 == exp0[1]   # lower median of 3 = 2nd
    assert out[0].q3_norm2 == exp0[2]
    assert out[1].n_vectors == 1
    assert out[1].median_norm2 == n2([0.1, -0.2])


def test_twap_weights_days_held(spark, monkeypatch):
    rows = [
        # symbol 1, Jan: tick@1 (held 9 days, close 10.00),
        # tick@10 (held 15 days, close 20.00), tick@25 (last: weight 1)
        (1, date(2024, 1, 1), 10.00, 100),
        (1, date(2024, 1, 10), 20.00, 100),
        (1, date(2024, 1, 25), 30.00, 100),
    ]
    monkeypatch.setattr(x7, "ticks", lambda sp, d: _ticks_df(spark, rows))
    out = x7.q_twap_monthly(spark, SF_DIR).collect()[0]
    assert (out.symbol, out.year, out.month) == (1, 2024, 1)
    assert out.days_covered == 9 + 15 + 1
    want = round((1000 * 9 + 2000 * 15 + 3000 * 1) / (100.0 * 25), 6)
    assert out.twap == want
    # a plain AVG would say 20.00; time-weighting pulls toward the
    # long-held prints
    assert out.twap != 20.0


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double"
    )


def test_session_depth_curve(spark, monkeypatch):
    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def at(mins):
        return datetime(2024, 1, 1, 12 + mins // 60, mins % 60, 0)

    rows = [
        # user 1: one 3-event session, one 1-event session
        (1, 1, at(0), "a", 1.0), (2, 1, at(1), "a", 1.0),
        (3, 1, at(2), "a", 1.0), (4, 1, at(90), "a", 1.0),
        # user 2: one 2-event session
        (5, 2, at(0), "a", 1.0), (6, 2, at(3), "a", 1.0),
    ]
    monkeypatch.setattr(x7, "load_events", lambda sp, d: _events(spark, rows))
    out = {r.k: r for r in x7.q_session_depth_curve(spark, SF_DIR).collect()}
    assert len(out) == 10
    # 3 sessions total with depths {3, 1, 2}
    assert out[1].sessions_ge_k == 3 and out[1].frac_ge_k == 1.0
    assert out[2].sessions_ge_k == 2
    assert out[3].sessions_ge_k == 1
    assert out[4].sessions_ge_k == 0 and out[4].frac_ge_k == 0.0
    assert out[2].frac_ge_k == round(2 / 3, 6)


def test_word_length_profile(spark, monkeypatch):
    docs = [
        (1, "ab cde f", "en", "s", 8),
        (2, "  gh   ij  ", "en", "s", 11),   # whitespace artifacts drop
        (3, "xyzzy", "fr", "s", 5),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    )
    monkeypatch.setattr(x7, "load_table", lambda sp, d, n: df)
    out = {r.lang: r for r in
           x7.q_word_length_profile(spark, SF_DIR).collect()}
    # en tokens: ab(2) cde(3) f(1) gh(2) ij(2) -> lens [1,2,2,2,3]
    assert out["en"].n_tokens == 5
    assert out["en"].mean_len == 2.0
    assert out["en"].median_len == 2
    assert out["en"].p90_len == 3
    assert out["fr"].n_tokens == 1 and out["fr"].median_len == 5


def test_ulcer_index_reference(spark, monkeypatch):
    closes = [100.0, 110.0, 99.0, 104.5, 110.0, 88.0]
    rows = [(1, date(2024, 1, 1 + i), c, 1) for i, c in enumerate(closes)]
    monkeypatch.setattr(x7, "ticks", lambda sp, d: _ticks_df(spark, rows))
    cc = [round(c * 100) for c in closes]
    peaks, dd = [], []
    for i, c in enumerate(cc):
        peaks.append(max(cc[: i + 1]))
        dd.append(((peaks[i] - c) * 10000) // peaks[i])
    out = x7.q_ulcer_index(spark, SF_DIR).collect()[0]
    assert out.n_days == len(closes)
    assert out.max_drawdown_bp == max(dd)
    assert out.ulcer_index_bp == round(
        math.sqrt(sum(d * d for d in dd) / len(dd)), 6
    )


def test_updown_run_lengths(spark, monkeypatch):
    # symbol 1 deltas: + + - + + + (flat day excluded, breaks nothing
    # around it beyond its own exclusion)
    closes = [10.0, 10.1, 10.2, 10.1, 10.1, 10.2, 10.3, 10.4]
    rows = [(1, date(2024, 1, 1 + i), c, 1) for i, c in enumerate(closes)]
    monkeypatch.setattr(x7, "ticks", lambda sp, d: _ticks_df(spark, rows))
    out = {(r.direction, r.run_len): r.n_runs
           for r in x7.q_updown_run_lengths(spark, SF_DIR).collect()}
    # nonzero deltas: +1 +1 -1 +1 +1 +1 -> runs: up(2), down(1), up(3)
    assert out == {("up", 2): 1, ("down", 1): 1, ("up", 3): 1}


def test_order_value_cv_reference(spark, monkeypatch):
    vals = {"A": [100.0, 200.0, 300.0], "B": [50.0, 50.0, 50.02]}
    orders, custs, ck = [], [], 0
    for seg, vs in vals.items():
        for v in vs:
            custs.append((ck, seg))
            orders.append((ck, v))
            ck += 1
    odf = spark.createDataFrame(orders, "o_custkey long, o_totalprice double")
    cdf = spark.createDataFrame(custs, "c_custkey long, c_mktsegment string")
    tabs = {"orders": odf, "customer": cdf}
    monkeypatch.setattr(x7, "load_table", lambda sp, d, n: tabs[n])
    out = {r.segment: r for r in
           x7.q_order_value_cv_by_segment(spark, SF_DIR).collect()}

    for seg, vs in vals.items():
        x = [round(v * 100) for v in vs]
        n = len(x)
        num = n * sum(v * v for v in x) - sum(x) ** 2
        varq = num // (n * (n - 1))
        mean_c = sum(x) / n
        assert out[seg].n_orders == n
        assert out[seg].mean_value == round(mean_c / 100.0, 6)
        assert out[seg].std_value == round(math.sqrt(varq) / 100.0, 6)
        assert out[seg].cv == round(math.sqrt(varq) / mean_c, 6)
    # sanity: B's dispersion is tiny relative to A's
    assert out["B"].cv < out["A"].cv


def test_user_value_pareto_topk(spark, monkeypatch):
    # 5 users -> top_k = 1; user 9 holds most of the value
    rows, eid = [], 0
    t = datetime(2024, 1, 1, 12, 0, 0)
    for uid, vals in [(9, [50.0, 30.0]), (1, [10.0]), (2, [5.0]),
                      (3, [4.0]), (4, [1.0])]:
        for v in vals:
            rows.append((eid, uid, t, "a", v))
            eid += 1
    monkeypatch.setattr(x7, "load_events", lambda sp, d: _events(spark, rows))
    out = x7.q_user_value_pareto(spark, SF_DIR).collect()[0]
    assert (out.n_users, out.top_k) == (5, 1)
    assert out.top_value_cents == 8000
    assert out.total_value_cents == 10000
    assert out.top_share == 0.8


def test_turn_of_month_buckets(spark, monkeypatch):
    rows = [
        (1, date(2024, 1, 31), 10.0, 1),   # dist 0 (last day)
        (1, date(2024, 2, 1), 10.5, 1),    # dist 0 (first day): +50c
        (1, date(2024, 2, 15), 10.0, 1),   # dist 13 -> bucket 10: -50c
        (1, date(2024, 2, 29), 11.0, 1),   # leap-year last day, dist 0: +100c
    ]
    monkeypatch.setattr(x7, "ticks", lambda sp, d: _ticks_df(spark, rows))
    out = {r.boundary_dist: r for r in
           x7.q_turn_of_month_returns(spark, SF_DIR).collect()}
    assert out[0].n_moves == 2           # Feb 1 (+50) and Feb 29 (+100)
    assert out[0].avg_move == 0.75
    assert out[10].n_moves == 1 and out[10].avg_move == -0.5


def test_overnight_intraday_split(spark, monkeypatch):
    rows = [
        # (symbol, date, open, high, low, close, volume)
        (1, date(2024, 1, 1), 10.0, 10.6, 9.9, 10.5, 1),
        (1, date(2024, 1, 2), 10.8, 11.1, 10.7, 11.0, 1),
        (1, date(2024, 1, 3), 10.9, 11.3, 10.8, 11.2, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "symbol long, date date, open double, high double, low double, "
        "close double, volume bigint",
    )
    monkeypatch.setattr(x7, "ticks", lambda sp, d: df)
    out = x7.q_overnight_intraday_split(spark, SF_DIR).collect()[0]
    # overnights: 10.8-10.5=+30c, 10.9-11.0=-10c -> avg +10c = 0.1
    # intradays on those days: 11.0-10.8=+20c, 11.2-10.9=+30c -> avg 25c
    assert out.n_overnights == 2
    assert out.avg_overnight == 0.1
    assert out.avg_intraday == 0.25
    # decomposition identity: overnight + intraday = close-to-close
    assert round(out.avg_overnight + out.avg_intraday, 6) == round(
        ((1100 - 1050) + (1120 - 1100)) / 200.0, 6
    )

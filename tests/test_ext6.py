"""Events/embeddings part 6 (registry_ext6.py): Markov 3-step, exponential
KS fit, embedding batch drift — semantics against Python references on hand
data. Oracle parity is covered by tools/verify_oracle.py / -m oracle."""

import math

import pytest
from pyspark.sql import functions as F

import stock_market_etl_pipeline_spark.registry_ext6 as ext6

from conftest import SF_DIR


def _events(spark, rows):
    """rows: (event_id, ts_iso, user_id, event_type)."""
    return spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.to_timestamp("ts").alias("ts"), "user_id",
        "event_type", "value", "props",
    )


def _emb(spark, rows):
    """rows: (vec_id, [floats])."""
    return spark.createDataFrame(
        [(i, v, "l0") for i, v in rows],
        "vec_id long, embedding array<double>, label string",
    )


# ---------------------------------------------------------------------------
# Markov 3-step
# ---------------------------------------------------------------------------


def _t3_reference(seqs):
    """seqs: list of per-user event-type sequences."""
    counts, row = {}, {}
    for s in seqs:
        for a, b in zip(s, s[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
            row[a] = row.get(a, 0) + 1
    t1 = {(a, b): n / row[a] for (a, b), n in counts.items()}
    types = sorted({x for s in seqs for x in s})
    def tmat(t):
        return {(a, b): t.get((a, b), 0.0) for a in types for b in types}
    m1 = tmat(t1)
    m2 = {
        (a, b): sum(m1[(a, k)] * m1[(k, b)] for k in types)
        for a in types for b in types
    }
    m3 = {
        (a, b): sum(m2[(a, k)] * m1[(k, b)] for k in types)
        for a in types for b in types
    }
    return t1, m3


def test_markov_3step_matches_reference(spark, monkeypatch):
    seqs = {
        1: ["view", "view", "cart", "buy", "view"],
        2: ["view", "cart", "view", "view"],
        3: ["cart", "buy", "view", "cart"],
    }
    rows = []
    eid = 0
    for u, s in seqs.items():
        for i, t in enumerate(s):
            rows.append((eid, f"2024-01-01 00:{i:02d}:00", u, t))
            eid += 1
    monkeypatch.setattr(ext6, "load_events", lambda s, d: _events(spark, rows))
    out = {
        (r.from_event, r.to_event): r
        for r in ext6.q_markov_3step_distribution(spark, SF_DIR).collect()
    }
    t1, m3 = _t3_reference(list(seqs.values()))
    for (a, b), r in out.items():
        assert r.p3 == pytest.approx(round(m3[(a, b)], 6), abs=2e-6)
        if (a, b) in t1:
            assert r.p1 == pytest.approx(t1[(a, b)], rel=1e-12)
        else:
            assert r.p1 is None
    # rows appear exactly where m3 > 0 (join fan-out produces no zeros)
    assert set(out) == {k for k, v in m3.items() if v > 0}


def test_markov_3step_rows_sum_to_one(spark, monkeypatch):
    rows = [
        (0, "2024-01-01 00:00:00", 1, "a"),
        (1, "2024-01-01 00:01:00", 1, "b"),
        (2, "2024-01-01 00:02:00", 1, "a"),
        (3, "2024-01-01 00:03:00", 1, "b"),
        (4, "2024-01-01 00:04:00", 1, "a"),
    ]
    monkeypatch.setattr(ext6, "load_events", lambda s, d: _events(spark, rows))
    out = ext6.q_markov_3step_distribution(spark, SF_DIR).collect()
    by_from = {}
    for r in out:
        by_from.setdefault(r.from_event, 0.0)
        by_from[r.from_event] += r.p3
    for s in by_from.values():
        assert s == pytest.approx(1.0, abs=1e-5)


# ---------------------------------------------------------------------------
# Exponential KS fit
# ---------------------------------------------------------------------------


def _ks_reference(gaps_us):
    n = len(gaps_us)
    sg = sum(gaps_us)
    lam = n / sg
    xs = sorted(gaps_us)
    dplus = max((i + 1) / n - (1 - math.exp(-lam * x))
                for i, x in enumerate(xs))
    dminus = max((1 - math.exp(-lam * x)) - i / n
                 for i, x in enumerate(xs))
    ks = round(max(dplus, dminus), 6)
    return n, sg / n / 1e6, ks, ks > 1.358 / math.sqrt(n)


def test_exp_ks_matches_reference(spark, monkeypatch):
    # one type, arrival times with irregular (bursty) gaps
    secs = [0, 1, 2, 3, 10, 11, 12, 40, 41, 90]
    rows = [
        (i, f"2024-01-01 00:00:{s:02d}" if s < 60
         else f"2024-01-01 00:01:{s - 60:02d}", 1, "ping")
        for i, s in enumerate(secs)
    ]
    monkeypatch.setattr(ext6, "load_events", lambda s, d: _events(spark, rows))
    r = ext6.q_exp_gap_fit_ks(spark, SF_DIR).collect()[0]
    gaps = [(b - a) * 1_000_000 for a, b in zip(secs, secs[1:])]
    n, mean_s, ks, rej = _ks_reference(gaps)
    assert r.n_gaps == n
    assert r.mean_gap_s == pytest.approx(mean_s, rel=1e-12)
    assert r.ks_stat == pytest.approx(ks, abs=2e-6)
    assert bool(r.reject_exp_05) == rej


def test_exp_ks_near_exponential_not_rejected(spark, monkeypatch):
    # gaps drawn deterministically from the exponential quantile grid:
    # x_i = -ln(1 - (i - 0.5)/n) — ECDF hugs the fitted CDF, KS small
    n = 40
    gaps = [-math.log(1 - (i + 0.5) / n) for i in range(n)]
    secs = [0.0]
    for g in gaps:
        secs.append(secs[-1] + g)
    rows = []
    for i, s in enumerate(secs):
        m, rem = divmod(s, 60)
        rows.append(
            (i, f"2024-01-01 00:{int(m):02d}:{rem:09.6f}", 1, "ping")
        )
    monkeypatch.setattr(ext6, "load_events", lambda s, d: _events(spark, rows))
    r = ext6.q_exp_gap_fit_ks(spark, SF_DIR).collect()[0]
    assert r.n_gaps == n
    assert r.ks_stat < 1.358 / math.sqrt(n)
    assert not r.reject_exp_05


# ---------------------------------------------------------------------------
# Embedding batch drift
# ---------------------------------------------------------------------------


def test_drift_identical_batches_cosine_one(spark, monkeypatch):
    v = [0.5, -0.25, 0.125, 1.0]
    rows = [(i, v) for i in range(250)]  # batches 0,1 full, 2 partial
    monkeypatch.setattr(ext6, "load_table", lambda s, d, n: _emb(spark, rows))
    out = {r.batch_from: r for r in
           ext6.q_embedding_batch_drift(spark, SF_DIR).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r.cosine == pytest.approx(1.0, abs=1e-9)
        assert r.l2_dist == 0.0
        assert r.n_dims == 4


def test_drift_orthogonal_shift_detected(spark, monkeypatch):
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    rows = [(i, a) for i in range(100)] + [(100 + i, b) for i in range(100)]
    monkeypatch.setattr(ext6, "load_table", lambda s, d, n: _emb(spark, rows))
    r = ext6.q_embedding_batch_drift(spark, SF_DIR).collect()[0]
    assert r.cosine == pytest.approx(0.0, abs=1e-9)
    # centroids are unit vectors on different axes: l2 = sqrt(2)
    assert r.l2_dist == pytest.approx(math.sqrt(2), abs=1e-4)


def test_drift_quantization_reference(spark, monkeypatch):
    # uneven batches + non-trivial values: mirror the exact integer math
    vs = [[0.31, -0.7, 0.11], [0.29, -0.64, 0.17], [0.4, -0.66, 0.1],
          [-0.2, 0.5, 0.33], [-0.25, 0.44, 0.4]]
    rows = [(i, vs[0]) for i in range(0, 60)] \
        + [(i, vs[1]) for i in range(60, 100)] \
        + [(i, vs[2]) for i in range(100, 170)] \
        + [(i, vs[3]) for i in range(170, 200)] \
        + [(i, vs[4]) for i in range(200, 230)]
    monkeypatch.setattr(ext6, "load_table", lambda s, d, n: _emb(spark, rows))
    out = {r.batch_from: r for r in
           ext6.q_embedding_batch_drift(spark, SF_DIR).collect()}

    def tdiv(a, b):
        # truncating division (Spark `div`), not Python floor //
        q = abs(a) // abs(b)
        return q if (a < 0) == (b < 0) else -q

    def cent(batch_rows):
        n = len(batch_rows)
        dims = len(batch_rows[0])
        return [
            tdiv(sum(round(v[d] * 1e6) for v in batch_rows), n * 100)
            for d in range(dims)
        ]

    batches = {}
    for i, v in rows:
        batches.setdefault(i // 100, []).append(v)
    for bf in (0, 1):
        c1, c2 = cent(batches[bf]), cent(batches[bf + 1])
        dot = sum(x * y for x, y in zip(c1, c2))
        na = sum(x * x for x in c1)
        nb = sum(y * y for y in c2)
        d2 = sum((x - y) ** 2 for x, y in zip(c1, c2))
        r = out[bf]
        assert r.cosine == dot / (math.sqrt(na) * math.sqrt(nb))
        assert r.l2_dist == math.sqrt(d2) / 1e4


# ---------------------------------------------------------------------------
# CUSUM changepoint
# ---------------------------------------------------------------------------


def test_cusum_locates_planted_level_shift(spark, monkeypatch):
    # 10 days at 2 events/day, then 10 days at 8/day: the cusum max
    # sits exactly at the break (end of the low regime)
    rows = []
    eid = 0
    for day in range(20):
        rate = 2 if day < 10 else 8
        for j in range(rate):
            rows.append(
                (eid, f"2024-01-{day + 1:02d} 00:{j:02d}:00", 1, "ping")
            )
            eid += 1
    monkeypatch.setattr(ext6, "load_events", lambda s, d: _events(spark, rows))
    r = ext6.q_cusum_changepoint_daily(spark, SF_DIR).collect()[0]
    assert r.n_days == 20
    assert str(r.changepoint_day) == "2024-01-10"
    # reference: nd*|cum_k - k*mean| maximized at k=10: cum=20, s=100,
    # dev = |20*20 - 10*100| = 600
    assert r.max_dev_scaled == 600
    assert r.max_cusum == 600 / 20


def test_cusum_integer_reference_on_irregular_series(spark, monkeypatch):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    rows = []
    eid = 0
    for day, x in enumerate(xs):
        for j in range(x):
            rows.append(
                (eid, f"2024-02-{day + 1:02d} 00:{j:02d}:00", 1, "ping")
            )
            eid += 1
    monkeypatch.setattr(ext6, "load_events", lambda s, d: _events(spark, rows))
    r = ext6.q_cusum_changepoint_daily(spark, SF_DIR).collect()[0]
    nd, s = len(xs), sum(xs)
    devs = []
    cum = 0
    for k, x in enumerate(xs[:-1], start=1):
        cum += x
        devs.append((abs(nd * cum - k * s), k))
    mdev = max(d for d, _ in devs)
    kstar = min(k for d, k in devs if d == mdev)
    assert r.max_dev_scaled == mdev
    assert str(r.changepoint_day) == f"2024-02-{kstar:02d}"


# ---------------------------------------------------------------------------
# Conditional entropy
# ---------------------------------------------------------------------------


def test_conditional_entropy_deterministic_chain_is_zero(spark, monkeypatch):
    # a -> b -> a -> b ...: next type is fully determined by current
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "a" if i % 2 == 0 else "b")
        for i in range(10)
    ]
    monkeypatch.setattr(ext6, "load_events", lambda s, d: _events(spark, rows))
    out = ext6.q_transition_conditional_entropy(spark, SF_DIR).collect()
    for r in out:
        assert r.h_contribution == 0.0
        assert r.h_conditional_total == 0.0


def test_conditional_entropy_matches_reference(spark, monkeypatch):
    seqs = {
        1: ["a", "b", "a", "c", "a", "b"],
        2: ["b", "a", "b", "c", "b"],
    }
    rows = []
    eid = 0
    for u, s in seqs.items():
        for i, t in enumerate(s):
            rows.append((eid, f"2024-01-01 00:{i:02d}:00", u, t))
            eid += 1
    monkeypatch.setattr(ext6, "load_events", lambda s, d: _events(spark, rows))
    out = {r.from_event: r for r in
           ext6.q_transition_conditional_entropy(spark, SF_DIR).collect()}
    import math as _m

    counts, row = {}, {}
    for s in seqs.values():
        for a, b in zip(s, s[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
            row[a] = row.get(a, 0) + 1
    tot = sum(counts.values())
    hparts = {}
    for (a, b), n in counts.items():
        hparts[a] = hparts.get(a, 0.0) - (n / tot) * _m.log(n / row[a])
    total = round(sum(hparts.values()), 6)
    for a, hp in hparts.items():
        assert out[a].h_contribution == pytest.approx(
            round(hp, 6), abs=2e-6
        )
        assert out[a].n_from == row[a]
        assert out[a].h_conditional_total == pytest.approx(total, abs=2e-6)

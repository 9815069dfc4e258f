"""Stats part 3 (registry_stats3.py): Mann-Whitney rank-sum, Benford
first-digit, shingle novelty deciles, open-order balance — semantics
against Python references on hand data. Oracle parity is covered by
tools/verify_oracle.py."""

import math
from datetime import date

import pytest
from pyspark.sql import functions as F

import stock_market_etl_pipeline_spark.registry_stats3 as st3

from conftest import SF_DIR


# ---------------------------------------------------------------------------
# Mann-Whitney
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    """rows: (doc_id, n_chars, source)."""
    return spark.createDataFrame(
        [(i, "x", "xx", s, n) for i, n, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _mw_reference(lengths_by_source, src):
    """Tie-corrected Mann-Whitney z of src vs rest, mirroring the
    query's quantized-variance closure."""
    pooled = sorted(
        v for vs in lengths_by_source.values() for v in vs
    )
    n = len(pooled)
    # average rank per value (1-based)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j] == pooled[i]:
            j += 1
        for _ in range(i, j):
            ranks[pooled[i]] = (i + 1 + j) / 2
        i = j
    n1 = len(lengths_by_source[src])
    n2 = n - n1
    r1 = sum(ranks[v] for v in lengths_by_source[src])
    u = r1 - n1 * (n1 + 1) / 2
    ties = 0
    for v in set(pooled):
        t = pooled.count(v)
        ties += t ** 3 - t
    var_q = (n1 * n2 * ((n + 1) * n * (n - 1) - ties)) // (
        12 * n * (n - 1)
    )
    z = (u - n1 * n2 / 2) / math.sqrt(var_q)
    return u, round(z, 6)


def test_mann_whitney_matches_reference(spark, monkeypatch):
    data = {
        "s1": [10, 20, 20, 30, 40, 55],
        "s2": [50, 60, 20, 70, 80],
        "s3": [15, 25, 35],
    }
    rows = []
    i = 0
    for s, vs in data.items():
        for v in vs:
            rows.append((i, v, s))
            i += 1
    monkeypatch.setattr(
        st3, "load_table", lambda sp, d, n: _docs(spark, rows)
    )
    out = {
        r.source: r
        for r in st3.q_mann_whitney_length_by_source(spark, SF_DIR).collect()
    }
    for s in data:
        u, z = _mw_reference(data, s)
        assert out[s].n_docs == len(data[s])
        assert out[s].u_stat == u, s
        assert out[s].z_score == pytest.approx(z, abs=2e-6), s
    # s2 is the long-doc source: its rank sum must sit above its mean
    assert out["s2"].z_score > 0 > out["s3"].z_score


def test_mann_whitney_single_source_emits_nothing(spark, monkeypatch):
    rows = [(i, 10 + i, "only") for i in range(5)]
    monkeypatch.setattr(
        st3, "load_table", lambda sp, d, n: _docs(spark, rows)
    )
    assert (
        st3.q_mann_whitney_length_by_source(spark, SF_DIR).count() == 0
    )  # n2 == 0: the test is undefined, not zero


# ---------------------------------------------------------------------------
# Benford
# ---------------------------------------------------------------------------


def test_benford_matches_reference(spark, monkeypatch):
    prices = [123.45, 19.99, 1500.0, 987.65, 12.34, 190.0, 2.50, 13.13]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(prices)],
        "o_orderkey long, o_totalprice double",
    )
    monkeypatch.setattr(st3, "load_table", lambda sp, d, n: df)
    out = {r.digit: r for r in
           st3.q_benford_first_digit(spark, SF_DIR).collect()}
    counts = {}
    for p in prices:
        d = int(str(int(round(p * 100)))[0])
        counts[d] = counts.get(d, 0) + 1
    assert {d: r.n_orders for d, r in out.items()} == counts
    nn = len(prices)
    for d, r in out.items():
        assert r.observed_share == counts[d] / nn
        e_share = math.log10(1 + 1 / d)
        assert r.benford_share == pytest.approx(round(e_share, 6), abs=2e-6)
        e = nn * e_share
        assert r.chi2_term == pytest.approx(
            round((counts[d] - e) ** 2 / e, 6), abs=2e-6
        )


# ---------------------------------------------------------------------------
# Shingle novelty by decile
# ---------------------------------------------------------------------------


def test_novelty_deciles_match_reference(spark, monkeypatch):
    # 10 docs -> one per decile; doc 0 is all-novel, doc 1 repeats doc 0,
    # doc 2 is half-novel, short docs contribute nothing
    texts = {
        0: "a b c d",          # shingles: "a b c", "b c d" (both novel)
        1: "a b c d",          # same shingles, zero novel
        2: "b c d e",          # "b c d" seen, "c d e" novel
        3: "hi",               # < 3 tokens: no shingles
        4: "c d e f g",        # "c d e" seen, "d e f","e f g" novel
        5: "x",                # no shingles
        6: "a b c",            # seen
        7: "z z z z",          # "z z z" novel (appears twice, distinct once)
        8: "q r s",            # novel
        9: "q r s",            # seen
    }
    df = spark.createDataFrame(
        [(i, t, "xx", "s0", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(st3, "load_table", lambda sp, d, n: df)
    out = {r.decile: r for r in
           st3.q_ngram_novelty_by_decile(spark, SF_DIR).collect()}
    want_totals = {0: 2, 1: 2, 2: 2, 3: 0, 4: 3, 5: 0, 6: 1, 7: 1, 8: 1, 9: 1}
    want_novel = {0: 2, 1: 0, 2: 1, 3: 0, 4: 2, 5: 0, 6: 0, 7: 1, 8: 1, 9: 0}
    assert len(out) == 10
    for dec in range(10):
        r = out[dec]
        assert r.n_docs == 1
        assert r.n_shingles == want_totals[dec], dec
        assert r.n_novel == want_novel[dec], dec
        if want_totals[dec]:
            assert r.novelty_rate == want_novel[dec] / want_totals[dec]
        else:
            assert r.novelty_rate is None


# ---------------------------------------------------------------------------
# Open-orders balance
# ---------------------------------------------------------------------------


def test_open_orders_balance_matches_reference(spark, monkeypatch):
    orders = [
        (1, date(2024, 1, 5)),
        (2, date(2024, 1, 20)),
        (3, date(2024, 2, 10)),
        (4, date(2024, 4, 1)),
    ]
    # order -> lineitem ship dates (close = max)
    ships = {
        1: [date(2024, 1, 15), date(2024, 2, 3)],   # closes Feb
        2: [date(2024, 1, 25)],                       # closes Jan
        3: [date(2024, 3, 1), date(2024, 2, 20)],    # closes Mar
        4: [date(2024, 4, 2)],                        # closes Apr
    }
    odf = spark.createDataFrame(orders, "o_orderkey long, o_orderdate date")
    ldf = spark.createDataFrame(
        [(k, d) for k, ds in ships.items() for d in ds],
        "l_orderkey long, l_shipdate date",
    )
    tabs = {"orders": odf, "lineitem": ldf}
    monkeypatch.setattr(st3, "load_table", lambda sp, d, n: tabs[n])
    rows = sorted(
        st3.q_open_orders_balance(spark, SF_DIR).collect(),
        key=lambda r: r.month_start,
    )
    got = [
        (str(r.month_start), r.n_opened, r.n_closed, r.open_balance)
        for r in rows
    ]
    assert got == [
        ("2024-01-01", 2, 1, 1),   # 1,2 open; 2 closes
        ("2024-02-01", 1, 1, 1),   # 3 opens; 1 closes
        ("2024-03-01", 0, 1, 0),   # 3 closes
        ("2024-04-01", 1, 1, 0),   # 4 opens and closes
    ]


# ---------------------------------------------------------------------------
# Round-number bias
# ---------------------------------------------------------------------------


def test_round_number_bias_matches_reference(spark, monkeypatch):
    closes = [10.00, 10.50, 10.37, 11.00, 12.25, 13.50, 9.99, 20.00]
    df = spark.createDataFrame(
        [(1, date(2024, 1, 1 + i), c, c, c, c, 100)
         for i, c in enumerate(closes)],
        "symbol long, date date, open double, high double, low double, "
        "close double, volume bigint",
    )
    monkeypatch.setattr(st3, "ticks", lambda sp, d: df)
    r = st3.q_round_number_bias(spark, SF_DIR).collect()[0]
    n = len(closes)
    n00 = sum(1 for c in closes if round(c * 100) % 100 == 0)
    n50 = sum(1 for c in closes if round(c * 100) % 50 == 0)
    assert (r.n_days, r.n_round00, r.n_round50) == (n, n00, n50)
    assert (n00, n50) == (3, 5)  # whole dollars; + the .50s
    assert r.share00 == n00 / n
    z = (n00 - n * 0.01) / math.sqrt(n * 0.01 * 0.99)
    assert r.z00 == pytest.approx(round(z, 6), abs=2e-6)


# ---------------------------------------------------------------------------
# Inter-purchase gap quartiles
# ---------------------------------------------------------------------------


def test_interpurchase_quartiles_match_reference(spark, monkeypatch):
    # one segment, one customer with gaps 10, 20, 30, 40 -> exact
    # inverse-CDF quartiles: q1 = first v with 4*cum >= n (cum 1, n 4)
    orders = [
        (1, date(2024, 1, 1)),
        (2, date(2024, 1, 11)),    # gap 10
        (3, date(2024, 1, 31)),    # gap 20
        (4, date(2024, 3, 1)),     # gap 30
        (5, date(2024, 4, 10)),    # gap 40
    ]
    odf = spark.createDataFrame(
        [(k, 7, d) for k, d in orders],
        "o_orderkey long, o_custkey long, o_orderdate date",
    )
    cdf = spark.createDataFrame(
        [(7, "BUILDING")], "c_custkey long, c_mktsegment string"
    )
    tabs = {"orders": odf, "customer": cdf}
    monkeypatch.setattr(st3, "load_table", lambda sp, d, n: tabs[n])
    r = st3.q_interpurchase_gap_quartiles(spark, SF_DIR).collect()[0]
    assert r.segment == "BUILDING"
    assert r.n_gaps == 4
    assert (r.q1_days, r.median_days, r.q3_days) == (10, 20, 30)


def test_interpurchase_same_day_orders_gap_zero(spark, monkeypatch):
    # two orders on the same day: deterministic (date, orderkey) order
    # makes the second a 0-day gap, never a flipped pair
    odf = spark.createDataFrame(
        [(1, 7, date(2024, 1, 1)), (2, 7, date(2024, 1, 1)),
         (3, 7, date(2024, 1, 5))],
        "o_orderkey long, o_custkey long, o_orderdate date",
    )
    cdf = spark.createDataFrame(
        [(7, "AUTO")], "c_custkey long, c_mktsegment string"
    )
    tabs = {"orders": odf, "customer": cdf}
    monkeypatch.setattr(st3, "load_table", lambda sp, d, n: tabs[n])
    r = st3.q_interpurchase_gap_quartiles(spark, SF_DIR).collect()[0]
    assert r.n_gaps == 2
    assert (r.q1_days, r.median_days, r.q3_days) == (0, 0, 4)


# ---------------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------------


def _kendall_reference(pairs):
    """pairs: [(volume, mv)] in date order — tau-b, C, D."""
    n = len(pairs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            p = (pairs[i][0] - pairs[j][0]) * (pairs[i][1] - pairs[j][1])
            if p > 0:
                c += 1
            elif p < 0:
                d += 1
    n0 = n * (n - 1) // 2
    n1 = n2 = 0
    for k in range(2):
        vals = [p[k] for p in pairs]
        tsum = sum(
            vals.count(v) * (vals.count(v) - 1) // 2 for v in set(vals)
        )
        if k == 0:
            n1 = tsum
        else:
            n2 = tsum
    return c, d, (c - d) / math.sqrt((n0 - n1) * (n0 - n2))


def _ticks_df(spark, rows):
    """rows: (symbol, date, close, volume)."""
    return spark.createDataFrame(
        [(s, dt, c, c, c, c, v) for s, dt, c, v in rows],
        "symbol long, date date, open double, high double, low double, "
        "close double, volume bigint",
    )


def test_kendall_matches_reference_both_strategies(spark, monkeypatch):
    rows = []
    closes = [10.0, 10.5, 10.2, 11.0, 10.8, 10.8, 12.0, 11.5]
    vols = [100, 300, 150, 400, 120, 120, 500, 200]
    for i, (c, v) in enumerate(zip(closes, vols)):
        rows.append((1, date(2024, 1, 1 + i), c, v))
    df = _ticks_df(spark, rows)
    monkeypatch.setattr(st3, "ticks", lambda sp, d: df)

    # reference over (volume, |move|) pairs, move in cents
    mv = [
        (vols[i], abs(round(closes[i] * 100) - round(closes[i - 1] * 100)))
        for i in range(1, len(closes))
    ]
    c_ref, d_ref, tau_ref = _kendall_reference(mv)

    out = st3.q_kendall_tau_volume_move(spark, SF_DIR).collect()[0]
    assert (out.n_concordant, out.n_discordant) == (c_ref, d_ref)
    assert out.n_days == len(mv)
    assert out.tau_b == tau_ref  # exact, not approx

    # force the deep (pair-join) strategy: byte-identical result
    import stock_market_etl_pipeline_spark.registry_fin5 as fin5

    monkeypatch.setattr(fin5, "_TS_ARRAY_MAX_DAYS", 0)
    deep = st3.q_kendall_tau_volume_move(spark, SF_DIR).collect()[0]
    assert (
        deep.n_concordant, deep.n_discordant, deep.tau_b
    ) == (out.n_concordant, out.n_discordant, out.tau_b)


def test_kendall_constant_side_drops(spark, monkeypatch):
    rows = [(1, date(2024, 1, 1 + i), 10.0 + i, 100) for i in range(6)]
    df = _ticks_df(spark, rows)  # constant volume: tau undefined
    monkeypatch.setattr(st3, "ticks", lambda sp, d: df)
    assert st3.q_kendall_tau_volume_move(spark, SF_DIR).count() == 0


# ---------------------------------------------------------------------------
# Token PMI
# ---------------------------------------------------------------------------


def test_token_pmi_matches_reference(spark, monkeypatch):
    # 'a b' co-occur in every doc (PMI ~ 0 vs their own high df);
    # 'x y' co-occur in exactly their 5 shared docs (strong collocation)
    texts = []
    for i in range(10):
        texts.append("a b filler%d" % i)
    for i in range(5):
        texts.append("a b x y")
    df = spark.createDataFrame(
        [(i, t, "xx", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(st3, "load_table", lambda sp, d, n: df)
    out = {
        (r.token_a, r.token_b): r
        for r in st3.q_token_pmi_pairs(spark, SF_DIR).collect()
    }
    n = len(texts)
    # support floor 5: fillers (df 1) never appear
    assert all(
        ta in ("a", "b", "x", "y") and tb in ("a", "b", "x", "y")
        for ta, tb in out
    )
    ab = out[("a", "b")]
    assert ab.n_docs_both == 15
    assert ab.pmi == pytest.approx(
        round(math.log(n * 15 / (15 * 15)), 6), abs=2e-6
    )
    xy = out[("x", "y")]
    assert xy.n_docs_both == 5
    assert xy.pmi == pytest.approx(
        round(math.log(n * 5 / (5 * 5)), 6), abs=2e-6
    )
    assert xy.pmi > ab.pmi  # the true collocation scores higher


# ---------------------------------------------------------------------------
# YoY revenue growth
# ---------------------------------------------------------------------------


def test_yoy_growth_matches_reference_and_gap_years(spark, monkeypatch):
    # nation A: 1994 rev 100.00, 1995 rev 150.00 (+50%), 1997 rev 120
    # (gap year: growth NULL); one supplier, one line per order
    li = [
        (1, 1, 100.0, 0.0),
        (2, 1, 150.0, 0.0),
        (3, 1, 120.0, 0.0),
    ]
    orders = [
        (1, date(1994, 6, 1)),
        (2, date(1995, 6, 1)),
        (3, date(1997, 6, 1)),
    ]
    tabs = {
        "lineitem": spark.createDataFrame(
            li,
            "l_orderkey long, l_suppkey long, l_extendedprice double, "
            "l_discount double",
        ),
        "orders": spark.createDataFrame(
            orders, "o_orderkey long, o_orderdate date"
        ),
        "supplier": spark.createDataFrame(
            [(1, 10)], "s_suppkey long, s_nationkey long"
        ),
        "nation": spark.createDataFrame(
            [(10, "A")], "n_nationkey long, n_name string"
        ),
    }
    monkeypatch.setattr(st3, "load_table", lambda sp, d, n: tabs[n])
    out = {r.yr: r for r in
           st3.q_yoy_revenue_growth(spark, SF_DIR).collect()}
    assert out[1994].revenue == 100.0
    assert out[1994].yoy_growth_pct is None          # first year
    assert out[1995].yoy_growth_pct == 50.0
    assert out[1997].yoy_growth_pct is None          # gap year


# ---------------------------------------------------------------------------
# Source vocabulary Jaccard
# ---------------------------------------------------------------------------


def test_source_vocab_jaccard_matches_reference(spark, monkeypatch):
    texts = [
        (0, "a b c d", "s1"),
        (1, "c d e", "s2"),
        (2, "x y", "s3"),
        (3, "a a c", "s2"),   # dup tokens collapse into the vocab set
    ]
    df = spark.createDataFrame(
        [(i, t, "xx", s, len(t)) for i, t, s in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(st3, "load_table", lambda sp, d, n: df)
    out = {
        (r.source_a, r.source_b): r
        for r in st3.q_source_vocab_jaccard(spark, SF_DIR).collect()
    }
    # s1={a,b,c,d}, s2={a,c,d,e}, s3={x,y}
    r = out[("s1", "s2")]
    assert (r.vocab_a, r.vocab_b, r.n_shared) == (4, 4, 3)
    assert r.jaccard == 3 / 5
    # disjoint pairs emit no row (inner join on shared tokens)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out

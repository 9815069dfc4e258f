"""registry_stats + the llm4 containment/funnel additions: independent
numpy/python references (a third implementation besides Spark and the
DuckDB oracle) and structural invariants."""

import math

import duckdb
import pytest

from stock_market_etl_pipeline_spark import registry

from conftest import SF_DIR


def _duck():
    con = duckdb.connect()
    for t in ["orders", "customer", "supplier", "nation", "lineitem",
              "events", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _gini_py(xs):
    xs = sorted(xs)
    n, s = len(xs), sum(xs)
    sw = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * sw - (n + 1) * s) / (n * s)


def test_gini_matches_python_reference(spark):
    got = {
        r.n_name: r
        for r in registry.queries()["gini_revenue_concentration"](
            spark, SF_DIR
        ).collect()
    }
    con = _duck()
    rows = con.execute(
        """
        SELECT n.n_name, c.c_nationkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2, o.o_custkey
        """
    ).fetchall()
    by_nation = {}
    for name, _, cents in rows:
        by_nation.setdefault(name, []).append(cents)
    assert set(got) == set(by_nation)
    for name, xs in by_nation.items():
        r = got[name]
        assert r.n_customers == len(xs)
        assert math.isclose(r.gini, _gini_py(xs), rel_tol=1e-12)
        assert 0.0 <= r.gini < 1.0


def test_hhi_matches_python_reference(spark):
    got = {
        r.n_name: r
        for r in registry.queries()["hhi_supplier_concentration"](
            spark, SF_DIR
        ).collect()
    }
    con = _duck()
    rows = con.execute(
        """
        SELECT n.n_name,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
                    AS BIGINT) AS rev
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, l.l_suppkey
        """
    ).fetchall()
    by_nation = {}
    for name, rev in rows:
        by_nation.setdefault(name, []).append(rev)
    assert set(got) == set(by_nation)
    for name, revs in by_nation.items():
        r, s = got[name], sum(revs)
        hhi = 10000.0 * sum(x * x for x in revs) / (s * s)
        assert math.isclose(r.hhi, hhi, rel_tol=1e-12)
        # HHI lives in [10000/n, 10000]; CR1 in [1/n, 1]
        assert 10000.0 / len(revs) - 1e-9 <= r.hhi <= 10000.0 + 1e-9
        assert math.isclose(r.top_share, max(revs) / s, rel_tol=1e-12)


def test_acf_matches_python_reference(spark):
    rows = registry.queries()["price_change_acf"](spark, SF_DIR).collect()
    assert rows and all(1 <= r.lag <= 5 for r in rows)
    con = _duck()
    ticks = con.execute(
        """
        SELECT l_suppkey AS symbol, CAST(l_shipdate AS DATE) AS date,
               CAST(ROUND(MAX(l_extendedprice) * 100, 0) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = {}
    for sym, _, c in ticks:
        series.setdefault(sym, []).append(c)
    checked = 0
    for r in rows:
        cs = series[r.symbol]
        d = [b - a for a, b in zip(cs, cs[1:])]
        x, y = d[r.lag:], d[: len(d) - r.lag]
        n = len(x)
        assert r.n_pairs == n
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        denx = n * sum(a * a for a in x) - sx * sx
        deny = n * sum(b * b for b in y) - sy * sy
        if denx > 0 and deny > 0:
            ref = (n * sxy - sx * sy) / (
                math.sqrt(denx) * math.sqrt(deny)
            )
            # acf is 1e-9-quantized (two-factor exact-div closure)
            assert math.isclose(r.acf, ref, rel_tol=0, abs_tol=5e-9)
            assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9
            checked += 1
    assert checked >= 5


def test_containment_planted_pairs(spark):
    df = registry.queries()["dedup_containment"](spark, SF_DIR)
    rows = df.collect()
    assert rows, "vacuously green: planted truncations missing"
    pairs = {(r.doc_a, r.doc_b): r for r in rows}
    planted = [
        (a, a + 4_000_000) for a in range(25) if (a, a + 4_000_000) in pairs
    ]
    # every planted half-length truncation shares (nearly) all its
    # shingles with its source -> containment well above threshold
    assert len(planted) == 25
    for p in planted:
        r = pairs[p]
        assert r.containment >= 0.8
        assert r.n_common <= r.size_small
    assert all(0.8 <= r.containment <= 1.0 for r in rows)


def test_quality_filter_funnel_structure(spark):
    rows = sorted(
        registry.queries()["quality_filter_funnel"](spark, SF_DIR).collect(),
        key=lambda r: r.stage,
    )
    assert [r.stage for r in rows] == list(range(6))
    assert rows[0].rule == "all_docs" and rows[0].n_dropped == 0
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert rows[0].n_surviving == docs.count()
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_surviving <= prev.n_surviving
        assert cur.n_dropped == prev.n_surviving - cur.n_surviving
    # funnel tail must equal the filter's own keep count
    kept = (
        registry.queries()["doc_quality_score"](spark, SF_DIR)
        .filter("keep")
        .count()
    )
    assert rows[-1].n_surviving == kept


def test_bounce_rate_consistency(spark):
    rows = registry.queries()["session_bounce_rate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert math.isclose(
            r.bounce_rate, r.n_bounces / r.n_sessions, rel_tol=1e-12
        )
    total = sum(r.n_sessions for r in rows)
    n_sessions = registry.queries()["sessionize_events"](
        spark, SF_DIR
    ).count()
    assert total == n_sessions


def test_lorenz_deciles_structure(spark):
    rows = registry.queries()["lorenz_revenue_deciles"](spark, SF_DIR).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r)
    gini = {
        r.n_name: r
        for r in registry.queries()["gini_revenue_concentration"](
            spark, SF_DIR
        ).collect()
    }
    for name, rs in by_nation.items():
        rs.sort(key=lambda r: r.decile)
        # nations with < 10 customers fill only the first n NTILE buckets
        n_buckets = len(rs)
        assert [r.decile for r in rs] == list(range(1, n_buckets + 1))
        assert n_buckets == min(10, sum(r.n_customers for r in rs))
        # cum_share is nondecreasing, ends at exactly 1.0, and the curve
        # lies under the diagonal (spend sorted ascending)
        shares = [r.cum_share for r in rs]
        assert all(b >= a for a, b in zip(shares, shares[1:]))
        assert math.isclose(shares[-1], 1.0, rel_tol=1e-12)
        # under the diagonal: cumulative revenue share <= cumulative
        # POPULATION share (bucket sizes are unequal, so use the real one)
        total_n = sum(r.n_customers for r in rs)
        cum_n = 0
        for r, s in zip(rs, shares):
            cum_n += r.n_customers
            assert s <= cum_n / total_n + 1e-9
        # NTILE balance: bucket sizes differ by <= 1, larger first
        sizes = [r.n_customers for r in rs]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)
        # decile totals must sum to the same customer count Gini saw
        assert sum(sizes) == gini[name].n_customers


def test_repeat_order_rate_consistency(spark):
    rows = registry.queries()["repeat_order_rate_by_nation"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_repeat <= r.n_customers
        assert r.n_orders >= r.n_customers
        assert math.isclose(
            r.repeat_rate, r.n_repeat / r.n_customers, rel_tol=1e-12
        )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.n_orders for r in rows) == orders.count()


def test_first_digit_distribution(spark):
    rows = registry.queries()["first_digit_distribution"](
        spark, SF_DIR
    ).collect()
    assert all(1 <= r.digit <= 9 for r in rows)
    assert math.isclose(sum(r.share for r in rows), 1.0, rel_tol=1e-9)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.n for r in rows) == orders.count()


def test_order_gap_percentiles_reference(spark):
    got = {
        r.n_name: r
        for r in registry.queries()["order_gap_percentiles"](
            spark, SF_DIR
        ).collect()
    }
    con = _duck()
    rows = con.execute(
        """
        WITH g AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                   LAG(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev
            FROM orders
        )
        SELECT n.n_name, date_diff('day', g.prev, g.d) AS gap
        FROM g
        JOIN customer c ON g.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE g.prev IS NOT NULL
        """
    ).fetchall()
    by_nation = {}
    for name, gap in rows:
        by_nation.setdefault(name, []).append(gap)

    def q(xs, p):
        xs = sorted(xs)
        pos = (len(xs) - 1) * p
        lo = int(math.floor(pos))
        hi = min(lo + 1, len(xs) - 1)
        return xs[lo] + (pos - lo) * (xs[hi] - xs[lo])

    assert set(got) == set(by_nation)
    for name, xs in by_nation.items():
        r = got[name]
        assert r.n_gaps == len(xs)
        assert math.isclose(r.median_days, q(xs, 0.5), abs_tol=1e-6)
        assert math.isclose(r.p25_days, q(xs, 0.25), abs_tol=1e-6)
        assert math.isclose(r.p75_days, q(xs, 0.75), abs_tol=1e-6)
        assert r.p25_days <= r.median_days <= r.p75_days <= r.max_days


def test_minhash_band_calibration_consistency(spark):
    """The calibration report must describe the SAME index the dedup
    query uses: total candidate-pair mass across bands bounds (>=) the
    distinct candidate count dedup_minhash_lsh returns (a pair colliding
    in k bands is counted k times here, once there)."""
    rows = registry.queries()["minhash_band_calibration"](
        spark, SF_DIR
    ).collect()
    assert sorted(r.band for r in rows) == [0, 1, 2, 3]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    for r in rows:
        assert r.n_collision_buckets <= r.n_buckets <= n_docs
        assert r.max_bucket >= 1
        assert r.candidate_pairs >= r.n_collision_buckets  # each >=1 pair
    n_cand = registry.queries()["dedup_minhash_lsh"](spark, SF_DIR).count()
    assert sum(r.candidate_pairs for r in rows) >= n_cand


def test_symbol_correlation_matrix_structure(spark):
    rows = registry.queries()["symbol_correlation_matrix"](
        spark, SF_DIR
    ).collect()
    syms = {r.symbol_a for r in rows} | {r.symbol_b for r in rows}
    k = len(syms)
    assert len(rows) == k * (k - 1) // 2  # full upper triangle
    for r in rows:
        assert r.symbol_a < r.symbol_b
        if r.corr is not None:
            assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9


def test_monthly_seasonality_index_weighted_mean_is_one(spark):
    rows = registry.queries()["monthly_seasonality_index"](
        spark, SF_DIR
    ).collect()
    assert sorted(r.month for r in rows) == list(range(1, 13))
    n = sum(r.n_days for r in rows)
    wmean = sum(r.seasonal_index * r.n_days for r in rows) / n
    assert math.isclose(wmean, 1.0, rel_tol=1e-9)


def test_volume_move_correlation_bounds(spark):
    rows = registry.queries()["volume_move_correlation"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        if r.vol_move_corr is not None:
            assert -1.0 - 1e-9 <= r.vol_move_corr <= 1.0 + 1e-9


def test_cross_source_clusters_consistency(spark):
    rows = registry.queries()["dedup_cross_source_clusters"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert r.n_members >= 2  # clusters come from pairs
        assert 1 <= r.n_sources <= r.n_members
        assert len(r.sources.split(",")) == r.n_sources
        assert r.cross_source == (r.n_sources >= 2)
    # cluster membership totals must agree with dedup_clusters
    cc = registry.queries()["dedup_clusters"](spark, SF_DIR).count()
    assert sum(r.n_members for r in rows) == cc


def test_minhash_calibration_estimator_quality(spark):
    """The 16-hash agreement estimate must track exact Jaccard within
    the binomial error band: per-pair |err| <= 0.35 (~4.6 sigma at the
    J=0.5 worst case) and mean |err| well inside one sigma (0.125)."""
    rows = registry.queries()["minhash_estimate_calibration"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert math.isclose(r.est_jaccard, r.n_agree / 16.0, rel_tol=1e-12)
        assert r.abs_err <= 0.35
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err <= 0.125


def test_gap_fill_interpolated_reference(spark):
    """Interpolation invariants vs gap_fill_forward's calendar: same row
    set, real rows untouched, gap values strictly between (or equal to)
    their anchors, trailing gaps == ffill."""
    interp = registry.queries()["gap_fill_interpolated"](spark, SF_DIR)
    rows = sorted(
        interp.collect(), key=lambda r: (r.symbol, r.date.toordinal())
    )
    ffill = {
        (r.symbol, r.date): r
        for r in registry.queries()["gap_fill_forward"](
            spark, SF_DIR
        ).collect()
    }
    assert len(rows) == len(ffill)
    by_symbol = {}
    for r in rows:
        by_symbol.setdefault(r.symbol, []).append(r)
    n_gaps = n_interp = 0
    for sym, rs in by_symbol.items():
        assert not rs[0].is_gap  # range starts at a real row
        anchors = [(i, r) for i, r in enumerate(rs) if not r.is_gap]
        for (i0, a), (i1, b) in zip(anchors, anchors[1:]):
            for j in range(i0 + 1, i1):
                g = rs[j]
                assert g.is_gap
                n_gaps += 1
                lo, hi = sorted((a.close, b.close))
                assert lo - 1e-9 <= g.close <= hi + 1e-9
                # exact linear form on integer cents
                k, n = j - i0, i1 - i0
                pc = round(a.close * 100)
                ncents = round(b.close * 100)
                want = (pc * n + (ncents - pc) * k) / (100.0 * n)
                assert math.isclose(g.close, want, rel_tol=1e-12)
                n_interp += 1
        # trailing gaps forward-fill
        last_anchor = anchors[-1][0]
        for g in rs[last_anchor + 1:]:
            assert g.is_gap and math.isclose(
                g.close, anchors[-1][1].close, rel_tol=1e-12
            )
    assert n_interp > 0  # the dataset must actually exercise interpolation


def _avg_ranks(xs):
    """Tie-averaged ranks (1-based), the scipy.stats.rankdata 'average'
    method re-implemented so the suite stays scipy-free."""
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for t in range(i, j + 1):
            ranks[order[t]] = avg
        i = j + 1
    return ranks


def test_spearman_matches_python_reference(spark):
    """Recompute Spearman per symbol in pure Python (tie-averaged ranks
    + Pearson) from the same (volume, |move|) pairs the query ranks."""
    qs = registry.queries()
    got = {
        r.symbol: (r.n_days, r.spearman)
        for r in qs["spearman_volume_move"](spark, SF_DIR).collect()
    }
    from stock_market_etl_pipeline_spark.oracles import WITH_TICKS

    con = _duck()
    pairs = {}
    for sym, vol, mv in con.execute(WITH_TICKS + """
        SELECT symbol, volume,
               abs(CAST(ROUND(close*100,0) AS BIGINT)
                   - LAG(CAST(ROUND(close*100,0) AS BIGINT))
                         OVER (PARTITION BY symbol ORDER BY date)) AS mv
        FROM ticks
    """).fetchall():
        if mv is not None:
            pairs.setdefault(sym, []).append((vol, mv))
    checked = 0
    for sym, vm in pairs.items():
        if sym not in got:
            continue
        a = _avg_ranks([v for v, _ in vm])
        b = _avg_ranks([m for _, m in vm])
        n = len(vm)
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        saa = sum(x * x for x in a)
        sbb = sum(y * y for y in b)
        va, vb = n * saa - sa * sa, n * sbb - sb * sb
        if va == 0 or vb == 0:
            assert got[sym][1] is None
            continue
        want = (n * sab - sa * sb) / math.sqrt(va * vb)
        assert got[sym][0] == n
        assert got[sym][1] == pytest.approx(want, abs=1e-9)
        checked += 1
    assert checked >= 10 and checked == len(got)


def test_corpus_datacard_invariants(spark):
    """Structural invariants on the one-row datacard: the planted 20
    copies must register as >= 20 dup groups' worth of redundancy, the
    median must sit between min and mean neighborhood, and rates must be
    consistent ratios of the integer fields."""
    qs = registry.queries()
    row = qs["corpus_datacard"](spark, SF_DIR).collect()[0]
    assert row.n_docs == 520  # 500 + 20 planted copies
    assert row.dup_groups >= 20
    assert row.redundant_docs >= 20
    assert row.dup_rate == pytest.approx(
        row.redundant_docs / row.n_docs, abs=0
    )
    assert row.mean_chars == pytest.approx(
        row.total_chars / row.n_docs, abs=0
    )
    assert 0 < row.median_chars < 2 * row.mean_chars
    assert row.n_langs == 5 and row.n_sources == 20


def test_bootstrap_ci_statistical_sanity(spark):
    """The CI must bracket the point estimate, narrow as sqrt(n) (checked
    loosely: interval width under 10% of the mean at 1500 orders), and
    the replicate weights must be deterministic Poisson(1)-ish: mean
    weight within 5% of 1."""
    qs = registry.queries()
    row = qs["bootstrap_order_value_ci"](spark, SF_DIR).collect()[0]
    assert row.n_replicates == 100
    assert row.ci_lo < row.point_mean < row.ci_hi
    width = row.ci_hi - row.ci_lo
    assert 0 < width < 0.2 * row.point_mean
    # weight distribution: recompute one replicate's total weight
    con = _duck()
    (wsum, n) = con.execute("""
        SELECT SUM(CASE WHEN ('0x' || substr(md5(o_orderkey || '-0'),
                   1, 15))::BIGINT % 1000000 >= 367879 THEN 1 ELSE 0 END
              + CASE WHEN ('0x' || substr(md5(o_orderkey || '-0'),
                   1, 15))::BIGINT % 1000000 >= 735759 THEN 1 ELSE 0 END
              + CASE WHEN ('0x' || substr(md5(o_orderkey || '-0'),
                   1, 15))::BIGINT % 1000000 >= 919699 THEN 1 ELSE 0 END),
               COUNT(*)
        FROM orders
    """).fetchone()
    assert abs(wsum / n - 1.0) < 0.08  # truncated-at-3 mean ~= 0.98

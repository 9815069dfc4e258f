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
            assert math.isclose(r.acf, ref, rel_tol=1e-9, abs_tol=1e-12)
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

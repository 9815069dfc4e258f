"""Registry contract tests: every oracle key has a query, every query runs
and returns rows with stable schema at sf0.001 (the heavy full-oracle
comparison lives in tools/verify_oracle.py)."""

import pytest

from stock_market_etl_pipeline_spark import registry

from conftest import SF_DIR


def test_every_oracle_has_query():
    qs, osql = registry.queries(), registry.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 24


@pytest.mark.parametrize("name", ["ticks_ohlcv", "db_summary", "predictions"])
def test_query_smoke(spark, name):
    df = registry.queries()[name](spark, SF_DIR)
    assert df.count() > 0


def test_dedup_exact_groups_nonvacuous(spark):
    """The registered exact-dedup query must exercise its POSITIVE path at
    every verify scale: the raw corpus has zero natural exact duplicates,
    so the registration plants byte-identical twins (doc_id + 10M) of the
    first 25 ids. Each group must have >1 member and the ORIGINAL id as
    survivor (ids < 10M)."""
    df = registry.queries()["dedup_exact_groups"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0, "vacuously green: planted duplicates missing"
    assert all(r.n_docs >= 2 for r in rows)
    assert all(r.keep_doc_id < 10_000_000 for r in rows)


def test_suppliers_above_nation_avg_nonvacuous(spark):
    """sf0.001 has exactly one supplier per nation; the at-or-above (>=)
    exact-cents comparison must return every such supplier (each IS its
    nation's average) rather than a vacuous empty set."""
    df = registry.queries()["suppliers_above_nation_avg"](spark, SF_DIR)
    assert df.count() > 0, "vacuously green: no rows at sf0.001"


ROWS_ONLY_TWINS = {
    # rows-only query -> its oracled exact twin (the correctness anchor);
    # canonical copy exported as registry.TWINS (VERDICT r10 #4 made the
    # pairing driver-visible and upgraded two twins: sketch_price_
    # quantiles now pairs with the exact same-probe-points percentiles,
    # part_pagerank with the integer-quantized PageRank itself);
    # per-family error-bound certificates live in test_sketches.py /
    # test_llm_ops.py / test_enrich.py
    "approx_stats": "describe_stats",
    "ann_ivf_topk": "ann_ivf_full_probe",
    "sketch_distinct_rollup_merge": "distinct_custkeys_by_priority",
    "sketch_price_quantiles": "priority_price_percentiles",
    "theta_customer_set_algebra": "customer_priority_set_algebra",
    "ann_pq_topk": "embedding_cosine_topk",
    "ann_ivf_pq_topk": "embedding_cosine_topk",
    "enriched_volume_approx_quartiles": "enriched_features",
    "sketch_rolling_active_users": "rolling_active_users",
    "sketch_token_counts": "token_frequencies",
    "part_pagerank": "part_pagerank_int",
    "semantic_dedup": "embedding_near_pairs",
}


def test_every_rows_only_query_has_an_oracled_exact_twin():
    """A rows-only registration without a hash-green exact twin would be
    unverifiable; freeze the pairing so adding one forces a twin, and
    pin the exported registry.TWINS to this frozen copy."""
    qs, osql = registry.queries(), registry.oracle_sql()
    rows_only = set(qs) - set(osql)
    assert rows_only == set(ROWS_ONLY_TWINS), (
        "update ROWS_ONLY_TWINS with the new rows-only query's twin"
    )
    assert registry.TWINS == ROWS_ONLY_TWINS
    for twin in ROWS_ONLY_TWINS.values():
        assert twin in osql, f"twin {twin} must itself be oracled"
        assert twin in qs, f"twin {twin} must be registered"


def test_tpch2_shapes_nonvacuous(spark):
    """Every part-2 decision-support analog must exercise its positive
    path at sf0.001 (constants were chosen against the generated
    distributions — this pins that choice)."""
    qs = registry.queries()
    expected_min = {
        "nation_pair_trade": 50,
        "product_profit_by_nation_year": 10,
        "important_parts_value": 1,
        "top_supplier_revenue": 1,
        "supplier_count_by_part_attrs": 5,
        "disjunctive_band_revenue": 1,
        "min_cost_supplier_per_part": 100,
        "sole_last_supplier_orders": 2,
    }
    for name, lo in expected_min.items():
        n = qs[name](spark, SF_DIR).count()
        assert n >= lo, f"{name}: {n} rows < {lo} (vacuous)"
    # the one-row scalar must actually count matched lines
    row = qs["disjunctive_band_revenue"](spark, SF_DIR).collect()[0]
    assert row.n_lines > 0 and row.band_revenue > 0


def test_dominant_part_suppliers_nonvacuous_and_majority(spark):
    qs = registry.queries()
    rows = qs["dominant_part_suppliers"](spark, SF_DIR).collect()
    assert len(rows) >= 1, "vacuously green: no over-share supplier"
    for r in rows:
        assert r.n_supp >= 2
        assert r.qty_ps * r.n_supp > 3 * r.qty_p
        assert 3.0 / r.n_supp < r.share <= 1.0


def test_mfi_nonvacuous_and_bounded(spark):
    """MFI must produce real values past the warm-up (not all-NULL), and
    every value must sit in [0, 100] by construction."""
    df = registry.queries()["mfi_14"](spark, SF_DIR)
    rows = df.filter("mfi IS NOT NULL")
    n = rows.count()
    assert n > 0, "vacuously green: no full 14-flow frame anywhere"
    bad = rows.filter("mfi < 0 OR mfi > 100").count()
    assert bad == 0


def test_purchase_attribution_nonvacuous(spark):
    """Attribution must actually attribute: at least one non-organic touch
    type, and total purchases must equal the raw purchase count."""
    from stock_market_etl_pipeline_spark.sources.events import load_events

    df = registry.queries()["purchase_attribution"](spark, SF_DIR)
    rows = {r.attributed_to: r.n_purchases for r in df.collect()}
    assert any(k != "organic" for k in rows), rows
    total = sum(rows.values())
    raw = (
        load_events(spark, SF_DIR)
        .filter("event_type = 'purchase'")
        .count()
    )
    assert total == raw


def test_driver_gate_window_is_oracled_and_fresh():
    """The driver's CORRECTNESS gate samples the first
    DRIVER_SAMPLE_WINDOW entries of queries(); freeze that the window is
    (a) entirely oracled — no rows-only entry can burn a gate slot with
    `err: no_oracle` — and (b) leads with never-driver-sampled names so
    each round certifies a fresh slice of the registry."""
    qs, osql = list(registry.queries()), registry.oracle_sql()
    window = qs[: registry.DRIVER_SAMPLE_WINDOW]
    assert all(n in osql for n in window)
    fresh = [n for n in window if n not in registry.DRIVER_SAMPLED]
    # while never-sampled oracled debt remains, the WHOLE window is fresh;
    # once it runs out the backfill tier takes over (tested below)
    n_fresh_available = sum(
        1 for n in registry._QUERIES
        if n in osql and n not in registry.DRIVER_SAMPLED
    )
    assert len(fresh) == min(registry.DRIVER_SAMPLE_WINDOW, n_fresh_available)
    # rows-only entries must sit past every oracled entry
    first_rows_only = min(
        (i for i, n in enumerate(qs) if n not in osql), default=len(qs)
    )
    assert all(n in osql for n in qs[:first_rows_only])
    # reordering must never drop or duplicate a query
    assert sorted(qs) == sorted(registry._QUERIES)


def test_driver_sampled_is_derived_from_correctness_files():
    """DRIVER_SAMPLED must be the mechanical union of the committed
    CORRECTNESS_r*.json keys — a hand-maintained list could typo a name
    and silently shift which queries get certified (ADVICE r6)."""
    import json
    from pathlib import Path

    root = Path(registry.__file__).resolve().parent.parent
    files = sorted(root.glob("CORRECTNESS_r*.json"))
    assert files, "no committed CORRECTNESS files found next to the package"
    expected = set()
    for f in files:
        expected |= set(json.loads(f.read_text()))
    assert registry.DRIVER_SAMPLED == frozenset(expected)
    # every historical name still resolves (or is explicitly retired)
    assert (expected - set(registry._QUERIES)) <= registry._RETIRED


def test_driver_gate_backfills_least_recently_certified(monkeypatch):
    """When never-sampled debt is smaller than the window, the remainder
    must backfill with the least-recently-certified oracled queries so
    old certifications rotate back under the gate."""
    oracled = [n for n in registry._QUERIES if n in registry._ORACLES]
    # pretend everything but 3 queries was sampled; stagger the rounds
    fresh3 = oracled[:3]
    hist = {n: (1 if i % 2 == 0 else 6) for i, n in enumerate(oracled[3:])}
    monkeypatch.setattr(registry, "_SAMPLE_HISTORY", hist)
    monkeypatch.setattr(registry, "DRIVER_SAMPLED", frozenset(hist))
    window = list(registry.queries())[: registry.DRIVER_SAMPLE_WINDOW]
    assert window[:3] == fresh3
    backfill = window[3:]
    expected = sorted(
        (n for n in hist), key=lambda n: (hist[n], n)
    )[: len(backfill)]
    assert backfill == expected
    # oldest-round names come first
    assert all(hist[n] == 1 for n in backfill)


def test_unknown_correctness_name_warns_but_serves(monkeypatch):
    """queries() is the driver's production entry point — a stale history
    name must degrade to a warning, never brick the whole registry
    (ADVICE r7). The loud check lives in
    test_driver_sampled_is_derived_from_correctness_files."""
    monkeypatch.setattr(
        registry, "_SAMPLE_HISTORY", {"no_such_query_xyz": 3}
    )
    with pytest.warns(UserWarning, match="no_such_query_xyz"):
        qs = registry.queries()
    assert sorted(qs) == sorted(registry._QUERIES)


def test_failed_gate_entry_reenters_backfill_first(tmp_path, monkeypatch):
    """A query that FAILED the driver gate in round N must sort at the
    very FRONT of the LRU backfill (round 0), not rotate to the back as
    most-recently-certified (ADVICE r7); a LATER green round restores
    its certification; rows-only 'no_oracle' records stay
    certifications."""
    import json

    g = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
    bad_hash = dict(g, hash_match=False)
    errored = dict(g, hash_match=None, rows_match=None, err="boom")
    rows_only = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": 5, "oracle_rows": None,
                 "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": g, "b": g, "c": g, "d": rows_only})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"a": bad_hash, "b": errored})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"b": g})
    )

    # the function derives its search root as
    # Path(__file__).resolve().parent.parent — plant a fake module path
    # two levels under tmp_path so the REAL parse logic runs on the
    # fixture files
    fake_pkg = tmp_path / "pkg" / "registry.py"
    fake_pkg.parent.mkdir()
    fake_pkg.write_text("")
    monkeypatch.setattr(registry, "__file__", str(fake_pkg))
    hist = registry._driver_sample_history()

    # 'a' failed hash in r2 after green r1 → round 0 (re-gate first)
    assert hist["a"] == 0
    # 'b' errored in r2 but re-certified green in r3 → round 3
    assert hist["b"] == 3
    # 'c' green r1 only → round 1
    assert hist["c"] == 1
    # 'd' rows-only no_oracle → a certification, round 1
    assert hist["d"] == 1


def test_customer_order_distribution_zero_bucket_nonvacuous(spark):
    """Q13's whole point is the LEFT JOIN keeping zero-order customers;
    the qualifying predicate (= '1-URGENT') was chosen so bucket 0 is
    robustly populated (18/150 customers at sf0.001). If a testdata regen
    made every customer urgent-ordered, this query would silently
    degenerate to an inner join — fail loudly instead."""
    df = registry.queries()["customer_order_distribution"](spark, SF_DIR)
    rows = {r.n_orders: r.n_customers for r in df.collect()}
    assert rows.get(0, 0) >= 5, f"zero-order bucket vacuous: {rows}"
    assert sum(rows.values()) == 150  # every customer lands in a bucket


def test_registry_import_time_stays_bounded():
    """VERDICT r11 #8: _driver_sample_history() parses every committed
    CORRECTNESS_r*.json at import, and the registry itself builds 309
    query closures — both grow round over round. Pin a generous wall
    bound on a FRESH import + queries() + oracle_sql() (subprocess, so
    no module cache) so creep surfaces as a test failure, not as a
    mysteriously slow driver gate. Measured 0.54 s at r12 (11 history
    files, 309 queries); the bound leaves ~4x headroom for host noise
    and eight more rounds of history files."""
    import subprocess
    import sys

    code = (
        "import time, sys; sys.path.insert(0, '/root/repo');"
        "t0 = time.perf_counter();"
        "import __spark_entry__ as m;"
        "qs = m.queries(); o = m.oracle_sql();"
        "assert len(qs) >= 300 and len(o) >= 290;"
        "print(time.perf_counter() - t0)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    wall = float(out.stdout.strip())
    assert wall < 2.0, f"registry import+queries() took {wall:.2f}s"

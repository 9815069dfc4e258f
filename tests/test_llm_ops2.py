"""LLM-pipeline part 2 (registry_llm2.py): semantics + plan shapes.

Oracle parity is covered by tools/verify_oracle.py / the -m oracle
marker; these pin the planted positive paths, reference math, and the
bounded-fan-out plan claims.
"""

import math

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark import registry

from conftest import SF_DIR
from test_plan_shapes import count_nodes, plan_of


@pytest.fixture(scope="module")
def qs():
    return registry.queries()


# ---------------------------------------------------------------------------
# source_fingerprint_overlap
# ---------------------------------------------------------------------------


def test_source_overlap_planted_pairs_present(spark, qs):
    """Docs 0..39 are replanted under source (id+7)%20; every returned
    pair must share ≥1 fingerprint and Jaccard must be consistent with
    the exact set counts."""
    rows = qs["source_fingerprint_overlap"](spark, SF_DIR).collect()
    assert len(rows) > 0, "vacuously green: planted overlaps missing"
    for r in rows:
        assert r.source_a < r.source_b
        assert 1 <= r.n_shared <= min(r.n_fp_a, r.n_fp_b)
        expect = r.n_shared / (r.n_fp_a + r.n_fp_b - r.n_shared)
        assert r.jaccard == pytest.approx(expect, abs=0)
    # doc 0 lives in src0 and is replanted into src7 → that pair exists
    assert any(r.source_a == "src0" and r.source_b == "src7" for r in rows)


# ---------------------------------------------------------------------------
# doc_bigram_surprisal
# ---------------------------------------------------------------------------


def test_bigram_surprisal_hand_corpus(spark, qs, monkeypatch):
    """Three docs: two identical ('a b a b'), one rare ('a x'). The
    bigram model is shared, so the rare transition must score strictly
    higher than the common docs, with exact c1/c2 terms."""
    import stock_market_etl_pipeline_spark.registry_llm2 as llm2

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b a b"), (2, "a x")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(llm2, "load_table", lambda s, d, t: docs)
    rows = {r.doc_id: r for r in llm2.q_doc_bigram_surprisal(spark, SF_DIR).collect()}
    # model: c(a,b)=4, c(b,a)=2, c(a,x)=1 → c1(a)=5, c1(b)=2
    # doc0/1: bigrams (a,b),(b,a),(a,b) → avg(5/4, 2/2, 5/4) = 7/6
    assert rows[0].n_bigrams == 3
    assert rows[0].surprisal == pytest.approx(7 / 6, abs=1e-6)
    assert rows[0].surprisal == rows[1].surprisal
    # doc2: one bigram (a,x) → 5/1 = 5
    assert rows[2].n_bigrams == 1
    assert rows[2].surprisal == 5.0
    assert rows[2].surprisal > rows[0].surprisal


def test_bigram_surprisal_short_doc_guarded(spark, qs, monkeypatch):
    """Docs with <2 tokens must be silently absent, not crash (the r4
    ADVICE sequence() guard discipline)."""
    import stock_market_etl_pipeline_spark.registry_llm2 as llm2

    docs = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "a b")], "doc_id long, text string"
    )
    monkeypatch.setattr(llm2, "load_table", lambda s, d, t: docs)
    got = {r.doc_id for r in llm2.q_doc_bigram_surprisal(spark, SF_DIR).collect()}
    assert got == {2}


# ---------------------------------------------------------------------------
# label_centroid_distances
# ---------------------------------------------------------------------------


def test_centroid_distances_match_numpy(spark, qs):
    """The exact-rational centroid construction must agree with numpy's
    float64 centroid cosines to ~1e-5 on the real embeddings table."""
    import numpy as np

    rows = qs["label_centroid_distances"](spark, SF_DIR).collect()
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("label", "embedding")
        .collect()
    )
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    cents = {
        k: np.round(np.stack(v) * 1e6).sum(axis=0) / (1e6 * len(v))
        for k, v in by_label.items()
    }
    n_labels = len(cents)
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        a, b = cents[r.label_a], cents[r.label_b]
        exp = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r.centroid_cosine == pytest.approx(exp, abs=1e-5)
        assert -1.0 - 1e-9 <= r.centroid_cosine <= 1.0 + 1e-9
        assert r.label_a < r.label_b


# ---------------------------------------------------------------------------
# Plan shapes
# ---------------------------------------------------------------------------


def test_overlap_join_is_on_fingerprint_digest(spark, qs):
    """The pair join must be an equi-join on the md5 digest (bounded
    per-key fan-out), never a nested-loop over sources."""
    plan = plan_of(qs["source_fingerprint_overlap"](spark, SF_DIR))
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert "CartesianProduct" not in plan


def test_centroid_pair_join_runs_on_bounded_rollup(spark, qs):
    """The pos-join must consume the (label, pos) aggregate — bounded at
    |labels|·|dim| rows — not the raw exploded vectors: a HashAggregate
    sits below every join input, and no window/cartesian appears."""
    plan = plan_of(qs["label_centroid_distances"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert count_nodes(plan, "Window") == 0
    assert count_nodes(plan, "HashAggregate") >= 4


def test_surprisal_single_checkpointed_explode(spark, qs):
    """The bigram explode is checkpoint-shared: the plan over the
    checkpointed table must contain NO parquet scan (documents was
    materialized once) and exactly one Generate-free scoring join tree."""
    plan = plan_of(qs["doc_bigram_surprisal"](spark, SF_DIR))
    assert count_nodes(plan, "Scan parquet") == 0
    assert count_nodes(plan, "Generate") == 0


# ---------------------------------------------------------------------------
# dau_mau_stickiness
# ---------------------------------------------------------------------------


def test_stickiness_bounds_and_consistency(spark, qs):
    """0 < stickiness ≤ 1, DAU ≤ MAU, and the MAU column must agree
    row-for-row with rolling_active_users (the composition claim)."""
    rows = qs["dau_mau_stickiness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dau <= r.mau_30d
        assert 0.0 <= r.stickiness <= 1.0
        assert r.stickiness == pytest.approx(r.dau / r.mau_30d, abs=0)
    mau_ref = {
        r.day: r.mau_30d
        for r in qs["rolling_active_users"](spark, SF_DIR).collect()
    }
    assert {r.day: r.mau_30d for r in rows} == mau_ref


def test_stickiness_single_events_scan_via_checkpoint(spark, qs):
    """The deduplicated user-day table is checkpoint-shared by DAU and
    the coverage explode; only the bounds aggregate re-reads events →
    exactly one parquet scan in the final plan."""
    plan = plan_of(qs["dau_mau_stickiness"](spark, SF_DIR))
    assert count_nodes(plan, "Scan parquet") == 1


# ---------------------------------------------------------------------------
# contamination_ngram_coverage
# ---------------------------------------------------------------------------


def test_contamination_planted_leaks_positive(spark, qs):
    """All 50 benchmark docs report; every planted-leak doc (0..19) has
    a positive rate bounded by its 40%-prefix gram fraction; counts are
    internally consistent."""
    rows = {r.doc_id: r for r in qs["contamination_ngram_coverage"](spark, SF_DIR).collect()}
    assert set(rows) == set(range(50))
    for i in range(20):
        r = rows[i]
        assert r.n_contaminated > 0, f"doc {i}: planted leak not detected"
        assert 0.0 < r.contamination_rate <= 1.0
    for r in rows.values():
        assert 0 <= r.n_contaminated <= r.n_grams
        assert r.contamination_rate == pytest.approx(
            r.n_contaminated / r.n_grams, abs=0
        )


def test_contamination_semi_join_on_hashed_grams(spark, qs):
    """The membership probe must be a LEFT SEMI on the 60-bit gram hash
    (8-byte shuffle keys — the span_duplication_rate lesson), never a
    nested loop."""
    plan = plan_of(qs["contamination_ngram_coverage"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0

"""doc_quality_score + dedup_edit_distance: semantics and plan shapes."""

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark import registry

from conftest import SF_DIR
from test_plan_shapes import count_nodes, plan_of


@pytest.fixture(scope="module")
def qs():
    return registry.queries()


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )


def test_quality_flags_on_crafted_docs(spark, monkeypatch):
    import stock_market_etl_pipeline_spark.registry_llm as llm

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "down the long road with a happy friend for many more days here"
    )
    too_short = "tiny doc"
    all_symbols = "@#$% ^&*! )(][ ;;;; @#$% ^&*! )(][ ;;;; " * 3
    repetitive = "spam " * 60

    monkeypatch.setattr(
        llm, "load_table",
        lambda s, d, n: _docs(s, [good, too_short, all_symbols, repetitive]),
    )
    rows = {r.doc_id: r for r in llm.q_doc_quality_score(spark, SF_DIR).collect()}

    assert rows[0].keep is True and rows[0].quality_score == 1.0
    assert rows[1].ok_n_tokens is False and rows[1].keep is False
    assert rows[2].ok_symbol is False and rows[2].keep is False
    # 60× the same token → distinct_ratio 1/60 < 0.2
    assert rows[3].ok_distinct is False and rows[3].keep is False
    # score is the fraction of passed checks
    for r in rows.values():
        passed = sum(
            [r.ok_n_tokens, r.ok_avg_token_len, r.ok_stopword, r.ok_symbol,
             r.ok_distinct]
        )
        assert r.quality_score == pytest.approx(passed / 5.0)


def test_quality_score_no_shuffle_single_scan(spark, qs):
    plan = plan_of(qs["doc_quality_score"](spark, SF_DIR))
    assert count_nodes(plan, "Exchange") == 0
    assert count_nodes(plan, "Scan parquet") == 1


def test_edit_distance_verify_finds_planted_near_dup(spark, monkeypatch):
    import stock_market_etl_pipeline_spark.registry_llm as llm

    # 60 tokens with ONE character deleted → shingle-Jaccard ≈ 0.95, so
    # the 4-band MinHash signature collides and the pair is a candidate;
    # the short `far` doc shares no shingles and must never appear
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
             "pi", "rho", "sigma", "tau", "upsilon"]
    base = " ".join(words[i % 20] + str(i) for i in range(60))
    near = base.replace("delta3", "delt3", 1)
    far = "completely different words that share nothing at all " * 4

    monkeypatch.setattr(
        llm, "load_table", lambda s, d, n: _docs(s, [base, near, far])
    )
    rows = llm.q_dedup_edit_distance(spark, SF_DIR).collect()
    pairs = {(r.doc_a, r.doc_b): r.edit_distance for r in rows}
    assert (0, 1) in pairs
    # 1 deletion + 1 char shifted across the 80-char prefix boundary
    assert pairs[(0, 1)] == 2
    assert all(2 not in p for p in pairs)


def test_edit_distance_runs_only_on_candidates(spark, qs):
    # the plan must not contain a doc×doc cross/nested-loop join — the
    # levenshtein verify attaches to the banded candidate set
    plan = plan_of(qs["dedup_edit_distance"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

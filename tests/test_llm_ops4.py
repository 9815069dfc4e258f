"""registry_llm4 + event_burst_days: corpus novelty attribution,
embedding outlier audit, exact-integer burst flags — semantics on
planted cases + conservation invariants on the real testdata. Oracle
parity is covered by the -m oracle marker."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark import registry
import stock_market_etl_pipeline_spark.registry_ext3 as ext3
import stock_market_etl_pipeline_spark.registry_llm4 as llm4

from conftest import SF_DIR
from test_plan_shapes import count_nodes, plan_of


@pytest.fixture(scope="module")
def qs():
    return registry.queries()


# ---------------------------------------------------------------------------
# doc_novelty_fraction
# ---------------------------------------------------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def test_novelty_planted_corpus(spark, monkeypatch):
    texts = [
        "a b c d",    # shingles {abc, bcd} — all novel
        "a b c x",    # {abc, bcx} — abc seen → 1/2
        "a b c d",    # exact dup → 0/2
        "z z",        # < 3 tokens → excluded
    ]
    monkeypatch.setattr(llm4, "load_table", lambda s, d, n: _docs(s, texts))
    rows = {r.doc_id: r for r in llm4.q_doc_novelty_fraction(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1, 2}
    assert (rows[0].n_shingles, rows[0].n_novel, rows[0].novelty_frac) == (2, 2, 1.0)
    assert (rows[1].n_shingles, rows[1].n_novel, rows[1].novelty_frac) == (2, 1, 0.5)
    assert (rows[2].n_shingles, rows[2].n_novel, rows[2].novelty_frac) == (2, 0, 0.0)


def test_novelty_conservation_on_testdata(spark):
    """Every distinct shingle is attributed to exactly ONE doc, so
    Σ n_novel == |corpus shingle vocabulary|, and the earliest doc is
    fully novel."""
    df = registry.queries()["doc_novelty_fraction"](spark, SF_DIR).cache()
    rows = df.collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty_frac == 1.0
    from stock_market_etl_pipeline_spark.functions.text import (
        word_shingles, ws_tokens,
    )
    from stock_market_etl_pipeline_spark.sources.tables import load_table

    vocab = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(word_shingles(ws_tokens(F.col("text")), 3)).alias("g"))
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == vocab
    df.unpersist()


# ---------------------------------------------------------------------------
# label_embedding_outliers
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(rows)],
        "vec_id bigint, embedding array<float>, label int",
    )


def test_outliers_planted_far_vector(spark, monkeypatch):
    rows = (
        [([0.1, 0.1], 0)] * 5
        + [([0.9, -0.8], 0)]       # vec_id 5: far from label-0 centroid
        + [([0.5, 0.5], 1)] * 4
    )
    monkeypatch.setattr(llm4, "load_table", lambda s, d, n: _emb(s, rows))
    got = llm4.q_label_embedding_outliers(spark, SF_DIR).collect()
    top0 = next(r for r in got if r.label == 0 and r.nn_rank == 1)
    assert top0.vec_id == 5
    # label 1 is a perfect clique: all distances 0, ranks tie-broken by id
    l1 = sorted((r.nn_rank, r.vec_id) for r in got if r.label == 1)
    assert l1 == [(1, 6), (2, 7), (3, 8)]
    assert all(r.dist2 == 0.0 for r in got if r.label == 1)


def test_outliers_distance_matches_numpy(spark, monkeypatch):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    rows = [(list(map(float, v)), int(i % 2)) for i, v in enumerate(vecs)]
    monkeypatch.setattr(llm4, "load_table", lambda s, d, n: _emb(s, rows))
    got = llm4.q_label_embedding_outliers(spark, SF_DIR).collect()
    # numpy reference on the SAME 1e-6 quantization
    q = np.round(vecs.astype("float64") * 1e6)
    for lab in (0, 1):
        idx = [i for i in range(30) if i % 2 == lab]
        sub = q[idx]
        cen = sub.mean(axis=0)
        d2 = ((sub - cen) ** 2).sum(axis=1) / 1e12
        order = sorted(range(len(idx)), key=lambda j: (-d2[j], idx[j]))
        want = [(idx[j], d2[j]) for j in order[:3]]
        have = sorted(
            ((r.vec_id, r.dist2) for r in got if r.label == lab),
            key=lambda p: want and [w[0] for w in want].index(p[0])
            if p[0] in [w[0] for w in want] else 99,
        )
        assert [h[0] for h in have] == [w[0] for w in want]
        for (hv, hd), (wv, wd) in zip(have, want):
            assert hd == pytest.approx(wd, rel=1e-9)


# ---------------------------------------------------------------------------
# event_burst_days
# ---------------------------------------------------------------------------


def _events(spark, day_counts, etype="click"):
    rows = []
    eid = 0
    for d, c in enumerate(day_counts):
        for k in range(c):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + d, 12, 0, k % 60), 1, etype,
                 1.0, "{}")
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_burst_day_flagged_and_uniform_not(spark, monkeypatch):
    monkeypatch.setattr(
        ext3, "load_events", lambda s, d: _events(spark, [1] * 9 + [20])
    )
    got = ext3.q_event_burst_days(spark, SF_DIR).collect()
    assert [(r.day, r.n_events) for r in got] == [(dt.date(2024, 1, 10), 20)]
    monkeypatch.setattr(
        ext3, "load_events", lambda s, d: _events(spark, [5] * 10)
    )
    assert ext3.q_event_burst_days(spark, SF_DIR).count() == 0


def test_burst_lower_tail_never_flagged(spark, monkeypatch):
    # a DEAD day (far below mean) must not flag: upper tail only
    monkeypatch.setattr(
        ext3, "load_events", lambda s, d: _events(spark, [20] * 9 + [1])
    )
    assert ext3.q_event_burst_days(spark, SF_DIR).count() == 0


def test_burst_nonvacuous_on_testdata(qs, spark):
    # 2-sigma was chosen so the real data flags something at every sf
    assert qs["event_burst_days"](spark, SF_DIR).count() >= 1


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def test_outliers_centroid_join_is_broadcast(qs, spark):
    plan = plan_of(qs["label_embedding_outliers"](spark, SF_DIR))
    assert count_nodes(plan, "BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_burst_stats_join_is_broadcast(qs, spark):
    plan = plan_of(qs["event_burst_days"](spark, SF_DIR))
    assert count_nodes(plan, "BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan

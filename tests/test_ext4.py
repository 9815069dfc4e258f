"""Round-6 extensions (registry_ext4.py): basket-graph triangles and
systematic weighted sampling, plus the global_prefix_sums primitive.
Oracle parity is covered by tools/verify_oracle.py / -m oracle; these
pin semantics on hand inputs and the distributed-prefix-sum invariant.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark import registry
import stock_market_etl_pipeline_spark.registry_ext4 as ext4
from stock_market_etl_pipeline_spark.operators.enumerate import (
    global_prefix_sums,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def qs():
    return registry.queries()


# ---------------------------------------------------------------------------
# Triangles
# ---------------------------------------------------------------------------


def _fake_lineitem(spark, orders):
    """orders: {orderkey: [partkeys]} — replicated twice so every pair
    clears the support-2 edge filter."""
    rows = [
        (ok + off, pk)
        for ok, parts in orders.items()
        for pk in parts
        for off in (0, 1000)
    ]
    return spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    )


def test_triangles_hand_graph(spark, monkeypatch):
    # parts {1,2,3} form a triangle (each pair co-occurs); part 4 hangs
    # off part 1 only (edge, no triangle); {5,6,7,8} form a 4-clique =
    # 4 triangles, each part in exactly 3 of them.
    orders = {
        10: [1, 2], 20: [2, 3], 30: [1, 3],
        40: [1, 4],
        50: [5, 6, 7, 8],
    }
    fake = _fake_lineitem(spark, orders)
    monkeypatch.setattr(ext4, "load_table", lambda s, d, t: fake)
    got = {
        r.part_key: r.n_triangles
        for r in ext4.q_part_triangle_counts(spark, SF_DIR).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 3, 6: 3, 7: 3, 8: 3}


def test_triangles_nonvacuous_at_sf0001(spark, qs):
    df = qs["part_triangle_counts"](spark, SF_DIR)
    assert df.count() > 50, "vacuous: support-2 graph has no triangles"


# ---------------------------------------------------------------------------
# Systematic weighted sample
# ---------------------------------------------------------------------------


def test_weighted_sample_selects_k_when_no_doc_spans_strides(
    spark, monkeypatch
):
    # 500 docs of weight 10 → total 5000, stride 100 > max weight 10,
    # so EXACTLY K docs are selected, evenly spaced.
    docs = spark.createDataFrame(
        [(i, "s", 10) for i in range(500)],
        "doc_id bigint, source string, n_chars int",
    )
    monkeypatch.setattr(ext4, "load_table", lambda s, d, t: docs)
    rows = ext4.q_systematic_weighted_sample(spark, SF_DIR).collect()
    assert len(rows) == ext4._SAMPLE_K
    ids = sorted(r.doc_id for r in rows)
    # stride 100 chars = 10 docs: every 10th doc, starting at index 9
    assert ids == list(range(9, 500, 10))


def test_weighted_sample_wide_doc_always_selected(spark, monkeypatch):
    # one doc holds >1 stride of the total weight: it MUST be selected
    # (and only once), however the remaining strides fall.
    docs = spark.createDataFrame(
        [(i, "s", 5) for i in range(100)] + [(999, "s", 2000)],
        "doc_id bigint, source string, n_chars int",
    )
    monkeypatch.setattr(ext4, "load_table", lambda s, d, t: docs)
    rows = ext4.q_systematic_weighted_sample(spark, SF_DIR).collect()
    picked = [r.doc_id for r in rows]
    assert picked.count(999) == 1
    assert len(picked) == len(set(picked))


def test_weighted_sample_deterministic_across_partitionings(
    spark, monkeypatch
):
    base = spark.createDataFrame(
        [(i, "s", (i * 37) % 90 + 10) for i in range(1000)],
        "doc_id bigint, source string, n_chars int",
    )
    picks = []
    for parts in (1, 7, 32):
        monkeypatch.setattr(
            ext4, "load_table",
            lambda s, d, t, p=parts: base.repartition(p),
        )
        picks.append(
            sorted(
                r.doc_id
                for r in ext4.q_systematic_weighted_sample(
                    spark, SF_DIR
                ).collect()
            )
        )
    assert picks[0] == picks[1] == picks[2]


# ---------------------------------------------------------------------------
# global_prefix_sums primitive
# ---------------------------------------------------------------------------


def test_global_prefix_sums_matches_naive_window(spark):
    df = spark.createDataFrame(
        [(i, (i * 13) % 7 + 1) for i in range(400)],
        "k bigint, v int",
    ).repartition(11)
    got = {
        r.k: r.cum
        for r in global_prefix_sums(df, ["k"], "v", "cum").collect()
    }
    want = {
        r.k: r.cum
        for r in df.select(
            "k",
            F.sum("v")
            .over(
                Window.orderBy("k").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("cum"),
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Unpivot / chi-square
# ---------------------------------------------------------------------------


def test_lang_source_chisq_matches_scipy_free_reference(spark, qs):
    """Recompute the statistic in pure Python from the same contingency
    table; dof must be (|langs|-1)(|sources|-1)."""
    from stock_market_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    cells = {
        (r.lang, r.source): r.cnt
        for r in docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    langs = sorted({k[0] for k in cells})
    sources = sorted({k[1] for k in cells})
    n = sum(cells.values())
    r_m = {l: sum(v for (a, _), v in cells.items() if a == l) for l in langs}
    c_m = {s: sum(v for (_, b), v in cells.items() if b == s) for s in sources}
    want = sum(
        (o * n - r_m[l] * c_m[s]) ** 2 / (r_m[l] * c_m[s] * n)
        for (l, s), o in cells.items()
    )
    row = qs["lang_source_chisq"](spark, SF_DIR).collect()[0]
    assert row.n_docs == n
    assert row.dof == (len(langs) - 1) * (len(sources) - 1)
    assert row.chi2 == pytest.approx(want, abs=2e-6)

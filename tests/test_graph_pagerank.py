"""PageRank certificates (operators/graph.py::pagerank,
part_pagerank): numpy power-iteration agreement on the real sf0.001
graph, probability-mass conservation, and a planted-hub sanity case.
The registered query is rows-only; its edge construction is anchored by
the hash-green part_cooccurrence twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_etl_pipeline_spark import registry
from stock_market_etl_pipeline_spark.operators.graph import pagerank

from conftest import SF_DIR


def test_planted_hub_ranks_first(spark):
    # star: 0 connected to 1..5; 6-7 an isolated dumbbell pair
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(6, 7)],
        "part_a bigint, part_b bigint",
    )
    pr = {r.node: r["rank"] for r in pagerank(edges, iters=20).collect()}
    assert max(pr, key=pr.get) == 0
    # leaves of the star are symmetric
    leaf_ranks = {round(pr[i], 12) for i in range(1, 6)}
    assert len(leaf_ranks) == 1
    # total mass is a probability distribution
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)


def test_matches_numpy_power_iteration_on_testdata(spark):
    import numpy as np

    edges = registry.queries()["part_cooccurrence"](spark, SF_DIR).select(
        "part_a", "part_b"
    )
    rows = edges.collect()
    got = {
        r.node: r["rank"]
        for r in pagerank(edges, iters=10).collect()
    }

    # reference: identical symmetrized graph, identical 10 iterations
    nodes = sorted({r.part_a for r in rows} | {r.part_b for r in rows})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    nbrs: list[set] = [set() for _ in range(n)]
    for r in rows:
        a, b = idx[r.part_a], idx[r.part_b]
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = np.array([len(s) for s in nbrs], dtype="float64")
    rank = np.full(n, 1.0 / n)
    for _ in range(10):
        new = np.full(n, 0.15 / n)
        for u in range(n):
            share = 0.85 * rank[u] / deg[u]
            for v in nbrs[u]:
                new[v] += share
        rank = new
    assert len(got) == n
    for v in nodes:
        assert got[v] == pytest.approx(rank[idx[v]], rel=1e-9, abs=1e-12)


def test_registered_topk_is_stable_and_mass_ordered(spark):
    df = registry.queries()["part_pagerank"](spark, SF_DIR)
    rows = df.collect()
    assert 0 < len(rows) <= 50
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # two runs agree exactly at the rounded precision
    again = [r["rank"] for r in registry.queries()["part_pagerank"](spark, SF_DIR).collect()]
    assert ranks == again

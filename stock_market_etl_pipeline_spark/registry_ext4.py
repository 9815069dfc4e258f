"""Round-6 analytics extensions: basket-graph triangle counting and
weight-proportional systematic sampling.

Both are LLM-curation / market-basket staples the registry lacked:
triangle participation is the clustering-coefficient precursor ("how
clique-ish is the co-purchase neighborhood of this part"), and
systematic weighted sampling is the deterministic probability-
proportional-to-size doc sampler a curation pipeline uses when it wants
"sample 50 docs, big docs proportionally more likely, reproducible
across runs and engines" (reference has a pandas `.sample()` in its
notebook sketches — `dashboard/app.py` random slices — which is neither
weighted nor deterministic; these are the distributed, seedless
equivalents).

Exactness: both queries are pure integer arithmetic — triangle counts
are counts; the sampler's stride test floor-divides exact int64
cumulative sums (no float ratio ever materializes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.enumerate import global_prefix_sums
from .registry import register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Basket-graph triangle participation
# ---------------------------------------------------------------------------

_TRI_SUPPORT = 2


@register(
    "part_triangle_counts",
    f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    e AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_TRI_SUPPORT}
    ),
    tri AS (
        SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        FROM e e1
        JOIN e e2 ON e1.pb = e2.pa
        JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    roles AS (
        SELECT a AS part_key FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT part_key, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM roles GROUP BY 1
    """,
)
def q_part_triangle_counts(spark, sf_dir):
    """Per-part triangle participation in the co-purchase graph — the
    numerator of the local clustering coefficient, and the step beyond
    ``part_cooccurrence`` (edges) and ``part_pagerank`` (centrality):
    a part in many triangles sits in a cohesive product CLIQUE, not just
    a hub. Edges are co-occurrence pairs with support ≥ {2} (same
    definition as part_cooccurrence), which bounds the graph to
    genuinely co-bought pairs.

    Plan: the standard distributed triangle enumeration over ORIENTED
    edges (pa < pb, so each triangle a<b<c is found exactly once as the
    wedge a-b, b-c closed by a-c). op dedups on one orderkey shuffle and
    self-joins co-partitioned; the wedge join shuffles the edge list on
    its mid vertex; the closing join shuffles wedges against edges on
    the (a, c) pair key. Every join is keyed — never all-pairs — and the
    wedge fan-out is Σ deg(v)² over the SUPPORT-FILTERED graph (measured:
    2324 edges at sf0.001 → 3445 at sf0.01 for 10× rows — the support
    filter keeps the graph from densifying with volume; the orientation
    halves wedge degree by construction). Counts are exact integers —
    no float policy.
    """
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _TRI_SUPPORT)
        .select("pa", "pb")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
            "leftsemi",
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    roles = (
        tri.select(F.col("a").alias("part_key"))
        .unionAll(tri.select(F.col("b").alias("part_key")))
        .unionAll(tri.select(F.col("c").alias("part_key")))
    )
    return roles.groupBy("part_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


# ---------------------------------------------------------------------------
# Systematic weight-proportional document sample
# ---------------------------------------------------------------------------

_SAMPLE_K = 50


@register(
    "systematic_weighted_sample",
    f"""
    WITH cw AS (
        SELECT doc_id, source, n_chars,
               CAST(SUM(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum
        FROM documents
    ),
    tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS t FROM documents)
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, cum
    FROM cw, tot
    WHERE cum * {_SAMPLE_K} // t
        > (cum - n_chars) * {_SAMPLE_K} // t
    """,
)
def q_systematic_weighted_sample(spark, sf_dir):
    """Deterministic probability-proportional-to-size sample of ~{50}
    documents: lay every doc's char weight end to end on a line, cut the
    line into {50} equal strides, keep each doc that contains a stride
    boundary. Selection probability is proportional to n_chars (docs
    wider than one stride are always kept, once), the result is
    reproducible across runs/engines/partitionings — the seedless
    counterpart of ``stratified_sample``'s hash gate, and the weighted
    sampler a curation pipeline wants for "mostly long docs" eval slices.

    Exactness: the stride test is pure int64 — a doc is selected iff
    floor(cum·K/T) > floor((cum−w)·K/T) (its weight interval crosses a
    boundary). No float ratio exists on either side (DuckDB uses `//` —
    NOTES rule 12). The global cumulative sum is the two-phase
    range-partition prefix sum (operators/enumerate.global_prefix_sums):
    within-partition running sums plus partition-count-sized offsets —
    the naive SUM OVER (ORDER BY doc_id) the ORACLE uses would plan an
    Exchange SinglePartition in Spark (the oracle states the semantics;
    the engine proves the scalable plan matches it). The total is a
    1-row broadcast."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    cw = global_prefix_sums(docs, ["doc_id"], "n_chars", out_col="cum")
    tot = docs.agg(F.sum("n_chars").alias("t"))
    return (
        cw.crossJoin(F.broadcast(tot))
        .filter(
            F.expr(
                f"(cum * {_SAMPLE_K}) div t"
                f" > ((cum - n_chars) * {_SAMPLE_K}) div t"
            )
        )
        .select("doc_id", "source", "n_chars", "cum")
    )

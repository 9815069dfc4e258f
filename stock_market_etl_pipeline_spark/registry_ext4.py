"""Round-6 analytics extensions: basket-graph triangle counting,
weight-proportional systematic sampling, the language-by-source
chi-square independence audit, association rules, and the bootstrap CI.

The first two are LLM-curation / market-basket staples the registry lacked:
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

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.enumerate import global_prefix_sums
from .oracles import WITH_TICKS
from .registry import register
from .sources.ticks import ticks
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
        # the edge table is referenced THREE times below; without a
        # checkpoint each reference re-runs the distinct + self-join +
        # groupBy lineage (plan audit showed 18 scans / 37 shuffles).
        # Edges are support-filtered and tiny relative to the fact table
        # — materialize once (same trade as corpus_prep's shingles).
        .localCheckpoint()
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
        .localCheckpoint()  # consumed three times by the role union
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


# ---------------------------------------------------------------------------
# Language × source independence (chi-square contingency audit)
# ---------------------------------------------------------------------------


@register(
    "lang_source_chisq",
    """
    WITH cell AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY 1, 2
    ),
    margins AS (
        SELECT lang, source, o,
               CAST(SUM(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
               CAST(SUM(o) OVER (PARTITION BY source) AS BIGINT) AS c,
               CAST(SUM(o) OVER () AS BIGINT) AS n
        FROM cell
    ),
    terms AS (
        SELECT CAST(o * n - r * c AS DOUBLE)
             * CAST(o * n - r * c AS DOUBLE)
             / (CAST(r * c AS DOUBLE) * CAST(n AS DOUBLE)) AS t,
               lang, source, n
        FROM margins
    )
    SELECT ROUND(SUM(t), 6) AS chi2,
           CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1)
                AS BIGINT) AS dof,
           CAST(MAX(n) AS BIGINT) AS n_docs
    FROM terms
    """,
)
def q_lang_source_chisq(spark, sf_dir):
    """Pearson chi-square independence test of the language × source
    contingency table — the corpus-balance audit ("does source X
    over-represent language Y?") a curation pipeline runs before fixing
    mixture weights. Emits the statistic, degrees of freedom, and N;
    the analyst compares chi2 against the dof's critical value.

    Exactness: each cell's term is ((O·N − R·C)²)/(R·C·N) — O, R, C, N
    are exact int64 counts, so the numerator/denominator enter double
    through correctly-rounded casts and the term is mul/mul/div of
    identical doubles on both engines (no add — no FMA exposure, rule
    11). The SUM over cells is the one order-sensitive float reduction,
    rounded 6dp at the aggregate boundary per the oracles.py policy
    (≤ |langs|·|sources| cells, magnitudes O(N) — far inside 6dp
    headroom). dof counts distinct margins, not a hardcoded grid.

    Plan: one documents scan → cell aggregate (tiny); margin windows and
    the final reduction run over the CELL table (≤ hundreds of rows), so
    the unpartitioned windows are metadata-sized, never data-sized."""
    cell = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    m = cell.select(
        "lang", "source", "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("r"),
        F.sum("o").over(Window.partitionBy("source")).alias("c"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("n"),
    )
    num = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    den = (F.col("r") * F.col("c")).cast("double") * F.col("n").cast(
        "double"
    )
    terms = m.select(
        (num * num / den).alias("t"), "lang", "source", "n"
    )
    return terms.agg(
        F.round(F.sum("t"), 6).alias("chi2"),
        (
            (F.countDistinct("lang") - 1)
            * (F.countDistinct("source") - 1)
        ).cast("long").alias("dof"),
        F.max("n").cast("long").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Association rules over the co-purchase graph (support / confidence / lift)
# ---------------------------------------------------------------------------

_RULE_TOPK = 50


@register(
    "part_association_rules",
    f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
                 FROM lineitem),
    item AS (
        SELECT l_partkey AS p, CAST(COUNT(*) AS BIGINT) AS n_p
        FROM op GROUP BY 1
    ),
    pair AS (
        SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ),
    scored AS (
        SELECT antecedent, consequent, n_ab,
               ia.n_p AS n_a, ic.n_p AS n_c, n_orders.n AS n,
               n_ab * 1.0 / ia.n_p AS confidence,
               n_ab * n_orders.n * 1.0 / (ia.n_p * ic.n_p) AS lift
        FROM pair
        JOIN item ia ON antecedent = ia.p
        JOIN item ic ON consequent = ic.p
        CROSS JOIN n_orders
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY n_ab * n DESC, antecedent, consequent) AS rn
        FROM scored
    )
    SELECT antecedent, consequent, n_ab, n_a, n_c, confidence, lift
    FROM ranked WHERE rn <= {_RULE_TOPK}
    """,
)
def q_part_association_rules(spark, sf_dir):
    """Top-{50} association rules antecedent→consequent over co-purchase
    baskets — support, confidence = P(c|a), lift = P(ab)/(P(a)P(b)) —
    the market-basket report built on the same DISTINCT (order, part)
    table as ``part_cooccurrence``/``part_triangle_counts`` (directed
    this time: confidence is asymmetric).

    Exactness: counts are exact int64; confidence and lift are ONE
    double division each of exact integer products (n_ab·n clears int64
    at ~10¹⁸ basket-pairs — beyond any real corpus). The top-k ORDER BY
    ranks on the exact INTEGER product n_ab·n (support), with
    (antecedent, consequent) id tiebreaks — never on a float.

    Plan: one orderkey-partitioned self-join (pair fan-out bounded by
    basket size², same as part_cooccurrence), two broadcast item-count
    joins, a 1-row total broadcast, and TakeOrderedAndProject for the
    top-k — no global sort of the pair table."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = op.select(
        F.countDistinct("l_orderkey").alias("n")
    )
    item = op.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n_p")
    )
    a, b = op.alias("a"), op.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("antecedent"),
            F.col("b.l_partkey").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    ia = item.select(
        F.col("p").alias("antecedent"), F.col("n_p").alias("n_a")
    )
    ic = item.select(
        F.col("p").alias("consequent"), F.col("n_p").alias("n_c")
    )
    scored = (
        pair.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(n_orders))
    )
    top = scored.orderBy(
        (F.col("n_ab") * F.col("n")).desc(), "antecedent", "consequent"
    ).limit(_RULE_TOPK)
    return top.select(
        "antecedent", "consequent", "n_ab", "n_a", "n_c",
        (F.col("n_ab") * F.lit(1.0) / F.col("n_a")).alias("confidence"),
        (
            F.col("n_ab") * F.col("n") * F.lit(1.0)
            / (F.col("n_a") * F.col("n_c"))
        ).alias("lift"),
    )

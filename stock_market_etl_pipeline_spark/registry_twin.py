"""Driver-oracled EXACT TWINS for the rows-only registry entries
(VERDICT r10 #4).

Twelve registry queries are rows-only by design — sketches, ANN, approx
quantiles, PageRank, semantic dedup produce engine-specific estimates
that no DuckDB SQL can hash-match. Each has always had an exact anchor
that its pytest certificate compares against; this module registers the
two anchors that were NOT yet registry queries themselves, so every
rows-only entry now pairs with a hash-green driver-oracled twin (the
full pairing lives in registry.TWINS and is frozen by
tests/test_registry.py):

- ``priority_price_percentiles`` — exact per-priority p50/p95/p99 of
  order value, the twin `sketch_price_quantiles`' KLL rank-error bound
  is certified against.
- ``part_pagerank_int`` — PageRank itself, made hash-matchable: the
  float power iteration is QUANTIZED to exact integer arithmetic
  (NOTES rule 13 — every per-round operation is a truncating integer
  division or an int add/multiply, identical on Spark BIGINT `div` and
  DuckDB HUGEINT `//`), so ten unrolled rounds produce bit-identical
  scaled scores on both engines. The float `part_pagerank` remains the
  production entry (numpy power-iteration agreement + mass conservation
  in tests/test_graph_pagerank.py); this twin proves the iterative
  join+aggregate machinery end-to-end with a real oracle.

Reference lineage: the reference has no sketch/ANN/graph surface
(extension per SURVEY §2); twin discipline mirrors the repo's existing
exact/approx pairs (enrich quartiles, theta set algebra).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Exact per-priority order-value percentiles (twin of sketch_price_quantiles)
# ---------------------------------------------------------------------------


@register(
    "priority_price_percentiles",
    """
    WITH vt AS (
        SELECT o_orderpriority AS priority, o_totalprice AS v,
               CAST(COUNT(*) AS BIGINT) AS t
        FROM orders GROUP BY 1, 2
    ),
    cum AS (
        SELECT priority, v, t,
               SUM(t) OVER (PARTITION BY priority ORDER BY v) AS c,
               SUM(t) OVER (PARTITION BY priority)            AS n
        FROM vt
    )
    SELECT priority,
           CAST(MAX(n) AS BIGINT)                       AS n_orders,
           MIN(CASE WHEN 2 * c >= n THEN v END)         AS p50,
           MIN(CASE WHEN 20 * c >= 19 * n THEN v END)   AS p95,
           MIN(CASE WHEN 100 * c >= 99 * n THEN v END)  AS p99
    FROM cum GROUP BY 1
    """,
)
def q_priority_price_percentiles(spark, sf_dir):
    """EXACT per-priority p50/p95/p99 of o_totalprice — the hash-green
    twin of ``sketch_price_quantiles`` (same groups, same probe points;
    the KLL rank-error certificate in tests/test_sketches.py compares
    against exactly these percentiles). percentile_disc semantics: the
    smallest value whose cumulative count reaches ⌈p·n⌉, stated as the
    integer inequality k·c ≥ m·n (k/m = 2/1, 20/19, 100/99) — exact
    ints on both engines, and the emitted percentiles are pass-through
    data values (raw doubles, no arithmetic → no rounding policy
    needed).

    Plan: the rank machinery runs over the DISTINCT (priority, value)
    table — windows over the value domain, never over orders; one
    fact-wide exchange (the value-table groupBy). Same shape as
    interpurchase_gap_quartiles; at 100 TB the sketch twin replaces it
    wherever ±1.65% rank error is acceptable and a full value-domain
    sort per group is not."""
    o = load_table(spark, sf_dir, "orders")
    vt = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    wc = Window.partitionBy("priority").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vt.select(
        "priority", "v", "t",
        F.sum("t").over(wc).alias("c"),
        F.sum("t").over(Window.partitionBy("priority")).alias("n"),
    )
    c, n, v = F.col("c"), F.col("n"), F.col("v")
    return cum.groupBy("priority").agg(
        F.max(n).cast("bigint").alias("n_orders"),
        F.min(F.when(2 * c >= n, v)).alias("p50"),
        F.min(F.when(20 * c >= 19 * n, v)).alias("p95"),
        F.min(F.when(100 * c >= 99 * n, v)).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Integer-quantized PageRank (twin of part_pagerank)
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000_000  # 10^12: rank mass as scaled integers
_PR_ITERS = 10

# Edge construction = the oracled part_cooccurrence sliver, directed
# both ways (registry_ext3.py:126-137 states the same pairs in SQL).
_PR_BASE = """
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    co AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ),
    e AS (
        SELECT pa AS src, pb AS dst FROM co
        UNION ALL
        SELECT pb AS src, pa AS dst FROM co
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    s0 AS (
        SELECT src AS part,
               CAST({scale} // n AS BIGINT) AS s
        FROM deg, nn
    )
"""

_PR_STEP = """,
    s{i} AS (
        SELECT d0.src AS part,
               CAST((15 * {scale}) // (100 * (SELECT n FROM nn))
                    + (85 * COALESCE(inc.tot, 0)) // 100 AS BIGINT) AS s
        FROM deg d0 LEFT JOIN (
            SELECT e.dst AS part, SUM(p.s // pd.d) AS tot
            FROM s{prev} p
            JOIN deg pd ON pd.src = p.part
            JOIN e ON e.src = p.part
            GROUP BY 1
        ) inc ON inc.part = d0.src
    )
"""


def _pagerank_oracle() -> str:
    sql = _PR_BASE.format(scale=_PR_SCALE)
    for i in range(1, _PR_ITERS + 1):
        sql += _PR_STEP.format(i=i, prev=i - 1, scale=_PR_SCALE)
    sql += f"""
    SELECT part, s AS score_scaled
    FROM s{_PR_ITERS}
    ORDER BY s DESC, part
    LIMIT 50
    """
    return sql


@register("part_pagerank_int", _pagerank_oracle())
def q_part_pagerank_int(spark, sf_dir):
    """Top-50 parts by INTEGER-QUANTIZED PageRank over the co-purchase
    graph — the hash-green twin of the float ``part_pagerank`` (same
    edges, same damping 0.85, same 10 power rounds), with every
    per-round operation exact integer arithmetic so both engines hold
    bit-identical scaled scores (NOTES rule 13):

        s₀      = SCALE div N
        contrib = s div out_degree            (per node, truncating)
        s'      = (15·SCALE) div (100·N) + (85·Σ incoming) div 100

    Truncating division loses ≤1 unit per op (~1e-12 of the mass per
    node per round — far below the float twin's own partitioning noise
    of ~1e-12), and Spark `div` / DuckDB `//` both truncate toward
    zero on these positive operands. Overflow audit: total mass stays
    ≤ SCALE = 10¹² by induction (0.15·SCALE + 0.85·mass fixpoint), so
    85·Σ ≤ 8.5e13 ≪ 2⁶³ at ANY scale factor — the headroom is
    scale-independent because mass is normalized, not volume-coupled.

    Plan: the ten rounds are a driver loop of (join deg → div,
    join edges → sum-by-dst, left-join back) over the bounded
    co-purchase graph, with a LAZY localCheckpoint per round cutting
    lineage without running jobs at DataFrame-construction time (the
    registry_fin5 depth-probe lesson); the 1-row node count broadcasts.
    Top-50 cut is TakeOrderedAndProject on the total order
    (score DESC, part) — deterministic under ties."""
    from .registry_ext3 import q_part_cooccurrence

    co = q_part_cooccurrence(spark, sf_dir).select("part_a", "part_b")
    e = (
        co.select(F.col("part_a").alias("src"), F.col("part_b").alias("dst"))
        .unionAll(
            co.select(
                F.col("part_b").alias("src"), F.col("part_a").alias("dst")
            )
        )
        .localCheckpoint(eager=False)
    )
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = deg.crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("part"),
        F.expr(f"CAST({_PR_SCALE} div n AS BIGINT)").alias("s"),
    )
    for _ in range(_PR_ITERS):
        contrib = s.join(deg, s["part"] == deg["src"]).select(
            F.col("part"), F.expr("s div d").alias("w")
        )
        inc = (
            e.join(contrib, e["src"] == contrib["part"])
            .groupBy(F.col("dst").alias("part2"))
            .agg(F.sum("w").alias("tot"))
        )
        s = (
            deg.crossJoin(F.broadcast(nn))
            .join(inc, deg["src"] == inc["part2"], "left")
            .select(
                F.col("src").alias("part"),
                F.expr(
                    f"CAST((15 * {_PR_SCALE}) div (100 * n)"
                    " + (85 * coalesce(tot, 0)) div 100 AS BIGINT)"
                ).alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        s.orderBy(F.col("s").desc(), "part")
        .limit(50)
        .select("part", F.col("s").alias("score_scaled"))
    )

"""Statistics family, part 3: rank-based two-sample testing, digit-law
conformance, corpus novelty decay, and an event-sourced running balance.

- ``mann_whitney_length_by_source`` — Mann-Whitney U (Wilcoxon
  rank-sum) of each source's document-length distribution against the
  rest of the corpus: the nonparametric "is this source's length
  profile different" gate a curation pipeline runs before mixing.
- ``benford_first_digit`` — first-significant-digit distribution of
  order totals vs Benford's law with per-digit chi-square terms: the
  classic synthetic-data / fraud smoke test.
- ``ngram_novelty_by_decile`` — fraction of each ingestion decile's
  3-token shingles never seen in any earlier document: how fast the
  corpus stops contributing new content (the marginal-value curve
  behind dedup budgeting).
- ``open_orders_balance`` — monthly opened/closed order counts and the
  cumulative open-order balance: the event-sourced running-balance
  shape (+1 at open, −1 at last receipt) none of the other rollups
  cover.

Float policy (NOTES rules 9-15): every statistic is closed over exact
integer aggregates; tie-averaged ranks ride the spearman 2× trick
(doubled ranks are integers); the Mann-Whitney variance is quantized by
exact truncating integer division (rule 13) before its single sqrt; the
Benford expectation is the one log10 per digit with ROUND 6 at each
O(1)-noise boundary; novelty and balances are pure counts with at most
one exact division.

100 TB shape: Mann-Whitney ranks ride the DISTINCT-VALUE table (windows
over |value domain| rows, never over documents — the same trick as the
trigram-entropy window totals); novelty's two aggregations both shuffle
(doc, shingle) pairs once and the novel-per-doc table derives from the
shingle first-occurrence rollup, so no shingle-keyed join back to the
corpus; the balance cumulative window runs over a months-sized rollup
(the documented bounded empty-partitionBy case).

Reference lineage: extension scope per SURVEY §2.12 (the reference's
stats stop at describe()).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.text import ws_tokens
from .oracles import WITH_TICKS
from .registry import register
from .sources.tables import load_table
from .sources.ticks import ticks

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Mann-Whitney U: each source's doc-length distribution vs the rest
# ---------------------------------------------------------------------------


@register(
    "mann_whitney_length_by_source",
    """
    WITH vt AS (
        SELECT n_chars AS v, CAST(COUNT(*) AS HUGEINT) AS t
        FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    ),
    rk AS (
        SELECT v,
               2 * SUM(t) OVER (ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) - t + 1 AS r2
        FROM vt
    ),
    tot AS (
        SELECT CAST(SUM(t) AS HUGEINT) AS nn,
               CAST(SUM(t * t * t - t) AS HUGEINT) AS ties
        FROM vt
    ),
    sv AS (
        SELECT source, n_chars AS v, CAST(COUNT(*) AS HUGEINT) AS c
        FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
    ),
    per AS (
        SELECT s.source,
               CAST(SUM(s.c) AS HUGEINT) AS n1,
               CAST(SUM(s.c * r.r2) AS HUGEINT) AS r2sum
        FROM sv s JOIN rk r ON s.v = r.v
        GROUP BY 1
    ),
    z AS (
        SELECT source, n1, t.nn - n1 AS n2,
               r2sum - n1 * (n1 + 1) AS u2,
               r2sum - n1 * (n1 + 1) - n1 * (t.nn - n1) AS diff2,
               (n1 * (t.nn - n1)
                * ((t.nn + 1) * t.nn * (t.nn - 1) - t.ties))
               // (12 * t.nn * (t.nn - 1)) AS var_q
        FROM per, tot t
        WHERE t.nn > 1
    )
    SELECT source,
           CAST(n1 AS BIGINT)            AS n_docs,
           CAST(u2 AS DOUBLE) / 2        AS u_stat,
           ROUND(CAST(diff2 AS DOUBLE)
                 / (2.0 * sqrt(CAST(var_q AS DOUBLE))), 6) AS z_score
    FROM z
    WHERE n1 > 0 AND n2 > 0 AND var_q > 0
    """,
)
def q_mann_whitney_length_by_source(spark, sf_dir):
    """Mann-Whitney U / Wilcoxon rank-sum per source vs the REST of the
    corpus on document length (n_chars), tie-corrected normal
    approximation. |z| > 1.96 flags a source whose length distribution
    doesn't match the corpus it is being mixed into — the rank-based
    sibling of ``lang_source_chisq`` (categorical) and
    ``kl_source_divergence`` (token-distribution).

    Exactness: tie-averaged pooled ranks ride the spearman 2× trick —
    2·avg_rank of a tie group = 2·cum − t + 1, an exact integer off the
    DISTINCT-VALUE cumulative window. U, the deviation from its mean,
    and the tie-corrected variance stay exact DECIMAL(38)/HUGEINT; the
    variance is QUANTIZED by one truncating integer division
    (rule 13 — ``(n1·n2·((N+1)·N·(N−1) − Σ(t³−t))) // (12·N·(N−1))``,
    both engines truncate toward zero; the ≤1-unit truncation is
    ~1e-18 relative on a variance that large). The Spark side computes
    it as the sub-mod decimal floor division ``(num − num%den)/den``
    rather than `div`, because IntegralDivide binds a BIGINT result
    (2⁶³ ANSI-throw ceiling) even on DECIMAL(38,0) operands while
    DuckDB ``//`` stays HUGEINT (ADVICE r10). Closure: one sqrt, one
    multiply, one divide on identical operands, ROUND 6. u_stat is an
    exact half-integer (u2/2, binary-exact). Headroom audit: all
    DECIMAL(38) products ≤ N⁵ — safe to ~sf100 on both sides now that
    the quotient stays decimal; the HUGEINT→DOUBLE
    casts are < 2⁶⁴ through sf10 (rule-13 zero-divergence band).

    Plan: rank machinery runs over the distinct-length table (windows
    over |value domain| rows, never over documents); per-source sums
    broadcast-join that table; one fact-wide exchange (the groupBys)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    vt = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast(_DEC).alias("t")
    )
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = vt.select(
        "v",
        (F.lit(2).cast(_DEC) * F.sum("t").over(wv) - F.col("t")
         + F.lit(1).cast(_DEC)).alias("r2"),
    )
    tot = vt.agg(
        F.sum("t").alias("nn"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .alias("ties"),
    )
    sv = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast(_DEC).alias("c")
    )
    per = (
        sv.join(F.broadcast(rk), "v")
        .groupBy("source")
        .agg(
            F.sum("c").alias("n1"),
            F.sum(F.col("c") * F.col("r2")).alias("r2sum"),
        )
    )
    n1, nn = F.col("n1"), F.col("nn")
    n2 = nn - n1
    u2 = F.col("r2sum") - n1 * (n1 + F.lit(1).cast(_DEC))
    diff2 = u2 - n1 * n2
    # Truncating division kept in DECIMAL (ADVICE r10): Spark `div` is
    # IntegralDivide → BIGINT even on DECIMAL(38,0) operands, capping
    # the quotient at 2⁶³ (ANSI throw beyond) while DuckDB `//` stays
    # HUGEINT. (num − num % den)/den is exactly divisible, so the
    # decimal division is an exact integer (no 6dp rounding in play)
    # and the DECIMAL(38) headroom audit above holds as written. All
    # operands are positive, so truncate == floor on both engines.
    z = (
        per.join(F.broadcast(tot.filter(nn > 1)))
        .select(
            "source", n1.alias("n1"), n2.alias("n2"),
            u2.alias("u2"), diff2.alias("diff2"), "nn", "ties",
        )
        .withColumn(
            "vq_num",
            F.expr("n1 * (nn - n1) * ((nn + 1) * nn * (nn - 1) - ties)"),
        )
        .withColumn("vq_den", F.expr("12 * nn * (nn - 1)"))
        .withColumn(
            "var_q",
            F.expr(
                "CAST((vq_num - vq_num % vq_den) / vq_den"
                " AS DECIMAL(38,0))"
            ),
        )
    )
    return z.filter(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("var_q") > 0)
    ).select(
        "source",
        F.col("n1").cast("long").alias("n_docs"),
        (F.col("u2").cast("double") / F.lit(2)).alias("u_stat"),
        F.round(
            F.col("diff2").cast("double")
            / (F.lit(2.0) * F.sqrt(F.col("var_q").cast("double"))),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit conformance of order totals
# ---------------------------------------------------------------------------


@register(
    "benford_first_digit",
    """
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders
    ),
    g AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM g)
    SELECT digit,
           n                                   AS n_orders,
           n * 1.0 / t.nn                      AS observed_share,
           ROUND(log10(1.0 + 1.0 / digit), 6)  AS benford_share,
           ROUND((n - t.nn * log10(1.0 + 1.0 / digit))
                 * (n - t.nn * log10(1.0 + 1.0 / digit))
                 / (t.nn * log10(1.0 + 1.0 / digit)), 6) AS chi2_term
    FROM g, t
    """,
)
def q_benford_first_digit(spark, sf_dir):
    """First-significant-digit distribution of order totals against
    Benford's law, with the per-digit chi-square contribution — the
    standard "is this money synthetic/fabricated" smoke test (TPC-H
    totals are uniform-ish products, so they FAIL it loudly; real books
    conform — either way the query certifies the machinery).

    Exactness: the first digit comes from the DECIMAL STRING of exact
    integer cents (substr of a bigint's text — identical across
    engines; log10/floor-based digit extraction would be 1-ulp fragile
    at power-of-ten boundaries). observed_share is one exact division,
    emitted raw. The Benford expectation is the single non-correctly-
    rounded op (log10) per digit, so benford_share and the chi2 term
    close with ROUND 6; the chi2 chain's sensitivity to a 1-ulp log10
    flip is ≈ 2·N·ulp ≪ 5e-7 through sf10 (docstring audit).

    Plan: one scan, one 9-row groupBy, total broadcast back — nothing
    bigger than the digit rollup ever moves."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            .cast("string"),
            1, 1,
        ).cast("int").alias("digit")
    )
    g = c.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = g.agg(F.sum("n").cast("bigint").alias("nn"))
    e = F.col("nn") * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return g.join(F.broadcast(t)).select(
        "digit",
        F.col("n").alias("n_orders"),
        (F.col("n") * F.lit(1.0) / F.col("nn")).alias("observed_share"),
        F.round(
            F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6
        ).alias("benford_share"),
        F.round((F.col("n") - e) * (F.col("n") - e) / e, 6)
        .alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# Shingle novelty by ingestion decile
# ---------------------------------------------------------------------------


@register(
    "ngram_novelty_by_decile",
    r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, CAST(u.i AS INT),
                                          CAST(u.i AS INT) + 2), ' ') AS g
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
        WHERE len(t) >= 3
    ),
    per_doc_total AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1
    ),
    firsts AS (
        SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY 1
    ),
    per_doc_novel AS (
        SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
        FROM firsts GROUP BY 1
    ),
    ranked AS (
        SELECT d.doc_id,
               CAST((ROW_NUMBER() OVER (ORDER BY d.doc_id) - 1) * 10
                    // COUNT(*) OVER () AS INTEGER) AS decile
        FROM documents d
    )
    SELECT r.decile,
           CAST(COUNT(*) AS BIGINT)                    AS n_docs,
           CAST(SUM(COALESCE(t.n_sh, 0)) AS BIGINT)    AS n_shingles,
           CAST(SUM(COALESCE(v.n_novel, 0)) AS BIGINT) AS n_novel,
           CASE WHEN SUM(COALESCE(t.n_sh, 0)) > 0
                THEN SUM(COALESCE(v.n_novel, 0)) * 1.0
                     / SUM(COALESCE(t.n_sh, 0))
           END AS novelty_rate
    FROM ranked r
    LEFT JOIN per_doc_total t ON r.doc_id = t.doc_id
    LEFT JOIN per_doc_novel v ON r.doc_id = v.doc_id
    GROUP BY 1
    """,
)
def q_ngram_novelty_by_decile(spark, sf_dir):
    """Novelty decay curve: for each ingestion decile (docs ordered by
    doc_id, cut into 10 integer-arithmetic buckets), the fraction of
    its distinct 3-token shingles that no EARLIER document contains —
    the marginal-content curve that tells a curation pipeline when
    additional crawl stops adding new text (companion to the dedup
    family: dedup asks "is this doc a copy", this asks "how much of
    this SLICE is copies").

    Implementation trick: novelty needs no shingle-keyed join back to
    the corpus — a shingle is novel exactly for its MIN doc_id, so the
    per-doc novel count is ``GROUP BY first_doc`` over the
    first-occurrence rollup, and the per-doc total is a second rollup
    of the same exploded distinct (doc, shingle) stream. Deciles use
    INTEGER arithmetic ((rn−1)·10 div N) so boundary docs can't flip
    across engines. Counts and the one division per decile are exact.

    Plan: the (doc, shingle) distinct groupBy is the one fact-sized
    exchange; both per-doc tables derive from it; the doc ranking uses
    the two-level bucketed row number (the
    operators/skewsafe.with_global_row_numbers pattern): per-bucket
    counts → prefix offsets over the TINY bucket table → local
    row_number within each doc_id bucket — no task ever sorts or holds
    the whole corpus, and the only empty-partitionBy window runs over
    the bounded bucket rollup."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", ws_tokens(F.lower(F.trim(F.col("text")))).alias("t")
    )
    sh = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2),"
                    " i -> concat_ws(' ', slice(t, i, 3)))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    per_doc_total = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sh")
    )
    firsts = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc_novel = firsts.groupBy(
        F.col("first_doc").alias("doc_id")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    # two-level bucketed global rank: per-bucket counts, prefix offsets
    # over the tiny bucket table, local row_number within each bucket —
    # the empty-partitionBy window touches only the bucket rollup
    ids = docs.select(
        "doc_id", F.floor(F.col("doc_id") / F.lit(8192)).alias("__bk")
    )
    bc = ids.groupBy("__bk").agg(F.count(F.lit(1)).alias("__c"))
    wbk = Window.orderBy("__bk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    off = bc.select(
        "__bk",
        (F.sum("__c").over(wbk) - F.col("__c")).alias("__off"),
        F.sum("__c").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__nd"),
    )
    wloc = Window.partitionBy("__bk").orderBy("doc_id")
    ranked = (
        ids.join(F.broadcast(off), "__bk")
        .select(
            "doc_id",
            (
                (F.col("__off") + F.row_number().over(wloc) - 1) * 10
            ).alias("__rn10"),
            "__nd",
        )
        .select(
            "doc_id",
            F.expr("CAST(__rn10 div __nd AS INT)").alias("decile"),
        )
    )
    joined = (
        ranked.join(per_doc_total, "doc_id", "left")
        .join(per_doc_novel, "doc_id", "left")
    )
    s_sh = F.sum(F.coalesce(F.col("n_sh"), F.lit(0)))
    s_nv = F.sum(F.coalesce(F.col("n_novel"), F.lit(0)))
    return joined.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        s_sh.cast("bigint").alias("n_shingles"),
        s_nv.cast("bigint").alias("n_novel"),
        F.when(s_sh > 0, s_nv * F.lit(1.0) / s_sh).alias("novelty_rate"),
    )


# ---------------------------------------------------------------------------
# Open-orders running balance by month
# ---------------------------------------------------------------------------


@register(
    "open_orders_balance",
    """
    WITH closes AS (
        SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS closed
        FROM lineitem GROUP BY 1
    ),
    op AS (
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_opened
        FROM orders GROUP BY 1
    ),
    cl AS (
        SELECT date_trunc('month', closed) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_closed
        FROM closes GROUP BY 1
    ),
    mm AS (
        SELECT COALESCE(op.m, cl.m) AS month_start,
               COALESCE(n_opened, 0) AS n_opened,
               COALESCE(n_closed, 0) AS n_closed
        FROM op FULL OUTER JOIN cl ON op.m = cl.m
    )
    SELECT CAST(month_start AS DATE) AS month_start, n_opened, n_closed,
           CAST(SUM(n_opened - n_closed)
                OVER (ORDER BY month_start
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_balance
    FROM mm
    """,
)
def q_open_orders_balance(spark, sf_dir):
    """Monthly opened / closed order counts and the cumulative
    open-order balance — the event-sourced running-balance shape: an
    order opens at o_orderdate and closes when its LAST lineitem
    ships (max l_shipdate — the driver testdata carries no receiptdate). The inventory/backlog panel every
    operations dashboard carries, none of the other rollups cover.

    Exactness: pure integer counts; the balance is a cumulative sum of
    exact ints, order-independent.

    Plan: the per-order close date is a combinable groupBy on the
    lineitem exchange; both month rollups are tiny; the cumulative
    window runs over the ~80-row month table (the documented bounded
    empty-partitionBy case, like the event-type rollup)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("r")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("o")
    )
    closes = li.groupBy("l_orderkey").agg(F.max("r").alias("closed"))
    op = orders.groupBy(F.trunc("o", "month").alias("m")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_opened")
    )
    cl = closes.groupBy(F.trunc("closed", "month").alias("m")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_closed")
    )
    mm = (
        op.join(cl, "m", "full_outer")
        .select(
            F.col("m").alias("month_start"),
            F.coalesce("n_opened", F.lit(0)).alias("n_opened"),
            F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
        )
    )
    wb = Window.orderBy("month_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return mm.select(
        "month_start", "n_opened", "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed")).over(wb)
        .cast("bigint").alias("open_balance"),
    )


# ---------------------------------------------------------------------------
# Round-number clustering of close prices
# ---------------------------------------------------------------------------


@register(
    "round_number_bias",
    WITH_TICKS
    + """,
    c AS (
        SELECT symbol,
               CAST(round(close * 100) AS BIGINT) % 100 AS c00,
               CAST(round(close * 100) AS BIGINT) % 50  AS c50
        FROM ticks
    ),
    g AS (
        SELECT symbol,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN c00 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_round00,
               CAST(SUM(CASE WHEN c50 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_round50
        FROM c GROUP BY 1
    )
    SELECT symbol, n_days, n_round00, n_round50,
           n_round00 * 1.0 / n_days AS share00,
           ROUND((n_round00 - n_days * 0.01)
                 / sqrt(n_days * 0.01 * 0.99), 6) AS z00
    FROM g WHERE n_days > 0
    """,
)
def q_round_number_bias(spark, sf_dir):
    """Round-number clustering per symbol: how often the close lands on
    whole dollars (cents % 100 == 0) or half-dollars, with a binomial
    z-score against the uniform-cents null (p = 1/100) — the classic
    market-microstructure "price clustering" diagnostic, and on
    synthetic data a generator-uniformity check (Benford's grid-level
    sibling: benford_first_digit tests the leading digit, this tests
    the trailing cents).

    Exactness: cents are exact int64, the modulo tests and counts are
    exact; share00 is one exact division (raw); the z closes with
    single ops on exact ints and the two double constants
    (n·0.01 — one multiply; variance chain multiply/sqrt/divide, each
    correctly rounded on identical inputs), ROUND 6.

    Plan: pure map + the one ticks exchange for the symbol groupBy."""
    t = ticks(spark, sf_dir)
    cents = F.round(F.col("close") * 100, 0).cast("bigint")
    c = t.select(
        "symbol",
        (cents % 100).alias("c00"),
        (cents % 50).alias("c50"),
    )
    g = c.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.when(F.col("c00") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_round00"),
        F.sum(F.when(F.col("c50") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_round50"),
    )
    n, r0 = F.col("n_days"), F.col("n_round00")
    return g.filter(n > 0).select(
        "symbol", "n_days", "n_round00", "n_round50",
        (r0 * F.lit(1.0) / n).alias("share00"),
        F.round(
            (r0 - n * F.lit(0.01))
            / F.sqrt(n * F.lit(0.01) * F.lit(0.99)),
            6,
        ).alias("z00"),
    )


# ---------------------------------------------------------------------------
# Inter-purchase gap quartiles per market segment
# ---------------------------------------------------------------------------


@register(
    "interpurchase_gap_quartiles",
    """
    WITH co AS (
        SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
               o_orderkey AS okey
        FROM orders
    ),
    gaps AS (
        SELECT c.c_mktsegment AS segment,
               datediff('day',
                        LAG(co.d) OVER (PARTITION BY co.ck
                                        ORDER BY co.d, co.okey),
                        co.d) AS gap
        FROM co JOIN customer c ON co.ck = c.c_custkey
    ),
    vt AS (
        SELECT segment, gap, CAST(COUNT(*) AS BIGINT) AS t
        FROM gaps WHERE gap IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
        SELECT segment, gap, t,
               SUM(t) OVER (PARTITION BY segment ORDER BY gap
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS c,
               SUM(t) OVER (PARTITION BY segment) AS n
        FROM vt
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT)                              AS n_gaps,
           CAST(MIN(CASE WHEN 4 * c >= n     THEN gap END) AS BIGINT)
               AS q1_days,
           CAST(MIN(CASE WHEN 4 * c >= 2 * n THEN gap END) AS BIGINT)
               AS median_days,
           CAST(MIN(CASE WHEN 4 * c >= 3 * n THEN gap END) AS BIGINT)
               AS q3_days
    FROM cum GROUP BY 1
    """,
)
def q_interpurchase_gap_quartiles(spark, sf_dir):
    """Days between a customer's consecutive orders, summarized as
    exact quartiles per market segment — the repeat-purchase cadence
    panel behind churn models (rfm_segments scores recency ONCE; this
    measures the full inter-arrival distribution).

    Exactness: gaps are exact day counts off a per-customer lag with a
    TOTAL order ((date, orderkey) — same-day orders can't flip the lag
    across engines); quartile_k is defined inversely on the exact
    cumulative counts (smallest gap with 4·cum ≥ k·n — integer
    arithmetic, no engine quantile function, no interpolation), so the
    selected values are integers, deterministic on both sides.

    Plan: the per-customer lag runs on the orders exchange (millions of
    shallow keys — no depth skew); quartile machinery runs entirely on
    the (segment, gap) DISTINCT-VALUE table (gap domain ≈ a few
    thousand days), the mann-whitney value-table trick applied per
    segment."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("okey"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    wl = Window.partitionBy("ck").orderBy("d", "okey")
    gaps = (
        orders.join(cust, orders.ck == cust.c_custkey)
        .select(
            "segment",
            F.datediff(F.col("d"), F.lag("d").over(wl)).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    vt = gaps.groupBy("segment", "gap").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    ws = Window.partitionBy("segment").orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vt.select(
        "segment", "gap", "t",
        F.sum("t").over(ws).alias("c"),
        F.sum("t").over(Window.partitionBy("segment")).alias("n"),
    )
    c, n, gap = F.col("c"), F.col("n"), F.col("gap")
    return cum.groupBy("segment").agg(
        F.max(n).cast("bigint").alias("n_gaps"),
        F.min(F.when(4 * c >= n, gap)).cast("bigint").alias("q1_days"),
        F.min(F.when(4 * c >= 2 * n, gap)).cast("bigint")
        .alias("median_days"),
        F.min(F.when(4 * c >= 3 * n, gap)).cast("bigint")
        .alias("q3_days"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b: volume vs absolute daily move, per symbol
# ---------------------------------------------------------------------------


def _kendall_numpy(d):
    """Per-symbol Kendall tau-b via the vectorized numpy kernel — the
    SAME documented Python slot (and the same size trigger) as
    registry_fin5._theil_sen_numpy: the per-key work is a bounded
    quadratic (all O(n²) sign comparisons of one symbol's day pairs),
    which JVM row machinery prices at ~300k pair-rows/s/core however it
    is expressed, and numpy broadcasting at ~100M/s/core. All counts
    are exact ints; the closure (one int→double conversion each side,
    one sqrt, one divide) matches the SQL oracle's ops bit-for-bit
    ((n0−n1)·(n0−n2) stays far below 2⁵³ at any realistic day count —
    2.4e10 at the 3000-day trigger bound)."""
    import pandas as pd

    def kern(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        empty = pd.DataFrame(
            {
                "symbol": pd.Series([], dtype="int64"),
                "n_days": pd.Series([], dtype="int64"),
                "n_concordant": pd.Series([], dtype="int64"),
                "n_discordant": pd.Series([], dtype="int64"),
                "tau_b": pd.Series([], dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        v = pdf["volume"].to_numpy(dtype=np.int64)
        m = pdf["mv"].to_numpy(dtype=np.int64)
        # Row-anchored pair scan (ADVICE r10, same fix as
        # registry_fin5._theil_sen_numpy): triu_indices materialized two
        # m-length int64 index arrays plus four gather temporaries;
        # accumulating concordant/discordant counts per anchor row keeps
        # peak memory at O(n) per task instead of O(n²). Identical
        # integer sign comparisons → identical counts.
        c = 0
        dd = 0
        for a in range(n - 1):
            s = np.sign(v[a] - v[a + 1:]) * np.sign(m[a] - m[a + 1:])
            c += int((s > 0).sum())
            dd += int((s < 0).sum())
        n0 = n * (n - 1) // 2
        _, tv = np.unique(v, return_counts=True)
        _, tm = np.unique(m, return_counts=True)
        n1 = int((tv * (tv - 1) // 2).sum())
        n2 = int((tm * (tm - 1) // 2).sum())
        if n0 == n1 or n0 == n2:
            return empty  # a constant side: tau undefined
        import math

        tau = (c - dd) / math.sqrt(float((n0 - n1) * (n0 - n2)))
        return pd.DataFrame(
            {
                "symbol": [int(pdf["symbol"].iloc[0])],
                "n_days": [int(n)],
                "n_concordant": [c],
                "n_discordant": [dd],
                "tau_b": [tau],
            }
        )

    return d.groupBy("symbol").applyInPandas(
        kern,
        "symbol long, n_days bigint, n_concordant bigint,"
        " n_discordant bigint, tau_b double",
    )


@register(
    "kendall_tau_volume_move",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol, date, volume,
               abs(CAST(round(close * 100) AS BIGINT)
                   - LAG(CAST(round(close * 100) AS BIGINT))
                         OVER (PARTITION BY symbol ORDER BY date)) AS mv
        FROM ticks
    ),
    f AS (SELECT symbol, date, volume, mv FROM d WHERE mv IS NOT NULL),
    cd AS (
        SELECT a.symbol,
               CAST(SUM(CASE WHEN (a.volume - b.volume)
                                * (a.mv - b.mv) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN (a.volume - b.volume)
                                * (a.mv - b.mv) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS dis
        FROM f a JOIN f b ON a.symbol = b.symbol AND a.date < b.date
        GROUP BY 1
    ),
    nn AS (
        SELECT symbol, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) * (CAST(COUNT(*) AS BIGINT) - 1)
                   // 2 AS n0
        FROM f GROUP BY 1
    ),
    tv AS (
        SELECT symbol,
               CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n1
        FROM (SELECT symbol, CAST(COUNT(*) AS BIGINT) AS t
              FROM f GROUP BY symbol, volume)
        GROUP BY 1
    ),
    tm AS (
        SELECT symbol,
               CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n2
        FROM (SELECT symbol, CAST(COUNT(*) AS BIGINT) AS t
              FROM f GROUP BY symbol, mv)
        GROUP BY 1
    )
    SELECT cd.symbol,
           nn.n                         AS n_days,
           cd.c                         AS n_concordant,
           cd.dis                       AS n_discordant,
           (cd.c - cd.dis)
           / sqrt(CAST((nn.n0 - tv.n1) * (nn.n0 - tm.n2) AS DOUBLE))
                                        AS tau_b
    FROM cd
    JOIN nn ON cd.symbol = nn.symbol
    JOIN tv ON cd.symbol = tv.symbol
    JOIN tm ON cd.symbol = tm.symbol
    WHERE nn.n0 > tv.n1 AND nn.n0 > tm.n2
    """,
)
def q_kendall_tau_volume_move(spark, sf_dir):
    """Kendall tau-b between volume and the absolute daily move, per
    symbol — completing the correlation family (Pearson =
    volume_move_correlation, Spearman = spearman_volume_move): tau is
    the pair-concordance probability, the most outlier-robust and the
    one with a direct betting interpretation ("pick two days at random;
    how often is the higher-volume day also the bigger-move day").

    Exactness: concordant/discordant counts, the pair total n0 and the
    tie corrections n1/n2 are exact ints; tau closes with one
    int→double conversion per operand (both < 2⁵³ at any realistic
    depth), one sqrt and one divide — identical single IEEE ops on both
    engines, emitted raw. Constant-side symbols (n0 == n1 or n0 == n2)
    drop on both sides.

    Plan: shallow histories (≤ registry_fin5._TS_ARRAY_MAX_DAYS days)
    use the vectorized numpy kernel (the documented Python slot — see
    _kendall_numpy and SCALING.md's r10 ladder); deeper ones fall back
    to the streaming symbol-keyed pair join that the oracle states
    directly. The tie/total terms always come from combinable groupBys,
    never pair enumeration."""
    from .registry_fin5 import _TS_ARRAY_MAX_DAYS, _max_symbol_depth

    t = ticks(spark, sf_dir)
    cexp = F.round(F.col("close") * 100, 0).cast("bigint")
    d = t.select(
        "symbol", "date", "volume",
        F.abs(
            cexp - F.lag(cexp).over(
                Window.partitionBy("symbol").orderBy("date")
            )
        ).alias("mv"),
    ).filter(F.col("mv").isNotNull())

    # depth trigger: the shared memoized ticks-depth probe (ADVICE r10
    # — no action per DataFrame construction). It counts raw days per
    # symbol, one more than this query's lag-filtered rows per symbol;
    # the off-by-one is immaterial against a 3000-day trigger.
    if _max_symbol_depth(spark, sf_dir) <= _TS_ARRAY_MAX_DAYS:
        return _kendall_numpy(d)

    # deep fallback: streaming pair join for C/D; ties and totals from
    # combinable groupBys (never the pair stream)
    a = d.select(
        F.col("symbol").alias("sym"), F.col("date").alias("da"),
        F.col("volume").alias("va"), F.col("mv").alias("ma"),
    )
    b = d.select(
        F.col("symbol").alias("symb"), F.col("date").alias("db"),
        F.col("volume").alias("vb"), F.col("mv").alias("mb"),
    )
    prod = (F.col("va") - F.col("vb")) * (F.col("ma") - F.col("mb"))
    cd = (
        a.join(b, (F.col("sym") == F.col("symb")) & (F.col("da") < F.col("db")))
        .groupBy(F.col("sym").alias("symbol"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).cast("bigint").alias("c"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).cast("bigint")
            .alias("dis"),
        )
    )
    nn = d.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).select(
        "symbol", "n", F.expr("n * (n - 1) div 2").alias("n0")
    )
    tv = (
        d.groupBy("symbol", "volume")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("symbol")
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("bigint").alias("n1"))
    )
    tm = (
        d.groupBy("symbol", "mv")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("symbol")
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("bigint").alias("n2"))
    )
    j = cd.join(nn, "symbol").join(tv, "symbol").join(tm, "symbol")
    return j.filter(
        (F.col("n0") > F.col("n1")) & (F.col("n0") > F.col("n2"))
    ).select(
        "symbol",
        F.col("n").alias("n_days"),
        F.col("c").alias("n_concordant"),
        F.col("dis").alias("n_discordant"),
        (
            (F.col("c") - F.col("dis"))
            / F.sqrt(
                ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n2")))
                .cast("double")
            )
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# PMI of top-vocabulary token pairs (document co-occurrence)
# ---------------------------------------------------------------------------

_PMI_TOP = 100     # head vocabulary size (pairs bounded at top²/2)
_PMI_MIN_DOCS = 5  # support floor: pairs below this are noise


@register(
    "token_pmi_pairs",
    rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ),
    dt AS (
        SELECT DISTINCT doc_id, u.tok FROM toks, UNNEST(t) AS u(tok)
    ),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM dt GROUP BY 1),
    top AS (SELECT tok, c FROM df ORDER BY c DESC, tok LIMIT {_PMI_TOP}),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    ft AS (
        SELECT d.doc_id, d.tok, t.c FROM dt d JOIN top t ON d.tok = t.tok
    ),
    pairs AS (
        SELECT a.tok AS token_a, b.tok AS token_b,
               MAX(a.c) AS ca, MAX(b.c) AS cb,
               CAST(COUNT(*) AS BIGINT) AS cab
        FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2
    )
    SELECT token_a, token_b, cab AS n_docs_both,
           ROUND(ln(CAST(nd.n * cab AS DOUBLE) / (ca * cb)), 6) AS pmi
    FROM pairs, nd
    WHERE cab >= {_PMI_MIN_DOCS}
    """,
)
def q_token_pmi_pairs(spark, sf_dir):
    """Pointwise mutual information of head-vocabulary token pairs at
    the DOCUMENT level: PMI = ln(N·c_ab / (c_a·c_b)) over document
    frequencies — positive for collocations ("new york"-style pairs
    that travel together), ~0 for independent topics, negative for
    complementary-distribution pairs. The corpus-structure diagnostic
    behind topic leakage and template detection, restricted to the
    top-{_PMI_TOP} tokens so the pair space is BOUNDED (≤ top²/2
    candidates, ≤ top²/2 · N doc-pair rows) instead of vocab-quadratic.

    Exactness: document frequencies and co-occurrence counts are exact
    ints off distinct (doc, token) pairs; the head vocabulary is a
    deterministic top-k (df DESC, token ASC — total order); PMI's
    operands N·c_ab and c_a·c_b stay far below 2⁵³ (≤ N² = 6.25e12 at
    sf10), so the one division is on exactly-converted ints and the
    one ln closes with ROUND 6.

    Plan: distinct (doc, token) is the fact-sized exchange; the head
    vocabulary is a TakeOrderedAndProject broadcast back; the pair
    self-join is bounded per doc by the head size (same
    cap-the-candidates discipline as the LSH bucket caps)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", ws_tokens(F.lower(F.trim(F.col("text")))).alias("t")
    )
    dt = toks.select(
        "doc_id", F.explode("t").alias("tok")
    ).distinct()
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top = df.orderBy(F.col("c").desc(), "tok").limit(_PMI_TOP)
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ft = dt.join(F.broadcast(top), "tok").select("doc_id", "tok", "c")
    fa = ft.select(
        F.col("doc_id").alias("da"), F.col("tok").alias("token_a"),
        F.col("c").alias("ca"),
    )
    fb = ft.select(
        F.col("doc_id").alias("db"), F.col("tok").alias("token_b"),
        F.col("c").alias("cb"),
    )
    pairs = (
        fa.join(
            fb,
            (F.col("da") == F.col("db"))
            & (F.col("token_a") < F.col("token_b")),
        )
        .groupBy("token_a", "token_b")
        .agg(
            F.max("ca").alias("ca"), F.max("cb").alias("cb"),
            F.count(F.lit(1)).cast("bigint").alias("cab"),
        )
    )
    return (
        pairs.filter(F.col("cab") >= _PMI_MIN_DOCS)
        .join(F.broadcast(nd))
        .select(
            "token_a", "token_b",
            F.col("cab").alias("n_docs_both"),
            F.round(
                F.log(
                    (F.col("n") * F.col("cab")).cast("double")
                    / (F.col("ca") * F.col("cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# Year-over-year revenue growth per nation
# ---------------------------------------------------------------------------


@register(
    "yoy_revenue_growth",
    """
    WITH rev AS (
        SELECT n.n_name AS nation,
               CAST(year(CAST(o.o_orderdate AS DATE)) AS INTEGER) AS yr,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS rev_c4
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT nation, yr,
           rev_c4 / 10000.0 AS revenue,
           CASE WHEN LAG(yr)     OVER w = yr - 1
                 AND LAG(rev_c4) OVER w > 0
                THEN (rev_c4 - LAG(rev_c4) OVER w) * 100.0
                     / LAG(rev_c4) OVER w
           END AS yoy_growth_pct
    FROM rev
    WINDOW w AS (PARTITION BY nation ORDER BY yr)
    """,
)
def q_yoy_revenue_growth(spark, sf_dir):
    """Year-over-year discounted-revenue growth per supplier nation —
    the growth-rate shape (LAG over a yearly rollup) that
    market_share_by_year (levels) and customer_segment_migration
    (rank movements) don't cover. NULL growth for a nation's first
    year and across gap years (the lag must be exactly yr − 1).

    Exactness: revenue accumulates as exact scaled-integer cents×100
    (the registry.revenue_sum_dec rule — no float sum at volume); the
    level closes with one exact division, and the growth is
    (delta · 100.0) / prev — a subtract on exact ints, one multiply,
    one divide, all single correctly-rounded IEEE ops on identical
    operands: emitted raw. int64 headroom to ~sf10 on the yearly
    grain (≈5e17 < 2⁶³ — tighter than the all-time sums because the
    year split divides the mass by ~7).

    Plan: orders joins on the lineitem exchange (shuffle join — both
    fact-sized), dims broadcast; the YoY lag runs over the tiny
    (nation, year) rollup."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            * (
                F.lit(100)
                - F.round(F.col("l_discount") * 100, 0).cast("bigint")
            )
        ).alias("rc4"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(F.to_date("o_orderdate")).alias("yr")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("nation", "yr")
        .agg(F.sum("rc4").cast("bigint").alias("rev_c4"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    prev_yr, prev_rev = F.lag("yr").over(w), F.lag("rev_c4").over(w)
    return rev.select(
        "nation", "yr",
        (F.col("rev_c4") / F.lit(10000.0)).alias("revenue"),
        F.when(
            (prev_yr == F.col("yr") - 1) & (prev_rev > 0),
            (F.col("rev_c4") - prev_rev) * F.lit(100.0) / prev_rev,
        ).alias("yoy_growth_pct"),
    )


# ---------------------------------------------------------------------------
# Vocabulary overlap (Jaccard) between source pairs
# ---------------------------------------------------------------------------


@register(
    "source_vocab_jaccard",
    r"""
    WITH toks AS (
        SELECT source, u.tok
        FROM (SELECT source,
                     string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents), UNNEST(t) AS u(tok)
    ),
    sv AS (SELECT DISTINCT source, tok FROM toks),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM sv GROUP BY 1),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM sv a JOIN sv b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_shared,
           sa.v AS vocab_a, sb.v AS vocab_b,
           i.n_shared * 1.0 / (sa.v + sb.v - i.n_shared) AS jaccard
    FROM inter i
    JOIN sz sa ON i.source_a = sa.source
    JOIN sz sb ON i.source_b = sb.source
    """,
)
def q_source_vocab_jaccard(spark, sf_dir):
    """Jaccard overlap of the token VOCABULARIES of every source pair —
    the set-similarity view of source relatedness (kl_source_divergence
    compares frequency SHAPES over a shared head; this asks how much of
    the vocabularies exist in both at all — near-duplicate feeds score
    high here even when their frequency profiles diverge).

    Exactness: vocabulary sizes and intersections are exact ints off
    distinct (source, token) pairs; Jaccard is one division via
    inclusion-exclusion, emitted raw.

    Plan: the distinct (source, token) groupBy is the fact-sized
    exchange; the pair join runs token-keyed over the DISTINCT table
    (each token contributes |sources-containing-it|² pair rows, bounded
    by the source count — a dozen, not a corpus axis), then a 2-dim
    rollup. Per-source sizes broadcast back onto the pair rows."""
    docs = load_table(spark, sf_dir, "documents")
    sv = (
        docs.select(
            "source",
            F.explode(
                ws_tokens(F.lower(F.trim(F.col("text"))))
            ).alias("tok"),
        )
        .distinct()
    )
    sz = sv.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    a = sv.select(F.col("source").alias("source_a"), "tok")
    b = sv.select(F.col("source").alias("source_b"), F.col("tok").alias("tok_b"))
    inter = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("v").alias("vocab_a"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("v").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b", "n_shared", "vocab_a", "vocab_b",
            (
                F.col("n_shared") * F.lit(1.0)
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )

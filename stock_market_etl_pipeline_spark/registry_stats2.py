"""Statistics family, part 2: weighted median selection and the
Wald-Wolfowitz runs test.

- ``weighted_median_price_by_nation`` — the quantity-weighted median
  lineitem price per supplier nation: the weighted-quantile SELECTION
  shape (cumulative weight crossing half the total) that none of the
  exact-quantile queries cover (they all weight rows equally).
- ``runs_test_updown`` — the Wald-Wolfowitz runs test on each symbol's
  up/down day sequence: "are the signs of daily moves random?" — the
  nonparametric companion of ``variance_ratio`` (which tests the
  MAGNITUDE structure; this tests the SIGN structure).

Float policy (NOTES rules 9-15):

- weighted median: weights and cumulative weights are exact int64; the
  crossing test 2*cum >= total compares exact ints, so the SELECTED row
  is deterministic in both engines and its price is a pass-through
  double — everything emitted RAW.
- runs test: R, n1, n2, n are exact ints; mu = 1 + 2*n1*n2/n is a
  single division; the variance is evaluated in DOUBLES as
  (2.0*n1*n2) * (2.0*n1*n2 - n) / (n*n*(n - 1.0)) — each operand chain
  is single IEEE ops on identical inputs (NOT a wide-int->double cast:
  2*n1*n2*(2*n1*n2 - n) as an INTEGER can pass 2^53 at n ~ 2e4 days
  and would hit the rule-13 cast divergence; as float arithmetic it is
  deterministic) — and the final z-score is ROUND(...,6).

100 TB shape: weighted median joins the fact table against a
25-row broadcast dim and runs ONE cumulative window per nation (the
same per-key window class as every symbol window here; skew-safe
chunked spine is the widen path); runs test is a lag window + groupBy
on the ticks exchange. Output: one row per nation / per symbol.

Reference lineage: extension scope per SURVEY §2.12 (the reference's
stats stop at describe()).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import register
from .sources.tables import load_table
from .sources.ticks import ticks

# ---------------------------------------------------------------------------
# Quantity-weighted median price per supplier nation
# ---------------------------------------------------------------------------


@register(
    "weighted_median_price_by_nation",
    """
    WITH li AS (
        SELECT n.n_name AS nation, l.l_extendedprice AS price,
               CAST(l.l_quantity AS BIGINT) AS w
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
    ),
    c AS (
        SELECT nation, price, w,
               SUM(w) OVER (PARTITION BY nation
                            ORDER BY price, w
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum,
               SUM(w) OVER (PARTITION BY nation) AS tot
        FROM li
    ),
    sel AS (
        SELECT nation, price, cum, tot,
               ROW_NUMBER() OVER (PARTITION BY nation
                                  ORDER BY price, w) AS rn
        FROM c WHERE 2 * cum >= tot
    )
    SELECT nation,
           price                     AS weighted_median_price,
           CAST(tot AS BIGINT)       AS total_quantity
    FROM sel WHERE rn = 1
    """,
)
def q_weighted_median_price_by_nation(spark, sf_dir):
    """Quantity-weighted median unit price per supplier nation: the
    price at which half the shipped QUANTITY (not half the rows) is
    cheaper — the robust price level a procurement dashboard quotes.

    Selection semantics: sort each nation's rows by (price, w), take
    the first row whose cumulative weight reaches half the total
    (2*cum >= tot — integers, no division). Weights are exact int64
    quantities; the comparison and the row choice are therefore
    deterministic across engines, and the emitted price is a
    pass-through parquet double: everything RAW, nothing rounded.

    Plan (r10 rewrite, VERDICT r9 #4): the old plan ran ONE cumulative
    window per nation partition — 25 tasks each sorting its nation's
    FULL lineitem slice, the per-key sort depth that probed ×10.8 for
    10× rows at the sf1→sf10 decade. The selection is not a sliding
    frame, so it decomposes as bucket-then-probe instead of chunking:

    1. bucket = floor(price / 100) — ~1050 buckets over the TPC-H
       price domain, so the per-(nation, bucket) groupBy is genuinely
       COMBINABLE (~26k groups; floor(price) at width 1 left ~1 row
       per group and the partial agg reduced nothing — measured 3×
       slower at sf0.1). Monotone under IEEE division, so bucket
       order == price order regardless of representation; the only
       fact-wide exchange carries bucket rows, not raw rows.
    2. cumulative weights over the TINY (nation, bucket) table find
       the target bucket b* whose cumulative crosses half the total
       (2*bcum >= tot on exact ints), plus cum_before = bcum - sw.
    3. a second scan keeps ONLY b*'s rows (broadcast of the 25-row
       target table), sorts those few rows per nation, and selects the
       first row where 2*(cum_before + local_cum) >= tot — identical
       ints to the old single-window crossing test, so the SELECTED
       row (and the oracle hash) is unchanged.

    Largest sort anywhere: one 100-unit price bucket of one nation
    (degenerate all-one-price nations fall back to the old task shape,
    no worse). Both dims stay broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice",
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    j = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            "nation", F.col("l_extendedprice").alias("price"), "w",
            F.floor(F.col("l_extendedprice") / F.lit(100.0)).alias("__b"),
        )
    )
    # phase 1: per-(nation, bucket) weight sums — combinable, so the
    # fact-wide exchange carries bucket rows, not raw rows
    bs = j.groupBy("nation", "__b").agg(F.sum("w").alias("sw"))
    wb = Window.partitionBy("nation").orderBy("__b")
    cum = bs.select(
        "nation", "__b", "sw",
        F.sum("sw").over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("bcum"),
        F.sum("sw").over(Window.partitionBy("nation")).alias("tot"),
    )
    # target bucket: smallest bucket whose cumulative crosses half the
    # total; the global crossing ROW provably lives inside it
    tgt = (
        cum.filter(2 * F.col("bcum") >= F.col("tot"))
        .groupBy("nation", "tot")
        .agg(
            F.min("__b").alias("tb"),
            (
                F.min_by(F.col("bcum"), F.col("__b"))
                - F.min_by(F.col("sw"), F.col("__b"))
            ).alias("cum_before"),
        )
        # renamed keys: tgt derives from j, so joining on the original
        # attributes would be an ambiguous self-join
        .select(
            F.col("nation").alias("t_nation"), "tb", "tot", "cum_before"
        )
    )
    # phase 2: sort ONLY the target bucket's rows per nation
    cand = j.join(
        F.broadcast(tgt),
        (F.col("nation") == F.col("t_nation")) & (F.col("__b") == F.col("tb")),
    ).select("nation", "price", "w", "tot", "cum_before")
    wo = Window.partitionBy("nation").orderBy("price", "w")
    sel = (
        cand.withColumn(
            "cum",
            F.col("cum_before")
            + F.sum("w").over(
                wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(2 * F.col("cum") >= F.col("tot"))
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") == 1)
    )
    return sel.select(
        "nation",
        F.col("price").alias("weighted_median_price"),
        F.col("tot").cast("bigint").alias("total_quantity"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on up/down days per symbol
# ---------------------------------------------------------------------------


@register(
    "runs_test_updown",
    WITH_TICKS
    + """,
    s0 AS (
        SELECT symbol, date,
               CASE WHEN close > LAG(close) OVER w THEN 1
                    WHEN close < LAG(close) OVER w THEN -1 END AS sgn
        FROM ticks
        WINDOW w AS (PARTITION BY symbol ORDER BY date)
    ),
    s AS (
        -- flat days (sgn NULL) are EXCLUDED before the boundary lag,
        -- so a run continues across a flat day instead of splitting
        SELECT symbol, sgn,
               CASE WHEN sgn IS DISTINCT FROM
                         LAG(sgn) OVER (PARTITION BY symbol ORDER BY date)
                    THEN 1 ELSE 0 END AS brk
        FROM s0 WHERE sgn IS NOT NULL
    ),
    g AS (
        SELECT symbol,
               CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_up,
               CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down,
               CAST(SUM(brk) AS BIGINT) AS n_runs
        FROM s GROUP BY 1
    )
    SELECT symbol, n_up, n_down, n_runs,
           ROUND((n_runs - (1.0 + 2.0 * n_up * n_down / (n_up + n_down)))
                 / sqrt((2.0 * n_up * n_down)
                        * (2.0 * n_up * n_down - (n_up + n_down))
                        / ((n_up + n_down) * (n_up + n_down)
                           * (n_up + n_down - 1.0))), 6) AS z_score
    FROM g
    WHERE n_up > 0 AND n_down > 0 AND n_up + n_down > 1
      AND (2.0 * n_up * n_down) * (2.0 * n_up * n_down - (n_up + n_down)) > 0
    """,
)
def q_runs_test_updown(spark, sf_dir):
    """Wald-Wolfowitz runs test per symbol: z-score of the observed
    number of up/down runs against the randomness null. |z| > 1.96
    flags non-random sign structure — too FEW runs = trending, too
    MANY = mean-reverting — the sign-domain counterpart of
    ``variance_ratio``.

    Runs are counted without any second shuffle: flat days (close ==
    prev close, NULL sign) are filtered out FIRST so a run continues
    across them; a boundary is then sgn IS DISTINCT FROM lag(sgn) over
    the filtered stream, which also counts each symbol's first signed
    row as a run start — SUM(brk) IS the run count exactly.

    Exactness: R/n1/n2 are exact ints; mu and sigma evaluate in
    DOUBLES (2*n1*n2*(2*n1*n2 - n) as an integer can pass 2^53 at
    calendar scale — float evaluation is single-op deterministic,
    rule 13's cast hazard never fires because no wide INT crosses to
    double); z is ROUND(...,6). Degenerate guards (all-up, all-down,
    zero variance) drop the symbol on both sides.

    Plan (r10 rewrite, VERDICT r9 #4): the old plan ran every window
    over partitionBy(symbol) — the window buffers one symbol's FULL
    history per group, the per-key depth that probed ×13.9 for 10×
    rows at the sf1→sf10 decade. Run counting is a SEGMENT MONOID
    (concatenating two sign streams merges their run counts minus one
    when the border signs agree), so the series chunks by calendar
    month — ONE scan, and the same single ticks exchange as before:

    1. in-month signs from lag WITHIN (symbol, month); the previous
       SIGNED row's sign (for run breaks across in-month flat days)
       via last(ignorenulls) over the preceding in-month frame. No
       window ever buffers more than one month of one symbol.
    2. one groupBy(symbol, month) collects per-month up/down counts,
       the internal run count (the month's first signed row counts as
       a run start), first/last in-month sign, AND first/last CLOSE —
       the closes carry the month-border information.
    3. on the months-sized table: the border observation between
       month m-1 and m is sign(first_close(m) - last_close(m-1)) —
       exactly the sign the old plan computed for m's first row, since
       its predecessor row IS m-1's last row (flat-month chains keep
       this true: every row's predecessor relation is preserved).
       Fold the border into the month's segment descriptor (first
       sign, last sign, run count), drop empty segments, and subtract
       one run per border where the previous non-empty segment's last
       sign equals this segment's first sign.

    All counts stay exact ints, so n_up/n_down/n_runs — and the oracle
    hash — are unchanged from the single-window plan."""
    t = ticks(spark, sf_dir)
    tm = t.select(
        "symbol", "date", "close", F.trunc("date", "month").alias("__m")
    )
    wcm = Window.partitionBy("symbol", "__m").orderBy("date")
    sgn = (
        F.when(F.col("close") > F.lag("close").over(wcm), F.lit(1))
        .when(F.col("close") < F.lag("close").over(wcm), F.lit(-1))
    )
    s = tm.withColumn("sgn", sgn)
    # previous SIGNED row's sign within the month (skips flat days)
    prev_sgn = F.last("sgn", ignorenulls=True).over(
        wcm.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        F.col("sgn").isNotNull() & ~F.col("sgn").eqNullSafe(prev_sgn),
        F.lit(1),
    ).otherwise(F.lit(0))
    # signed-rows-only min_by/max_by keys: NULL keys are skipped by the
    # aggregate, so first_sgn/last_sgn see only signed rows
    sgn_key = F.when(F.col("sgn").isNotNull(), F.col("date"))
    per_m = s.withColumn("brk", brk).groupBy("symbol", "__m").agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).alias("n_up_m"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).alias("n_down_m"),
        F.sum("brk").alias("runs_m"),
        F.min_by("sgn", sgn_key).alias("first_sgn"),
        F.max_by("sgn", sgn_key).alias("last_sgn"),
        F.min_by("close", "date").alias("first_close"),
        F.max_by("close", "date").alias("last_close"),
    )
    wmm = Window.partitionBy("symbol").orderBy("__m")
    # border observation: this month's first row vs previous month's
    # last row (NULL for the first month or a flat border)
    b_m = (
        F.when(F.col("first_close") > F.lag("last_close").over(wmm), F.lit(1))
        .when(F.col("first_close") < F.lag("last_close").over(wmm), F.lit(-1))
    )
    seg = per_m.select(
        "symbol", "__m", "n_up_m", "n_down_m", "runs_m",
        "first_sgn", "last_sgn", b_m.alias("b_m"),
    ).select(
        "symbol", "__m",
        (F.col("n_up_m")
         + F.when(F.col("b_m") == 1, 1).otherwise(0)).alias("seg_up"),
        (F.col("n_down_m")
         + F.when(F.col("b_m") == -1, 1).otherwise(0)).alias("seg_down"),
        F.coalesce("b_m", "first_sgn").alias("seg_first"),
        F.coalesce("last_sgn", "b_m").alias("seg_last"),
        F.when(F.col("b_m").isNull(), F.col("runs_m"))
        .when(F.col("first_sgn").isNull(), F.lit(1))
        .otherwise(
            F.lit(1) + F.col("runs_m")
            - F.when(F.col("b_m") == F.col("first_sgn"), 1).otherwise(0)
        ).alias("seg_runs"),
    ).filter(F.col("seg_first").isNotNull())
    # border merge across non-empty segments: == (not eqNullSafe) so
    # the first segment's NULL lag contributes 0, never a subtraction
    merged = seg.select(
        "symbol", "seg_up", "seg_down", "seg_runs",
        F.when(
            F.col("seg_first") == F.lag("seg_last").over(wmm), F.lit(1)
        ).otherwise(F.lit(0)).alias("same"),
    )
    g = merged.groupBy("symbol").agg(
        F.sum("seg_up").cast("bigint").alias("n_up"),
        F.sum("seg_down").cast("bigint").alias("n_down"),
        (F.sum("seg_runs") - F.sum("same")).cast("bigint").alias("n_runs"),
    )
    n1, n2, r = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    n = n1 + n2
    two_n1n2 = F.lit(2.0) * n1 * n2
    mu = F.lit(1.0) + two_n1n2 / n
    var = (
        two_n1n2 * (two_n1n2 - n)
        / (n.cast("double") * n.cast("double") * (n - F.lit(1.0)))
    )
    return g.filter(
        (n1 > 0) & (n2 > 0) & (n > 1)
        & (two_n1n2 * (two_n1n2 - n.cast("double")) > 0)
    ).select(
        "symbol", "n_up", "n_down", "n_runs",
        F.round((r - mu) / F.sqrt(var), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Customer spend-quartile migration year over year
# ---------------------------------------------------------------------------


@register(
    "customer_segment_migration",
    """
    WITH cy AS (
        SELECT o_custkey AS custkey,
               CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS yr,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS spend_c
        FROM orders GROUP BY 1, 2
    ),
    seg AS (
        SELECT custkey, yr,
               CAST(4 * (ROW_NUMBER() OVER (PARTITION BY yr
                         ORDER BY spend_c DESC, custkey) - 1)
                    // (COUNT(*) OVER (PARTITION BY yr)) + 1
                    AS INTEGER) AS seg
        FROM cy
    ),
    mig AS (
        SELECT a.yr AS year_from, a.seg AS seg_from, b.seg AS seg_to,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM seg a JOIN seg b ON a.custkey = b.custkey
                             AND b.yr = a.yr + 1
        GROUP BY 1, 2, 3
    )
    SELECT year_from, seg_from, seg_to, n_customers,
           n_customers * 1.0 / CAST(SUM(n_customers) OVER (
               PARTITION BY year_from, seg_from) AS BIGINT)
               AS migration_prob
    FROM mig
    """,
)
def q_customer_segment_migration(spark, sf_dir):
    """Year-over-year spend-quartile migration matrix: each customer's
    annual spend ranks them into an integer quartile segment (1 = top
    spenders), and consecutive-year pairs count who moved where —
    the churn/upsell panel behind ``rfm_segments`` (static snapshot)
    and ``new_vs_returning_revenue`` (binary version of the same
    question).

    Segments are INTEGER ntile: seg = 4*(rank-1) div n + 1 over the
    (spend desc, custkey) total order — pure int arithmetic, no
    interpolated thresholds, so a boundary customer's segment cannot
    flip across engines. Migration probabilities are exact int
    divisions (RAW).

    Plan: orders collapse to one row per (custkey, year); the rank
    window runs per YEAR over that collapsed table (customers/year
    rows — fine at verify scales; at 10^9 customers/year the window
    partition needs the two-phase global-rank spine,
    operators/enumerate.global_sequence_ids, the documented widen
    path); the consecutive-year self-join shuffles on custkey."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.year(F.col("o_orderdate").cast("date")).cast("int").alias("yr"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    cy = o.groupBy("custkey", "yr").agg(
        F.sum("c").cast("bigint").alias("spend_c")
    )
    wr = Window.partitionBy("yr").orderBy(
        F.col("spend_c").desc(), F.col("custkey")
    )
    wn = Window.partitionBy("yr")
    # materialize the segment table once: it appears on BOTH sides of
    # the consecutive-year self-join (the checkpointed-matrix-power
    # rule — without this the orders subtree re-plans twice)
    seg = cy.select(
        "custkey", "yr",
        (F.row_number().over(wr) - 1).alias("__r"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    ).select(
        "custkey", "yr",
        (F.expr("(4 * __r) div __n") + 1).cast("int").alias("seg"),
    ).localCheckpoint(eager=True)
    a, b = seg.alias("a"), seg.alias("b")
    mig = (
        a.join(
            b,
            (F.col("a.custkey") == F.col("b.custkey"))
            & (F.col("b.yr") == F.col("a.yr") + 1),
        )
        .groupBy(
            F.col("a.yr").alias("year_from"),
            F.col("a.seg").alias("seg_from"),
            F.col("b.seg").alias("seg_to"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )
    wrow = Window.partitionBy("year_from", "seg_from")
    return mig.select(
        "year_from", "seg_from", "seg_to", "n_customers",
        (F.col("n_customers")
         / F.sum("n_customers").over(wrow).cast("bigint"))
        .alias("migration_prob"),
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator on order values
# ---------------------------------------------------------------------------

_HILL_K = 500


@register(
    "hill_tail_index",
    f"""
    WITH ranked AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
               ROW_NUMBER() OVER (
                   ORDER BY round(o_totalprice * 100) DESC, o_orderkey
               ) AS rn
        FROM orders
        ORDER BY rn LIMIT {_HILL_K + 1}
    ),
    xmin AS (SELECT c AS cmin FROM ranked WHERE rn = {_HILL_K + 1})
    SELECT CAST({_HILL_K} AS BIGINT)           AS k_order_stats,
           cmin / 100.0                        AS x_min,
           ROUND(AVG(ln(c * 1.0 / cmin)), 6)   AS hill_estimate,
           ROUND(1.0 / AVG(ln(c * 1.0 / cmin)), 6) AS pareto_alpha
    FROM ranked, xmin WHERE rn <= {_HILL_K}
    GROUP BY cmin
    """,
)
def q_hill_tail_index(spark, sf_dir):
    """Hill estimator of the order-value tail index over the top
    {_HILL_K} order statistics: hill = mean(ln(x_i / x_(k+1))),
    alpha = 1/hill. Alpha ~ 1-2 reads a genuinely heavy (Pareto-like)
    revenue tail — whether the whale orders dominate — the parametric
    tail companion of ``lorenz_revenue_deciles`` / ``abc_revenue_classes``
    (which describe the WHOLE distribution).

    Exactness: values are exact int64 cents and the top-(k+1) SET plus
    its internal ranks are fixed by the (cents desc, orderkey) total
    order; each ratio is one exact division, ln is 1-ulp-exposed and
    the mean order-sensitive -> hill and alpha ROUND(...,6) (alpha
    from the UNROUNDED mean); x_min is one exact division (RAW).

    Plan: TakeOrderedAndProject(k+1) — per-partition top-k then a tiny
    merge; the estimator itself runs on {_HILL_K + 1} rows. No window
    over the full orders table, no second scan."""
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
        "o_orderkey",
    )
    top = o.orderBy(F.col("c").desc(), "o_orderkey").limit(_HILL_K + 1)
    packed = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct((-F.col("c")).alias("__neg"),
                         F.col("o_orderkey"), F.col("c"))
            )
        ).alias("__ts")
    )
    # k+1 rows, referenced twice (estimator + x_min): materialize so
    # the TakeOrderedAndProject corpus pass runs once
    ranked = packed.select(
        F.posexplode("__ts").alias("__pos", "__s")
    ).select(
        (F.col("__pos") + 1).alias("rn"), F.col("__s.c").alias("c")
    ).localCheckpoint(eager=True)
    xmin = ranked.filter(F.col("rn") == _HILL_K + 1).select(
        F.col("c").alias("cmin")
    )
    hill = F.avg(F.log(F.col("c") * F.lit(1.0) / F.col("cmin")))
    return (
        ranked.filter(F.col("rn") <= _HILL_K)
        .crossJoin(F.broadcast(xmin))
        .groupBy("cmin")
        .agg(
            F.round(hill, 6).alias("hill_estimate"),
            F.round(F.lit(1.0) / hill, 6).alias("pareto_alpha"),
        )
        .select(
            F.lit(_HILL_K).cast("bigint").alias("k_order_stats"),
            (F.col("cmin") / F.lit(100.0)).alias("x_min"),
            "hill_estimate", "pareto_alpha",
        )
    )

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

    Plan: lineitem joins two BROADCAST dims (supplier, nation), then
    one cumulative window + filter per nation partition. The window's
    (price, w) tie order makes the cumulative sum path-deterministic
    even among equal prices (rule: any window consumed by a selection
    must have a total order)."""
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
        .select("nation", F.col("l_extendedprice").alias("price"), "w")
    )
    wo = Window.partitionBy("nation").orderBy("price", "w")
    c = j.select(
        "nation", "price", "w",
        F.sum("w").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("w").over(Window.partitionBy("nation")).alias("tot"),
    )
    sel = (
        c.filter(2 * F.col("cum") >= F.col("tot"))
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

    Plan: the sign lag, the boundary lag, and the groupBy share the
    ONE HashPartitioning(symbol) exchange from ticks()."""
    t = ticks(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("date")
    sgn = (
        F.when(F.col("close") > F.lag("close").over(w), F.lit(1))
        .when(F.col("close") < F.lag("close").over(w), F.lit(-1))
    )
    s = t.select("symbol", "date", sgn.alias("sgn")).filter(
        F.col("sgn").isNotNull()
    )
    brk = F.when(
        ~F.col("sgn").eqNullSafe(F.lag("sgn").over(w)), F.lit(1)
    ).otherwise(F.lit(0))
    s2 = s.select("symbol", "sgn", brk.alias("brk"))
    g = s2.groupBy("symbol").agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint").alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint").alias("n_down"),
        F.sum("brk").cast("bigint").alias("n_runs"),
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

"""Extended coverage, part 8: randomness testing, top-k stability,
Markov steady state, and lead-lag correlation.

- ``turning_points_test`` — per-symbol turning-points test of
  randomness: count strict local extrema of the close series and close
  the classic z statistic against E[T] = 2(n−2)/3, Var = (16n−29)/90 —
  the third member of the randomness family beside
  ``runs_test_updown`` (sign runs) and ``variance_ratio``.
- ``topk_turnover_monthly`` — month-over-month Jaccard stability of the
  top-10 symbols by traded volume: how much of the leaderboard churns
  each month (the set-valued complement of ``market_share_by_year``).
- ``markov_stationary_int`` — the event-type Markov chain's
  distribution after 10 integer-quantized power-iteration steps from
  uniform: the steady-state companion of ``event_transition_matrix``
  (one-step) and ``markov_3step_distribution`` (three-step paths),
  hash-matchable by the same scaled-integer discipline as
  ``part_pagerank_int``.
- ``volume_lead_move_correlation`` — Pearson correlation between
  YESTERDAY's volume and TODAY's |close move|: does volume PREDICT
  motion (the lead-lag variant of the contemporaneous
  ``volume_move_correlation``, same exact-moment machinery).

Float policy (NOTES rules 11-13): every statistic closes over exact
integer sums; z and correlations are chains of SINGLE correctly-rounded
ops (cast / divide / sqrt / multiply) on identical operand trees, with
ROUND 6 at the boundary; the Markov iteration is pure truncating
integer arithmetic end to end (Spark ``div`` = DuckDB ``//`` toward
zero), so the scaled masses are bit-identical.

100 TB shape: turning points and the lead correlation ride the ONE
symbol exchange every ticks window shares; the monthly top-10 table is
months×10 rows (broadcast self-join); the Markov chain state is
|event-type|²-bounded — counts collapse map-side before ten joins over
a ~10-row table.

Reference lineage: extension scope per SURVEY §2.12.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import cents, register
from .sources.events import load_events
from .sources.ticks import ticks

_DEC = "decimal(38,0)"


def _dec(c):
    return c.cast(_DEC)


# ---------------------------------------------------------------------------
# Turning-points test of randomness, per symbol
# ---------------------------------------------------------------------------


@register(
    "turning_points_test",
    WITH_TICKS
    + """,
    c AS (
        SELECT symbol, date,
               CAST(round(close * 100) AS BIGINT) AS cc
        FROM ticks
    ),
    tp AS (
        SELECT symbol,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN (cc > pc AND cc > nc)
                               OR (cc < pc AND cc < nc)
                             THEN 1 ELSE 0 END) AS BIGINT) AS t
        FROM (
            SELECT symbol, cc,
                   LAG(cc)  OVER (PARTITION BY symbol ORDER BY date) AS pc,
                   LEAD(cc) OVER (PARTITION BY symbol ORDER BY date) AS nc
            FROM c
        )
        GROUP BY 1
    )
    SELECT symbol,
           n                                   AS n_obs,
           t                                   AS n_turning,
           ROUND(CAST(3 * t - 2 * n + 4 AS DOUBLE)
                 / (3.0 * sqrt(CAST(16 * n - 29 AS DOUBLE) / 90.0)),
                 6)                            AS z_score
    FROM tp
    WHERE n >= 3
    """,
)
def q_turning_points_test(spark, sf_dir):
    """Turning-points test per symbol: T = #strict local extrema of the
    close series (cents — ties are NOT extrema, deterministically on
    both engines); under i.i.d. randomness E[T] = 2(n−2)/3 and
    Var[T] = (16n−29)/90, so z = (T − E)/σ flags serial dependence
    (trending: too few turns; mean-reverting/choppy: too many).

    Exactness: T and n are exact ints off one lag+lead window;
    z = (3T − 2n + 4) / (3·√((16n−29)/90)) is evaluated as the SAME
    chain of single correctly-rounded ops on both engines (int casts
    exact below 2⁵³, one divide, one sqrt, one multiply, one divide),
    ROUND 6 at the boundary — rule 11's single-op exemption, no
    multiply-add anywhere for FMA to contract.

    Plan: the lag/lead window and the per-symbol aggregate share the
    one symbol exchange; |symbols| rows out."""
    t = ticks(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("date")
    cc = cents("close")
    d = t.select(
        "symbol",
        cc.alias("cc"),
        F.lag(cc).over(w).alias("pc"),
        F.lead(cc).over(w).alias("nc"),
    )
    is_turn = (
        ((F.col("cc") > F.col("pc")) & (F.col("cc") > F.col("nc")))
        | ((F.col("cc") < F.col("pc")) & (F.col("cc") < F.col("nc")))
    )
    agg = d.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(is_turn, 1).otherwise(0)).cast("bigint").alias("t"),
    )
    n, tt = F.col("n"), F.col("t")
    return agg.filter(n >= 3).select(
        "symbol",
        n.alias("n_obs"),
        tt.alias("n_turning"),
        F.round(
            (3 * tt - 2 * n + 4).cast("double")
            / (
                F.lit(3.0)
                * F.sqrt((16 * n - 29).cast("double") / F.lit(90.0))
            ),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Month-over-month top-10 turnover (leaderboard stability)
# ---------------------------------------------------------------------------


@register(
    "topk_turnover_monthly",
    WITH_TICKS
    + """,
    mv AS (
        SELECT symbol, date_trunc('month', date) AS month,
               CAST(SUM(volume) AS BIGINT) AS vol
        FROM ticks GROUP BY 1, 2
    ),
    rk AS (
        SELECT month, symbol,
               ROW_NUMBER() OVER (PARTITION BY month
                                  ORDER BY vol DESC, symbol) AS rn
        FROM mv
    ),
    top AS (SELECT month, symbol FROM rk WHERE rn <= 10),
    sz AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS k FROM top GROUP BY 1),
    pairs AS (
        SELECT b.month AS month,
               CAST(COUNT(a.symbol) AS BIGINT) AS n_common
        FROM sz b0
        JOIN top b ON b.month = b0.month
        LEFT JOIN top a
          ON a.symbol = b.symbol
         AND b.month = a.month + INTERVAL 1 MONTH
        GROUP BY 1
    )
    SELECT CAST(p.month AS DATE)                    AS month,
           p.n_common                               AS n_common,
           ROUND(CAST(p.n_common AS DOUBLE)
                 / CAST(prev.k + cur.k - p.n_common AS DOUBLE),
                 6)                                 AS jaccard
    FROM pairs p
    JOIN sz cur  ON cur.month = p.month
    JOIN sz prev ON p.month = prev.month + INTERVAL 1 MONTH
    """,
)
def q_topk_turnover_monthly(spark, sf_dir):
    """Leaderboard stability: for each month with a predecessor in the
    data, the Jaccard overlap between this month's and last month's
    top-10 symbols by total traded volume (rank ties broken by symbol
    — a total order, so the sets are deterministic). A low Jaccard
    month is a regime change in where the volume lives.

    Exactness: monthly volume sums are exact int64; set sizes and the
    intersection are exact counts; Jaccard is ONE division of small
    ints, ROUND 6.

    Plan: the (symbol, month) rollup is one exchange with map-side
    combine; everything after runs on a months×10-row table
    (broadcast joins). Months missing a predecessor month in the data
    drop out via the inner join on month arithmetic — same rule both
    engines."""
    t = ticks(spark, sf_dir)
    mv = t.groupBy(
        "symbol", F.trunc("date", "month").alias("month")
    ).agg(F.sum("volume").cast("bigint").alias("vol"))
    rk = mv.select(
        "month", "symbol",
        F.row_number()
        .over(
            Window.partitionBy("month").orderBy(
                F.col("vol").desc(), "symbol"
            )
        )
        .alias("rn"),
    )
    top = rk.filter(F.col("rn") <= 10).select("month", "symbol")
    top = top.localCheckpoint(eager=False)  # 4 consumers below
    sz = top.groupBy("month").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    prev = top.select(
        F.add_months(F.col("month"), 1).alias("month"),
        F.col("symbol").alias("psym"),
    )
    common = (
        top.join(
            F.broadcast(prev),
            (top.month == prev.month) & (top.symbol == prev.psym),
            "left",
        )
        .groupBy(top.month.alias("month"))
        .agg(F.count("psym").cast("bigint").alias("n_common"))
    )
    szp = sz.select(
        F.add_months(F.col("month"), 1).alias("month"),
        F.col("k").alias("k_prev"),
    )
    return (
        common.join(F.broadcast(sz), "month")
        .join(F.broadcast(szp), "month")
        .select(
            "month",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (
                    F.col("k_prev") + F.col("k") - F.col("n_common")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Integer-quantized Markov steady state of the event-type chain
# ---------------------------------------------------------------------------

_MK_SCALE = 1_000_000_000_000  # 10^12, the part_pagerank_int convention
_MK_ITERS = 10

_MK_BASE = """
    WITH seq AS (
        SELECT event_type AS cur,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prv
        FROM events
    ),
    c AS (
        SELECT prv AS f, cur AS t, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE prv IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT f, CAST(SUM(c) AS BIGINT) AS r FROM c GROUP BY 1),
    st AS (SELECT DISTINCT event_type AS s FROM events),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM st),
    v0 AS (
        SELECT s, CAST({scale} // n AS BIGINT) AS v FROM st, nn
    )
"""

_MK_STEP = """,
    v{i} AS (
        SELECT st.s AS s, CAST(COALESCE(inc.tot, 0) AS BIGINT) AS v
        FROM st LEFT JOIN (
            SELECT c.t AS s, SUM((p.v // r.r) * c.c) AS tot
            FROM v{prev} p
            JOIN r ON r.f = p.s
            JOIN c ON c.f = p.s
            GROUP BY 1
        ) inc ON inc.s = st.s
    )
"""


def _markov_oracle() -> str:
    sql = _MK_BASE.format(scale=_MK_SCALE)
    for i in range(1, _MK_ITERS + 1):
        sql += _MK_STEP.format(i=i, prev=i - 1)
    sql += f"""
    SELECT s AS event_type, v AS mass_scaled
    FROM v{_MK_ITERS}
    """
    return sql


@register("markov_stationary_int", _markov_oracle())
def q_markov_stationary_int(spark, sf_dir):
    """Event-type distribution after 10 power-iteration steps of the
    per-user transition chain, starting uniform — the steady-state
    companion of ``event_transition_matrix``: where does a user's
    attention settle if the observed dynamics keep running.

    Hash-matchable by the ``part_pagerank_int`` discipline (NOTES rule
    13): mass is carried as integers scaled to 10¹²; each step is
    w(i) = v(i) div rowtotal(i) (truncating, identical both engines)
    then v'(j) = Σᵢ w(i)·count(i→j). Overflow audit: w(i)·c(i,j) ≤
    v(i) ≤ SCALE and the sum spans |event types| terms, so every
    operand stays ≤ ~10¹³ ≪ 2⁶³ at ANY scale factor — mass is
    normalized, not volume-coupled. States with no outgoing edges shed
    their mass (substochastic truncation), identically on both sides.

    Plan: ONE user_id exchange builds the transition counts (map-side
    combined to the |types|² table); the ten rounds are joins over
    that ~|types|²-row broadcastable table with a lazy localCheckpoint
    per round to cut lineage — no driver-side collect anywhere."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prv"),
    ).filter(F.col("prv").isNotNull())
    # distinct column names per table (cf/ct/cn, rf/rn) so the r-from-c
    # lineage never trips the ambiguous-self-join analyzer in the
    # ten-round join chain
    c = (
        seq.groupBy(F.col("prv").alias("cf"), F.col("cur").alias("ct"))
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
        .localCheckpoint(eager=False)
    )
    r = c.groupBy(F.col("cf").alias("rf")).agg(
        F.sum("cn").cast("long").alias("rn")
    )
    r = r.localCheckpoint(eager=False)
    st = ev.select(F.col("event_type").alias("s")).distinct()
    st = st.localCheckpoint(eager=False)
    nn = st.agg(F.count(F.lit(1)).cast("long").alias("n"))
    v = st.crossJoin(F.broadcast(nn)).select(
        "s", F.expr(f"CAST({_MK_SCALE} div n AS BIGINT)").alias("v")
    )
    for _ in range(_MK_ITERS):
        inc = (
            v.join(F.broadcast(r), F.col("s") == F.col("rf"))
            .select(F.col("s").alias("ps"), F.expr("v div rn").alias("w"))
            .join(F.broadcast(c), F.col("ps") == F.col("cf"))
            .groupBy(F.col("ct").alias("s2"))
            .agg(F.sum(F.col("w") * F.col("cn")).alias("tot"))
        )
        v = (
            st.join(inc, st["s"] == inc["s2"], "left")
            .select(
                "s",
                F.coalesce(F.col("tot"), F.lit(0)).cast("long").alias("v"),
            )
            .localCheckpoint(eager=False)
        )
    return v.select(F.col("s").alias("event_type"), F.col("v").alias("mass_scaled"))


# ---------------------------------------------------------------------------
# Does volume predict motion? Lead-lag Pearson per symbol
# ---------------------------------------------------------------------------


@register(
    "volume_lead_move_correlation",
    WITH_TICKS
    + """,
    d AS (
        SELECT symbol,
               LAG(volume) OVER (PARTITION BY symbol ORDER BY date) AS xv,
               abs(CAST(ROUND(close * 100, 0) AS BIGINT)
                   - LAG(CAST(ROUND(close * 100, 0) AS BIGINT))
                         OVER (PARTITION BY symbol ORDER BY date)) AS mv
        FROM ticks
    ),
    m AS (
        SELECT symbol,
               CAST(COUNT(*) AS BIGINT)          AS n,
               CAST(SUM(xv) AS BIGINT)           AS sx,
               CAST(SUM(mv) AS BIGINT)           AS sy,
               CAST(SUM(xv * mv) AS BIGINT)      AS sxy,
               CAST(SUM(xv * xv) AS BIGINT)      AS sxx,
               CAST(SUM(mv * mv) AS BIGINT)      AS syy
        FROM d WHERE mv IS NOT NULL AND xv IS NOT NULL GROUP BY 1
    )
    SELECT symbol, n AS n_days,
           CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
                 AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
                THEN (CASE WHEN CAST(n AS HUGEINT) * sxy
                               - CAST(sx AS HUGEINT) * sy < 0
                           THEN -1.0 ELSE 1.0 END)
                   * sqrt(CAST((CAST(n AS HUGEINT) * sxy
                                - CAST(sx AS HUGEINT) * sy) * 1000000000
                               // (CAST(n AS HUGEINT) * sxx
                                   - CAST(sx AS HUGEINT) * sx) AS BIGINT)
                          * CAST((CAST(n AS HUGEINT) * sxy
                                  - CAST(sx AS HUGEINT) * sy) * 1000000000
                                 // (CAST(n AS HUGEINT) * syy
                                     - CAST(sy AS HUGEINT) * sy) AS BIGINT))
                   / 1e9 + 0.0
                ELSE NULL END AS lead_corr
    FROM m
    """,
)
def q_volume_lead_move_correlation(spark, sf_dir):
    """Per-symbol Pearson correlation between YESTERDAY's volume and
    TODAY's |close move| (cents) — the one-day lead-lag variant of
    ``volume_move_correlation``: a significantly positive value says
    volume spikes PRECEDE big moves for that symbol (information
    arrival), not just accompany them.

    Same exact-moment machinery (registry_stats.py recipe): both
    series int64, five exact sums per symbol, closing products in
    DECIMAL(38)/HUGEINT quantized by the rule-13 truncating division
    at 10⁹, one √·√ finish emitted raw. One symbol exchange serves the
    lag window and the aggregate; |symbols| rows out."""
    t = ticks(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("date")
    cc = cents("close")
    d = t.select(
        "symbol",
        F.lag("volume").over(w).alias("xv"),
        F.abs(cc - F.lag(cc).over(w)).alias("mv"),
    ).filter(F.col("mv").isNotNull() & F.col("xv").isNotNull())
    m = d.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xv").alias("sx"),
        F.sum("mv").alias("sy"),
        F.sum(F.col("xv") * F.col("mv")).alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
        F.sum(F.col("mv") * F.col("mv")).alias("syy"),
    )
    num = _dec(F.col("n")) * _dec(F.col("sxy")) - _dec(F.col("sx")) * _dec(
        F.col("sy")
    )
    denx = _dec(F.col("n")) * _dec(F.col("sxx")) - _dec(F.col("sx")) * _dec(
        F.col("sx")
    )
    deny = _dec(F.col("n")) * _dec(F.col("syy")) - _dec(F.col("sy")) * _dec(
        F.col("sy")
    )
    q9 = F.lit(1000000000).cast(_DEC)
    pre = m.select(
        "symbol", F.col("n").alias("n_days"),
        num.alias("num"), (num * q9).alias("num9"),
        denx.alias("denx"), deny.alias("deny"),
    )
    zero = F.lit(0).cast(_DEC)
    sign = F.when(F.col("num") < zero, F.lit(-1.0)).otherwise(F.lit(1.0))
    return pre.select(
        "symbol", "n_days",
        F.when(
            (F.col("denx") > zero) & (F.col("deny") > zero),
            sign
            * F.sqrt(
                F.expr("num9 div denx").cast("double")
                * F.expr("num9 div deny").cast("double")
            )
            / F.lit(1e9),
        ).alias("lead_corr"),
    )

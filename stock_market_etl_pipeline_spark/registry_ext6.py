"""Events + embeddings analytics, part 6: Markov k-step distribution,
exponential goodness-of-fit, embedding batch drift.

- ``markov_3step_distribution`` — the 3-step transition distribution
  (T^3) from the per-user first-order Markov estimate: where does a
  session END UP three clicks after each event type. The matrix-power
  companion of ``event_transition_matrix`` (one step) and
  ``event_paths_top`` (observed, not modeled, paths).
- ``exp_gap_fit_ks`` — per event type: exponential-arrival MLE rate
  over the type's inter-arrival gaps plus the exact Kolmogorov-Smirnov
  statistic against that fit. "Is this event stream Poisson, or bursty"
  as a number — the modeling counterpart of ``event_burst_days`` and
  ``inter_event_gaps``' descriptive percentiles.
- ``embedding_batch_drift`` — centroid cosine / L2 between CONSECUTIVE
  ingest batches (vec_id blocks) of the embedding corpus: the
  embedding-space drift monitor for a continuously-ingested corpus
  ("did the encoder or the data change between batch b and b+1").

Float policy (NOTES rules 9-15):

- markov: one-step probabilities are exact int divisions (RAW); the
  two matrix-multiply contractions sum float products, so the emitted
  p3 is ROUND(...,6) applied once.
- exp fit: gaps are exact int64 epoch-micros; the ECDF ranks i/n are
  exact single divisions; exp() is last-ulp-exposed, so the KS sup is
  ROUND(...,6); the MLE rate n/sum_gaps is one exact division (RAW).
  The 5%-level reject flag compares the ROUNDED KS against the
  engine-identical critical value, so it cannot flip across engines.
- drift: embedding values quantize to 1e-6 ints BEFORE aggregation
  (the label_centroid quantize-first discipline, registry_llm4.py);
  per-(batch, dim) centroids quantize to 1e-4 ints by truncating
  division, after which EVERY operand (dot, norms, squared L2) is an
  exact integer below 2^53 — casts are exact, sqrt is IEEE
  correctly-rounded, and the emitted cosine/L2 are single-op chains
  on identical doubles: emitted RAW, no rounding anywhere (rule 13:
  no wide int ever crosses the double boundary).

100 TB shape: each query collapses the fact table to a bounded
aggregate in ONE pass (type-pair counts <= |types|^2; per-type gap
ECDF windows reuse the lag exchange; (batch, dim) centroid table),
then does all modeling on the bounded table via broadcast/checkpoint —
nothing pairwise or iterative ever touches corpus-sized data.

Reference lineage: the reference has no events/embeddings surface —
extension scope per SURVEY §2.12.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .sources.events import load_events
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Markov 3-step distribution (T^3 via two bounded matrix-multiply joins)
# ---------------------------------------------------------------------------

_TRANS_CTE = """
    seq AS (
        SELECT event_type AS f,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS t
        FROM events
    ),
    pairs AS (
        SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE t IS NOT NULL GROUP BY 1, 2
    ),
    tm AS (
        SELECT f, t,
               n / CAST(SUM(n) OVER (PARTITION BY f) AS BIGINT) AS p
        FROM pairs
    )
"""


@register(
    "markov_3step_distribution",
    "WITH "
    + _TRANS_CTE
    + """,
    t2 AS (
        SELECT a.f AS f, b.t AS t, SUM(a.p * b.p) AS p
        FROM tm a JOIN tm b ON a.t = b.f GROUP BY 1, 2
    ),
    t3 AS (
        SELECT a.f AS f, b.t AS t, SUM(a.p * b.p) AS p
        FROM t2 a JOIN tm b ON a.t = b.f GROUP BY 1, 2
    )
    SELECT t3.f AS from_event, t3.t AS to_event,
           tm.p                AS p1,
           ROUND(t3.p, 6)      AS p3
    FROM t3 LEFT JOIN tm ON t3.f = tm.f AND t3.t = tm.t
    """,
)
def q_markov_3step_distribution(spark, sf_dir):
    """Three-step Markov forecast: for each event type, the probability
    distribution over event types THREE transitions later, computed as
    T^3 from the per-user consecutive-pair estimate (same pair
    convention as ``event_transition_matrix``: (ts, event_id) order).
    p1 (the one-step probability, NULL where no direct transition was
    observed) rides along for contrast.

    Exactness: p1 is an exact int division (RAW); each contraction
    SUM(a.p * b.p) runs over <= |types| terms of float products whose
    summation order differs across engines, so only the FINAL p3 is
    ROUND(...,6) — the intermediate t2 stays unrounded on both sides
    (rounding it would discard real information and still not make
    the sums order-stable).

    Plan: ONE user_id shuffle collapses the fact table to <= |types|^2
    pair counts; the transition matrix is localCheckpoint-materialized
    (T appears three times in T^3 — without it the corpus subtree
    triplicates, the kl_source_divergence lesson) and the two
    matrix-multiply joins run over the tiny checkpointed table."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("f"),
            F.lead("event_type").over(w).alias("t"),
        )
        .filter(F.col("t").isNotNull())
        .groupBy("f", "t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tm = pairs.select(
        "f", "t",
        (F.col("n") / F.sum("n").over(Window.partitionBy("f"))).alias("p"),
    ).localCheckpoint(eager=True)
    a, b = tm.alias("a"), tm.alias("b")
    t2 = (
        a.join(b, F.col("a.t") == F.col("b.f"))
        .groupBy(F.col("a.f").alias("f"), F.col("b.t").alias("t"))
        .agg(F.sum(F.col("a.p") * F.col("b.p")).alias("p"))
    )
    t3 = (
        t2.alias("a")
        .join(tm.alias("b"), F.col("a.t") == F.col("b.f"))
        .groupBy(F.col("a.f").alias("f"), F.col("b.t").alias("t"))
        .agg(F.sum(F.col("a.p") * F.col("b.p")).alias("p"))
    )
    return (
        t3.alias("x")
        .join(
            tm.alias("m"),
            (F.col("x.f") == F.col("m.f")) & (F.col("x.t") == F.col("m.t")),
            "left",
        )
        .select(
            F.col("x.f").alias("from_event"),
            F.col("x.t").alias("to_event"),
            F.col("m.p").alias("p1"),
            F.round(F.col("x.p"), 6).alias("p3"),
        )
    )


# ---------------------------------------------------------------------------
# Exponential inter-arrival fit + exact KS statistic per event type
# ---------------------------------------------------------------------------


@register(
    "exp_gap_fit_ks",
    """
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               )) AS gap_us
        FROM events
    ),
    gg AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL),
    r AS (
        SELECT event_type, gap_us,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY gap_us) AS i,
               COUNT(*) OVER (PARTITION BY event_type) AS n,
               SUM(gap_us) OVER (PARTITION BY event_type) AS sg
        FROM gg
    ),
    d AS (
        SELECT event_type, n, sg,
               (1.0 - exp(-(CAST(n AS DOUBLE) / sg) * gap_us)) AS fx,
               i * 1.0 / n       AS ecdf_hi,
               (i - 1) * 1.0 / n AS ecdf_lo
        FROM r
    )
    SELECT event_type,
           CAST(MIN(n) AS BIGINT)                    AS n_gaps,
           MIN(sg) * 1.0 / MIN(n) / 1000000.0        AS mean_gap_s,
           ROUND(GREATEST(MAX(ecdf_hi - fx), MAX(fx - ecdf_lo)), 6)
                                                     AS ks_stat,
           ROUND(GREATEST(MAX(ecdf_hi - fx), MAX(fx - ecdf_lo)), 6)
               > 1.358 / sqrt(CAST(MIN(n) AS DOUBLE)) AS reject_exp_05
    FROM d GROUP BY 1
    """,
)
def q_exp_gap_fit_ks(spark, sf_dir):
    """Arrival-process audit per event type: fit an exponential
    inter-arrival model by MLE (rate = n / sum_gaps over the type's
    global (ts, event_id)-ordered stream) and score it with the exact
    Kolmogorov-Smirnov statistic sup|ECDF - F|, computed as
    max(i/n - F(x_i), F(x_i) - (i-1)/n) over the rank-ordered gaps.
    reject_exp_05 applies the asymptotic 5% critical value 1.358/sqrt(n)
    — TRUE means the stream is NOT Poisson (bursty or periodic), the
    modeled confirmation of what ``event_burst_days`` flags
    descriptively.

    Exactness: gaps are exact int64 epoch-micros; i/n and (i-1)/n are
    exact single divisions; F(x) = 1 - exp(-(n/sg)*gap) is a chain of
    single IEEE ops with ONE last-ulp-exposed exp(), so the KS sup is
    ROUND(...,6) (tie order within equal gaps cannot change the sup:
    equal gaps have equal F, and the max/min over a tie block depend
    only on the block's outer ranks). The reject flag compares the
    ROUNDED ks against an engine-identical critical value — no flip
    channel. mean_gap_s is exact-int single divisions (RAW).

    Plan: lag window, rank window, the per-type totals and the final
    groupBy ALL share one HashPartitioning(event_type) exchange. The
    per-type sort is the same shape as every per-type window here; at
    extreme per-type cardinality the skew-safe chunked spine
    (operators/skewsafe.py) is the documented widen path."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
        .alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wt = Window.partitionBy("event_type")
    r = g.select(
        "event_type", "gap_us",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("gap_us")
        ).alias("i"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("gap_us").over(wt).alias("sg"),
    )
    fx = F.lit(1.0) - F.exp(
        -(F.col("n").cast("double") / F.col("sg")) * F.col("gap_us")
    )
    d = r.select(
        "event_type", "n", "sg",
        fx.alias("fx"),
        (F.col("i") * F.lit(1.0) / F.col("n")).alias("ecdf_hi"),
        ((F.col("i") - 1) * F.lit(1.0) / F.col("n")).alias("ecdf_lo"),
    )
    ks = F.round(
        F.greatest(
            F.max(F.col("ecdf_hi") - F.col("fx")),
            F.max(F.col("fx") - F.col("ecdf_lo")),
        ),
        6,
    )
    return d.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_gaps"),
        (F.min("sg") * F.lit(1.0) / F.min("n") / F.lit(1000000.0))
        .alias("mean_gap_s"),
        ks.alias("ks_stat"),
        (ks > F.lit(1.358) / F.sqrt(F.min("n").cast("double")))
        .alias("reject_exp_05"),
    )


# ---------------------------------------------------------------------------
# Embedding batch drift (consecutive ingest-batch centroid similarity)
# ---------------------------------------------------------------------------

_DRIFT_BATCH = 100  # vec_ids per ingest batch


@register(
    "embedding_batch_drift",
    f"""
    WITH ex AS (
        SELECT vec_id // {_DRIFT_BATCH} AS b,
               CAST(u.pos - 1 AS INTEGER) AS pos,
               CAST(ROUND(CAST(u.val AS DOUBLE) * 1000000) AS BIGINT) AS q
        FROM (
            SELECT vec_id, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ) u(vec_id, val, pos)
    ),
    cen AS (
        SELECT b, pos,
               CAST(SUM(q) AS BIGINT) // (CAST(COUNT(*) AS BIGINT) * 100)
                   AS c4
        FROM ex GROUP BY 1, 2
    ),
    pair AS (
        SELECT a.b AS batch_from, b.b AS batch_to,
               CAST(SUM(a.c4 * b.c4) AS BIGINT)        AS dot,
               CAST(SUM(a.c4 * a.c4) AS BIGINT)        AS na,
               CAST(SUM(b.c4 * b.c4) AS BIGINT)        AS nb,
               CAST(SUM((a.c4 - b.c4) * (a.c4 - b.c4)) AS BIGINT) AS d2,
               CAST(COUNT(*) AS INTEGER)               AS n_dims
        FROM cen a JOIN cen b ON b.b = a.b + 1 AND a.pos = b.pos
        GROUP BY 1, 2
    )
    SELECT batch_from, batch_to, n_dims,
           CASE WHEN na > 0 AND nb > 0
                THEN dot / (sqrt(CAST(na AS DOUBLE))
                            * sqrt(CAST(nb AS DOUBLE))) END AS cosine,
           sqrt(CAST(d2 AS DOUBLE)) / 10000.0               AS l2_dist
    FROM pair
    """,
)
def q_embedding_batch_drift(spark, sf_dir):
    """Embedding-space drift monitor: cosine similarity and L2 distance
    between the centroids of CONSECUTIVE {_DRIFT_BATCH}-vector ingest
    batches (vec_id blocks — the ingest order). A centroid cosine
    dropping below ~0.9 between adjacent batches flags an encoder
    version change or a data-mix shift mid-ingest.

    Exactness (the label_centroid quantize-first discipline,
    registry_llm4.py:285-): values quantize to 1e-6 ints before any
    aggregation; per-(batch, dim) centroids quantize to 1e-4 ints via
    truncating division (sum(q) div (n*100)); every downstream operand
    — dot, both norms, the squared L2 — is then an exact int below
    2^53 (|c4| <= 1e5 at |v| <= 10, dims bounded: dot <= dims * 1e10),
    so the int->double casts are exact, sqrt is IEEE-exact, and
    cosine/l2 are single-op chains emitted RAW. Zero-norm batches
    NULL the cosine on both sides.

    Plan: one posexplode + (batch, dim) aggregate collapses the corpus;
    the consecutive-pair join runs over the tiny checkpointed centroid
    table (batches x dims rows). At 100 TB batches grow linearly but
    the pair join stays adjacent-only — |batches| rows out."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        (F.floor(F.col("vec_id") / _DRIFT_BATCH)).alias("b"),
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "b", "pos",
        F.round(F.col("val").cast("double") * 1000000, 0)
        .cast("long").alias("q"),
    )
    cen = (
        ex.groupBy("b", "pos")
        .agg(
            F.expr("sum(q) div (count(1) * 100)").cast("long").alias("c4")
        )
        .localCheckpoint(eager=True)
    )
    a, b = cen.alias("a"), cen.alias("b")
    c1, c2 = F.col("a.c4"), F.col("b.c4")
    pair = (
        a.join(
            b,
            (F.col("b.b") == F.col("a.b") + 1)
            & (F.col("a.pos") == F.col("b.pos")),
        )
        .groupBy(
            F.col("a.b").alias("batch_from"), F.col("b.b").alias("batch_to")
        )
        .agg(
            F.sum(c1 * c2).cast("long").alias("dot"),
            F.sum(c1 * c1).cast("long").alias("na"),
            F.sum(c2 * c2).cast("long").alias("nb"),
            F.sum((c1 - c2) * (c1 - c2)).cast("long").alias("d2"),
            F.count(F.lit(1)).cast("int").alias("n_dims"),
        )
    )
    return pair.select(
        "batch_from", "batch_to", "n_dims",
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            F.col("dot")
            / (
                F.sqrt(F.col("na").cast("double"))
                * F.sqrt(F.col("nb").cast("double"))
            ),
        ).alias("cosine"),
        (F.sqrt(F.col("d2").cast("double")) / F.lit(10000.0)).alias("l2_dist"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint scan on daily event counts
# ---------------------------------------------------------------------------


@register(
    "cusum_changepoint_daily",
    """
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, day, x,
               SUM(x) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS k,
               SUM(x) OVER (PARTITION BY event_type) AS s,
               COUNT(*) OVER (PARTITION BY event_type) AS nd
        FROM d
    ),
    c AS (
        -- scaled CUSUM numerator: nd*cum - k*s = nd * sum_{i<=k}(x_i - mean)
        -- — exact integers end to end (running sums of ints are exact
        -- under ANY accumulation order, unlike float cusums)
        SELECT event_type, day, nd, s,
               abs(nd * cum - k * s) AS dev
        FROM w WHERE k < nd
    ),
    mx AS (
        SELECT c.*, MAX(dev) OVER (PARTITION BY event_type) AS mdev
        FROM c
    )
    SELECT event_type,
           CAST(MIN(nd) AS BIGINT)                    AS n_days,
           MIN(CASE WHEN dev = mdev THEN day END)     AS changepoint_day,
           CAST(MAX(dev) AS BIGINT)                   AS max_dev_scaled,
           MAX(dev) / (CAST(MIN(nd) AS DOUBLE))       AS max_cusum
    FROM mx GROUP BY 1
    """,
)
def q_cusum_changepoint_daily(spark, sf_dir):
    """CUSUM changepoint scan per event type: the day k maximizing
    |sum_{i<=k}(x_i - mean)| over the daily count series — the
    classic level-shift locator (did the rate change, and WHEN),
    complementing ``daily_event_ewma`` (which flags drift as it
    happens; this retrospectively places the break).

    Exactness: the CUSUM deviation is kept as the SCALED integer
    nd*cum - k*s (= nd * the float cusum) — running sums of ints are
    exact under any accumulation order, so no float ever enters the
    argmax; the winning day is the EARLIEST day attaining the per-type
    max deviation (window max + conditional min on exact ints —
    DuckDB's min_by takes no struct key), deterministic in both
    engines.
    The reported max_cusum is one final int->double division. The
    last day (k = nd) is excluded — its deviation is identically 0.

    Plan: events collapse to (type, day) counts in one shuffle; the
    running/total windows and the final groupBy reuse the type
    partitioning. Overflow audit: nd*cum <= nd * total_events; at
    1e12 events over 1e5 days that is 1e17 — within int64 headroom
    here (6e14 at sf10), DECIMAL the widen path."""
    ev = load_events(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("day")
    w = d.select(
        "event_type", "day", "x",
        F.sum("x").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.row_number().over(wo).alias("k"),
        F.sum("x").over(wt).alias("s"),
        F.count(F.lit(1)).over(wt).alias("nd"),
    )
    c = w.filter(F.col("k") < F.col("nd")).select(
        "event_type", "day", "nd",
        F.abs(F.col("nd") * F.col("cum") - F.col("k") * F.col("s"))
        .alias("dev"),
    )
    mx = c.select(
        "*", F.max("dev").over(Window.partitionBy("event_type")).alias("mdev")
    )
    return mx.groupBy("event_type").agg(
        F.min("nd").cast("bigint").alias("n_days"),
        F.min(F.when(F.col("dev") == F.col("mdev"), F.col("day")))
        .alias("changepoint_day"),
        F.max("dev").cast("bigint").alias("max_dev_scaled"),
        (F.max("dev") / F.min("nd").cast("double")).alias("max_cusum"),
    )


# ---------------------------------------------------------------------------
# Conditional entropy of the event-transition process
# ---------------------------------------------------------------------------


@register(
    "transition_conditional_entropy",
    "WITH "
    + _TRANS_CTE
    + """,
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM pairs),
    ent AS (
        SELECT p.f,
               SUM(-(p.n * 1.0 / t.t) * ln(tm.p)) AS hpart,
               CAST(SUM(p.n) AS BIGINT) AS n_from
        FROM pairs p JOIN tm ON p.f = tm.f AND p.t = tm.t
        CROSS JOIN tot t
        GROUP BY 1
    )
    SELECT f AS from_event, n_from,
           ROUND(hpart, 6) AS h_contribution,
           ROUND(SUM(hpart) OVER (), 6) AS h_conditional_total
    FROM ent
    """,
)
def q_transition_conditional_entropy(spark, sf_dir):
    """Conditional entropy H(next | current) of the event-type process,
    decomposed per conditioning type: how PREDICTABLE is the next
    click given the current one. H -> 0 reads deterministic flows
    (funnel-like), H near ln(|types|) reads noise — the one-number
    summary over ``event_transition_matrix`` and the information-
    theoretic sibling of ``markov_3step_distribution``.

    H = -sum_{a,b} p(a,b) ln p(b|a): p(a,b) = n_ab/T and p(b|a) are
    each ONE exact int division; ln is 1-ulp-exposed and both the
    per-type partial sums and the total are order-sensitive ->
    ROUND(...,6). n_from (exact int) rides along so the reader can
    weight contributions.

    Plan: one user_id shuffle for the pairs; everything downstream
    runs on the <= |types|^2 checkpointed transition table (shared
    with the matrix-power query's discipline)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("f"),
            F.lead("event_type").over(w).alias("t"),
        )
        .filter(F.col("t").isNotNull())
        .groupBy("f", "t")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tm = pairs.select(
        "f", "t",
        (F.col("n") / F.sum("n").over(Window.partitionBy("f"))).alias("p"),
    )
    tot = pairs.agg(F.sum("n").cast("bigint").alias("t_all"))
    ent = (
        pairs.join(tm.select("f", "t", "p"), ["f", "t"])
        .crossJoin(F.broadcast(tot))
        .groupBy("f")
        .agg(
            F.sum(
                -(F.col("n") * F.lit(1.0) / F.col("t_all"))
                * F.log(F.col("p"))
            ).alias("hpart"),
            F.sum("n").cast("bigint").alias("n_from"),
        )
    )
    return ent.select(
        F.col("f").alias("from_event"),
        "n_from",
        F.round(F.col("hpart"), 6).alias("h_contribution"),
        F.round(F.sum("hpart").over(Window.partitionBy()), 6)
        .alias("h_conditional_total"),
    )

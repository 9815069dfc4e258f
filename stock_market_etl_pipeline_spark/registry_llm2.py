r"""LLM-data-pipeline operators, part 2: cross-source dedup overlap,
bigram-LM surprisal scoring, and label-centroid geometry.

Extends ``registry_llm.py`` with three corpus-curation rollups a
training-data team reaches for after the per-document signals exist:
which SOURCES duplicate each other (overlap matrix), which documents an
n-gram LM finds surprising (filtering signal), and how separable the
label classes are in embedding space (centroid distance matrix).

Float policy (oracles.py): counts and fingerprint sets are exact;
surprisal is a per-doc AVG of exact-integer ratios → 6dp; centroid
cosines quantize float32 embedding values to exact 1e-6 integers first
so the only order-sensitive float reduction is the final ≤|dim|-term
sum → 6dp.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.text import normalized_fingerprint
from .registry import register
from .sources.tables import load_table


# ---------------------------------------------------------------------------
# Cross-source fingerprint overlap matrix
# ---------------------------------------------------------------------------

_OVERLAP_PLANT_N = 40  # docs 0..39 replanted under a shifted source


@register(
    "source_fingerprint_overlap",
    rf"""
    WITH corpus AS (
        SELECT source, text FROM documents
        UNION ALL
        SELECT 'src' || CAST((doc_id + 7) % 20 AS VARCHAR) AS source, text
        FROM documents WHERE doc_id < {_OVERLAP_PLANT_N}
    ),
    fp AS (
        SELECT DISTINCT source,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        FROM corpus
    ),
    per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp GROUP BY 1
    ),
    shared AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b, s.n_shared,
           pa.n_fp AS n_fp_a, pb.n_fp AS n_fp_b,
           s.n_shared * 1.0 / (pa.n_fp + pb.n_fp - s.n_shared) AS jaccard
    FROM shared s
    JOIN per_src pa ON s.source_a = pa.source
    JOIN per_src pb ON s.source_b = pb.source
    """,
)
def q_source_fingerprint_overlap(spark, sf_dir):
    """Cross-source duplication matrix: for every source pair sharing at
    least one exact content fingerprint, the shared-distinct count and
    the Jaccard overlap of their fingerprint sets — the rollup that
    tells a curation team which feeds are mirrors of each other.

    The raw corpus has zero natural cross-source duplicates (the
    dedup_exact_groups finding), so the registration plants the first 40
    documents again under a deterministically shifted source
    (``src{(id+7) % 20}``), mirrored in the oracle CTE — the positive
    path is exercised at every verify scale and the planted pairs are
    distinguishable by inspection.  Plan: distinct (source, md5) set
    (one shuffle on the 16-byte digest), self-equi-join on fingerprint
    with ``source_a < source_b`` (join fan-out per fingerprint is
    bounded by |sources| — a duplicate shared by k sources yields
    C(k,2) ≤ C(|sources|,2) pairs, independent of corpus size), then a
    |sources|²-bounded aggregate.  Jaccard divides exact int64 counts
    raw (identical doubles both engines).
    """
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") < _OVERLAP_PLANT_N).select(
        F.concat(
            F.lit("src"), ((F.col("doc_id") + 7) % 20).cast("string")
        ).alias("source"),
        "text",
    )
    corpus = docs.select("source", "text").unionByName(planted)
    fp = corpus.select(
        "source", normalized_fingerprint(F.col("text")).alias("f")
    ).distinct()
    per_src = fp.groupBy("source").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fp.select(F.col("source").alias("source_a"), "f")
    b = fp.select(F.col("source").alias("source_b"), F.col("f").alias("fb"))
    shared = (
        a.join(b, (a.f == b.fb) & (a.source_a < b.source_b))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pa = per_src.select(
        F.col("source").alias("sa"), F.col("n_fp").alias("n_fp_a")
    )
    pb = per_src.select(
        F.col("source").alias("sb"), F.col("n_fp").alias("n_fp_b")
    )
    return (
        shared.join(F.broadcast(pa), F.col("source_a") == F.col("sa"))
        .join(F.broadcast(pb), F.col("source_b") == F.col("sb"))
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            (
                F.col("n_shared")
                / (F.col("n_fp_a") + F.col("n_fp_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram-LM surprisal score per document
# ---------------------------------------------------------------------------

@register(
    "doc_bigram_surprisal",
    r"""
    WITH lt AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ),
    bi AS (
        SELECT doc_id, t[g.i] AS w1, t[g.i + 1] AS w2
        FROM lt, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
        WHERE len(t) >= 2
    ),
    bc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bi GROUP BY 1, 2
    ),
    wt AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bc GROUP BY 1)
    SELECT bi.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(wt.c1 * 1.0 / bc.c2), 6) AS surprisal
    FROM bi
    JOIN bc USING (w1, w2)
    JOIN wt USING (w1)
    GROUP BY 1
    """,
)
def q_doc_bigram_surprisal(spark, sf_dir):
    """Per-document LM-surprisal proxy: the average INVERSE conditional
    bigram probability 1/P(w2|w1) = c(w1)/c(w1,w2) over the document's
    bigrams, under the corpus's own bigram model — high values mean the
    document's word transitions are rare in the corpus (the classic
    perplexity-based quality filter, log-free: libm ln() is a 1-ulp
    trap across engines, and avg-inverse-probability is rank-equivalent
    enough for filtering).

    Plan: the (doc_id, w1, w2) bigram table is localCheckpoint-
    materialized ONCE and shared by the count model (bc → wt rollups,
    vocab²-bounded) and the per-doc scoring join — without it the
    explode runs three times.  Each surprisal term is a division of two
    exact int64 counts (identical doubles); the per-doc AVG is the one
    order-sensitive reduction → 6dp per the float policy.  Joins
    shuffle on (w1, w2) / w1; the scored table shuffles once on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    lt = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    bi = (
        lt.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1,"
                    "             element_at(t, i + 1) AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .localCheckpoint(eager=True)
    )
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    wt = bc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return (
        bi.join(bc, ["w1", "w2"])
        .join(wt, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.col("c1") / F.col("c2")), 6).alias("surprisal"),
        )
    )


# ---------------------------------------------------------------------------
# Label-centroid cosine distance matrix
# ---------------------------------------------------------------------------

@register(
    "label_centroid_distances",
    """
    WITH ex AS (
        SELECT label, CAST(u.pos - 1 AS INTEGER) AS pos,
               CAST(ROUND(CAST(u.val AS DOUBLE) * 1000000) AS BIGINT) AS q
        FROM (
            SELECT label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ) u(label, val, pos)
    ),
    cen AS (
        SELECT label, pos,
               CAST(SUM(q) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ex GROUP BY 1, 2
    ),
    norms AS (
        SELECT label,
               sqrt(SUM((s * 1.0 / n) * (s * 1.0 / n))) AS nrm
        FROM cen GROUP BY 1
    ),
    dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
               SUM((a.s * 1.0 / a.n) * (b.s * 1.0 / b.n)) AS dot
        FROM cen a JOIN cen b ON a.pos = b.pos AND a.label < b.label
        GROUP BY 1, 2
    )
    SELECT d.label_a, d.label_b,
           ROUND(d.dot / (na.nrm * nb.nrm), 6) AS centroid_cosine
    FROM dots d
    JOIN norms na ON d.label_a = na.label
    JOIN norms nb ON d.label_b = nb.label
    """,
)
def q_label_centroid_distances(spark, sf_dir):
    """Pairwise cosine similarity between label centroids — the class-
    separability matrix behind embedding-space audits (labels whose
    centroids are near-parallel are candidates for merging or
    relabeling).

    Exactness: float32 embedding values quantize to exact 1e-6 integers
    BEFORE any aggregation, so each centroid component is the exact
    rational Σq/n (bit-identical in both engines regardless of sum
    order — the label_centroids 6dp-AVG policy is not tight enough to
    SQUARE and re-sum, which is why this query re-derives centroids
    exactly instead of composing with the rounded query).  The dot
    products and norms then sum ≤|dim| identical doubles — the one
    order-sensitive reduction — and the cosine rounds 6dp.  Plan: one
    posexplode → (label, pos) aggregate (|labels|·|dim| rows at any
    corpus size), then the pair join runs on pos over that bounded
    table; output is C(|labels|, 2) rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        "pos",
        F.round(F.col("val").cast("double") * 1000000, 0)
        .cast("long")
        .alias("q"),
    )
    cen = ex.groupBy("label", "pos").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    comp = (F.col("s") * 1.0 / F.col("n"))
    norms = cen.groupBy("label").agg(
        F.sqrt(F.sum(comp * comp)).alias("nrm")
    )
    a = cen.select(
        F.col("label").alias("label_a"), "pos", comp.alias("ca")
    )
    b = cen.select(
        F.col("label").alias("label_b"),
        F.col("pos").alias("pos_b"),
        comp.alias("cb"),
    )
    dots = (
        a.join(
            b, (a.pos == b.pos_b) & (F.col("label_a") < F.col("label_b"))
        )
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = norms.select(F.col("label").alias("la"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("label").alias("lb"), F.col("nrm").alias("nb"))
    return (
        dots.join(F.broadcast(na), F.col("label_a") == F.col("la"))
        .join(F.broadcast(nb), F.col("label_b") == F.col("lb"))
        .select(
            "label_a",
            "label_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "centroid_cosine"
            ),
        )
    )


# ---------------------------------------------------------------------------
# DAU / MAU stickiness (composition of exact daily + sliding distinct)
# ---------------------------------------------------------------------------

@register(
    "dau_mau_stickiness",
    """
    WITH bounds AS (
        SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events
    ),
    ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1
    ),
    covered AS (
        SELECT ud.user_id, ud.day + CAST(g.i AS INTEGER) AS cover_day
        FROM ud, UNNEST(generate_series(0, 29)) AS g(i), bounds
        WHERE ud.day + CAST(g.i AS INTEGER) <= bounds.max_day
    ),
    mau AS (
        SELECT cover_day AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau_30d
        FROM covered GROUP BY 1
    )
    SELECT m.day, COALESCE(d.dau, 0) AS dau, m.mau_30d,
           COALESCE(d.dau, 0) * 1.0 / m.mau_30d AS stickiness
    FROM mau m LEFT JOIN dau d USING (day)
    """,
)
def q_dau_mau_stickiness(spark, sf_dir):
    """Product-health stickiness curve: DAU / trailing-30-day MAU per
    day (the classic engagement ratio), composing the exact daily
    distinct with the covered-day sliding distinct of
    ``rolling_active_users``.

    The DEDUPLICATED (user, day) table is localCheckpoint-materialized
    ONCE and shared by the DAU rollup and the 30× coverage explode —
    events are scanned once, and everything downstream of the distinct
    works on the collapsed table.  Days inside the window of a prior
    active day but with no events of their own get DAU = 0 via the LEFT
    join (MAU > 0 by construction for every emitted day, so the ratio
    is total).  Counts are exact int64; stickiness divides them raw
    (identical doubles).  Cite: the covered-day identity is documented
    at registry_ext3.q_rolling_active_users; this query is its
    composition certificate.
    """
    from .sources.events import load_events

    ev = load_events(spark, sf_dir)
    ud = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bounds = ev.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    covered = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 29))
            ).alias("cover_day"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("cover_day") <= F.col("max_day"))
    )
    mau = covered.groupBy(F.col("cover_day").alias("day")).agg(
        F.countDistinct("user_id").alias("mau_30d")
    )
    return (
        mau.join(dau, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            "mau_30d",
            (
                F.coalesce(F.col("dau"), F.lit(0)) * F.lit(1.0)
                / F.col("mau_30d")
            ).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# N-gram-level benchmark contamination (partial-leak decontamination)
# ---------------------------------------------------------------------------

_BENCH_N = 50       # doc_id < 50 plays the held-out benchmark set
_LEAK_N = 20        # the first 20 benchmark docs are partially leaked
_CONTAM_K = 8       # 8-token grams, the common decontamination unit


@register(
    "contamination_ngram_coverage",
    rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    leaked AS (
        SELECT doc_id + 20000000 AS doc_id,
               t[1:greatest(len(t) * 2 // 5, 0)] AS t
        FROM toks WHERE doc_id < {_LEAK_N}
    ),
    corpus_t AS (
        SELECT doc_id, t FROM toks WHERE doc_id >= {_BENCH_N}
        UNION ALL SELECT doc_id, t FROM leaked
    ),
    bench_g AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(array_to_string(
                   t[i:i+{_CONTAM_K - 1}], ' ')), 1, 15))::BIGINT AS h
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t) - {_CONTAM_K - 1}, 0)))
                 AS g(i)
        WHERE doc_id < {_BENCH_N}
    ),
    corpus_g AS (
        SELECT DISTINCT
               ('0x' || substr(md5(array_to_string(
                   t[i:i+{_CONTAM_K - 1}], ' ')), 1, 15))::BIGINT AS h
        FROM corpus_t,
             UNNEST(generate_series(1, greatest(len(t) - {_CONTAM_K - 1}, 0)))
                 AS g(i)
    ),
    totals AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM bench_g GROUP BY 1
    ),
    hits AS (
        SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
        FROM bench_g b WHERE b.h IN (SELECT h FROM corpus_g)
        GROUP BY 1
    )
    SELECT t.doc_id, t.n_grams,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           COALESCE(h.n_contaminated, 0) * 1.0 / t.n_grams
               AS contamination_rate
    FROM totals t LEFT JOIN hits h USING (doc_id)
    """,
)
def q_contamination_ngram_coverage(spark, sf_dir):
    """N-gram-level benchmark decontamination: for every held-out
    benchmark document, the fraction of its DISTINCT 8-token grams that
    appear anywhere in the training corpus — the standard partial-leak
    metric (a paraphrased or truncated leak moves this; the exact-hash
    `benchmark_contamination` needle screen cannot see it).

    Benchmark set = docs 0..49 (deterministic stand-in for an eval
    suite).  The registration additionally plants CONTROLLED partial
    leaks — the first 40% of each of docs 0..19 re-enters the corpus as
    a new document (mirrored in the oracle CTE) — so those docs are
    guaranteed a positive prefix-shaped rate (~0.17-0.24 observed, the
    gram-count fraction of a 40% token prefix); docs 20..49 measure the
    corpus's NATURAL overlap, which is nonzero for some (the testdata's
    long-prefix containment families, the same ones
    dedup_prefix_containment detects) — exactly what a real
    decontamination pass should surface.
    Plan: grams hash to 60 bits BEFORE any exchange (the
    span_duplication_rate lesson — ~120-byte string keys went ×12 at
    sf10), the corpus gram set is ONE distinct on the 8-byte hash, and
    the membership probe is a LEFT SEMI co-partitioned on that hash;
    per-doc totals and hits then aggregate on doc_id.  Counts are exact
    int64; the rate divides them raw.  Collision risk 2⁻⁶⁰·n² —
    immaterial for a rate.
    """
    from .functions.text import md5_hash60, word_shingles_all, ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("t"))
    leaked = toks.filter(F.col("doc_id") < _LEAK_N).select(
        (F.col("doc_id") + 20000000).alias("doc_id"),
        F.expr("slice(t, 1, greatest(size(t) * 2 div 5, 0))").alias("t"),
    )
    corpus_t = toks.filter(F.col("doc_id") >= _BENCH_N).unionByName(leaked)

    def grams(df):
        return df.select(
            "doc_id",
            F.explode(word_shingles_all(F.col("t"), _CONTAM_K)).alias("g"),
        ).select("doc_id", md5_hash60(F.col("g")).alias("h"))

    bench_g = grams(toks.filter(F.col("doc_id") < _BENCH_N)).distinct()
    corpus_g = grams(corpus_t).select("h").distinct()
    totals = bench_g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    hits = (
        bench_g.join(corpus_g, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).alias(
            "n_contaminated"
        ),
        (
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            * F.lit(1.0)
            / F.col("n_grams")
        ).alias("contamination_rate"),
    )


# ---------------------------------------------------------------------------
# Length-balanced corpus sharding
# ---------------------------------------------------------------------------

_N_SHARDS = 8


@register(
    "balanced_shards",
    f"""
    WITH ranked AS (
        SELECT n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    )
    SELECT CAST((rn - 1) % {_N_SHARDS} AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT)   AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS largest_doc
    FROM ranked GROUP BY 1
    """,
)
def q_balanced_shards(spark, sf_dir):
    """Length-balanced sharding for training workers: docs ranked by size
    descending (tiebreak doc_id) and dealt round-robin to N shards — the
    deterministic longest-first variant of LPT scheduling, which bounds
    per-shard imbalance by ONE largest document instead of the O(shard)
    drift random assignment gives. Output: per-shard doc count, char
    mass, and largest doc (the balance audit a data-loader reads before
    an epoch).

    Plan note: the rank is a total order, but over (n_chars, doc_id)
    PAIRS only — 16 bytes/doc, no text moves — and the result reduces
    immediately to N rows. At 100 TB the same two columns sort in one
    rollup-sized stage (compare global_doc_ids, which avoids even that
    via prefix-sum offsets when EXACT contiguity is needed; here the
    total order IS the semantics — longest-first dealing).

    Reference has no sharding surface (single-process); this extends the
    training-prep family (sequence_packing, train_val_split,
    source_temperature_mix).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    ranked = docs.select(
        "n_chars", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.select(
            ((F.col("rn") - 1) % _N_SHARDS).cast("bigint").alias("shard"),
            "n_chars",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.max("n_chars").cast("bigint").alias("largest_doc"),
        )
    )

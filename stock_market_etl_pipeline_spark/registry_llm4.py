"""LLM/corpus operators, part 4: corpus novelty attribution and
embedding-space outlier audit.

Two curation measures a training-data pipeline runs between dedup and
sampling:

- ``doc_novelty_fraction`` — how much of each document's content the
  corpus had NOT seen before it (by ingestion order): the per-doc
  complement of ``vocabulary_growth``'s corpus curve, and the signal
  behind "stop crawling this source, it's recycling itself".
- ``label_embedding_outliers`` — the top-k vectors farthest from their
  label's centroid: mislabeled / out-of-distribution candidates, the
  per-vector drill-down of ``label_centroid_distances``' class-level
  matrix (same exact-rational centroid arithmetic).

Both follow the novelty decomposition trick that keeps gram-scale work
off the join path: novelty is attributed via ``min(doc_id)`` per shingle
— a doc's novel-shingle count is just the number of shingles whose
MINIMUM owner it is — so the query is two aggregates over the exploded
table plus a doc-level join, never a gram-level join-back.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.text import word_shingles, ws_tokens
from .registry import register
from .sources.tables import load_table

_SHINGLE_K = 3


# ---------------------------------------------------------------------------
# Asymmetric containment dedup (small-in-large)
# ---------------------------------------------------------------------------

_CONTAIN_THRESHOLD = 0.8
_CONTAIN_OFFSET = 4_000_000


@register(
    "dedup_containment",
    rf"""
    WITH toks0 AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    trunc AS (
        SELECT doc_id + {_CONTAIN_OFFSET} AS doc_id,
               list_slice(t, 1,
                   GREATEST(CAST(ceil(len(t) / 2.0) AS INT), 8)) AS t
        FROM toks0 WHERE doc_id < 25
    ),
    toks AS (
        SELECT doc_id, t FROM toks0 UNION ALL SELECT doc_id, t FROM trunc
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)
    ),
    kept AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50
    ),
    shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN kept USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
           CAST(LEAST(sa.n, sb.n) AS BIGINT) AS size_small,
           n_common * 1.0 / LEAST(sa.n, sb.n) AS containment
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / LEAST(sa.n, sb.n) >= {_CONTAIN_THRESHOLD}
    """,
)
def q_dedup_containment(spark, sf_dir):
    """Asymmetric-containment near-dup pairs: |A∩B| / min(|A|,|B|) ≥ 0.8
    over capped word-3-shingles — the small-in-large duplication family
    (quoted articles, boilerplate-wrapped reposts, pagination supersets)
    that Jaccard structurally underweights (a doc inside one 3× its size
    scores J ≈ 0.33, containment ≈ 1.0) and that
    dedup_prefix_containment only catches when the overlap is a PREFIX.

    Runs over the corpus ∪ planted half-length truncations of the first
    25 docs (plant_prefix_duplicates at offset 4e6, mirrored in the
    oracle CTE): a truncation twin has containment ≈ 1 but Jaccard
    ≈ 0.5 against its source — below the jaccard query's threshold, so
    this query's planted positives are invisible to that one (the two
    queries witness different pair families by construction). Candidates
    come from the same stop-shingle-capped inverted index as
    dedup_ngram_jaccard (bucket_pairs, Σ bucket² bounded by the df cap);
    the score is one int÷int division, emitted raw."""
    from .operators.dedup import (
        _doc_shingles,
        containment_pairs_from_buckets,
        plant_prefix_duplicates,
        shingle_buckets,
    )
    from .registry_llm import NGRAM_MAX_DOC_FREQ

    docs = load_table(spark, sf_dir, "documents")
    corpus = plant_prefix_duplicates(docs, n=25, id_offset=_CONTAIN_OFFSET)
    buckets = shingle_buckets(
        _doc_shingles(corpus, _SHINGLE_K), max_doc_freq=NGRAM_MAX_DOC_FREQ
    )
    return containment_pairs_from_buckets(buckets, threshold=_CONTAIN_THRESHOLD)


# ---------------------------------------------------------------------------
# Quality-filter funnel (per-rule attrition of doc_quality_score)
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = [
    ("all_docs", None),
    ("min_max_tokens", "ok_n_tokens"),
    ("avg_token_len", "ok_avg_token_len"),
    ("stopword_ratio", "ok_stopword"),
    ("symbol_ratio", "ok_symbol"),
    ("distinct_ratio", "ok_distinct"),
]


def _funnel_oracle() -> str:
    from .registry_llm import _QUALITY_FLAGS_CTES, _TOKS_CTE

    sums, conj = [], []
    for i, (_, flag) in enumerate(_FUNNEL_STAGES):
        if flag is not None:
            conj.append(flag)
        cond = " AND ".join(conj) if conj else "TRUE"
        sums.append(
            f"SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS n{i}"
        )
    rows = []
    for i, (rule, _) in enumerate(_FUNNEL_STAGES):
        dropped = "0" if i == 0 else f"n{i - 1} - n{i}"
        rows.append(
            f"SELECT CAST({i} AS INTEGER) AS stage, '{rule}' AS rule, "
            f"CAST(n{i} AS BIGINT) AS n_surviving, "
            f"CAST({dropped} AS BIGINT) AS n_dropped FROM agg"
        )
    return (
        "WITH "
        + _TOKS_CTE
        + _QUALITY_FLAGS_CTES
        + ", agg AS (SELECT "
        + ", ".join(sums)
        + " FROM f) "
        + " UNION ALL ".join(rows)
    )


@register("quality_filter_funnel", _funnel_oracle())
def q_quality_filter_funnel(spark, sf_dir):
    """Per-rule attrition of the Gopher-style quality filter: for each
    rule in doc_quality_score's fixed order, how many documents survive
    the CONJUNCTION of rules so far and how many that rule drops — the
    observability readout a curation pipeline watches to see which gate
    is doing the cutting (a rule dropping 40% of a trusted source signals
    a miscalibrated threshold, not bad data).

    Composes the registered doc_quality_score (same flags, same scan —
    the funnel can never disagree with the filter) into ONE aggregate
    row of six conjunction counts, unpivoted to six rows driver-side via
    an inline struct array: output is 6 rows at any corpus size, and the
    only data-sized work is doc_quality_score's own embarrassingly
    parallel scan."""
    from .registry_llm import q_doc_quality_score

    flags = q_doc_quality_score(spark, sf_dir)
    aggs, conj = [], None
    for i, (_, flag) in enumerate(_FUNNEL_STAGES):
        if flag is None:
            aggs.append(F.count(F.lit(1)).alias(f"n{i}"))
        else:
            conj = F.col(flag) if conj is None else conj & F.col(flag)
            aggs.append(
                F.sum(F.when(conj, 1).otherwise(0)).alias(f"n{i}")
            )
    agg = flags.agg(*aggs)
    stages = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(rule).alias("rule"),
                F.col(f"n{i}").cast("long").alias("n_surviving"),
                (
                    (F.col(f"n{i - 1}") - F.col(f"n{i}")) if i else F.lit(0)
                )
                .cast("long")
                .alias("n_dropped"),
            )
            for i, (rule, _) in enumerate(_FUNNEL_STAGES)
        ]
    )
    return agg.select(F.explode(stages).alias("s")).select(
        "s.stage", "s.rule", "s.n_surviving", "s.n_dropped"
    )


@register(
    "doc_novelty_fraction",
    rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+{_SHINGLE_K - 1}], ' ') AS g
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t) - {_SHINGLE_K - 1}, 0)))
                 AS s(i)
    ),
    firstseen AS (
        SELECT g, MIN(doc_id) AS d0 FROM grams GROUP BY 1
    ),
    novel AS (
        SELECT d0 AS doc_id, COUNT(*) AS n_novel FROM firstseen GROUP BY 1
    ),
    tot AS (
        SELECT doc_id, COUNT(*) AS n_shingles FROM grams GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(t.n_shingles AS BIGINT)           AS n_shingles,
           CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
           ROUND(COALESCE(nv.n_novel, 0) * 1.0 / t.n_shingles, 6)
               AS novelty_frac
    FROM tot t LEFT JOIN novel nv USING (doc_id)
    WHERE t.n_shingles > 0
    """,
)
def q_doc_novelty_fraction(spark, sf_dir):
    """Per-document novelty: the fraction of a doc's DISTINCT word
    3-shingles that no lower-numbered document contains — i.e. the
    content this doc introduced to the corpus, under doc_id as the
    ingestion order.

    The naive formulation joins every (doc, shingle) pair back to a
    first-seen table — a gram-scale shuffle join. The min-owner
    decomposition avoids it: ``first_seen(g) = min(doc_id)`` attributes
    each shingle to exactly one doc, so ``n_novel(d) = |{{g :
    min_owner(g) = d}}|`` falls out of a COUNT over the (vocab-sized)
    first-seen table, and the only join is doc-level totals × doc-level
    novel counts. The exploded distinct-shingle table is
    localCheckpoint'd once and shared by both aggregates
    (boilerplate_ngram_coverage's shared-subtree pattern). Docs shorter
    than 3 tokens have no shingles and are excluded (guard in
    word_shingles). Exact-int division, rounded 6dp for uniformity with
    the other coverage fractions."""
    from .operators.dedup import _spread

    docs = _spread(load_table(spark, sf_dir, "documents"))
    gd = docs.select(
        "doc_id",
        F.explode(word_shingles(ws_tokens(F.col("text")), _SHINGLE_K)).alias("g"),
    ).localCheckpoint()
    firstseen = gd.groupBy("g").agg(F.min("doc_id").alias("d0"))
    novel = firstseen.groupBy(F.col("d0").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    tot = gd.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    return (
        tot.join(novel, "doc_id", "left")
        .filter(F.col("n_shingles") > 0)
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)) * F.lit(1.0)
                / F.col("n_shingles"),
                6,
            ).alias("novelty_frac"),
        )
    )


_OUTLIER_K = 3


@register(
    "label_embedding_outliers",
    f"""
    WITH ex AS (
        SELECT vec_id, label, CAST(u.pos - 1 AS INTEGER) AS pos,
               CAST(ROUND(CAST(u.val AS DOUBLE) * 1000000) AS BIGINT) AS q
        FROM (
            SELECT vec_id, label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ) u(vec_id, label, val, pos)
    ),
    cen AS (
        SELECT label, pos,
               CAST(SUM(q) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ex GROUP BY 1, 2
    ),
    d AS (
        SELECT e.vec_id, e.label,
               SUM(CAST(c.n * e.q - c.s AS HUGEINT)
                   * (c.n * e.q - c.s)) AS d2,
               MAX(c.n) AS n
        FROM ex e JOIN cen c ON e.label = c.label AND e.pos = c.pos
        GROUP BY 1, 2
    ),
    r AS (
        SELECT label, vec_id, d2, n,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY d2 DESC, vec_id) AS nn_rank
        FROM d
    )
    SELECT label, nn_rank, vec_id,
           CAST(d2 AS DOUBLE)
               / (CAST(n * n AS DOUBLE) * 1000000000000.0) AS dist2
    FROM r WHERE nn_rank <= {_OUTLIER_K}
    """,
)
def q_label_embedding_outliers(spark, sf_dir):
    """Top-3 vectors farthest (squared Euclidean) from their label's
    centroid — the mislabeled/out-of-distribution audit list a curator
    reviews per class.

    Exactness (label_centroid_distances' quantize-first discipline,
    registry_llm2.py): values quantize to 1e-6 ints BEFORE aggregation;
    with s = Σq and n per (label, dim), the scaled squared distance
    Σ_dims (n·q − s)² is an exact integer — it clears the rational
    centroid q̄ = s/n without ever forming a float — accumulated in
    DECIMAL(38)/HUGEINT (n·q ≈ 10¹³ squares past int64 at corpus
    scale). Ranking compares those exact integers (ties broken by
    vec_id), so the top-k set is deterministic in both engines; the
    reported dist2 rescales by 1/(n²·10¹²) via identical cast/multiply/
    divide chains on identical wide ints — emitted raw.

    Plan: posexplode → (label, dim) centroid aggregate (|labels|·|dim|
    rows, BROADCAST back to the exploded side — no gram-scale shuffle
    join), one vec_id aggregate, one |vecs|-row ranking window. Output
    is |labels|·3 rows at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id", "label", "pos",
        F.round(F.col("val").cast("double") * 1000000, 0)
        .cast("long")
        .alias("q"),
    )
    cen = ex.groupBy("label", "pos").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    dev = (F.col("n") * F.col("q") - F.col("s")).cast("decimal(38,0)")
    d = (
        ex.join(F.broadcast(cen), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(dev * dev).alias("d2"), F.max("n").alias("n"))
    )
    w = Window.partitionBy("label").orderBy(
        F.col("d2").desc(), F.col("vec_id")
    )
    r = d.withColumn("nn_rank", F.row_number().over(w))
    return r.filter(F.col("nn_rank") <= _OUTLIER_K).select(
        "label", "nn_rank", "vec_id",
        (
            F.col("d2").cast("double")
            / ((F.col("n") * F.col("n")).cast("double") * F.lit(1.0e12))
        ).alias("dist2"),
    )


@register(
    "lang_trigram_similarity",
    r"""
    WITH s AS (
        SELECT lang, lower(text) AS s FROM documents
    ),
    tri AS (
        SELECT lang, substr(s, CAST(u.i AS INTEGER), 3) AS g
        FROM s, UNNEST(generate_series(1, greatest(length(s) - 2, 0)))
             AS u(i)
    ),
    prof AS (
        SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS n
        FROM tri GROUP BY 1, 2
    ),
    norms AS (
        SELECT lang, SUM(CAST(n AS HUGEINT) * n) AS n2 FROM prof GROUP BY 1
    ),
    dots AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               SUM(CAST(a.n AS HUGEINT) * b.n) AS dot
        FROM prof a JOIN prof b ON a.g = b.g AND a.lang < b.lang
        GROUP BY 1, 2
    )
    SELECT d.lang_a, d.lang_b,
           CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               AS trigram_cosine
    FROM dots d
    JOIN norms na ON d.lang_a = na.lang
    JOIN norms nb ON d.lang_b = nb.lang
    """,
)
def q_lang_trigram_similarity(spark, sf_dir):
    """Pairwise cosine similarity between per-language character-trigram
    frequency profiles — the classic n-gram language model distance
    (Cavnar–Trenkle): languages whose corpora read alike (shared
    vocabulary, same script) score high, and the matrix audits whether
    the lang labels actually partition the corpus into distinct
    character distributions (lang_id_confusion's model-free sibling).

    Exactness: profiles are exact int64 counts per (lang, trigram); dot
    products and norms accumulate count products in DECIMAL(38)/HUGEINT
    (corpus-scale counts square past int64), and the cosine closes with
    sqrt·sqrt-multiply-divide on the correctly-rounded wide→double
    casts — single IEEE ops on identical inputs, emitted raw.

    Plan: the trigram explode is the corpus-chars pass (bounded-cost
    interpreted HOF, same budget class as the shingle ops); after the
    (lang, trigram) aggregate everything is |langs|·|charset³|-bounded —
    the pair join runs on the PROFILE table, never on documents. Short
    texts (<3 chars) contribute nothing via the sequence guard."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select("lang", F.lower(F.col("text")).alias("s"))
    # substring's start must be dynamic per element -> SQL lambda form
    # (python F.substring takes a literal start); CASE guards short text
    # against sequence()'s descending-default trap (ADVICE r4)
    tri = s.select(
        "lang",
        F.explode(
            F.expr(
                "transform("
                "  CASE WHEN length(s) >= 3"
                "       THEN sequence(1, length(s) - 2)"
                "       ELSE array() END,"
                "  i -> substring(s, i, 3))"
            )
        ).alias("g"),
    )
    prof = tri.groupBy("lang", "g").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    nd = F.col("n").cast("decimal(38,0)")
    norms = prof.groupBy("lang").agg(F.sum(nd * nd).alias("n2"))
    a = prof.select(F.col("lang").alias("lang_a"), "g", F.col("n").alias("na"))
    b = prof.select(
        F.col("lang").alias("lang_b"), F.col("g").alias("gb"),
        F.col("n").alias("nb"),
    )
    dots = (
        a.join(b, (a.g == b.gb) & (F.col("lang_a") < F.col("lang_b")))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.sum(
                F.col("na").cast("decimal(38,0)")
                * F.col("nb").cast("decimal(38,0)")
            ).alias("dot")
        )
    )
    na = norms.select(F.col("lang").alias("la"), F.col("n2").alias("na2"))
    nb2 = norms.select(F.col("lang").alias("lb"), F.col("n2").alias("nb2"))
    return (
        dots.join(F.broadcast(na), F.col("lang_a") == F.col("la"))
        .join(F.broadcast(nb2), F.col("lang_b") == F.col("lb"))
        .select(
            "lang_a", "lang_b",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
            ).alias("trigram_cosine"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash-LSH band calibration (geometry observability)
# ---------------------------------------------------------------------------


def _band_calibration_oracle() -> str:
    from .registry_llm import _MINHASH_CTES

    return (
        "WITH "
        + _MINHASH_CTES
        + """,
    buckets AS (
        SELECT band, band_sig, COUNT(*) AS m
        FROM banded GROUP BY 1, 2
    )
    SELECT CAST(band AS INTEGER)            AS band,
           CAST(COUNT(*) AS BIGINT)         AS n_buckets,
           CAST(SUM(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                                            AS n_collision_buckets,
           CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS candidate_pairs,
           CAST(MAX(m) AS BIGINT)           AS max_bucket
    FROM buckets GROUP BY 1
    """
    )


@register("minhash_band_calibration", _band_calibration_oracle())
def q_minhash_band_calibration(spark, sf_dir):
    """Per-band health report of the MinHash-LSH index that
    dedup_minhash_lsh queries: bucket count, collision-bucket count,
    candidate-pair mass Σ m·(m−1)/2, and the largest bucket — the
    numbers an operator watches to size the geometry BEFORE a scale
    cliff (NOTES r4: the ×43 near-pairs cliff was exactly
    candidate_pairs going quadratic; max_bucket nearing the
    bucket_pairs cap is the widen-planes signal, candidate_pairs far
    below corpus size means the bands are too fine and recall is
    leaking).

    Same signature/banding derivation as the dedup queries (shared
    _MINHASH CTEs in the oracle, minhash_banded on the Spark side), so
    the report describes the index actually used. All counts are exact
    ints; output is |bands| rows at any corpus size, and the only work
    beyond signature computation is one (band, band_sig) aggregate —
    the index table's own grain."""
    from .operators.dedup import minhash_banded

    docs = load_table(spark, sf_dir, "documents")
    banded = minhash_banded(docs, k=3, num_hashes=16, bands=4)
    buckets = banded.groupBy("band", "band_sig").agg(
        F.count(F.lit(1)).alias("m")
    )
    m = F.col("m")
    return buckets.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.when(m >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_collision_buckets"),
        F.sum((m * (m - 1) / 2).cast("long")).cast("bigint").alias(
            "candidate_pairs"
        ),
        F.max(m).cast("bigint").alias("max_bucket"),
    ).select(
        F.col("band").cast("int").alias("band"),
        "n_buckets", "n_collision_buckets", "candidate_pairs", "max_bucket",
    )


# ---------------------------------------------------------------------------
# Cross-source duplication clusters (syndication audit)
# ---------------------------------------------------------------------------


def _cross_source_oracle() -> str:
    from .registry_llm import _MINHASH_CAND_SELECT, _MINHASH_CTES

    return (
        "WITH RECURSIVE "
        + _MINHASH_CTES
        + """,
    cand AS ("""
        + _MINHASH_CAND_SELECT
        + """),
    sym AS (
        SELECT doc_a AS u, doc_b AS v FROM cand
        UNION
        SELECT doc_b, doc_a FROM cand
    ),
    reach(node, r) AS (
        SELECT u, u FROM sym
        UNION
        SELECT s.u, re.r FROM sym s JOIN reach re ON s.v = re.node
    ),
    cc AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY 1)
    SELECT cc.cluster_id,
           CAST(COUNT(*) AS BIGINT)                 AS n_members,
           CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
           array_to_string(list_sort(list_distinct(list(d.source))), ',')
                                                    AS sources,
           COUNT(DISTINCT d.source) >= 2            AS cross_source
    FROM cc JOIN documents d ON cc.doc_id = d.doc_id
    GROUP BY 1
    """
    )


@register("dedup_cross_source_clusters", _cross_source_oracle())
def q_dedup_cross_source_clusters(spark, sf_dir):
    """Near-dup clusters annotated with their SOURCE spread: a cluster
    whose members span ≥2 sources is syndication / mirroring (dedup
    should keep one copy corpus-WIDE, and per-source dedup rates
    under-count it), while single-source clusters are self-recycling
    feeds (dedup_rate_by_source's territory). The source-resolved
    rollup of dedup_clusters, composing the same connected components
    with the documents dim.

    Plan: CC runs over LSH candidates (banded, bounded); the rollup
    joins cluster ids to documents on doc_id (one co-partitioned join)
    and aggregates |clusters| rows. The sources list is sorted before
    joining so the string is deterministic in both engines."""
    from .operators.dedup import minhash_lsh_candidates
    from .operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(docs, k=3, num_hashes=16, bands=4)
    cc = connected_components(cand).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    return (
        cc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.array_join(
                F.array_sort(F.collect_set("source")), ","
            ).alias("sources"),
            (F.countDistinct("source") >= 2).alias("cross_source"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash estimator calibration: signature-agreement vs exact Jaccard
# ---------------------------------------------------------------------------


def _minhash_calibration_oracle() -> str:
    from .registry_llm import _MINHASH_CAND_SELECT, _MINHASH_CTES

    return (
        "WITH "
        + _MINHASH_CTES
        + """,
    cand AS ("""
        + _MINHASH_CAND_SELECT
        + """),
    agree AS (
        SELECT c.doc_a, c.doc_b,
               SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                   AS n_agree
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.doc_a
        JOIN sig sb ON sb.doc_id = c.doc_b AND sb.hash_idx = sa.hash_idx
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT g.doc_a, g.doc_b,
           CAST(g.n_agree AS BIGINT) AS n_agree,
           g.n_agree / 16.0          AS est_jaccard,
           ROUND(COALESCE(i.n_common, 0) * 1.0
                 / (sa.n + sb.n - COALESCE(i.n_common, 0)), 6)
                                     AS exact_jaccard,
           abs(g.n_agree / 16.0
               - ROUND(COALESCE(i.n_common, 0) * 1.0
                       / (sa.n + sb.n - COALESCE(i.n_common, 0)), 6))
                                     AS abs_err
    FROM agree g
    LEFT JOIN inter i ON g.doc_a = i.doc_a AND g.doc_b = i.doc_b
    JOIN sizes sa ON g.doc_a = sa.doc_id
    JOIN sizes sb ON g.doc_b = sb.doc_id
    """
    )


@register("minhash_estimate_calibration", _minhash_calibration_oracle())
def q_minhash_estimate_calibration(spark, sf_dir):
    """Estimator-calibration audit for the MinHash family: per LSH
    candidate pair, the signature-agreement Jaccard ESTIMATE
    (agreeing positions / 16 — the unbiased estimator banding theory is
    built on) next to the EXACT shingle Jaccard, with the absolute
    error. This is the query that justifies the 16-hash geometry with
    data (E[err] ≈ √(J(1−J)/16) ≈ 0.12 worst case): run it after any
    num_hashes/bands change and the error column says whether the
    estimator still supports the banding thresholds.

    minhash_band_calibration watches the INDEX (bucket geometry); this
    watches the ESTIMATOR — together they are the LSH observability
    pair. Exactness: n_agree and n_common are exact ints; est and exact
    are single divisions (exact rounded 6dp per the jaccard-family
    convention) and abs_err one subtraction of the two — identical IEEE
    ops both engines, emitted raw. All joins run over candidate pairs
    and the 16-row-per-doc signature table only; the shingle table is
    localCheckpoint'd once and shared (jaccard_lsh_verified's plan)."""
    from .operators.dedup import (
        _doc_shingles,
        _minhash_mins,
        minhash_lsh_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs, 3).localCheckpoint(eager=True)
    cand = minhash_lsh_candidates(
        docs, k=3, num_hashes=16, bands=4, shingles=sh
    )
    # r12 (guide §2.3): signature agreement per pair via the WIDE per-doc
    # signature (one 16-element array row per doc) — the long-format
    # formulation fanned every candidate ×16 signature rows through a
    # (doc_b, hash_idx) join and re-grouped; zip_with over the two arrays
    # counts the same agreeing positions with two one-row-per-doc joins
    # and no re-aggregation. Docs with no shingles drop out of the wide
    # table exactly as they dropped out of the long signatures.
    mins = _minhash_mins(docs, 3, 16, sh)
    arr = mins.select(
        "doc_id",
        F.array(*[F.col(f"__mh{i}") for i in range(16)]).alias("__sig"),
    )
    wa = arr.select(F.col("doc_id").alias("doc_a"), F.col("__sig").alias("__sa"))
    wb = arr.select(F.col("doc_id").alias("doc_b"), F.col("__sig").alias("__sb"))
    agree = (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.aggregate(
                F.zip_with(
                    "__sa", "__sb",
                    lambda a, b: F.when(a == b, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("n_agree"),
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sza = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    szb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    exact = F.round(nc * 1.0 / (F.col("na") + F.col("nb") - nc), 6)
    est = F.col("n_agree") / F.lit(16.0)
    return (
        agree.join(inter, ["doc_a", "doc_b"], "left")
        .join(sza, "doc_a")
        .join(szb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.col("n_agree").cast("bigint").alias("n_agree"),
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
            F.abs(est - exact).alias("abs_err"),
        )
    )


@register("semantic_dedup")
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup semantic dedup over the embeddings corpus (one decision
    row per vector; filter(is_kept) = deduplicated corpus).

    Rows-only BY DESIGN: the k-means quantizer is iterative (not
    SQL-expressible); row count is pinned to corpus size by construction.
    Oracled exact twin: ``embedding_near_pairs`` (same 0.35 cosine
    threshold — its all-pairs edge set is the superset every within-
    cluster dup edge must come from; soundness + planted-twin recall
    certificates in tests/test_llm_ops3.py).
    """
    from .operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_clusters=16, threshold=0.35).select(
        "vec_id", "cluster", "centroid_sim", "group_id", "keep_id", "is_kept"
    )


# ---------------------------------------------------------------------------
# Corpus datacard: the one-row summary a training-data release ships with
# ---------------------------------------------------------------------------


@register(
    "corpus_datacard",
    r"""
    WITH aug AS (
        -- planted positives: the corpus has no natural exact dups, so
        -- docs 0..19 are re-added under offset ids (mirrored in the
        -- engine) to keep the dup-counting path non-vacuous
        SELECT doc_id, lang, source, n_chars, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, lang, source, n_chars, text
        FROM documents WHERE doc_id < 20
    ),
    fp AS (
        SELECT doc_id, lang, source, n_chars,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                   AS fingerprint
        FROM aug
    ),
    groups AS (
        SELECT fingerprint, COUNT(*) AS n FROM fp GROUP BY 1
    ),
    med AS (
        -- exact x2 median of n_chars: sum of the two middle order stats
        -- (equal for odd counts) — integer-exact on both engines
        SELECT CAST(SUM(n_chars) AS BIGINT) AS med2
        FROM (
            SELECT n_chars,
                   ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM fp
        )
        WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) * 1.0 / COUNT(*) AS mean_chars,
           CAST(MAX(med.med2) AS DOUBLE) / 2 AS median_chars,
           CAST((SELECT COUNT(*) FROM groups WHERE n > 1) AS BIGINT)
               AS dup_groups,
           CAST((SELECT COALESCE(SUM(n - 1), 0) FROM groups WHERE n > 1)
                AS BIGINT) AS redundant_docs,
           CAST((SELECT COALESCE(SUM(n - 1), 0) FROM groups WHERE n > 1)
                AS BIGINT) * 1.0 / COUNT(*) AS dup_rate
    FROM fp, med
    GROUP BY med.med2
    """,
)
def q_corpus_datacard(spark, sf_dir):
    """The datacard row a corpus release ships with: size, coverage,
    central tendency, and exact-duplicate redundancy in ONE result —
    the composition a curation pipeline runs after every rebuild (each
    piece reuses a registered primitive: doc_fingerprints' normalized
    md5, dedup_exact_groups' group counting, the ×2-integer median
    idiom from robust_price_anomalies). Docs 0..19 are re-planted under
    offset ids on BOTH sides so the dup fields are never vacuously zero
    (the corpus has no natural exact dups — same pattern as
    source_fingerprint_overlap).

    Exactness: counts and sums are int64; mean and dup_rate are ONE
    double division of exact integers; the median is the sum of the two
    middle order statistics (equal when n is odd) divided by 2 — a
    single halving of an exact integer, bit-identical across engines.
    No rounding anywhere.

    Plan: one documents scan feeds the fingerprint projection; the dup
    aggregate groups on the 32-hex digest (high-cardinality, unskewed);
    the median costs one additional ordered pass (global row_number —
    acceptable because the datacard is a REPORT run once per rebuild,
    not a hot-path operator; the two-phase enumerate machinery is the
    scale path if it ever becomes one). Everything downstream of the
    scan is metadata-sized."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text"
    )
    aug = docs.unionAll(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "lang", "source", "n_chars", "text",
        )
    )
    fp = aug.select(
        "doc_id", "lang", "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("fingerprint"),
    )
    groups = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("n"))
    dups = groups.filter(F.col("n") > 1).agg(
        F.count(F.lit(1)).alias("dup_groups"),
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias(
            "redundant_docs"
        ),
    )
    wn = Window.orderBy("n_chars", "doc_id")
    med = (
        fp.select(
            "n_chars",
            F.row_number().over(wn).alias("rn"),
            F.count(F.lit(1)).over(
                Window.partitionBy()
            ).alias("n"),
        )
        .filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("(n + 2) div 2"))
        )
        .agg(F.sum("n_chars").alias("med2"))
    )
    base = fp.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    return (
        base.crossJoin(F.broadcast(dups))
        .crossJoin(F.broadcast(med))
        .select(
            "n_docs", "total_chars", "n_langs", "n_sources",
            (
                F.col("total_chars") * F.lit(1.0) / F.col("n_docs")
            ).alias("mean_chars"),
            (F.col("med2").cast("double") / F.lit(2)).alias(
                "median_chars"
            ),
            F.col("dup_groups").cast("long").alias("dup_groups"),
            F.col("redundant_docs").cast("long").alias("redundant_docs"),
            (
                F.col("redundant_docs") * F.lit(1.0) / F.col("n_docs")
            ).alias("dup_rate"),
        )
    )

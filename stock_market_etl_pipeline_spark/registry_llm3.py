r"""LLM-data-pipeline operators, part 3: weighted corpus sampling,
sparse lexical similarity, and quantized embedding search.

Three curation surfaces a training-data team needs beyond the dedup /
dense-ANN families already registered:

- ``priority_sample_docs`` — deterministic weighted sampling (Duffield
  priority sampling) with an unbiased subset-sum estimator: THE way to
  downsample a 100 TB corpus to a quality-weighted subset while keeping
  an auditable estimate of the mass you kept.
- ``tfidf_shingle_pairs`` — sparse vector similarity over an inverted
  index (posting-list pair expansion, integer-quantized idf): the
  LEXICAL complement to embedding_near_pairs — catches template/
  boilerplate similarity that dense embeddings smooth over.
- ``embedding_quantized_topk`` — int8 scalar quantization + exact
  integer cosine: 4× less scan/shuffle IO than float32 brute force,
  recall certified against the exact baseline.

Float policy (oracles.py): priorities are ONE double division of
bit-identical inputs (raw); cosines are exact-integer dots/norms closed
by sqrt/mul/div (NOTES rule 11 single-op chain) and ranked at 6dp with
id tiebreaks; weights/counts are exact int64.

The reference has none of these (its similarity surface is
pandas-windowed price math, ``src/transform.py``); all three are the
brief's training-data extension scope.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.text import md5_hash60, ws_tokens, word_shingles_all
from .operators.sampling import priority_sample
from .operators.similarity import quantized_cosine_topk
from .registry import register
from .sources.tables import load_table


# ---------------------------------------------------------------------------
# Priority sampling (weighted sample without replacement + estimator)
# ---------------------------------------------------------------------------

_PRIO_K = 64
_TWO_60_SQL = "1152921504606846976.0"  # 2^60 — exact double


@register(
    "priority_sample_docs",
    f"""
    WITH w AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
               CAST(n_chars AS DOUBLE) /
               ((('0x' || substr(md5('prio|' || doc_id), 1, 15))::BIGINT + 1)
                   / {_TWO_60_SQL}) AS priority
        FROM documents
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY priority DESC, doc_id) AS rn
        FROM w
    ),
    tau AS (SELECT priority AS tau FROM r WHERE rn = {_PRIO_K + 1})
    SELECT doc_id, source, weight, priority,
           GREATEST(CAST(weight AS DOUBLE), tau) AS est_weight
    FROM r, tau WHERE rn <= {_PRIO_K}
    """,
)
def q_priority_sample_docs(spark, sf_dir):
    """Quality-weighted corpus sample: {k} documents drawn by priority
    sampling with weight = n_chars, plus the max(w, τ) estimator column
    whose sum unbiasedly estimates total corpus mass (certified over
    salts in tests/test_llm_ops3.py).

    Plan: one scan + distributed top-(k+1) (TakeOrderedAndProject); τ
    and the estimator derive from the checkpointed (k+1)-row frame — no
    global sort, no second scan (operators/sampling.py). The oracle's
    unpartitioned ROW_NUMBER is DuckDB-side only.
    """
    docs = load_table(spark, sf_dir, "documents")
    return priority_sample(
        docs, weight_col="n_chars", k=_PRIO_K, keep_cols=("source",)
    )


# ---------------------------------------------------------------------------
# Sparse tf-idf similarity over an inverted index
# ---------------------------------------------------------------------------

_TFIDF_K = 4            # word-shingle width (terms are 4-gram windows)
_TFIDF_DF_CAP = 50      # stop-term cap: drop terms in > 50 docs
_TFIDF_IW_CAP = 1 << 20  # integer-idf clip (keeps wt products in int64)
_TFIDF_PLANT_N = 30     # docs 0..29 replanted with the last 5 tokens cut
_TFIDF_TOPN = 50

_TFIDF_CORPUS_CTE = r"""
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id,
               array_to_string(list_slice(
                   string_split_regex(trim(text), '\s+'), 1,
                   greatest(len(string_split_regex(trim(text), '\s+')) - 5,
                            0)), ' ') AS text
        FROM documents WHERE doc_id < 30
    )
"""


@register(
    "tfidf_shingle_pairs",
    "WITH "
    + _TFIDF_CORPUS_CTE
    + rf""",
    toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM corpus
    ),
    tf AS (
        SELECT doc_id,
               ('0x' || substr(md5(array_to_string(
                   t[i:i+{_TFIDF_K - 1}], ' ')), 1, 15))::BIGINT AS term,
               CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks, UNNEST(generate_series(
            1, greatest(len(t) - {_TFIDF_K - 1}, 0))) AS g(i)
        GROUP BY 1, 2
    ),
    dfreq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY 1 HAVING COUNT(*) <= {_TFIDF_DF_CAP}
    ),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM corpus),
    wt AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * least(n_docs // df, {_TFIDF_IW_CAP}) AS wt
        FROM tf JOIN dfreq USING (term), nd
    ),
    norms AS (SELECT doc_id, SUM(wt * wt) AS norm2 FROM wt GROUP BY 1),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.wt * b.wt) AS dot,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM wt a JOIN wt b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared,
           ROUND(CAST(dot AS DOUBLE) /
                 (sqrt(CAST(na.norm2 AS DOUBLE)) *
                  sqrt(CAST(nb.norm2 AS DOUBLE))), 6) AS cosine
    FROM dots
    JOIN norms na ON dots.doc_a = na.doc_id
    JOIN norms nb ON dots.doc_b = nb.doc_id
    ORDER BY cosine DESC, doc_a, doc_b LIMIT {_TFIDF_TOPN}
    """,
)
def q_tfidf_shingle_pairs(spark, sf_dir):
    """Sparse lexical similarity: top-{N} document pairs by tf-idf cosine
    over hashed 4-gram shingle terms — the inverted-index path (posting
    lists, NOT an all-pairs join).

    Scale shape: terms are hashed to 60 bits BEFORE the exchange (the
    span_duplication_rate lesson — 8-byte shuffle keys); the stop-term
    cap df ≤ {cap} bounds posting lists so pair fan-out per term is
    ≤ C({cap},2) independent of corpus size; pair expansion is ONE
    grouped pass (sorted posting list + i<j explode — the bucket_pairs
    shape, weights carried in structs, no self-join of the weighted
    term table); the weighted-term table is localCheckpoint-materialized
    once and shared by the norm and dot branches (the corpus_prep
    lesson).

    Exactness: idf is integer-quantized (⌊N/df⌋, clipped at 2^20) so
    dots and norms are exact integers summed in DECIMAL(38)/HUGEINT;
    the cosine closes with cast → sqrt·sqrt → mul → div (correctly
    rounded single ops, NOTES rule 11) and ranks at 6dp with id
    tiebreaks. The raw corpus has no natural near-dup docs, so docs
    0..29 are replanted with the last 5 tokens cut (oracle-mirrored) —
    the top of the ranking is the planted pairs, asserted non-vacuous
    in tests/test_llm_ops3.py.
    """
    from .operators.dedup import _spread

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = ws_tokens(F.col("text"))
    plant = docs.filter(F.col("doc_id") < _TFIDF_PLANT_N).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(
            F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(0))), " "
        ).alias("text"),
    )
    corpus = docs.unionByName(plant)
    tf = (
        _spread(corpus)
        .select(
            "doc_id",
            F.explode(
                word_shingles_all(ws_tokens(F.col("text")), _TFIDF_K)
            ).alias("sh"),
        )
        .select("doc_id", md5_hash60(F.col("sh")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _TFIDF_DF_CAP)
    )
    n_docs = corpus.agg(F.countDistinct("doc_id").alias("n_docs"))
    wt = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.least(F.expr("n_docs div df"), F.lit(_TFIDF_IW_CAP))
            ).alias("wt"),
        )
        .localCheckpoint(eager=True)
    )
    norms = wt.groupBy("doc_id").agg(
        F.sum((F.col("wt") * F.col("wt")).cast("decimal(38,0)")).alias(
            "norm2"
        )
    )
    posts = (
        wt.groupBy("term")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "wt"))).alias(
                "ms"
            )
        )
        .filter(F.size("ms") >= 2)
    )
    pairs = (
        posts.select(
            "ms", F.posexplode("ms").alias("i", "a")
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.wt").alias("wt_a"),
            F.explode(
                F.slice(F.col("ms"), F.col("i") + 2, F.size("ms"))
            ).alias("b"),
        )
        .select(
            "doc_a",
            "wt_a",
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.wt").alias("wt_b"),
        )
    )
    dots = pairs.groupBy("doc_a", "doc_b").agg(
        F.sum((F.col("wt_a") * F.col("wt_b")).cast("decimal(38,0)")).alias(
            "dot"
        ),
        F.count(F.lit(1)).alias("n_shared"),
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("norm2").alias("na2")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("norm2").alias("nb2")
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_a", "doc_b")
        .limit(_TFIDF_TOPN)
    )


# ---------------------------------------------------------------------------
# int8-quantized embedding search
# ---------------------------------------------------------------------------

@register(
    "embedding_quantized_topk",
    """
    WITH emb AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    qv AS (
        SELECT vec_id,
               list_transform(v, x ->
                   CAST(floor(x * 127.0 / s + 0.5) AS BIGINT)) AS q
        FROM (SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x))) AS s
              FROM emb)
        WHERE s > 0
    ),
    qq AS (SELECT vec_id AS query_id, q AS qg FROM qv WHERE vec_id < 10),
    scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ROUND(CAST(list_sum(
                         list_transform(e.q, (x, i) -> x * qg[i]))
                         AS DOUBLE)
                     / (sqrt(CAST(list_sum(
                            list_transform(qg, x -> x * x)) AS DOUBLE))
                        * sqrt(CAST(list_sum(
                            list_transform(e.q, x -> x * x)) AS DOUBLE))),
                     6) AS score_q
        FROM qv e, qq WHERE e.vec_id != qq.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score_q DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, score_q, CAST(rn AS INTEGER) AS nn_rank
    FROM ranked WHERE rn <= 10
    """,
)
def q_embedding_quantized_topk(spark, sf_dir):
    """Brute-force cosine top-10 over int8-QUANTIZED vectors for query
    vectors vec_id < 10 — the 4×-less-IO variant of
    embedding_cosine_topk, with recall against that exact baseline
    certified in tests/test_llm_ops3.py.

    Quantization is ⌊x·127/s + 0.5⌋ per vector (s = max|x|): a
    mul→div→add→floor chain of correctly-rounded single ops that no
    engine can FMA-contract (the add follows a division), so the int8
    codes — and therefore the exact integer dots/norms and their
    sqrt/mul/div closure — are bit-identical across engines
    (operators/similarity.py quantize_int8).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_cosine_topk(emb, query_ids=list(range(10)), k=10)


# ---------------------------------------------------------------------------
# Subsampled-Hadamard JL projection (64 -> 16 dims)
# ---------------------------------------------------------------------------


@register(
    "embedding_hadamard_projection",
    """
    WITH ex AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               unnest(embedding) AS x
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, i,
               CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS qv
        FROM ex
    ),
    m AS (
        SELECT jj.j AS j, ii.i AS i,
               (1 - 2 * (bit_count(CAST(ii.i AS BIGINT)
                                   & CAST((jj.j * 19 + 7) % 64 AS BIGINT)) % 2))
               * (1 - 2 * (bit_count(CAST((ii.i * 2654435761) % 4294967296
                                          AS BIGINT)) % 2))
                   AS sign
        FROM (SELECT unnest(generate_series(0, 15)) AS j) jj,
             (SELECT unnest(generate_series(0, 63)) AS i) ii
    )
    SELECT q.vec_id,
           CAST(m.j AS BIGINT) AS out_dim,
           CAST(SUM(q.qv * m.sign) AS BIGINT) / 4000000.0 AS value
    FROM q JOIN m ON q.i = m.i
    GROUP BY 1, 2
    """,
)
def q_embedding_hadamard_projection(spark, sf_dir):
    """Registered 64→16 subsampled-Hadamard reduction of the embeddings
    table in long format (vec_id, out_dim, value) — the storage-side
    companion to the ANN family: 4× smaller vectors to scan, shuffle,
    and index, with the distortion certified against exact distances in
    tests/test_llm_ops3.py. See operators/similarity.hadamard_projection
    for the exact-integer arithmetic and plan notes.
    """
    from .operators.similarity import hadamard_projection

    return hadamard_projection(
        load_table(spark, sf_dir, "embeddings"), out_dims=16, dims=64
    )

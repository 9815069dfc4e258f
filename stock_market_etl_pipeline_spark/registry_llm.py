"""LLM-training-data-pipeline queries: dedup / similarity / text analysis
over the ``documents`` and ``embeddings`` tables (BASELINE.json north star;
these are first-class operators alongside the SURVEY §2 inventory).

Registered into the same registry as the parity queries. Oracle SQL for the
hash-based operators (MinHash/SimHash) is generated programmatically so the
60-bit md5 hash primitive stays byte-identical with functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.text import (
    BPE_ISH_PATTERN,
    LANG_PRIORITY,
    STOPWORDS,
    bpe_ish_tokens,
    normalized_fingerprint,
    stopword_hits,
    ws_tokens,
)
from .operators.dedup import (
    SIMHASH_BITS,
    exact_duplicate_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from .operators.similarity import (
    ann_topk_lsh,
    cosine_topk,
    embedding_near_pairs,
    embedding_near_pairs_lsh,
    ivf_topk,
    plane_signs,
)
from .registry import register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# Shared oracle fragments
# ---------------------------------------------------------------------------

_TOKS_CTE = r"""
toks AS (
    SELECT doc_id, text, lang, string_split_regex(trim(text), '\s+') AS t
    FROM documents
)
"""

# word 3-gram distinct shingles (k=3 → slice [i : i+2] inclusive in DuckDB)
_SHINGLES_CTE = _TOKS_CTE + r""",
sh AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
    FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)
)
"""

# Document-frequency cap for the inverted-index Jaccard join: a shingle
# appearing in more than this many documents is a stop-shingle — it carries
# no near-dup signal but fans the self-join out quadratically on one hot
# key. The cap bounds per-key join cost at scale; true near-dups share many
# RARE shingles, so the capped Jaccard still separates them (the cap is
# mirrored in the oracle CTE so the comparison stays bit-exact).
NGRAM_MAX_DOC_FREQ = 50

# capped shingles: relation `shc` = sh minus stop-shingles
_CAPPED_SHINGLES_CTE = _SHINGLES_CTE + f""",
kept AS (
    SELECT shingle FROM sh GROUP BY shingle
    HAVING COUNT(*) <= {NGRAM_MAX_DOC_FREQ}
),
shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN kept USING (shingle))
"""

_EMB_CTE = """
emb AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
)
"""

_DOT = "list_sum(list_transform({a}, (x, i) -> x * {b}[i]))"
_NORM = "sqrt(list_sum(list_transform({a}, x -> x * x)))"


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"ROUND({_DOT.format(a=a, b=b)} / "
        f"({_NORM.format(a=a)} * {_NORM.format(a=b)}), 6)"
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_SW = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


@register(
    "text_stats",
    "WITH " + _TOKS_CTE + rf"""
    SELECT doc_id,
           CAST(length(text) AS INTEGER)            AS n_chars_computed,
           CAST(len(t) AS INTEGER)                  AS n_tokens,
           CAST(len(list_distinct(t)) AS INTEGER)   AS n_distinct_tokens,
           ROUND(list_sum(list_transform(t, x -> length(x))) * 1.0
                 / len(t), 6)                       AS avg_token_len,
           ROUND(len(list_filter(t, x -> lower(x) IN ({_SW}))) * 1.0
                 / len(t), 6)                       AS stopword_ratio,
           CAST(len(regexp_extract_all(text,
                '{BPE_ISH_PATTERN}')) AS INTEGER)   AS n_bpe_tokens
    FROM toks
    """,
)
def q_text_stats(spark, sf_dir):
    """Text quality metrics: lengths, token counts, stopword ratio, BPE-ish
    lexer token count — all JVM-side expressions (functions/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    t = ws_tokens(F.col("text"))
    tok_lens = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars_computed"),
        F.size(t).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("int").alias("n_distinct_tokens"),
        F.round(tok_lens * 1.0 / F.size(t), 6).alias("avg_token_len"),
        F.round(
            stopword_hits(t, STOPWORDS["en"]) * 1.0 / F.size(t), 6
        ).alias("stopword_ratio"),
        F.size(bpe_ish_tokens(F.col("text"))).cast("int").alias("n_bpe_tokens"),
    )


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(t, x -> lower(x) IN ({words})))"


_LANG_CASE = "CASE\n"
for _lang in LANG_PRIORITY:
    _others = [
        _lang_score_sql(o) for o in LANG_PRIORITY if o != _lang
    ]
    _cond = " AND ".join(
        f"{_lang_score_sql(_lang)} >= {o}" for o in _others
    )
    _LANG_CASE += (
        f"  WHEN {_lang_score_sql(_lang)} > 0 AND {_cond} THEN '{_lang}'\n"
    )
_LANG_CASE += "  ELSE 'und' END"


@register(
    "lang_id",
    "WITH " + _TOKS_CTE + f"""
    SELECT doc_id, lang AS lang_label, {_LANG_CASE} AS lang_guess,
           ({_LANG_CASE}) = lang AS is_match
    FROM toks
    """,
)
def q_lang_id(spark, sf_dir):
    """Heuristic language ID: per-language stopword hit counts, argmax with
    a fixed priority order (en > de > fr > es), 'und' when no hits."""
    docs = load_table(spark, sf_dir, "documents")
    t = ws_tokens(F.col("text"))
    scores = {lang: stopword_hits(t, STOPWORDS[lang]) for lang in LANG_PRIORITY}
    guess = None
    for lang in reversed(LANG_PRIORITY):
        cond = (scores[lang] > 0)
        for other in LANG_PRIORITY:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        guess = (
            F.when(cond, F.lit(lang)).otherwise(guess)
            if guess is not None
            else F.when(cond, F.lit(lang)).otherwise(F.lit("und"))
        )
    # reversed loop ordering gives earlier-priority langs the outermost when
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        guess.alias("lang_guess"),
        (guess == F.col("lang")).alias("is_match"),
    )


@register(
    "doc_fingerprints",
    r"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprints(spark, sf_dir):
    """Normalized md5 fingerprint per document (the exact-dedup key)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", normalized_fingerprint(F.col("text")).alias("fingerprint")
    )


@register(
    "dedup_exact_groups",
    r"""
    SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        FROM documents
    )
    GROUP BY fingerprint HAVING COUNT(*) > 1
    """,
)
def q_dedup_exact_groups(spark, sf_dir):
    """Exact dedup: fingerprint groups with >1 member + survivor id."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicate_groups(docs).select(
        "fingerprint", "n_docs", "keep_doc_id"
    )


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------

@register(
    "dedup_ngram_jaccard",
    "WITH " + _CAPPED_SHINGLES_CTE + """,
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
           ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    """,
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Word-3-gram Jaccard near-dup pairs ≥ 0.5 (operators/dedup.py).

    Registered WITH the document-frequency cap (the scale-safe variant):
    stop-shingles above NGRAM_MAX_DOC_FREQ are dropped before the
    inverted-index self-join, bounding the per-key fan-out at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, k=3, threshold=0.5, max_doc_freq=NGRAM_MAX_DOC_FREQ
    )


_MINHASH_ORACLE = (
    "WITH " + _SHINGLES_CTE + """,
    idx AS (
        SELECT doc_id, shingle, i AS hash_idx
        FROM sh, UNNEST(generate_series(0, 15)) AS g(i)
    ),
    hashed AS (
        SELECT doc_id, hash_idx,
               ('0x' || substr(md5(hash_idx || '|' || shingle), 1, 15))::BIGINT AS h
        FROM idx
    ),
    sig AS (
        SELECT doc_id, hash_idx, MIN(h) AS minhash
        FROM hashed GROUP BY 1, 2
    ),
    banded AS (
        SELECT doc_id, hash_idx // 4 AS band,
               string_agg(minhash::VARCHAR, ':' ORDER BY hash_idx) AS band_sig
        FROM sig GROUP BY 1, 2
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.band_sig = b.band_sig
                 AND a.doc_id < b.doc_id
    """
)


@register("dedup_minhash_lsh", _MINHASH_ORACLE)
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash (16 hashes) + LSH (4 bands × 4 rows) candidate pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs, k=3, num_hashes=16, bands=4)


def _simhash_oracle() -> str:
    votes = ",\n".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    recombine = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    bits_per_band = SIMHASH_BITS // 4
    mask = (1 << bits_per_band) - 1
    return (
        "WITH " + _TOKS_CTE + f""",
    tok AS (
        SELECT DISTINCT doc_id, u.tk AS tok
        FROM toks, UNNEST(list_distinct(t)) AS u(tk)
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok
    ),
    votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
    sig AS (SELECT doc_id, {recombine} AS simhash FROM votes),
    chunks AS (
        SELECT doc_id, simhash, i AS band,
               (simhash >> (i * {bits_per_band})) & {mask} AS chunk
        FROM sig, UNNEST(generate_series(0, 3)) AS g(i)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sim_a, b.simhash AS sim_b
        FROM chunks a
        JOIN chunks b ON a.band = b.band AND a.chunk = b.chunk
                     AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """
    )


@register("dedup_simhash", _simhash_oracle())
def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (hamming ≤ 3) via banded hamming-LSH."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_distance=3, bands=4)


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------

@register(
    "embedding_cosine_topk",
    "WITH " + _EMB_CTE + f""",
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
    scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               {_cosine_sql('qv', 'v')} AS score
        FROM emb e, q WHERE e.vec_id != q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, score, CAST(rn AS INTEGER) AS nn_rank
    FROM ranked WHERE rn <= 10
    """,
)
def q_embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for query vectors vec_id < 10."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, query_ids=list(range(10)), k=10).select(
        "query_id", "neighbor_id", "score", F.col("rank").alias("nn_rank")
    )


@register(
    "embedding_near_pairs",
    "WITH " + _EMB_CTE + f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_cosine_sql('a.v', 'b.v')} AS score
    FROM emb a JOIN emb b ON a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.v', 'b.v')} >= 0.35
    """,
)
def q_embedding_near_pairs(spark, sf_dir):
    """Embedding-space near-duplicate pairs: cosine ≥ 0.35.

    The EXACT all-pairs baseline — small-sf oracle truth only. The
    registered scale path is ``embedding_near_pairs_lsh`` below (banded LSH
    candidates + exact verify, no all-pairs join); its recall against this
    query is asserted in tests/test_llm_ops.py.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs(emb, threshold=0.35)


# --- banded sign-LSH near-pairs: the scale-safe registered variant --------

_EMB_DIM = 64           # driver testdata embeddings are 64-dim (TESTDATA.md)
_LSH_SEED = 42
_LSH_BANDS = 16
_LSH_PLANES_PER_BAND = 4
_LSH_THRESHOLD = 0.45


def _signs_sql(plane: int) -> str:
    """DuckDB list literal of the ±1 plane — same md5-parity planes as the
    Spark expression (operators/similarity.py plane_signs)."""
    return "[" + ", ".join(
        "1.0" if s > 0 else "-1.0"
        for s in plane_signs(_LSH_SEED, plane, _EMB_DIM)
    ) + "]"


def _bucket_sql(first_plane: int, n_planes: int) -> str:
    """Packed sign-bit bucket over ``n_planes`` consecutive planes."""
    return " + ".join(
        f"(CASE WHEN list_sum(list_transform(v, (x, i) -> x * "
        f"{_signs_sql(first_plane + p)}[i])) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )


_NEAR_PAIRS_LSH_ORACLE = (
    "WITH " + _EMB_CTE + """,
    bb AS (
        """
    + "\n        UNION ALL\n        ".join(
        f"SELECT vec_id, {band} AS band, "
        f"CAST({_bucket_sql(band * _LSH_PLANES_PER_BAND, _LSH_PLANES_PER_BAND)}"
        f" AS INTEGER) AS bucket FROM emb"
        for band in range(_LSH_BANDS)
    )
    + f"""
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                           AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, {_cosine_sql('ea.v', 'eb.v')} AS score
    FROM cand
    JOIN emb ea ON ea.vec_id = id_a
    JOIN emb eb ON eb.vec_id = id_b
    WHERE {_cosine_sql('ea.v', 'eb.v')} >= {_LSH_THRESHOLD}
    """
)


@register("embedding_near_pairs_lsh", _NEAR_PAIRS_LSH_ORACLE)
def q_embedding_near_pairs_lsh(spark, sf_dir):
    """Scale-safe near-pairs: banded sign-LSH candidates (16 bands × 4
    planes) + exact cosine verify ≥ 0.45. The join is an equi-join on
    (band, bucket) — never a broadcast-nested-loop over the corpus
    (asserted in tests/test_plan_shapes.py). Deterministic md5-parity
    hyperplanes make it bit-exact against the DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs_lsh(
        emb,
        threshold=_LSH_THRESHOLD,
        n_bands=_LSH_BANDS,
        planes_per_band=_LSH_PLANES_PER_BAND,
        seed=_LSH_SEED,
        dim=_EMB_DIM,
    )


_ANN_PLANES = 6

_ANN_LSH_ORACLE = (
    "WITH " + _EMB_CTE + f""",
    bk AS (
        SELECT vec_id, v,
               CAST({_bucket_sql(0, _ANN_PLANES)} AS INTEGER) AS bucket
        FROM emb
    ),
    q AS (
        SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
        FROM bk WHERE vec_id < 10
    ),
    scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               {_cosine_sql('qv', 'e.v')} AS score
        FROM bk e JOIN q ON e.bucket = q.qbucket AND e.vec_id != q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, score, CAST(rn AS INTEGER) AS nn_rank
    FROM ranked WHERE rn <= 10
    """
)


@register("ann_lsh_topk", _ANN_LSH_ORACLE)
def q_ann_lsh_topk(spark, sf_dir):
    """ANN top-10 via sign-projection LSH buckets (6 planes) + exact rerank
    — the bucketed approximate path next to the brute-force
    ``embedding_cosine_topk`` baseline. Oracle-exact because the buckets are
    deterministic; recall vs brute force asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_lsh(
        emb, query_ids=list(range(10)), k=10, n_planes=_ANN_PLANES,
        dim=_EMB_DIM,
    ).select("query_id", "neighbor_id", "score", F.col("rank").alias("nn_rank"))


@register("ann_ivf_topk")  # no SQL oracle: KMeans quantizer (rows-only check)
def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN top-10: KMeans coarse quantizer, n_probe nearest clusters
    scanned per query, exact rerank inside the probed clusters. Not
    SQL-expressible (iterative KMeans) → driver records the weaker
    rows-only check; recall ≥ 0.5 vs brute force is asserted in
    tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, query_ids=list(range(5)), k=10, n_clusters=8, n_probe=4
    ).select("query_id", "neighbor_id", "score", F.col("rank").alias("nn_rank"))


@register(
    "corpus_prep",
    "WITH " + _CAPPED_SHINGLES_CTE + r""",
    quality AS (
        SELECT doc_id FROM toks
        WHERE len(t) >= 20 AND length(text) >= 100
    ),
    fp AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        FROM documents
    ),
    exact_survivors AS (
        SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    near_dropped AS (
        SELECT DISTINCT doc_b AS doc_id
        FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                   JOIN sizes sb ON doc_b = sb.doc_id
        WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
    )
    SELECT q.doc_id FROM quality q
    JOIN exact_survivors e ON q.doc_id = e.doc_id
    LEFT JOIN near_dropped d ON q.doc_id = d.doc_id
    WHERE d.doc_id IS NULL
    """,
)
def q_corpus_prep(spark, sf_dir):
    """Composite training-data prep pipeline: quality filter (length/token
    thresholds) → exact-dup removal (min-id survivor) → near-dup removal
    (drop the higher id of every Jaccard ≥ 0.5 pair). The flagship
    LLM-data flow: every stage is one of the standalone operators chained
    into a single lazy plan. Near-dup stage runs with the stop-shingle
    document-frequency cap (NGRAM_MAX_DOC_FREQ) — the scale-safe variant."""
    docs = load_table(spark, sf_dir, "documents")
    t = ws_tokens(F.col("text"))
    quality = docs.filter(
        (F.size(t) >= 20) & (F.length("text") >= 100)
    ).select("doc_id")
    fp = docs.select(
        "doc_id", normalized_fingerprint(F.col("text")).alias("f")
    )
    exact_survivors = fp.groupBy("f").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    near_dropped = (
        ngram_jaccard_pairs(
            docs, k=3, threshold=0.5, max_doc_freq=NGRAM_MAX_DOC_FREQ
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        quality.join(exact_survivors, "doc_id")
        .join(near_dropped, "doc_id", "left_anti")
    )

"""LLM-training-data-pipeline queries: dedup / similarity / text analysis
over the ``documents`` and ``embeddings`` tables (BASELINE.json north star;
these are first-class operators alongside the SURVEY §2 inventory).

Registered into the same registry as the parity queries. Oracle SQL for the
hash-based operators (MinHash/SimHash) is generated programmatically so the
60-bit md5 hash primitive stays byte-identical with functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.text import (
    BPE_ISH_PATTERN,
    LANG_PRIORITY,
    STOPWORDS,
    bpe_ish_tokens,
    md5_hash60,
    normalized_fingerprint,
    stopword_hits,
    word_shingles_all,
    ws_tokens,
)
from .operators.dedup import (
    SIMHASH_BITS,
    _doc_shingles,
    exact_duplicate_groups,
    plant_exact_duplicates,
    plant_prefix_duplicates,
    prefix_containment_pairs,
    jaccard_over_candidates,
    jaccard_pairs_from_buckets,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    shingle_buckets,
    simhash_near_pairs,
)
from .operators.similarity import (
    ann_topk_lsh,
    cosine_topk,
    embedding_near_pairs,
    embedding_near_pairs_lsh,
    ivf_topk,
    plane_signs,
    plant_near_duplicates,
    perturbation_constants,
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
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id, text
        FROM documents WHERE doc_id < 25
    )
    SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        FROM corpus
    )
    GROUP BY fingerprint HAVING COUNT(*) > 1
    """,
)
def q_dedup_exact_groups(spark, sf_dir):
    """Exact dedup: fingerprint groups with >1 member + survivor id.

    Runs over the corpus ∪ planted byte-identical twins of the first 25
    doc_ids (operators/dedup.plant_exact_duplicates, mirrored in the
    oracle CTE): the raw testdata has ZERO natural exact duplicates at
    every verify scale, so without planting this query would be vacuously
    green on an empty result. With planting it returns ≥1 group with the
    original id as survivor at every sf — the positive path is
    oracle-checked, not just pytest-fixtured.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = plant_exact_duplicates(docs, n=25, id_offset=10_000_000)
    return exact_duplicate_groups(corpus).select(
        "fingerprint", "n_docs", "keep_doc_id"
    )


@register(
    "dedup_prefix_containment",
    r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    trunc AS (
        SELECT doc_id + 2000000 AS doc_id,
               list_slice(t, 1,
                   GREATEST(CAST(ceil(len(t) / 2.0) AS INT), 8)) AS t
        FROM toks WHERE doc_id < 25
    ),
    corpus AS (
        SELECT doc_id, t FROM toks UNION ALL SELECT doc_id, t FROM trunc
    ),
    keyed AS (
        SELECT doc_id, t, len(t) AS n,
               md5(array_to_string(list_slice(t, 1, 8), ' ')) AS k
        FROM corpus
    )
    SELECT a.doc_id AS prefix_id, b.doc_id AS full_id,
           CAST(a.n AS BIGINT) AS len_prefix,
           CAST(b.n AS BIGINT) AS len_full
    FROM keyed a JOIN keyed b
      ON a.k = b.k AND a.n < b.n AND list_slice(b.t, 1, a.n) = a.t
    """,
)
def q_dedup_prefix_containment(spark, sf_dir):
    """Truncation-duplicate pairs: docs whose token sequence is a strict
    prefix of another doc (cut-off re-crawls, pagination tails — the
    containment family exact/Jaccard dedup both miss: a half-length
    truncation has Jaccard ≈ 0.5 against its source and a different
    fingerprint). Runs over the corpus ∪ planted half-length truncations
    of the first 25 doc_ids (operators/dedup.plant_prefix_duplicates,
    mirrored in the oracle CTE — guaranteed ground truth at every sf,
    per the dedup_exact_groups anti-vacuity precedent; the testdata also
    contains NATURAL containment pairs, found identically by both
    engines). Candidates keyed by first-8-token fingerprint, verified by
    exact array equality."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = plant_prefix_duplicates(docs, n=25, id_offset=2_000_000)
    return prefix_containment_pairs(corpus, prefix_key_tokens=8)


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


# MinHash signature chain over an existing `sh` (doc_id, shingle) relation —
# shared by the whole-corpus oracles below and the incremental batch-vs-
# corpus oracle (which swaps in its own planted-batch corpus for `sh`)
_MINHASH_FROM_SH = """
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
"""

_MINHASH_CTES = _SHINGLES_CTE + "," + _MINHASH_FROM_SH

_MINHASH_CAND_SELECT = """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.band_sig = b.band_sig
                 AND a.doc_id < b.doc_id
"""

_MINHASH_ORACLE = "WITH " + _MINHASH_CTES + _MINHASH_CAND_SELECT


@register("dedup_minhash_lsh", _MINHASH_ORACLE)
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash (16 hashes) + LSH (4 bands × 4 rows) candidate pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs, k=3, num_hashes=16, bands=4)


@register(
    "dedup_jaccard_lsh_verified",
    "WITH " + _MINHASH_CTES + """,
    cand AS (""" + _MINHASH_CAND_SELECT + """),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
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
def q_dedup_jaccard_lsh_verified(spark, sf_dir):
    """Candidates+verify near-dup (the 100 TB text path): MinHash-LSH
    banded candidates, then EXACT shingle-Jaccard ≥ 0.5 computed only on
    candidate pairs — the full-corpus inverted-index self-join (and its
    stop-shingle skew surface) never exists in the plan.

    The shingle table is localCheckpoint-materialized once and shared by
    the signature, sizes, and both verify-join sides (the r2 plan
    re-exploded the corpus per branch: 5 scans / 10 shuffles)."""
    from .operators.dedup import _doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs, 3).localCheckpoint(eager=True)
    cand = minhash_lsh_candidates(docs, k=3, num_hashes=16, bands=4, shingles=sh)
    return jaccard_over_candidates(docs, cand, k=3, threshold=0.5, shingles=sh)


@register(
    "dedup_shared_spans",
    r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+19], ' ') AS gram
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 19, 0))) AS g(i)
    ),
    anchors AS (
        SELECT doc_id,
               ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gram_hash
        FROM grams
        WHERE ('0x' || substr(md5(gram), 1, 15))::BIGINT % 8 = 0
    ),
    kept AS (
        SELECT gram_hash FROM anchors GROUP BY 1 HAVING COUNT(*) <= 50
    ),
    a2 AS (
        SELECT a.doc_id, a.gram_hash
        FROM anchors a JOIN kept USING (gram_hash)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_anchors
    FROM a2 a JOIN a2 b ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def q_dedup_shared_spans(spark, sf_dir):
    """Substring/shared-span duplication: document pairs sharing at least
    one 20-token gram, detected via CONTENT-DEFINED anchor sampling
    (keep a gram iff md5_hash60(gram) % 8 == 0 — the suffix-array-dedup
    trick, Spark-style). Position/stride sampling would misalign when
    the shared span sits at different offsets in the two docs; content
    selection picks the SAME anchors inside any shared span. Catches the
    copied-paragraph / long-boilerplate-block duplication that set-based
    Jaccard underweights (a 30-token copied block in two long docs moves
    Jaccard by ~0) and exact dedup misses entirely. Anchor doc-frequency
    cap 50 applies the stop-shingle discipline to the pair phase;
    bucket_pairs keeps the candidate pass a grouped explode, not a
    self-join. Non-vacuous on the raw testdata: the corpus's natural
    long-prefix families share anchors at every sf."""
    from .operators.dedup import shared_span_pairs

    docs = load_table(spark, sf_dir, "documents")
    return shared_span_pairs(docs, span=20, mod=8, max_doc_freq=50)


@register(
    "span_duplication_rate",
    r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    pos AS (
        SELECT doc_id,
               ('0x' || substr(md5(array_to_string(t[i:i+19], ' ')), 1, 15))
                   ::BIGINT AS gram_hash
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 19, 0))) AS g(i)
    ),
    gd AS (
        SELECT gram_hash, COUNT(DISTINCT doc_id) AS nd, COUNT(*) AS n_occ
        FROM pos GROUP BY 1
    )
    SELECT CAST(SUM(n_occ) AS BIGINT) AS total_grams,
           CAST(SUM(CASE WHEN nd >= 2 THEN n_occ ELSE 0 END) AS BIGINT)
               AS cross_doc_grams,
           ROUND(SUM(CASE WHEN nd >= 2 THEN n_occ ELSE 0 END) * 1.0
                 / SUM(n_occ), 6) AS dup_rate
    FROM gd
    """,
)
def q_span_duplication_rate(spark, sf_dir):
    """Corpus duplication mass: the fraction of positional 20-token gram
    occurrences whose gram appears in MORE THAN ONE document — the
    aggregate 'how much of this corpus is copied text' number that
    decides whether a substring-dedup pass (dedup_shared_spans) is worth
    running before training. Two combinable aggregates (per-gram
    distinct-doc + occurrence counts, then one global roll-up): the
    shuffle carries one 8-byte row per gram occurrence — grams are
    HASHED to 60 bits BEFORE the exchange (an sf1→sf10 probe measured
    the full-string groupBy going ×12 for 10× rows: ~120-byte shuffle
    keys; hashing is mirrored in the oracle, and a 60-bit collision
    merging two gram counts is ~n²/2⁶⁰ — immaterial for a rate).
    Exact integer counts closed by a single division, rounded at 6dp."""
    from .operators.dedup import _spread

    docs = load_table(spark, sf_dir, "documents")
    pos = _spread(docs).select(
        "doc_id",
        F.explode(word_shingles_all(ws_tokens(F.col("text")), 20)).alias(
            "gram"
        ),
    ).select("doc_id", md5_hash60(F.col("gram")).alias("gram_hash"))
    gd = pos.groupBy("gram_hash").agg(
        F.countDistinct("doc_id").alias("nd"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    dup = F.sum(F.when(F.col("nd") >= 2, F.col("n_occ")).otherwise(0))
    return gd.agg(
        F.sum("n_occ").cast("long").alias("total_grams"),
        dup.cast("long").alias("cross_doc_grams"),
        F.round(dup * 1.0 / F.sum("n_occ"), 6).alias("dup_rate"),
    )


_INC_BATCH_OFFSET = 3_000_000

@register(
    "dedup_incremental_near",
    r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 3000000 AS doc_id,
               array_to_string(
                   list_slice(string_split_regex(trim(text), '\s+'), 1,
                       len(string_split_regex(trim(text), '\s+')) - 1),
                   ' ') AS text
        FROM documents WHERE doc_id < 25
    ),
    toks2 AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM corpus
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM toks2, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)
    ),"""
    + _MINHASH_FROM_SH
    + """,
    cand AS (
        SELECT DISTINCT b.doc_id AS doc_a, a.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.band_sig = b.band_sig
        WHERE a.doc_id >= 3000000 AND b.doc_id < 3000000
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
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
def q_dedup_incremental_near(spark, sf_dir):
    """Incremental NEAR-dedup: an arriving batch checked against the
    existing corpus without the corpus ever self-joining — the near-dup
    analog of `dedup_incremental`'s bucketed anti-join, and the op a
    daily-crawl curation pipeline actually runs at 100 TB (the corpus's
    banded MinHash index is persisted; each batch costs |batch|·bands
    bucket probes + exact Jaccard on its own candidates). Batch = planted
    drop-last-token twins of the first 25 doc_ids
    (operators/dedup.plant_near_text_batch, mirrored in the oracle CTE:
    Jaccard ≈ 0.9 vs their sources — near-dups, not exact). Candidates
    from `incremental_minhash_candidates` (batch→corpus band equi-join
    only), verified with exact shingle-Jaccard ≥ 0.5; the shared shingle
    table is localCheckpoint-materialized once across signature and
    verify stages (the corpus_prep trade, measured winning at sf1)."""
    from .operators.dedup import (
        _doc_shingles,
        incremental_minhash_candidates,
        minhash_banded,
        plant_near_text_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = plant_near_text_batch(docs, n=25, id_offset=_INC_BATCH_OFFSET)
    union = docs.select("doc_id", "text").unionByName(batch)
    sh = _doc_shingles(union, 3).localCheckpoint(eager=True)
    banded = minhash_banded(union, k=3, num_hashes=16, bands=4, shingles=sh)
    cand = incremental_minhash_candidates(
        banded, F.col("doc_id") >= _INC_BATCH_OFFSET
    )
    return jaccard_over_candidates(
        union, cand, k=3, threshold=0.5, shingles=sh
    )


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


@register(
    "dedup_clusters",
    "WITH RECURSIVE " + _MINHASH_CTES + """,
    cand AS (""" + _MINHASH_CAND_SELECT + """),
    sym AS (
        SELECT doc_a AS u, doc_b AS v FROM cand
        UNION
        SELECT doc_b, doc_a FROM cand
    ),
    reach(node, r) AS (
        SELECT u, u FROM sym
        UNION
        SELECT s.u, re.r FROM sym s JOIN reach re ON s.v = re.node
    )
    SELECT node AS doc_id, MIN(r) AS cluster_id
    FROM reach GROUP BY 1
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """Dedup-cluster resolution: connected components over the MinHash-LSH
    candidate pairs (A~B, B~C ⇒ one cluster), cluster_id = min member id
    (the survivor policy). Iterative min-label propagation on Spark
    (operators/graph.py); the oracle is DuckDB's recursive-CTE transitive
    closure — both converge to the same fixpoint."""
    from .operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(docs, k=3, num_hashes=16, bands=4)
    return connected_components(cand).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


# ---------------------------------------------------------------------------
# Training-data preparation: chunking / redaction / sampling / packing
# ---------------------------------------------------------------------------

_CHUNK = 64  # tokens per chunk


@register(
    "doc_chunking",
    "WITH " + _TOKS_CTE + f"""
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           array_to_string(t[i * {_CHUNK} + 1 : i * {_CHUNK} + {_CHUNK}], ' ')
               AS chunk_text,
           CAST(len(t[i * {_CHUNK} + 1 : i * {_CHUNK} + {_CHUNK}]) AS INTEGER)
               AS chunk_tokens
    FROM toks,
         UNNEST(generate_series(0,
             greatest(CAST(ceil(len(t) / {_CHUNK}.0) AS INTEGER) - 1, 0)))
         AS g(i)
    """,
)
def q_doc_chunking(spark, sf_dir):
    """Fixed-size token chunking: each document explodes into ⌈n/64⌉
    chunks of ≤64 whitespace tokens — the context-window slicing step of a
    training pipeline. Pure explode+slice (no UDF); chunk count grows with
    the data, never with the driver."""
    docs = load_table(spark, sf_dir, "documents")
    t = ws_tokens(F.col("text"))
    n_chunks = F.greatest(
        F.ceil(F.size(t) / F.lit(float(_CHUNK))).cast("int") - 1, F.lit(0)
    )
    exploded = docs.select(
        "doc_id",
        t.alias("__t"),
        F.explode(F.sequence(F.lit(0), n_chunks)).alias("chunk_idx"),
    )
    sl = F.slice(F.col("__t"), F.col("chunk_idx") * _CHUNK + 1, _CHUNK)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(sl, " ").alias("chunk_text"),
        F.size(sl).cast("int").alias("chunk_tokens"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_LONGNUM_RE = r"[0-9]{6,}"


@register(
    "pii_redaction",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_LONGNUM_RE}')) AS INTEGER)
               AS n_long_numbers,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_LONGNUM_RE}', '<NUM>', 'g') AS redacted_text
    FROM documents
    """,
)
def q_pii_redaction(spark, sf_dir):
    """PII scrubbing pass: emails and long digit runs replaced with typed
    placeholder tokens, plus per-document match counts — regexp built-ins
    only (Java and RE2 agree on this pattern subset), codegen-friendly."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_LONGNUM_RE), F.lit(0)))
        .cast("int")
        .alias("n_long_numbers"),
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _LONGNUM_RE,
            "<NUM>",
        ).alias("redacted_text"),
    )


# per-language keep rates for the stratified sample (en-heavy corpus →
# downsample en, keep the tail languages)
_STRATA_RATES = {"en": 0.5, "de": 0.9, "fr": 0.9, "es": 0.9}
_DEFAULT_RATE = 0.2
_TWO60_F = float(1 << 60)


def _rate_case_sql() -> str:
    whens = "\n".join(
        f"WHEN lang = '{lang}' THEN {rate}"
        for lang, rate in _STRATA_RATES.items()
    )
    return f"CASE {whens} ELSE {_DEFAULT_RATE} END"


@register(
    "stratified_sample",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5('strat|' || doc_id), 1, 15))::BIGINT
          / {_TWO60_F:.1f} < {_rate_case_sql()}
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language stratified sampling: keep iff
    hash(doc_id)∈[0,1) falls under the stratum's rate. Hash-gated (never
    rand()): retries and speculative tasks keep the same rows, and the
    sample is reproducible across engines — a property sampling at 100 TB
    cannot do without."""
    docs = load_table(spark, sf_dir, "documents")
    u = md5_hash60(F.concat_ws("|", F.lit("strat"), F.col("doc_id"))) / F.lit(
        _TWO60_F
    )
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in reversed(list(_STRATA_RATES.items())):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.filter(u < rate).select("doc_id", "lang")


@register(
    "train_val_split",
    "WITH " + _TOKS_CTE + f"""
    SELECT CASE
             WHEN ('0x' || substr(md5('split|' || doc_id), 1, 15))::BIGINT % 10 < 8
               THEN 'train'
             WHEN ('0x' || substr(md5('split|' || doc_id), 1, 15))::BIGINT % 10 < 9
               THEN 'val'
             ELSE 'test'
           END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(t)) AS BIGINT) AS total_tokens
    FROM toks
    GROUP BY 1
    """,
)
def q_train_val_split(spark, sf_dir):
    """Hash-mod 80/10/10 train/val/test assignment with per-split document
    and token totals. Membership is a pure function of doc_id — stable
    under reprocessing, appends, and engine changes (no shuffle-dependent
    sampling)."""
    docs = load_table(spark, sf_dir, "documents")
    h = md5_hash60(F.concat_ws("|", F.lit("split"), F.col("doc_id"))) % 10
    split = (
        F.when(h < 8, "train").when(h < 9, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), F.size(ws_tokens(F.col("text"))).alias("__n"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__n").cast("bigint").alias("total_tokens"),
        )
    )


_PACK_BUDGET = 256   # tokens per pack
_PACK_SHARDS = 8


@register(
    "sequence_packing",
    "WITH " + _TOKS_CTE + f""",
    sized AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('pack|' || doc_id), 1, 15))::BIGINT
                    % {_PACK_SHARDS} AS INTEGER) AS shard,
               CAST(len(t) AS INTEGER) AS n_tokens
        FROM toks
    ),
    packed AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tokens
        FROM sized
    )
    SELECT doc_id, shard, n_tokens,
           CAST((cum_tokens - n_tokens) // {_PACK_BUDGET} AS INTEGER) AS pack_id
    FROM packed
    """,
)
def q_sequence_packing(spark, sf_dir):
    """Sequence packing for training batches: documents are hash-sharded,
    then contiguously filled into ~256-token packs via a per-shard running
    token count (pack_id = tokens-before ÷ budget — the contiguous-fill
    approximation of greedy bin packing). Sharding keeps the running sum a
    PER-SHARD window, so packing parallelizes across the cluster instead
    of serializing on one global ordering."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    sized = docs.select(
        "doc_id",
        (
            md5_hash60(F.concat_ws("|", F.lit("pack"), F.col("doc_id")))
            % _PACK_SHARDS
        )
        .cast("int")
        .alias("shard"),
        F.size(ws_tokens(F.col("text"))).cast("int").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sized.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET)
        .cast("int")
        .alias("pack_id"),
    )


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
# Candidate-phase bucket cap (dedup.bucket_pairs max_bucket): pair cost is
# Σ|bucket|², so one non-discriminative bucket is the quadratic hot key —
# the round-4 sf1 sweep measured ×43 wall on 10× vectors with 4 planes/band
# before the cap. 512 ≈ 4× the largest bucket observed at sf0.1 (the
# largest verify scale), so the cap NEVER trips where the oracle gate runs
# (asserted in tests/test_llm_ops.py) and bounds cost everywhere else; a
# capped bucket means "widen planes_per_band for this corpus size".
_LSH_MAX_BUCKET = 512


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
    keepb AS (
        SELECT band, bucket FROM bb GROUP BY band, bucket
        HAVING COUNT(*) BETWEEN 2 AND {_LSH_MAX_BUCKET}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bb a
        JOIN keepb k ON k.band = a.band AND k.bucket = a.bucket
        JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
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
        max_bucket=_LSH_MAX_BUCKET,
    )


# --- production-threshold near-dup variant over planted twins --------------
# The gaussian testdata has no natural cosine ≥ 0.9 pairs, so the registered
# high-threshold query PLANTS deterministic near-duplicate twins (derived
# data: vec_id arithmetic + fixed rational noise, oracle-expressible) and
# searches at the real near-dup operating point: 8 planes per band → 256
# buckets/band, the selective banding the 0.45-threshold variant's
# docstring prescribes for cosine ≥ 0.9.

_HI_THRESHOLD = 0.9
_HI_BANDS = 8
_HI_PLANES_PER_BAND = 8
_HI_PLANT_N = 100
_HI_PLANT_OFFSET = 1_000_000

_HI_PERT_SQL = "[" + ", ".join(
    repr(c) for c in perturbation_constants(_EMB_DIM)
) + "]"

_NEAR_PAIRS_LSH_HI_ORACLE = (
    "WITH " + _EMB_CTE + f""",
    corpus AS (
        SELECT vec_id, v FROM emb
        UNION ALL
        SELECT vec_id + {_HI_PLANT_OFFSET} AS vec_id,
               list_transform(v, (x, i) -> x + {_HI_PERT_SQL}[i]) AS v
        FROM emb WHERE vec_id < {_HI_PLANT_N}
    ),
    bb AS (
        """
    + "\n        UNION ALL\n        ".join(
        f"SELECT vec_id, {band} AS band, "
        f"CAST({_bucket_sql(band * _HI_PLANES_PER_BAND, _HI_PLANES_PER_BAND)}"
        f" AS INTEGER) AS bucket FROM corpus"
        for band in range(_HI_BANDS)
    )
    + f"""
    ),
    keepb AS (
        SELECT band, bucket FROM bb GROUP BY band, bucket
        HAVING COUNT(*) BETWEEN 2 AND {_LSH_MAX_BUCKET}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bb a
        JOIN keepb k ON k.band = a.band AND k.bucket = a.bucket
        JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                 AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, {_cosine_sql('ea.v', 'eb.v')} AS score
    FROM cand
    JOIN corpus ea ON ea.vec_id = id_a
    JOIN corpus eb ON eb.vec_id = id_b
    WHERE {_cosine_sql('ea.v', 'eb.v')} >= {_HI_THRESHOLD}
    """
)


@register("embedding_near_pairs_lsh_hi", _NEAR_PAIRS_LSH_HI_ORACLE)
def q_embedding_near_pairs_lsh_hi(spark, sf_dir):
    """Near-dup pairs at the production threshold (cosine ≥ 0.9) over a
    corpus with planted near-duplicate twins (plant_near_duplicates: the
    first 100 vectors get a deterministic-noise copy at id+1e6, cosine
    ≈ 0.97 from the original). Banding runs at the high-similarity
    operating point — 8 bands × 8 planes (256 buckets/band): per-plane
    collision probability for a cosine-0.97 pair is ~0.92, so band recall
    is ~0.52 and 8 OR-bands reach ~0.997 while random gaussian pairs
    almost never collide on 8 planes. Recall ≥ 0.9 vs the exact all-pairs
    baseline is asserted in tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = plant_near_duplicates(
        emb, n=_HI_PLANT_N, id_offset=_HI_PLANT_OFFSET, dim=_EMB_DIM
    )
    return embedding_near_pairs_lsh(
        corpus,
        threshold=_HI_THRESHOLD,
        n_bands=_HI_BANDS,
        planes_per_band=_HI_PLANES_PER_BAND,
        seed=_LSH_SEED,
        dim=_EMB_DIM,
        max_bucket=_LSH_MAX_BUCKET,
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
    "ann_ivf_full_probe",
    "WITH " + _EMB_CTE + f""",
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
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
def q_ann_ivf_full_probe(spark, sf_dir):
    """IVF ANN in its EXHAUSTIVE configuration (n_probe = n_clusters):
    every cluster is probed, so the candidate set is the whole corpus and
    the exact rerank must reproduce brute-force top-k bit-for-bit — which
    makes the whole IVF machinery (KMeans quantizer, centroid probe
    selection, candidate union, rerank) hash-checkable against the plain
    SQL top-k oracle. The approximate operating point keeps its rows-only
    entry (`ann_ivf_topk`); this full-probe twin is the correctness
    certificate that the plumbing between quantizer and rerank loses no
    candidates."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, query_ids=list(range(5)), k=10, n_clusters=8, n_probe=8
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
    document-frequency cap (NGRAM_MAX_DOC_FREQ) — the scale-safe variant.

    r12 shape (OPTIMIZATION_r12.md): the SHINGLE BUCKET table (shingle →
    sorted doc ids, stop-shingles dropped by the size-of-list cap — no
    window sort) is localCheckpoint-materialized ONCE and shared by the
    sizes and intersection branches of the Jaccard pass; it is one row per
    distinct shingle, far smaller than the (doc_id, shingle) rows the
    r2–r11 shape checkpointed (which Catalyst re-shuffled per branch —
    ReuseExchange needs bit-identical subtrees and the checkpoint scan
    severs partitioning metadata anyway). The quality filter and the
    exact-dup fingerprint ride ONE corpus scan: min-per-fingerprint
    survivorship carries the survivor's own quality flag via
    min_by(q, doc_id), so the former quality-branch scan and its join are
    gone. Jaccard's per-pair sizes attach through one unpivoted join
    instead of two (operators/dedup._attach_pair_sizes)."""
    docs = load_table(spark, sf_dir, "documents")
    t = ws_tokens(F.col("text"))
    fp = docs.select(
        "doc_id",
        normalized_fingerprint(F.col("text")).alias("f"),
        ((F.size(t) >= 20) & (F.length("text") >= 100)).alias("__q"),
    )
    survivors = (
        fp.groupBy("f")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("__q", "doc_id").alias("__q"),
        )
        .filter(F.col("__q"))
        .select("doc_id")
    )
    buckets = shingle_buckets(
        _doc_shingles(docs, 3), max_doc_freq=NGRAM_MAX_DOC_FREQ
    ).localCheckpoint(eager=True)
    near_dropped = (
        jaccard_pairs_from_buckets(buckets, threshold=0.5)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return survivors.join(near_dropped, "doc_id", "left_anti")


_K_PER_GROUP = 20


@register(
    "sample_k_per_group",
    f"""
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang, ROW_NUMBER() OVER (
            PARTITION BY lang
            ORDER BY md5('samp|' || doc_id), doc_id) AS rn
        FROM documents
    ) WHERE rn <= {_K_PER_GROUP}
    """,
)
def q_sample_k_per_group(spark, sf_dir):
    """Exactly-k-per-group sampling: rank by a hash of the id inside each
    language and keep the first k — a deterministic uniform draw (the hash
    IS the random order) that, unlike fraction-based sampling, guarantees
    the group quota exactly. One window over the group key; reproducible
    across engines, retries, and appends of unrelated groups."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat_ws("|", F.lit("samp"), F.col("doc_id"))), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("__rn"))
        .filter(F.col("__rn") <= _K_PER_GROUP)
        .select("doc_id", "lang")
    )


@register(
    "token_frequencies",
    "WITH " + _TOKS_CTE + """,
    tok AS (
        SELECT lower(u.tk) AS token FROM toks, UNNEST(t) AS u(tk)
    ),
    counts AS (
        SELECT token, COUNT(*) AS n FROM tok GROUP BY 1
    ),
    top AS (
        SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 100
    ),
    total AS (SELECT COUNT(*) AS total FROM tok),
    ranked AS (
        SELECT token, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
        FROM top
    )
    SELECT token, CAST(n AS BIGINT) AS n,
           CAST(rnk AS INTEGER) AS freq_rank,
           ROUND(n * 1.0 / total, 6) AS share
    FROM ranked, total
    """,
)
def q_token_frequencies(spark, sf_dir):
    """Corpus unigram statistics: top-100 lowercased tokens with counts and
    corpus share — the vocabulary-head profile a tokenizer-training or
    quality pass starts from.

    Scale shape: the top-100 is orderBy+limit — planned as
    TakeOrderedAndProject (per-partition top-k, tiny merge) — never a
    row_number window over the full vocabulary, which would funnel hundreds
    of millions of distinct tokens through ONE partition at corpus scale.
    Rank is posexplode over the sorted 100-element array; the share
    denominator is a 1-row corpus-token count broadcast-joined in. No
    Window node anywhere in the plan (asserted in test_plan_shapes)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(ws_tokens(F.col("text"))).alias("tk")
    ).select(F.lower("tk").alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), "token").limit(100)
    total = tok.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    packed = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct((-F.col("n")).alias("__neg"), F.col("token"), F.col("n"))
            )
        ).alias("__ts")
    )
    return (
        packed.crossJoin(F.broadcast(total))
        .select(F.col("__total"), F.posexplode("__ts").alias("__pos", "__s"))
        .select(
            F.col("__s.token").alias("token"),
            F.col("__s.n").cast("bigint").alias("n"),
            (F.col("__pos") + 1).cast("int").alias("freq_rank"),
            F.round(F.col("__s.n") / F.col("__total"), 6).alias("share"),
        )
    )


_COOC_VOCAB = 40   # top-V tokens by document frequency enter the pair phase
_COOC_TOPK = 100


@register(
    "token_cooccurrence",
    "WITH " + _TOKS_CTE + f""",
    tok AS (
        SELECT DISTINCT doc_id, lower(u.tk) AS token
        FROM toks, UNNEST(t) AS u(tk)
    ),
    dfc AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY 1),
    vocab AS (SELECT token, df FROM dfc ORDER BY df DESC, token
              LIMIT {_COOC_VOCAB}),
    q AS (SELECT t.doc_id, t.token, v.df
          FROM tok t JOIN vocab v USING (token)),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    pc AS (
        SELECT a.token AS token_a, b.token AS token_b,
               COUNT(*) AS n_ab, MIN(a.df) AS df_a, MIN(b.df) AS df_b
        FROM q a JOIN q b ON a.doc_id = b.doc_id AND a.token < b.token
        GROUP BY 1, 2
    )
    SELECT token_a, token_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(df_a AS BIGINT) AS df_a, CAST(df_b AS BIGINT) AS df_b,
           ROUND(n_ab * 1.0 * n_docs / (df_a * df_b), 6) AS lift
    FROM pc, nd
    ORDER BY ROUND(n_ab * 1.0 * n_docs / (df_a * df_b), 6) DESC,
             token_a, token_b
    LIMIT {_COOC_TOPK}
    """,
)
def q_token_cooccurrence(spark, sf_dir):
    """Collocation mining: top-100 token pairs by LIFT — the corpus
    statistic behind multi-word-expression detection and template/spam
    spotting (pairs that co-occur far above independence). Lift =
    P(a,b)/(P(a)·P(b)) = n_ab·n_docs/(df_a·df_b), a ratio of exact
    integers — deliberately NOT log-PMI: libm log() differs across
    engines at the ulp level (ADVICE r3), while an integer ratio divides
    to the identical double in both engines and ranks identically.

    Scale shape: the pair phase is gated by a deterministic top-V
    document-frequency vocabulary (V=40: orderBy+limit →
    TakeOrderedAndProject, never a full-vocab window), so per-doc pair
    fan-out is bounded by C(V,2) regardless of corpus size — the stop-
    shingle/bucket-cap discipline applied to co-occurrence. Pairs are
    generated from each doc's sorted qualifying-token array with
    higher-order functions (one doc_id shuffle; no self-join), then one
    grouped count; df sides join back via broadcast (V rows). The
    (doc_id, token) explode is localCheckpoint-materialized once and
    shared by the document-frequency and pair branches (vocab selection
    needs the global df before the pair pass can filter, so the table is
    read twice — the corpus_prep trade)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(ws_tokens(F.col("text")), F.lower)
            )
        ).alias("token"),
    ).localCheckpoint(eager=True)
    dfc = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfc.orderBy(F.col("df").desc(), "token").limit(_COOC_VOCAB)
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__nd"))
    per_doc = (
        tok.join(F.broadcast(vocab.select("token")), "token")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("token")).alias("ts"))
    )
    combos = F.flatten(
        F.transform(
            F.col("ts"),
            lambda x, i: F.transform(
                F.slice(F.col("ts"), i + 2, F.size(F.col("ts"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pc = (
        per_doc.select(F.explode(combos).alias("p"))
        .groupBy(
            F.col("p.a").alias("token_a"), F.col("p.b").alias("token_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    va = vocab.select(
        F.col("token").alias("token_a"), F.col("df").alias("df_a")
    )
    vb = vocab.select(
        F.col("token").alias("token_b"), F.col("df").alias("df_b")
    )
    lift = F.round(
        F.col("n_ab") * F.col("__nd") / (F.col("df_a") * F.col("df_b")), 6
    )
    return (
        pc.join(F.broadcast(va), "token_a")
        .join(F.broadcast(vb), "token_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token_a",
            "token_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("df_a").cast("bigint").alias("df_a"),
            F.col("df_b").cast("bigint").alias("df_b"),
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "token_a", "token_b")
        .limit(_COOC_TOPK)
    )


_HIST_WIDTH = 50


@register(
    "doc_length_histogram",
    "WITH " + _TOKS_CTE + f"""
    SELECT CAST(len(t) // {_HIST_WIDTH} AS INTEGER) AS bucket,
           CAST(len(t) // {_HIST_WIDTH} * {_HIST_WIDTH} AS INTEGER) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(len(t)) AS INTEGER) AS min_tokens,
           CAST(MAX(len(t)) AS INTEGER) AS max_tokens
    FROM toks GROUP BY 1, 2
    """,
)
def q_doc_length_histogram(spark, sf_dir):
    """Document-length histogram (50-token buckets): the length
    distribution every corpus-prep threshold decision reads. Integer
    floor-division bucketing, one aggregate pass."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(ws_tokens(F.col("text")))
    return (
        docs.select(
            F.floor(n / _HIST_WIDTH).cast("int").alias("bucket"),
            (F.floor(n / _HIST_WIDTH) * _HIST_WIDTH).cast("int").alias("bucket_lo"),
            n.alias("__n"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("__n").cast("int").alias("min_tokens"),
            F.max("__n").cast("int").alias("max_tokens"),
        )
    )


@register(
    "doc_keywords",
    "WITH " + _TOKS_CTE + """,
    tok AS (
        SELECT doc_id, lower(u.tk) AS token FROM toks, UNNEST(t) AS u(tk)
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    docfreq AS (
        SELECT token, COUNT(*) AS n_docs_with
        FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1
    ),
    scored AS (
        SELECT t.doc_id, t.token, t.tf, d.n_docs_with,
               ROW_NUMBER() OVER (
                   PARTITION BY t.doc_id
                   ORDER BY t.tf * 1.0 / d.n_docs_with DESC, t.token) AS rnk
        FROM tf t JOIN docfreq d USING (token)
    )
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
           CAST(n_docs_with AS BIGINT) AS n_docs_with,
           CAST(rnk AS INTEGER) AS kw_rank,
           ROUND(tf * 1.0 / n_docs_with, 6) AS score
    FROM scored WHERE rnk <= 3
    """,
)
def q_doc_keywords(spark, sf_dir):
    """Per-document keywords: top-3 tokens by tf/df (term frequency over
    document frequency — the rank-equivalent of tf-idf without log(), which
    is deliberately avoided: libm ln() differs across engines at the ulp
    level and would break hash-exact comparison; tf/df is a ratio of
    identical integers → identical doubles → identical ranking)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("tk")
    ).select("doc_id", F.lower("tk").alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = (
        tok.distinct().groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_docs_with"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") * 1.0 / F.col("n_docs_with")).desc(), "token"
    )
    return (
        tf.join(docfreq, "token")
        .withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= 3)
        .select(
            "doc_id", "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("n_docs_with").cast("bigint").alias("n_docs_with"),
            F.col("kw_rank").cast("int").alias("kw_rank"),
            F.round(F.col("tf") * 1.0 / F.col("n_docs_with"), 6).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# Document quality scoring + edit-distance dedup verify
# ---------------------------------------------------------------------------

# Union of all language stopword lists — the quality filter must not
# penalize non-English documents, so hits count against every known list.
_ALL_SW = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))
_ALL_SW_SQL = ", ".join(f"'{w}'" for w in _ALL_SW)

# Gopher-style repetition/quality thresholds (Rae et al. 2021, table A1
# spirit — bounds adapted to the synthetic corpus's length profile).
_QF_MIN_TOKENS, _QF_MAX_TOKENS = 20, 100_000
_QF_MIN_AVG_LEN, _QF_MAX_AVG_LEN = 2.0, 12.0
_QF_MIN_STOPWORD = 0.05
_QF_MAX_SYMBOL = 0.25
_QF_MIN_DISTINCT = 0.2


# m/f relations shared with quality_filter_funnel (registry_llm4): the
# funnel MUST count attrition under the exact flags this filter applies.
_QUALITY_FLAGS_CTES = rf""",
    m AS (
        SELECT doc_id,
               len(t) AS n_tokens,
               list_sum(list_transform(t, x -> length(x))) * 1.0
                   / len(t) AS avg_token_len,
               len(list_filter(t, x -> lower(x) IN ({_ALL_SW_SQL}))) * 1.0
                   / len(t) AS stopword_ratio,
               length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
                   / length(text) AS symbol_ratio,
               len(list_distinct(t)) * 1.0 / len(t) AS distinct_ratio
        FROM toks
    ),
    f AS (
        SELECT *,
            n_tokens BETWEEN {_QF_MIN_TOKENS} AND {_QF_MAX_TOKENS} AS ok_n_tokens,
            avg_token_len BETWEEN {_QF_MIN_AVG_LEN!r} AND {_QF_MAX_AVG_LEN!r}
                AS ok_avg_token_len,
            stopword_ratio >= {_QF_MIN_STOPWORD!r} AS ok_stopword,
            symbol_ratio <= {_QF_MAX_SYMBOL!r}     AS ok_symbol,
            distinct_ratio >= {_QF_MIN_DISTINCT!r} AS ok_distinct
        FROM m
    )
"""


@register(
    "doc_quality_score",
    "WITH " + _TOKS_CTE + _QUALITY_FLAGS_CTES + """
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           avg_token_len, stopword_ratio, symbol_ratio, distinct_ratio,
           ok_n_tokens, ok_avg_token_len, ok_stopword, ok_symbol, ok_distinct,
           (CAST(ok_n_tokens AS INTEGER) + CAST(ok_avg_token_len AS INTEGER)
            + CAST(ok_stopword AS INTEGER) + CAST(ok_symbol AS INTEGER)
            + CAST(ok_distinct AS INTEGER)) / 5.0 AS quality_score,
           ok_n_tokens AND ok_avg_token_len AND ok_stopword AND ok_symbol
               AND ok_distinct AS keep
    FROM f
    """,
)
def q_doc_quality_score(spark, sf_dir):
    """Gopher-style document quality filter (Rae et al. 2021): token count,
    mean token length, stopword ratio (union of all known language lists,
    so non-English docs aren't penalized), symbol-character ratio, and
    distinct-token ratio, each gated by a fixed bound; quality_score is the
    fraction of checks passed and `keep` their conjunction.

    All ratios are single integer÷integer divisions — bit-identical on both
    engines, emitted UNROUNDED (6dp rounding flips on exact ties like
    k/128, NOTES rule 9). Pure JVM expressions, one scan, zero shuffles —
    embarrassingly parallel at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = ws_tokens(F.col("text"))
    tok_lens = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    m = docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        (tok_lens * 1.0 / F.size(t)).alias("avg_token_len"),
        (stopword_hits(t, _ALL_SW) * 1.0 / F.size(t)).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", "")) * 1.0
            / F.length("text")
        ).alias("symbol_ratio"),
        (F.size(F.array_distinct(t)) * 1.0 / F.size(t)).alias("distinct_ratio"),
    )
    f = m.select(
        "*",
        F.col("n_tokens").between(_QF_MIN_TOKENS, _QF_MAX_TOKENS).alias(
            "ok_n_tokens"
        ),
        F.col("avg_token_len").between(_QF_MIN_AVG_LEN, _QF_MAX_AVG_LEN).alias(
            "ok_avg_token_len"
        ),
        (F.col("stopword_ratio") >= _QF_MIN_STOPWORD).alias("ok_stopword"),
        (F.col("symbol_ratio") <= _QF_MAX_SYMBOL).alias("ok_symbol"),
        (F.col("distinct_ratio") >= _QF_MIN_DISTINCT).alias("ok_distinct"),
    )
    oks = ["ok_n_tokens", "ok_avg_token_len", "ok_stopword", "ok_symbol",
           "ok_distinct"]
    score = None
    for c in oks:
        term = F.col(c).cast("int")
        score = term if score is None else score + term
    keep = None
    for c in oks:
        keep = F.col(c) if keep is None else keep & F.col(c)
    return f.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "avg_token_len", "stopword_ratio", "symbol_ratio", "distinct_ratio",
        *oks,
        (score / 5.0).alias("quality_score"),
        keep.alias("keep"),
    )


_EDIT_PREFIX_LEN = 80
_EDIT_MAX_DIST = 20


@register(
    "dedup_edit_distance",
    "WITH " + _MINHASH_CTES + """,
    cand AS (""" + _MINHASH_CAND_SELECT + f""")
    SELECT c.doc_a, c.doc_b,
           CAST(levenshtein(substr(da.text, 1, {_EDIT_PREFIX_LEN}),
                            substr(db.text, 1, {_EDIT_PREFIX_LEN}))
                AS INTEGER) AS edit_distance
    FROM cand c
    JOIN documents da ON da.doc_id = c.doc_a
    JOIN documents db ON db.doc_id = c.doc_b
    WHERE levenshtein(substr(da.text, 1, {_EDIT_PREFIX_LEN}),
                      substr(db.text, 1, {_EDIT_PREFIX_LEN}))
          <= {_EDIT_MAX_DIST}
    """,
)
def q_dedup_edit_distance(spark, sf_dir):
    """Edit-distance dedup verify: exact Levenshtein over MinHash-LSH
    candidate pairs only (the fuzzy-match analogue of
    dedup_jaccard_lsh_verified). Levenshtein is O(m·n) per pair, so two
    guards make it scale: it runs on banded candidates (Σ bucket², never
    n²) and on a fixed 80-char prefix (constant per-pair cost). Both
    engines implement classic unit-cost insert/delete/substitute DP —
    integer-exact, no float policy needed.
    """
    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(docs, k=3, num_hashes=16, bands=4)
    prefix = docs.select(
        "doc_id", F.substring("text", 1, _EDIT_PREFIX_LEN).alias("prefix")
    )
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa")
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb")
    )
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.levenshtein("pa", "pb").cast("int").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= _EDIT_MAX_DIST)
    )


# ---------------------------------------------------------------------------
# Gopher repetition signals (word-bigram duplication)
# ---------------------------------------------------------------------------


@register(
    "doc_repetition_stats",
    "WITH " + _TOKS_CTE + r""",
    b AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(t)),
                                     i -> ('0x' || substr(md5(
                                         t[i] || ' ' || t[i + 1]
                                     ), 1, 15))::BIGINT)) AS gram
        FROM toks WHERE len(t) >= 2
    ),
    g AS (SELECT doc_id, gram, COUNT(*) AS n FROM b GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT)   AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
           CAST(MAX(n) AS BIGINT)   AS top_n,
           MAX(n) * 1.0 / SUM(n)        AS top_share,
           1.0 - COUNT(*) * 1.0 / SUM(n) AS dup_fraction
    FROM g GROUP BY doc_id
    """,
)
def q_doc_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): per-doc
    word-bigram duplication — the share of the single most frequent bigram
    (top_share) and the fraction of bigram occurrences that are repeats
    (dup_fraction). High values mark boilerplate/spam that the
    length/stopword checks in doc_quality_score miss.

    Plan: bigrams via a sequence/transform higher-order function (pure
    JVM, no UDF), explode, then a TWO-LEVEL aggregate — count per
    (doc_id, gram), then per doc — each a hash aggregate with map-side
    partial. Cost is O(tokens log tokens) per doc via shuffle, NOT the
    O(tokens²) of an array-only distinct/filter formulation, so
    million-token documents don't quadratically blow up a task. Grams
    are HASHED to 60 bits BEFORE the exchange (the span_duplication_rate
    lesson, re-caught by the r12 sf1→sf10 sweep at ×13.8: full ~15-byte
    string keys made the two-level aggregate spill at 100M gram rows;
    8-byte keys restored ×7.1). The md5-prefix hash is mirrored in the
    oracle, so collisions — ~len²/2⁶⁰ per doc, none at verify scale —
    affect BOTH engines identically and the match stays bit-exact.
    Ratios are small-int divisions → bit-exact, emitted raw (rule 9).
    """
    from .operators.dedup import _spread

    docs = _spread(load_table(spark, sf_dir, "documents"))
    t = ws_tokens(F.col("text"))
    grams = docs.filter(F.size(t) >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: md5_hash60(
                    F.concat_ws(
                        " ", F.element_at(t, i), F.element_at(t, i + 1)
                    )
                ),
            )
        ).alias("gram"),
    )
    g = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("n"))
    return g.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.count(F.lit(1)).alias("distinct_bigrams"),
        F.max("n").alias("top_n"),
        (F.max("n") * 1.0 / F.sum("n")).alias("top_share"),
        (F.lit(1.0) - F.count(F.lit(1)) * 1.0 / F.sum("n")).alias(
            "dup_fraction"
        ),
    )


# ---------------------------------------------------------------------------
# Corpus-health reporting + decontamination screen
# ---------------------------------------------------------------------------


@register(
    "dedup_rate_by_source",
    r"""
    WITH fp AS (
        SELECT source, lang,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        FROM documents
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT)           AS n_docs,
           CAST(COUNT(DISTINCT f) AS BIGINT)  AS n_unique,
           1.0 - COUNT(DISTINCT f) * 1.0 / COUNT(*) AS dup_rate
    FROM fp GROUP BY 1, 2
    """,
)
def q_dedup_rate_by_source(spark, sf_dir):
    """Corpus-health report: exact-duplicate rate per (source, lang) slice
    — the rollup a data curator reads before deciding which feed needs the
    expensive near-dup pass. One groupBy over fingerprints; COUNT DISTINCT
    runs Spark's two-phase distinct aggregate (partial on (keys, f), final
    on keys) — no slice ever needs to fit in memory whole. dup_rate is an
    integer÷integer division — bit-exact, raw (NOTES rule 9).
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "source", "lang", normalized_fingerprint(F.col("text")).alias("f")
    )
    return fp.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("f").alias("n_unique"),
        (
            F.lit(1.0) - F.countDistinct("f") * 1.0 / F.count(F.lit(1))
        ).alias("dup_rate"),
    )


# Benchmark needles screened against the corpus. In production this list is
# the n-gram inventory of held-out eval sets (thousands of entries,
# broadcast); the mechanism — substring containment on the normalized text,
# ANY-semantics across needles — is identical at either list size.
_CONTAMINATION_NEEDLES = (
    "the quick brown fox",
    "hash join build side",
    "stream stream stream",
)


@register(
    "benchmark_contamination",
    r"""
    WITH norm AS (
        SELECT doc_id, source,
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS ntext
        FROM documents
    )
    SELECT doc_id, source,
           (ntext LIKE '%the quick brown fox%')   AS hit_1,
           (ntext LIKE '%hash join build side%')  AS hit_2,
           (ntext LIKE '%stream stream stream%')  AS hit_3
    FROM norm
    WHERE ntext LIKE '%the quick brown fox%'
       OR ntext LIKE '%hash join build side%'
       OR ntext LIKE '%stream stream stream%'
    """,
)
def q_benchmark_contamination(spark, sf_dir):
    """Decontamination screen: flag documents whose normalized text
    contains any benchmark/eval needle phrase (the training-data hygiene
    step that keeps held-out sets out of the corpus). Pure JVM `contains`
    predicates over one scan — embarrassingly parallel, no shuffle, no
    UDF; per-needle hit flags let the curator distinguish which eval set
    leaked. The needle list broadcasts as literals; at thousands of
    needles the same plan swaps LIKE-chains for an Aho-Corasick-style
    multi-pattern regexp, still one scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    ntext = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    norm = docs.select("doc_id", "source", ntext.alias("ntext"))
    hits = [
        F.col("ntext").contains(n).alias(f"hit_{i + 1}")
        for i, n in enumerate(_CONTAMINATION_NEEDLES)
    ]
    out = norm.select("doc_id", "source", *hits)
    keep = None
    for i in range(len(_CONTAMINATION_NEEDLES)):
        c = F.col(f"hit_{i + 1}")
        keep = c if keep is None else keep | c
    return out.filter(keep)


# ---------------------------------------------------------------------------
# Temperature-based source mixing (training-mix composition)
# ---------------------------------------------------------------------------

# sampled_count_s ∝ count_s^α : α=1 keeps natural proportions, α→0 flattens
# the mix toward uniform. 0.5 is the common multilingual-training compromise.
MIX_ALPHA = 0.5


@register(
    "source_temperature_mix",
    """
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM documents GROUP BY 1
    ),
    m AS (SELECT MIN(n_total) AS min_n FROM counts),
    rates AS (
        SELECT lang, n_total,
               SQRT(CAST(min_n AS DOUBLE) / n_total) AS rate
        FROM counts, m
    ),
    kept AS (
        SELECT d.lang
        FROM documents d JOIN rates r USING (lang)
        WHERE ('0x' || substr(md5('mix|' || d.doc_id), 1, 15))::BIGINT
              / 1152921504606846976.0 < r.rate
    )
    SELECT r.lang, r.n_total,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           ROUND(r.rate, 6) AS rate
    FROM rates r
    LEFT JOIN (SELECT lang, COUNT(*) AS n_kept FROM kept GROUP BY 1) k
           USING (lang)
    """,
)
def q_source_temperature_mix(spark, sf_dir):
    """Temperature-based mixture rebalancing: resample each stratum (here
    language — the canonical multilingual-pretraining case; the en-heavy
    corpus gets flattened toward the tail languages) at rate
    (min_count/count_s)^(1-α), so the kept corpus has per-stratum volume
    ∝ count_s^α — the standard dial between "natural proportions" (α=1)
    and "uniform" (α=0). Membership is hash-gated (md5_hash60, never
    rand()): reproducible across retries, engines, and appends.

    Every float on the decision path is bit-identical cross-engine: the
    rate is sqrt of a correctly-rounded division of exact ints (IEEE sqrt
    and division are correctly rounded in both engines), and the uniform
    u is the shared 60-bit hash over 2^60. Plan: docs scanned TWICE (the
    honest minimum — once to learn the per-stratum counts, once to apply
    the gate), with the 5-row rates table localCheckpoint'd so the counts
    scan is not replayed per branch (corpus_prep's shared-subtree
    pattern), and every join on it broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    min_n = counts.agg(F.min("n_total").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "lang",
        "n_total",
        F.sqrt(F.col("min_n").cast("double") / F.col("n_total")).alias("rate"),
    ).localCheckpoint()
    u = md5_hash60(F.concat_ws("|", F.lit("mix"), F.col("doc_id"))) / F.lit(
        _TWO60_F
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .filter(u < F.col("rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    )
    return (
        rates.join(F.broadcast(kept), "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.round("rate", 6).alias("rate"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new batch against an existing corpus
# ---------------------------------------------------------------------------

_INCR_TWIN_OFFSET = 10_000_000


@register(
    "dedup_incremental",
    rf"""
    WITH corpus AS (
        SELECT * FROM documents WHERE doc_id % 5 != 0
    ),
    newb AS (
        SELECT doc_id, text, source FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + {_INCR_TWIN_OFFSET}, text, source
        FROM corpus WHERE doc_id < 40
    ),
    cfp AS (
        SELECT DISTINCT
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM corpus
    )
    SELECT n.doc_id, n.source,
           md5(regexp_replace(lower(trim(n.text)), '\s+', ' ', 'g')) AS fingerprint
    FROM newb n
    WHERE md5(regexp_replace(lower(trim(n.text)), '\s+', ' ', 'g'))
          NOT IN (SELECT fp FROM cfp)
    """,
)
def q_dedup_incremental(spark, sf_dir):
    """Incremental exact dedup: admit only new-batch documents whose
    normalized fingerprint is NOT already in the existing corpus — the
    steady-state dedup shape at 100 TB, where the corpus fingerprint set
    is a persisted table and each incoming crawl batch anti-joins against
    it (never re-deduping history against itself).

    Fixture geometry (deterministic, oracle-mirrored): corpus = doc_id %
    5 != 0; new batch = the held-out %5==0 docs (true new content) plus
    byte-identical twins of corpus docs with doc_id < 40 (guaranteed
    duplicates, the plant_exact_duplicates pattern —
    operators/dedup.py:78-96). The anti-join must keep the former and
    drop ALL of the latter, so the query is non-vacuous in both
    directions at every verify scale. Plan: LeftAnti hash join on the
    16-byte digest — shuffle payload is fingerprints, not text; with the
    corpus side persisted and bucketed by fingerprint at scale, only the
    new batch shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    twins = corpus.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + _INCR_TWIN_OFFSET).alias("doc_id"), "text", "source"
    )
    newb = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "text", "source"
    ).unionByName(twins)
    cfp = corpus.select(normalized_fingerprint(F.col("text")).alias("fp")).distinct()
    nfp = newb.select(
        "doc_id", "source", normalized_fingerprint(F.col("text")).alias("fingerprint")
    )
    return nfp.join(cfp, nfp.fingerprint == cfp.fp, "left_anti")


# ---------------------------------------------------------------------------
# Cross-document boilerplate coverage
# ---------------------------------------------------------------------------

# a word 3-gram window appearing in >= this many DISTINCT documents is
# treated as boilerplate vocabulary (headers, footers, license text)
BOILERPLATE_MIN_DF = 3


@register(
    "boilerplate_ngram_coverage",
    rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS s(i)
    ),
    bp AS (
        SELECT g FROM grams GROUP BY g
        HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DF}
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1),
    com AS (
        SELECT grams.doc_id, COUNT(*) AS n_common
        FROM grams JOIN bp USING (g) GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_boilerplate,
           ROUND(COALESCE(c.n_common, 0) * 1.0 / t.n_grams, 6)
               AS boilerplate_frac
    FROM tot t LEFT JOIN com c USING (doc_id)
    WHERE t.n_grams > 0
    """,
)
def q_boilerplate_ngram_coverage(spark, sf_dir):
    """Cross-document boilerplate coverage: the fraction of each doc's
    word-3-gram POSITIONS covered by n-grams that appear in >=
    BOILERPLATE_MIN_DF distinct documents — the corpus-level complement
    of `doc_repetition_stats` (within-doc repetition). High coverage
    flags template/license/navigation text a training-data curator strips
    before near-dup passes (boilerplate also poisons MinHash signatures).

    Positional (non-distinct) shingles via `word_shingles_all`: a window
    duplicated within one doc counts per occurrence, so the fraction is a
    true coverage measure. The exploded gram table is localCheckpoint'd
    ONCE and shared by all three consumers (document frequency, per-doc
    totals, per-doc boilerplate hits) — corpus_prep's shared-subtree
    pattern, 1 explode instead of 3. The boilerplate vocabulary is
    broadcast: high-df n-grams are few BY CONSTRUCTION (df >= 3 across a
    deduped corpus bounds the set far below the gram count), so the
    coverage join ships the small set, never shuffling the gram table a
    second time. frac = exact-int division, correctly rounded identically
    in both engines.
    """
    from .operators.dedup import _spread

    docs = _spread(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        F.explode(word_shingles_all(ws_tokens(F.col("text")), 3)).alias("g"),
    ).localCheckpoint()
    bp = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILERPLATE_MIN_DF)
        .select("g")
    )
    tot = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    com = (
        grams.join(F.broadcast(bp), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        tot.join(com, "doc_id", "left")
        .filter(F.col("n_grams") > 0)
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_boilerplate"),
            F.round(
                F.coalesce("n_common", F.lit(0)) * F.lit(1.0) / F.col("n_grams"),
                6,
            ).alias("boilerplate_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Global contiguous sample ids (distributed enumeration)
# ---------------------------------------------------------------------------


@register(
    "global_doc_ids",
    """
    SELECT doc_id, lang,
           CAST(ROW_NUMBER() OVER (ORDER BY lang, doc_id) - 1 AS BIGINT)
               AS global_id
    FROM documents
    """,
)
def q_global_doc_ids(spark, sf_dir):
    """Contiguous 0-based sample ids in (lang, doc_id) order via the
    two-phase range-partition enumeration (operators/enumerate.py) — the
    scalable replacement for an unpartitioned row_number, whose
    Exchange SinglePartition is a one-task sort of the whole corpus.
    Ids depend only on the total order, not on partition boundaries, so
    the distributed result is bit-identical to the oracle's single-node
    ROW_NUMBER."""
    from .operators.enumerate import global_sequence_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return global_sequence_ids(docs, ["lang", "doc_id"])


# ---------------------------------------------------------------------------
# Per-label embedding centroids
# ---------------------------------------------------------------------------


@register(
    "label_centroids",
    """
    WITH ex AS (
        SELECT label, CAST(u.pos - 1 AS INTEGER) AS pos,
               CAST(u.val AS DOUBLE) AS val
        FROM (
            SELECT label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ) u(label, val, pos)
    )
    SELECT label, pos,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(val), 6)       AS centroid_val
    FROM ex GROUP BY 1, 2
    """,
)
def q_label_centroids(spark, sf_dir):
    """Per-label centroid vectors, one row per (label, dimension) — the
    class-prototype aggregate behind centroid classifiers and IVF coarse
    quantizers (operators/similarity.py trains the same thing with
    KMeans; this is its supervised one-pass twin).

    Plan: posexplode fans each vector into |dim| rows, then ONE
    map-side-combinable groupBy on (label, pos) — no window, no join, no
    collect; the output is |labels|·|dim| rows regardless of corpus
    size, and partial aggregation means the shuffle carries only
    per-partition (sum, count) pairs. float32 values widen to double
    BEFORE averaging on both engines; the multi-row float AVG is
    order-sensitive → 6dp per the float policy (O(1)-magnitude values:
    headroom to ~sf1000 per NOTES rule 10).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    return ex.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"),
    )


# ---------------------------------------------------------------------------
# Vocabulary growth (Heaps'-law curve)
# ---------------------------------------------------------------------------

_VOCAB_BUCKET_DOCS = 100


@register(
    "vocabulary_growth",
    "WITH " + _TOKS_CTE + f""",
    tok AS (
        SELECT doc_id, lower(u.tk) AS token
        FROM toks, UNNEST(t) AS u(tk) WHERE u.tk != ''
    ),
    occ AS (
        SELECT doc_id // {_VOCAB_BUCKET_DOCS} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS bucket_tokens
        FROM tok GROUP BY 1
    ),
    firsts AS (
        SELECT MIN(doc_id) // {_VOCAB_BUCKET_DOCS} AS bucket, token
        FROM tok GROUP BY token
    ),
    nf AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types
        FROM firsts GROUP BY 1
    )
    SELECT occ.bucket,
           occ.bucket_tokens,
           CAST(SUM(occ.bucket_tokens) OVER cum AS BIGINT) AS cumulative_tokens,
           COALESCE(nf.new_types, 0)  AS new_types,
           CAST(SUM(COALESCE(nf.new_types, 0)) OVER cum AS BIGINT)
               AS vocab_size
    FROM occ LEFT JOIN nf USING (bucket)
    WINDOW cum AS (ORDER BY occ.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_vocabulary_growth(spark, sf_dir):
    """Heaps'-law curve: distinct vocabulary size vs tokens processed, in
    {_VOCAB_BUCKET_DOCS}-doc buckets of doc_id order.

    COUNT(DISTINCT token) OVER (ORDER BY doc) needs unbounded distinct
    state and isn't window-expressible; the scalable identity is
    first-seen decomposition (same as cumulative_active_users): each
    token type counts exactly once, in the bucket of its MIN(doc_id), so
    the curve is a running SUM over per-bucket first-seen counts. Plan:
    one shuffle on token (the min), one on bucket (tiny), and the only
    unpartitioned window runs over the |docs|/{_VOCAB_BUCKET_DOCS}
    bucket table — at extreme corpus sizes widen the bucket or switch
    the running sum to the distributed prefix-sum pattern
    (operators/enumerate.py). Counts are exact int64; no floats anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tk"),
    ).filter(F.col("tk") != "").select(
        "doc_id", F.lower("tk").alias("token")
    )
    occ = tok.groupBy(
        (F.col("doc_id") / _VOCAB_BUCKET_DOCS).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("bucket_tokens"))
    firsts = tok.groupBy("token").agg(
        (F.min("doc_id") / _VOCAB_BUCKET_DOCS).cast("long").alias("bucket")
    )
    nf = firsts.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("new_types")
    )
    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    joined = occ.join(nf, "bucket", "left").select(
        "bucket",
        "bucket_tokens",
        F.coalesce("new_types", F.lit(0)).alias("new_types"),
    )
    return joined.select(
        "bucket",
        "bucket_tokens",
        F.sum("bucket_tokens").over(cum).cast("long").alias(
            "cumulative_tokens"
        ),
        "new_types",
        F.sum("new_types").over(cum).cast("long").alias("vocab_size"),
    )


# ---------------------------------------------------------------------------
# Multi-signal dedup agreement (text LSH candidates × embedding cosine)
# ---------------------------------------------------------------------------


@register(
    "dedup_signal_agreement",
    "WITH " + _MINHASH_CTES + "," + _EMB_CTE + """,
    cand AS (""" + _MINHASH_CAND_SELECT + """),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
               ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
    )
    SELECT j.doc_a, j.doc_b, j.n_common, j.jaccard,
           """ + _cosine_sql("ea.v", "eb.v") + """ AS cosine,
           j.jaccard >= 0.5 AS text_near,
           """ + _cosine_sql("ea.v", "eb.v") + """ >= 0.35 AS emb_near
    FROM jac j
    JOIN emb ea ON j.doc_a = ea.vec_id
    JOIN emb eb ON j.doc_b = eb.vec_id
    """,
)
def q_dedup_signal_agreement(spark, sf_dir):
    """Cross-modal dedup audit: do the TEXT near-dup signal (exact shingle
    Jaccard over MinHash-LSH candidates) and the EMBEDDING signal (cosine
    over the same doc pair, doc_id = vec_id) agree?

    The production question behind it: a near-dup pipeline that prunes on
    one signal needs to know the other signal's disagreement rate before
    trusting the pruning. Candidates come from the SAME banded-LSH
    machinery as dedup_minhash_lsh (bounded candidate phase — the corpus
    never self-joins); exact Jaccard runs only over candidates
    (threshold 0 keeps every overlapping candidate so DISagreements are
    visible, not filtered away); the embedding side joins by key — two
    hash joins, no vector scan beyond the candidate set. Jaccard is a
    ratio of exact ints; cosine follows the repo-wide 6dp embedding
    policy; both flags compare the ROUNDED values so the booleans are
    bit-identical across engines.
    """
    from .operators.dedup import (
        _doc_shingles,
        jaccard_over_candidates,
        minhash_lsh_candidates,
    )
    from .operators.similarity import _to_double, dot, l2_norm

    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs, 3).localCheckpoint(eager=True)
    cand = minhash_lsh_candidates(
        docs, k=3, num_hashes=16, bands=4, shingles=sh
    )
    jac = jaccard_over_candidates(
        docs, cand, k=3, threshold=0.0, shingles=sh
    )
    # norms hoisted to one fold per vector (r12, see cosine_topk); same
    # operand order (norm_a * norm_b) keeps the doubles bit-identical
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _to_double(F.col("embedding")).alias("v")
    )
    emb = emb.select("vec_id", "v", l2_norm(F.col("v")).alias("__n"))
    ea = emb.select(
        F.col("vec_id").alias("doc_a"), F.col("v").alias("va"),
        F.col("__n").alias("__na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("doc_b"), F.col("v").alias("vb"),
        F.col("__n").alias("__nb"),
    )
    cos = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb")), 6
    )
    return (
        jac.join(ea, "doc_a")
        .join(eb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_common", "jaccard",
            cos.alias("cosine"),
            (F.col("jaccard") >= 0.5).alias("text_near"),
            (cos >= 0.35).alias("emb_near"),
        )
    )


# ---------------------------------------------------------------------------
# Token bigram language-model statistics
# ---------------------------------------------------------------------------


@register(
    "token_bigrams",
    r"""
    WITH lt AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents
    ),
    bi AS (
        SELECT t[g.i] AS w1, t[g.i + 1] AS w2
        FROM lt, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
        WHERE len(t) >= 2
    ),
    bc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM bi GROUP BY 1, 2
    ),
    wt AS (
        SELECT w1, CAST(SUM(n_occurrences) AS BIGINT) AS w1_total
        FROM bc GROUP BY 1
    ),
    top AS (
        SELECT w1, w2, n_occurrences
        FROM bc
        ORDER BY n_occurrences DESC, w1 ASC, w2 ASC
        LIMIT 100
    )
    SELECT t.w1, t.w2, t.n_occurrences, wt.w1_total,
           t.n_occurrences / wt.w1_total AS cond_prob
    FROM top t JOIN wt USING (w1)
    """,
)
def q_token_bigrams(spark, sf_dir):
    """Corpus bigram statistics: the 100 most frequent token bigrams with
    their conditional probability P(w2 | w1) — the n-gram LM building
    block (and the token-level analog of event_transition_matrix).

    Adjacent pairs are built JVM-side from the token array (element_at
    over sequence(1, n-1) — no window, no self-join; docs shorter than 2
    tokens are filtered BEFORE sequence() so the descending-range crash
    the r4 ADVICE found in word_shingles can't recur). The top-100 cut is
    a TakeOrderedAndProject on (count desc, bigram asc) — deterministic,
    never a full sort — and the w1 row-sum table joins back only for
    those 100 keys. Counts and totals are exact int64; cond_prob divides
    them raw.
    """
    docs = load_table(spark, sf_dir, "documents")
    lt = docs.select(
        F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    bi = lt.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "             element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bc = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    wt = bc.groupBy("w1").agg(F.sum("n_occurrences").alias("w1_total"))
    top = bc.orderBy(
        F.col("n_occurrences").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(100)
    return top.join(wt, "w1").select(
        "w1", "w2", "n_occurrences", "w1_total",
        (F.col("n_occurrences") / F.col("w1_total")).alias("cond_prob"),
    )


# ---------------------------------------------------------------------------
# Dedup survivorship: canonical doc per near-dup cluster by quality
# ---------------------------------------------------------------------------


@register(
    "dedup_survivorship",
    "WITH RECURSIVE " + _MINHASH_CTES + rf""",
    cand AS ({_MINHASH_CAND_SELECT}),
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
    cc AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY 1),
    m AS (
        SELECT doc_id,
               len(t) AS n_tokens,
               list_sum(list_transform(t, x -> length(x))) * 1.0
                   / len(t) AS avg_token_len,
               len(list_filter(t, x -> lower(x) IN ({_ALL_SW_SQL}))) * 1.0
                   / len(t) AS stopword_ratio,
               length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
                   / length(text) AS symbol_ratio,
               len(list_distinct(t)) * 1.0 / len(t) AS distinct_ratio
        FROM toks
    ),
    q AS (
        SELECT doc_id,
            (CAST(n_tokens BETWEEN {_QF_MIN_TOKENS} AND {_QF_MAX_TOKENS}
                  AS INTEGER)
             + CAST(avg_token_len BETWEEN {_QF_MIN_AVG_LEN!r}
                    AND {_QF_MAX_AVG_LEN!r} AS INTEGER)
             + CAST(stopword_ratio >= {_QF_MIN_STOPWORD!r} AS INTEGER)
             + CAST(symbol_ratio <= {_QF_MAX_SYMBOL!r} AS INTEGER)
             + CAST(distinct_ratio >= {_QF_MIN_DISTINCT!r} AS INTEGER)
            ) / 5.0 AS quality_score
        FROM m
    ),
    ranked AS (
        SELECT cc.cluster_id, cc.doc_id, q.quality_score,
               ROW_NUMBER() OVER (PARTITION BY cc.cluster_id
                   ORDER BY q.quality_score DESC, cc.doc_id ASC) AS pick,
               CAST(COUNT(*) OVER (PARTITION BY cc.cluster_id) AS BIGINT)
                   AS n_members
        FROM cc JOIN q USING (doc_id)
    )
    SELECT cluster_id, doc_id AS survivor_doc_id,
           quality_score AS survivor_quality,
           n_members, n_members - 1 AS n_dropped
    FROM ranked WHERE pick = 1
    """,
)
def q_dedup_survivorship(spark, sf_dir):
    """End-to-end curation survivorship: resolve near-dup clusters
    (connected components over MinHash-LSH candidates — same machinery as
    dedup_clusters) and keep the HIGHEST-QUALITY member of each cluster
    (Gopher-style quality_score, doc_id as deterministic tiebreak) —
    the "which copy do we train on" decision, composed from the two
    registered primitives so they cannot drift apart.

    Plan: cluster resolution is iterative min-label propagation
    (operators/graph.py, converges in O(diameter) rounds); quality runs
    embarrassingly parallel per doc and joins on doc_id; the argmax is a
    row_number window over the cluster-member table (|docs in clusters|,
    a sliver of the corpus). quality_score is an exact k/5 double;
    everything else is int64 — hash-exact unrounded.
    """
    from .operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(docs, k=3, num_hashes=16, bands=4)
    cc = connected_components(cand).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    quality = q_doc_quality_score(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    joined = cc.join(quality, "doc_id")
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    w_cl = Window.partitionBy("cluster_id")
    ranked = joined.select(
        "cluster_id", "doc_id", "quality_score",
        F.row_number().over(w_rank).alias("pick"),
        F.count(F.lit(1)).over(w_cl).alias("n_members"),
    )
    return ranked.filter(F.col("pick") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("survivor_doc_id"),
        F.col("quality_score").alias("survivor_quality"),
        "n_members",
        (F.col("n_members") - 1).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix
# ---------------------------------------------------------------------------


@register(
    "lang_id_confusion",
    "WITH " + _TOKS_CTE + f""",
    pred AS (
        SELECT doc_id, lang AS lang_label, {_LANG_CASE} AS lang_guess
        FROM toks
    ),
    cm AS (
        SELECT lang_label, lang_guess, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY 1, 2
    )
    SELECT lang_label, lang_guess, n_docs,
           n_docs / CAST(SUM(n_docs) OVER (PARTITION BY lang_label)
                         AS BIGINT) AS share_of_label
    FROM cm
    """,
)
def q_lang_id_confusion(spark, sf_dir):
    """Classifier-eval confusion matrix for the heuristic language ID:
    per (true lang, predicted lang) document counts and the row-share
    (recall on the diagonal, confusion mass off it).

    Composes the registered lang_id surface, so the matrix cannot drift
    from the per-doc query. Plan: one combinable groupBy collapses the
    corpus to ≤|langs|² cells; the normalizing window runs over that tiny
    aggregate. Shares are exact-int64 divisions emitted raw.
    """
    pred = q_lang_id(spark, sf_dir).select("lang_label", "lang_guess")
    cm = pred.groupBy("lang_label", "lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("lang_label")
    return cm.select(
        "lang_label", "lang_guess", "n_docs",
        (F.col("n_docs") / F.sum("n_docs").over(w)).alias("share_of_label"),
    )


# ---------------------------------------------------------------------------
# Near-dup threshold-tuning curve
# ---------------------------------------------------------------------------


@register(
    "near_dup_rate_curve",
    "WITH " + _MINHASH_CTES + """,
    cand AS (""" + _MINHASH_CAND_SELECT + """),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    banded_j AS (
        SELECT CAST(LEAST(20 * n_common // (sa.n + sb.n - n_common), 20)
                    AS BIGINT) AS jaccard_band
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
    ),
    bc AS (
        SELECT jaccard_band, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM banded_j GROUP BY 1
    )
    SELECT jaccard_band,
           jaccard_band / 20.0 AS band_lo,
           n_pairs,
           CAST(SUM(n_pairs) OVER (ORDER BY jaccard_band DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS pairs_at_or_above
    FROM bc
    """,
)
def q_near_dup_rate_curve(spark, sf_dir):
    """Threshold-tuning data for the near-dup pipeline: how many LSH
    candidate pairs fall in each Jaccard band of width 0.05, with the
    cumulative at-or-above count a threshold choice would keep — the
    curve you read BEFORE fixing the dedup threshold on a new corpus.

    Banding is EXACT integer arithmetic: band = ⌊20·|∩| / |∪|⌋ via
    integer floor-division (a float ``floor(jaccard·20)`` would 1-ulp
    flip at band edges — exact 0.05 multiples are common since Jaccard
    is a small-integer ratio); jaccard == 1 collapses into the top band
    via LEAST. The cumulative window runs over ≤21 band rows. Candidates
    come from the same bounded banded-LSH machinery as dedup_minhash_lsh.
    """
    from .operators.dedup import _doc_shingles, minhash_lsh_candidates

    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs, 3).localCheckpoint(eager=True)
    cand = minhash_lsh_candidates(
        docs, k=3, num_hashes=16, bands=4, shingles=sh
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    banded_j = (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            F.least(
                F.expr("div(20 * n_common, na + nb - n_common)"), F.lit(20)
            )
            .cast("bigint")
            .alias("jaccard_band")
        )
    )
    bc = banded_j.groupBy("jaccard_band").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    w_cum = Window.orderBy(F.col("jaccard_band").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return bc.select(
        "jaccard_band",
        (F.col("jaccard_band") / F.lit(20.0)).alias("band_lo"),
        "n_pairs",
        F.sum("n_pairs").over(w_cum).cast("bigint").alias(
            "pairs_at_or_above"
        ),
    )


@register("ann_pq_topk")  # no SQL oracle: KMeans codebooks (rows-only check)
def q_ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN top-10: per-subspace codebooks (m=8,
    k=16 → 4-byte codes, 64× smaller than float32), ADC scoring over
    codes only, exact-cosine rerank of the top-4k candidates. Not
    SQL-expressible (iterative Lloyd training) → rows-only; the exact
    twin is ann_ivf_full_probe (same queries, brute-force oracle) and
    planted-twin recall ≥ 0.95 is asserted in tests/test_llm_ops3.py."""
    from .operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk(emb, query_ids=list(range(5)), k=10).select(
        "query_id", "neighbor_id", "score", F.col("rank").alias("nn_rank")
    )


@register("ann_ivf_pq_topk")  # no SQL oracle: KMeans quantizers (rows-only)
def q_ann_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ ANN top-10 (FAISS IVFPQ shape): coarse-quantizer probe
    filter over 4-byte PQ codes, exact rerank. Rows-only (two iterative
    trainers); exact twin ann_ivf_full_probe; planted-twin recall ≥0.9
    asserted in tests/test_llm_ops3.py (two approximations stack, so the
    bound is looser than either alone)."""
    from .operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(emb, query_ids=list(range(5)), k=10).select(
        "query_id", "neighbor_id", "score", F.col("rank").alias("nn_rank")
    )

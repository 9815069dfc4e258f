"""LLM/corpus operators, part 6: corpus-shape statistics — Zipf fit,
vocabulary coverage, lexical diversity, and source-distribution KL
divergence.

- ``zipf_slope`` — the log-log OLS fit of frequency on rank over the
  vocabulary head: the one-number "does this corpus look like natural
  language" check (natural text reads ~ -1). Complements
  ``vocabulary_growth`` (Heaps' law — vocab vs corpus size) with the
  frequency-decay side of the power-law pair.
- ``vocab_coverage`` — cumulative token-mass coverage of the top-k
  vocabulary for a ladder of k: the table a tokenizer-budget decision
  reads ("how much of the corpus do 10k merges already cover").
- ``lexical_diversity_by_source`` — type-token ratio, hapax share and
  Herdan's C per source: the repetitiveness ranking that catches
  template-generated or boilerplate-heavy feeds before training.
- ``kl_source_divergence`` — pairwise smoothed KL divergence (and the
  symmetric Jensen-Shannon) between per-source unigram distributions
  over a shared head vocabulary: the drift measure for a training-mix
  monitor ("source B stopped looking like source A").

Float policy (NOTES rules 9-15): token counts and ranks are exact
integers; every probability is ONE exact division; ln() on
bit-identical inputs is last-ulp-exposed and every cross-term SUM is
order-sensitive, so ALL emitted statistics are ROUND(...,6) applied
once to the final value. Shares whose numerator/denominator are both
exact ints (coverage, TTR, hapax) are single divisions emitted RAW.

100 TB shape: every query aggregates the token stream ONCE into a
(token[, source]) count table before anything pairwise happens; the
pairwise phases run over capped-vocabulary broadcasts (head vocab
<= {V} rows), so nothing quadratic ever touches corpus-sized data.
Top-k selection is orderBy+limit (TakeOrderedAndProject — per-partition
top-k, tiny merge), never a row_number window over the full vocabulary
(the token_frequencies lesson).

Reference lineage: the reference has no corpus-statistics surface —
extension scope per SURVEY §2.12; tokenization shared with
functions/text.py (reference src/transform.py:61-77 string cleaning).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.text import ws_tokens
from .registry import register
from .sources.tables import load_table

_TOKS_CTE = r"""
toks AS (
    SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
tok AS (
    SELECT doc_id, source, lower(u.tk) AS token FROM toks, UNNEST(t) AS u(tk)
)
"""

_ZIPF_N = 100          # vocabulary head entering the log-log fit
_COVER_KS = (10, 25, 50, 100, 500)
_KL_VOCAB = 200        # shared head vocabulary for the KL phase


def _spark_tokens(spark, sf_dir, with_source=False):
    docs = load_table(spark, sf_dir, "documents")
    cols = (["source"] if with_source else []) + [
        F.explode(ws_tokens(F.col("text"))).alias("tk")
    ]
    out = docs.select(*cols)
    return out.select(
        *(["source"] if with_source else []), F.lower("tk").alias("token")
    )


# ---------------------------------------------------------------------------
# Zipf log-log slope over the vocabulary head
# ---------------------------------------------------------------------------


@register(
    "zipf_slope",
    "WITH "
    + _TOKS_CTE
    + f""",
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
    top AS (SELECT token, n FROM counts ORDER BY n DESC, token
            LIMIT {_ZIPF_N}),
    ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
        FROM top
    ),
    xy AS (
        SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
        FROM ranked
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM xy
    )
    SELECT k AS n_tokens,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k,
                 6) AS intercept,
           ROUND((k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 6) AS r2
    FROM m
    """,
)
def q_zipf_slope(spark, sf_dir):
    """Zipf's-law fit: OLS of ln(frequency) on ln(rank) over the
    top-{_ZIPF_N} tokens. Natural language reads a slope near -1 with
    r2 > 0.9; a flat slope flags synthetic or template corpora.

    Exactness: counts and ranks are exact ints; ln on identical
    doubles is 1-ulp-exposed and the five moment SUMs over the
    {_ZIPF_N} fit points are order-sensitive, so slope/intercept/r2
    are each ROUND(...,6) once at the end (noise ~1e-15 relative vs
    a 1e-6 grid). Degenerate den = 0 cannot occur: ranks 1..k are
    distinct so var(x) > 0 whenever k >= 2.

    Plan: top-{_ZIPF_N} is orderBy+limit (TakeOrderedAndProject);
    the rank and the OLS run over <= {_ZIPF_N} rows packed into one
    sorted array (single tiny partition by construction, not by
    accident — no full-vocab Window node, the token_frequencies
    lesson)."""
    tok = _spark_tokens(spark, sf_dir)
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), "token").limit(_ZIPF_N)
    packed = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct((-F.col("n")).alias("__neg"), F.col("token"),
                         F.col("n"))
            )
        ).alias("__ts")
    )
    xy = packed.select(
        F.posexplode("__ts").alias("__pos", "__s")
    ).select(
        F.log((F.col("__pos") + 1).cast("double")).alias("x"),
        F.log(F.col("__s.n").cast("double")).alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k = F.col("k").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    s_num = k * sxy - sx * sy
    den = k * sxx - sx * sx
    return m.select(
        F.col("k").alias("n_tokens"),
        F.round(s_num / den, 6).alias("slope"),
        F.round((sy - s_num / den * sx) / k, 6).alias("intercept"),
        F.round(s_num * s_num / (den * (k * syy - sy * sy)), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage ladder
# ---------------------------------------------------------------------------


@register(
    "vocab_coverage",
    "WITH "
    + _TOKS_CTE
    + f""",
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
    top AS (SELECT token, n FROM counts ORDER BY n DESC, token
            LIMIT {max(_COVER_KS)}),
    ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
        FROM top
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
                     CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types
              FROM tok)
    SELECT CAST(k.k AS INTEGER)                    AS top_k,
           CAST(SUM(r.n) AS BIGINT)                AS covered_tokens,
           CAST(SUM(r.n) AS BIGINT) * 1.0 / MIN(t.total) AS coverage,
           MIN(t.n_types)                          AS vocab_size
    FROM (VALUES {", ".join(f"({k})" for k in _COVER_KS)}) AS k(k),
         ranked r, total t
    WHERE r.rnk <= k.k
    GROUP BY 1
    """,
)
def q_vocab_coverage(spark, sf_dir):
    """Cumulative corpus coverage of the top-k vocabulary for
    k in {_COVER_KS}: the token-mass ladder a vocabulary-size /
    tokenizer-budget decision reads, with the full vocabulary size
    alongside. covered/total is one exact int division per row —
    emitted RAW (no rounding needed anywhere in this query).

    Plan: ONE token aggregate feeds both the head (orderBy+limit →
    TakeOrderedAndProject) and the corpus totals (count + distinct
    count in one pass over the count table — never a second corpus
    scan); the k-ladder is a {len(_COVER_KS)}-row local cross of the
    packed head array. No Window over the vocabulary."""
    tok = _spark_tokens(spark, sf_dir)
    # the count table feeds BOTH the head and the totals; localCheckpoint
    # materializes the one corpus aggregate so the two branches don't
    # re-scan the corpus (the corpus_datacard shared-table pattern)
    counts = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    top = counts.orderBy(F.col("n").desc(), "token").limit(max(_COVER_KS))
    # totals from the count table: corpus tokens = SUM(n), types = rows
    total = counts.agg(
        F.sum("n").cast("bigint").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("__types"),
    )
    packed = top.agg(
        F.sort_array(
            F.collect_list(F.struct((-F.col("n")).alias("__neg"),
                                    F.col("token"), F.col("n")))
        ).alias("__ts")
    )
    ranked = packed.select(
        F.posexplode("__ts").alias("__pos", "__s")
    ).select((F.col("__pos") + 1).alias("rnk"), F.col("__s.n").alias("n"))
    ks = spark.createDataFrame([(k,) for k in _COVER_KS], "k int")
    return (
        ranked.join(F.broadcast(ks), F.col("rnk") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("n").cast("bigint").alias("covered_tokens"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("k").cast("int").alias("top_k"),
            "covered_tokens",
            (F.col("covered_tokens") / F.col("__total")).alias("coverage"),
            F.col("__types").alias("vocab_size"),
        )
    )


# ---------------------------------------------------------------------------
# Lexical diversity per source
# ---------------------------------------------------------------------------


@register(
    "lexical_diversity_by_source",
    "WITH "
    + _TOKS_CTE
    + """,
    st AS (
        SELECT source, token, COUNT(*) AS n FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT)                       AS n_tokens,
           CAST(COUNT(*) AS BIGINT)                     AS n_types,
           CAST(COUNT(*) AS BIGINT) * 1.0
               / CAST(SUM(n) AS BIGINT)                 AS ttr,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               * 1.0 / CAST(COUNT(*) AS BIGINT)         AS hapax_share,
           ROUND(ln(CAST(COUNT(*) AS DOUBLE))
                 / ln(CAST(SUM(n) AS DOUBLE)), 6)       AS herdan_c
    FROM st GROUP BY 1
    """,
)
def q_lexical_diversity_by_source(spark, sf_dir):
    """Lexical-diversity panel per source: type-token ratio, hapax
    (frequency-1) share of the vocabulary, and Herdan's C =
    ln(types)/ln(tokens) — the size-robust diversity exponent. A
    template or boilerplate feed reads low on all three; the quality
    pass uses this to rank sources before mixing.

    Exactness: TTR and hapax_share are single exact int divisions —
    RAW; Herdan's C divides two 1-ulp-exposed ln values → ROUND 6.

    Plan: one (source, token) aggregate, then a per-source aggregate
    that reuses the same hash partitioning (source is a prefix of the
    group key) — two exchanges total, nothing pairwise."""
    tok = _spark_tokens(spark, sf_dir, with_source=True)
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n"))
    g = st.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint").alias("__hapax"),
    )
    return g.select(
        "source", "n_tokens", "n_types",
        (F.col("n_types") / F.col("n_tokens")).alias("ttr"),
        (F.col("__hapax") / F.col("n_types")).alias("hapax_share"),
        F.round(
            F.log(F.col("n_types").cast("double"))
            / F.log(F.col("n_tokens").cast("double")),
            6,
        ).alias("herdan_c"),
    )


# ---------------------------------------------------------------------------
# Pairwise source KL / Jensen-Shannon divergence
# ---------------------------------------------------------------------------


@register(
    "kl_source_divergence",
    "WITH "
    + _TOKS_CTE
    + f""",
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
    vocab AS (SELECT token FROM counts ORDER BY n DESC, token
              LIMIT {_KL_VOCAB}),
    v_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    st AS (
        SELECT t.source, t.token, COUNT(*) AS n
        FROM tok t JOIN vocab USING (token) GROUP BY 1, 2
    ),
    s_tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot
              FROM st GROUP BY 1),
    dense AS (
        SELECT s.source, vb.token,
               (COALESCE(st.n, 0) + 1) * 1.0 / (s.tot + v.v) AS p
        FROM s_tot s CROSS JOIN vocab vb CROSS JOIN v_n v
        LEFT JOIN st ON st.source = s.source AND st.token = vb.token
    )
    SELECT a.source AS source_a, b.source AS source_b,
           ROUND(SUM(a.p * ln(a.p / b.p)), 6) AS kl_ab,
           ROUND(SUM(0.5 * a.p * ln(2.0 * a.p / (a.p + b.p))
                     + 0.5 * b.p * ln(2.0 * b.p / (a.p + b.p))), 6) AS js
    FROM dense a JOIN dense b ON a.token = b.token
                             AND a.source <> b.source
    GROUP BY 1, 2
    """,
)
def q_kl_source_divergence(spark, sf_dir):
    """Training-mix drift matrix: for every ordered source pair, the
    Kullback-Leibler divergence KL(a||b) and the symmetric
    Jensen-Shannon divergence of their unigram distributions over a
    shared {_KL_VOCAB}-token head vocabulary with add-one smoothing
    (every vocab token gets count+1, so no zero denominators and both
    distributions live on the same support).

    Exactness: each smoothed probability is ONE exact division of
    exact ints; the per-term ln is 1-ulp-exposed and the sum over the
    {_KL_VOCAB}-term support is order-sensitive → both divergences
    ROUND(...,6).

    Plan: the corpus token stream is aggregated ONCE into the
    (source, token) count table (localCheckpoint-materialized — the
    shared-table pattern; the global head vocab is its sum over
    sources, not a second corpus pass); everything pairwise happens
    on the S x {_KL_VOCAB} dense matrix — sources x head-vocab, KBs,
    itself checkpointed before the a x b self-join. At 100 TB the
    pair phase grows as sources^2 x vocab cap, never with the
    corpus; the (source, token) table is full-vocabulary-sized (the
    TF-IDF DF-table class of aggregate), distributed across executor
    block storage."""
    tok = _spark_tokens(spark, sf_dir, with_source=True)
    # ONE corpus pass: the (source, token) count table subsumes the
    # global counts (sum over sources); localCheckpoint materializes it
    # so vocab selection, per-source totals, and the dense matrix all
    # derive from the same physical aggregate instead of re-scanning
    # the corpus per branch (probe: the naive tree exploded to 12
    # parquet scans through the a x b self-join).
    stc = (
        tok.groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    counts = stc.groupBy("token").agg(F.sum("n").alias("n"))
    vocab = counts.orderBy(F.col("n").desc(), "token") \
        .limit(_KL_VOCAB).select("token")
    st = stc.join(F.broadcast(vocab), "token")
    s_tot = st.groupBy("source").agg(F.sum("n").cast("bigint").alias("tot"))
    v_n = vocab.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    dense = (
        s_tot.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(v_n))
        .join(st, ["source", "token"], "left")
        .select(
            "source", "token",
            ((F.coalesce(F.col("n"), F.lit(0)) + 1)
             / (F.col("tot") + F.col("v"))).alias("p"),
        )
        # sources x head-vocab rows — KBs; materialize before the
        # pairwise self-join so a x b duplicates nothing
        .localCheckpoint(eager=True)
    )
    a = dense.alias("a")
    b = dense.alias("b")
    pa, pb = F.col("a.p"), F.col("b.p")
    pair = a.join(
        b,
        (F.col("a.token") == F.col("b.token"))
        & (F.col("a.source") != F.col("b.source")),
    )
    return (
        pair.groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.round(F.sum(pa * F.log(pa / pb)), 6).alias("kl_ab"),
            F.round(
                F.sum(
                    F.lit(0.5) * pa * F.log(F.lit(2.0) * pa / (pa + pb))
                    + F.lit(0.5) * pb * F.log(F.lit(2.0) * pb / (pa + pb))
                ),
                6,
            ).alias("js"),
        )
    )


# ---------------------------------------------------------------------------
# Character-trigram entropy / perplexity per language
# ---------------------------------------------------------------------------


@register(
    "char_trigram_entropy",
    r"""
    WITH s AS (
        SELECT lang, lower(text) AS s FROM documents
    ),
    tri AS (
        SELECT lang, substr(s, CAST(u.i AS INTEGER), 3) AS g
        FROM s, UNNEST(generate_series(1, length(s) - 2)) AS u(i)
        WHERE length(s) >= 3
    ),
    prof AS (
        SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS n
        FROM tri GROUP BY 1, 2
    ),
    tot AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS vocab
        FROM prof GROUP BY 1
    )
    SELECT p.lang,
           t.t                                        AS n_trigrams,
           t.vocab                                    AS trigram_vocab,
           ROUND(SUM(-(p.n * 1.0 / t.t) * ln(p.n * 1.0 / t.t)), 6)
                                                      AS entropy_nats,
           ROUND(exp(SUM(-(p.n * 1.0 / t.t) * ln(p.n * 1.0 / t.t))), 6)
                                                      AS perplexity
    FROM prof p JOIN tot t USING (lang)
    GROUP BY 1, 2, 3
    """,
)
def q_char_trigram_entropy(spark, sf_dir):
    """Shannon entropy (nats) and perplexity of each language's
    character-trigram distribution — the script-complexity number that
    separates a natural language from template or encoded junk (low
    entropy) and random bytes (entropy near ln(vocab)). Companion of
    ``lang_trigram_similarity`` (which compares profiles ACROSS
    languages; this scores each profile's internal shape).

    Exactness: trigram counts are exact ints; each p = n/t is ONE
    exact division; ln is 1-ulp-exposed and the entropy sum is
    order-sensitive, so entropy and perplexity are each ROUND(...,6)
    computed from the UNROUNDED sum (perplexity is exp of the
    unrounded entropy, then rounded — rounding before exp would
    quantize twice).

    Plan: one (lang, trigram) aggregate off the exploded trigram
    stream; per-language totals and the entropy sum reuse the lang
    hash partitioning (lang is a prefix of the profile key)."""
    docs = load_table(spark, sf_dir, "documents")
    # length >= 3 filter BEFORE the sequence: Spark's sequence(1, 0)
    # returns a DESCENDING [1, 0] (step defaults to -1 when start >
    # stop), so empty/NULL/1-2-char docs would emit two spurious
    # 'trigram' rows where DuckDB's generate_series(1, 0) is empty.
    # The filter is mirrored in the oracle SQL and pushes down to the
    # parquet scan; NULL text fails `length >= 3` on both engines.
    s = docs.select("lang", F.lower("text").alias("s")).filter(
        F.length("s") >= 3
    )
    tri = s.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(s) - 2),"
                " i -> substring(s, i, 3))"
            )
        ).alias("g"),
    )
    prof = tri.groupBy("lang", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # per-lang totals as WINDOW aggregates over the profile (not a
    # groupBy + join back, which re-plans the corpus subtree twice):
    # the window reuses the lang-prefixed hash partitioning
    from pyspark.sql import Window as _W

    wl = _W.partitionBy("lang")
    withtot = prof.select(
        "lang", "n",
        F.sum("n").over(wl).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(wl).cast("bigint").alias("vocab"),
    )
    p = F.col("n") * F.lit(1.0) / F.col("t")
    ent = F.sum(-p * F.log(p))
    return (
        withtot.groupBy("lang", "t", "vocab")
        .agg(
            F.round(ent, 6).alias("entropy_nats"),
            F.round(F.exp(ent), 6).alias("perplexity"),
        )
        .select(
            "lang",
            F.col("t").alias("n_trigrams"),
            F.col("vocab").alias("trigram_vocab"),
            "entropy_nats", "perplexity",
        )
    )


# ---------------------------------------------------------------------------
# Token burstiness (Church-Gale): clustering of occurrences into documents
# ---------------------------------------------------------------------------

_BURST_TOP = 100


@register(
    "token_burstiness",
    "WITH "
    + _TOKS_CTE
    + f""",
    occ AS (
        SELECT doc_id, token, COUNT(*) AS k FROM tok GROUP BY 1, 2
    ),
    stats AS (
        SELECT token,
               CAST(SUM(k) AS BIGINT)   AS cf,
               CAST(COUNT(*) AS BIGINT) AS df
        FROM occ GROUP BY 1
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    top AS (
        SELECT token, cf, df FROM stats
        ORDER BY cf DESC, token LIMIT {_BURST_TOP}
    )
    SELECT token, cf, df,
           cf * 1.0 / df AS mean_per_doc,
           ROUND(df / (n_docs * (1.0 - exp(-(cf * 1.0 / n_docs)))), 6)
               AS df_vs_poisson
    FROM top, nd
    """,
)
def q_token_burstiness(spark, sf_dir):
    """Church-Gale burstiness for the top-{_BURST_TOP} tokens by
    collection frequency: mean occurrences per CONTAINING document
    (cf/df — a function word reads ~uniform, a topical word bursts)
    and the observed document frequency against the Poisson-mixing
    expectation N(1 - e^(-cf/N)). df_vs_poisson << 1 marks bursty,
    topical tokens — the content-word detector a keyword extractor or
    stopword-list builder reads.

    Exactness: cf/df/N are exact ints; mean_per_doc is ONE exact
    division (RAW); the Poisson expectation chains one division, one
    1-ulp exp, and two more single ops, so the ratio is ROUND(...,6).

    Plan: one (doc_id, token) aggregate, one token aggregate on top of
    it, TakeOrderedAndProject for the head, 1-row N broadcast. No
    windows, nothing pairwise."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("tk")
    ).select("doc_id", F.lower("tk").alias("token"))
    occ = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("k")
    )
    stats = occ.groupBy("token").agg(
        F.sum("k").cast("bigint").alias("cf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    top = stats.orderBy(F.col("cf").desc(), "token").limit(_BURST_TOP)
    expect = F.col("n_docs") * (
        F.lit(1.0) - F.exp(-(F.col("cf") * F.lit(1.0) / F.col("n_docs")))
    )
    return top.crossJoin(F.broadcast(nd)).select(
        "token", "cf", "df",
        (F.col("cf") * F.lit(1.0) / F.col("df")).alias("mean_per_doc"),
        F.round(F.col("df") / expect, 6).alias("df_vs_poisson"),
    )

"""Corpus-shape statistics (registry_llm6.py): Zipf fit, vocabulary
coverage, lexical diversity, source KL divergence — semantics against
Python references on hand corpora. Oracle parity is covered by
tools/verify_oracle.py / -m oracle."""

import math

import pytest

import stock_market_etl_pipeline_spark.registry_llm6 as llm6

from conftest import SF_DIR


def _docs(spark, rows):
    """rows: list of (doc_id, text, source)."""
    return spark.createDataFrame(
        [(i, t, "xx", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _patch(monkeypatch, spark, rows):
    df = _docs(spark, rows)
    monkeypatch.setattr(llm6, "load_table", lambda s, d, n: df)


# ---------------------------------------------------------------------------
# Zipf
# ---------------------------------------------------------------------------


def test_zipf_exact_power_law_reads_minus_one(spark, monkeypatch):
    # frequencies 1200/r for rank r = 1..6: ln f = ln 1200 - 1 * ln r
    freqs = [1200 // r for r in (1, 2, 3, 4, 5, 6)]  # 1200,600,400,300,240,200
    words = [f"w{i}" for i in range(6)]
    text = " ".join(
        " ".join([w] * f) for w, f in zip(words, freqs)
    )
    _patch(monkeypatch, spark, [(0, text, "s0")])
    r = llm6.q_zipf_slope(spark, SF_DIR).collect()[0]
    assert r.n_tokens == 6
    assert r.slope == pytest.approx(-1.0, abs=1e-6)
    assert r.r2 == pytest.approx(1.0, abs=1e-6)
    assert r.intercept == pytest.approx(math.log(1200), abs=1e-6)


def test_zipf_matches_python_ols_on_uneven_counts(spark, monkeypatch):
    freqs = [37, 19, 11, 7, 5, 3, 2]
    words = [f"t{i}" for i in range(len(freqs))]
    text = " ".join(" ".join([w] * f) for w, f in zip(words, freqs))
    _patch(monkeypatch, spark, [(0, text, "s0")])
    r = llm6.q_zipf_slope(spark, SF_DIR).collect()[0]
    xs = [math.log(i + 1) for i in range(len(freqs))]
    ys = [math.log(f) for f in sorted(freqs, reverse=True)]
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert r.slope == pytest.approx(round(slope, 6), abs=2e-6)
    assert r.intercept == pytest.approx(
        round((sy - slope * sx) / k, 6), abs=2e-6
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_ladder_exact(spark, monkeypatch):
    # 30 distinct tokens: token i appears (31 - i) times, i = 1..30
    parts = []
    for i in range(1, 31):
        parts.extend([f"v{i:02d}"] * (31 - i))
    _patch(monkeypatch, spark, [(0, " ".join(parts), "s0")])
    rows = {r.top_k: r for r in llm6.q_vocab_coverage(spark, SF_DIR).collect()}
    total = sum(range(1, 31))  # 465
    assert set(rows) == {10, 25, 50, 100, 500}
    top10 = sum(31 - i for i in range(1, 11))  # ranks 1..10
    assert rows[10].covered_tokens == top10
    assert rows[10].coverage == pytest.approx(top10 / total, rel=1e-12)
    # k beyond the vocabulary covers everything
    assert rows[100].covered_tokens == total
    assert rows[100].coverage == 1.0
    assert rows[100].vocab_size == 30


# ---------------------------------------------------------------------------
# Lexical diversity
# ---------------------------------------------------------------------------


def test_lexical_diversity_exact_counts(spark, monkeypatch):
    rows = [
        (0, "a a a b b c", "rich"),      # types {a,b,c}, hapax {c}
        (1, "x x x x x x", "flat"),      # types {x}, hapax {}
    ]
    _patch(monkeypatch, spark, rows)
    out = {
        r.source: r
        for r in llm6.q_lexical_diversity_by_source(spark, SF_DIR).collect()
    }
    rich = out["rich"]
    assert (rich.n_tokens, rich.n_types) == (6, 3)
    assert rich.ttr == pytest.approx(0.5, rel=1e-12)
    assert rich.hapax_share == pytest.approx(1 / 3, rel=1e-12)
    assert rich.herdan_c == pytest.approx(
        round(math.log(3) / math.log(6), 6), abs=1e-9
    )
    flat = out["flat"]
    assert (flat.n_tokens, flat.n_types) == (6, 1)
    assert flat.ttr == pytest.approx(1 / 6, rel=1e-12)
    assert flat.hapax_share == 0.0
    assert flat.herdan_c == 0.0  # ln(1)/ln(6)


# ---------------------------------------------------------------------------
# KL divergence
# ---------------------------------------------------------------------------


def _kl_reference(counts_a, counts_b, vocab):
    v = len(vocab)
    ta = sum(counts_a.get(t, 0) for t in vocab)
    tb = sum(counts_b.get(t, 0) for t in vocab)
    pa = {t: (counts_a.get(t, 0) + 1) / (ta + v) for t in vocab}
    pb = {t: (counts_b.get(t, 0) + 1) / (tb + v) for t in vocab}
    kl = sum(pa[t] * math.log(pa[t] / pb[t]) for t in vocab)
    js = sum(
        0.5 * pa[t] * math.log(2 * pa[t] / (pa[t] + pb[t]))
        + 0.5 * pb[t] * math.log(2 * pb[t] / (pa[t] + pb[t]))
        for t in vocab
    )
    return round(kl, 6), round(js, 6)


def test_kl_identical_sources_zero(spark, monkeypatch):
    rows = [(0, "a b c a b", "s1"), (1, "a b c a b", "s2")]
    _patch(monkeypatch, spark, rows)
    out = llm6.q_kl_source_divergence(spark, SF_DIR).collect()
    assert len(out) == 2  # both ordered pairs
    for r in out:
        assert r.kl_ab == 0.0
        assert r.js == 0.0


def test_kl_matches_reference_and_is_asymmetric(spark, monkeypatch):
    ta = "a a a a b b c d"
    tb = "a b b b b c c e"
    rows = [(0, ta, "s1"), (1, tb, "s2")]
    _patch(monkeypatch, spark, rows)
    out = {
        (r.source_a, r.source_b): r
        for r in llm6.q_kl_source_divergence(spark, SF_DIR).collect()
    }
    ca, cb = {}, {}
    for t in ta.split():
        ca[t] = ca.get(t, 0) + 1
    for t in tb.split():
        cb[t] = cb.get(t, 0) + 1
    # head vocab = all distinct tokens here (< _KL_VOCAB), sorted by
    # corpus frequency desc then token
    tot = {t: ca.get(t, 0) + cb.get(t, 0) for t in set(ca) | set(cb)}
    vocab = sorted(tot, key=lambda t: (-tot[t], t))
    kl12, js12 = _kl_reference(ca, cb, vocab)
    kl21, js21 = _kl_reference(cb, ca, vocab)
    r12, r21 = out[("s1", "s2")], out[("s2", "s1")]
    assert r12.kl_ab == pytest.approx(kl12, abs=2e-6)
    assert r21.kl_ab == pytest.approx(kl21, abs=2e-6)
    assert r12.js == pytest.approx(js12, abs=2e-6)
    # JS is symmetric, KL is not (on this pair)
    assert r12.js == r21.js
    assert r12.kl_ab != r21.kl_ab
    assert r12.kl_ab > 0 and r12.js > 0


# ---------------------------------------------------------------------------
# Character-trigram entropy
# ---------------------------------------------------------------------------


def test_trigram_entropy_uniform_and_degenerate(spark, monkeypatch):
    # 'abcabc' -> trigrams abc, bca, cab, abc: H = -(2/4 ln 2/4 + 2*(1/4 ln 1/4))
    rows = [(0, "abcabc", "uni"), (1, "xxxxx", "flat")]
    df = spark.createDataFrame(
        [(i, t, lang, "s0", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(llm6, "load_table", lambda s, d, n: df)
    out = {r.lang: r for r in
           llm6.q_char_trigram_entropy(spark, SF_DIR).collect()}
    h = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert out["uni"].n_trigrams == 4
    assert out["uni"].trigram_vocab == 3
    assert out["uni"].entropy_nats == pytest.approx(round(h, 6), abs=2e-6)
    assert out["uni"].perplexity == pytest.approx(
        round(math.exp(h), 6), abs=2e-6
    )
    # single repeated trigram: zero entropy, perplexity 1
    assert out["flat"].trigram_vocab == 1
    assert out["flat"].entropy_nats == 0.0
    assert out["flat"].perplexity == 1.0


def test_trigram_entropy_short_empty_null_docs(spark, monkeypatch):
    """Docs shorter than 3 chars must contribute NOTHING — Spark's
    sequence(1, 0) is a descending [1, 0] (ADVICE r9: two spurious
    'trigram' rows per short doc), so the length>=3 guard is
    load-bearing for oracle parity with DuckDB's empty
    generate_series(1, 0). NULL/empty/1-2-char docs are dropped; a
    lang whose ONLY docs are short emits no row at all."""
    rows = [
        (0, None, "shorty"),
        (1, "", "shorty"),
        (2, "h", "shorty"),
        (3, "hi", "shorty"),
        (4, "abc", "edge"),      # exactly one trigram
        (5, "hi", "mixed"),      # short doc must not pollute 'mixed'
        (6, "abcabc", "mixed"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, "s0", len(t) if t else 0) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(llm6, "load_table", lambda s, d, n: df)
    out = {r.lang: r for r in
           llm6.q_char_trigram_entropy(spark, SF_DIR).collect()}
    assert "shorty" not in out          # nothing but short docs -> no row
    assert out["edge"].n_trigrams == 1
    assert out["edge"].trigram_vocab == 1
    assert out["edge"].entropy_nats == 0.0
    assert out["edge"].perplexity == 1.0
    # 'mixed' sees only the 4 trigrams of 'abcabc' (abc, bca, cab, abc)
    h = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert out["mixed"].n_trigrams == 4
    assert out["mixed"].trigram_vocab == 3
    assert out["mixed"].entropy_nats == pytest.approx(round(h, 6), abs=2e-6)


# ---------------------------------------------------------------------------
# Token burstiness
# ---------------------------------------------------------------------------


def test_burstiness_bursty_vs_uniform(spark, monkeypatch):
    # 'uni' appears once in each of 8 docs; 'burst' 8 times in one doc:
    # same cf, very different df
    rows = []
    for i in range(8):
        rows.append((i, "uni filler" + str(i), "s0"))
    rows.append((100, " ".join(["burst"] * 8), "s0"))
    _patch(monkeypatch, spark, rows)
    out = {r.token: r for r in
           llm6.q_token_burstiness(spark, SF_DIR).collect()}
    uni, burst = out["uni"], out["burst"]
    assert (uni.cf, uni.df) == (8, 8)
    assert (burst.cf, burst.df) == (8, 1)
    assert uni.mean_per_doc == 1.0
    assert burst.mean_per_doc == 8.0
    n = 9
    expect = n * (1.0 - math.exp(-8 / n))
    assert uni.df_vs_poisson == pytest.approx(round(8 / expect, 6), abs=2e-6)
    assert burst.df_vs_poisson == pytest.approx(
        round(1 / expect, 6), abs=2e-6
    )
    assert burst.df_vs_poisson < 0.5 < uni.df_vs_poisson

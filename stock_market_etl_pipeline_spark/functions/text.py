"""Text-analysis Column expressions for the LLM-data-pipeline operators.

All pure built-in expressions (split/regexp/md5/transform) — no Python
UDFs, so they run inside whole-stage codegen and scale linearly with
executors. Every function has an exact DuckDB-SQL twin (registry oracle
strings) built on the same md5-based hashing so correctness checks are
bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenization (matches DuckDB string_split_regex(trim(x),'\s+')).
def ws_tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


# BPE-ish lexer tokens: letter runs, digit runs, single punctuation marks.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def _shingle_windows(tokens: Column, k: int) -> Column:
    """All k-token windows as space-joined strings; EMPTY array when the
    document has fewer than k tokens.

    The n >= k guard is load-bearing: ``sequence(1, greatest(n-k+1, 0))``
    alone yields the DESCENDING array [1, 0] when n < k (Spark defaults
    step to -1 when start > stop) and ``slice(tokens, 0, k)`` then throws
    INVALID_PARAMETER_VALUE.START at runtime. The DuckDB oracles'
    ``generate_series(1, n-k+1)`` is empty in that case, so without the
    guard Spark crashes where the oracle returns rows.
    """
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), n - (k - 1))
    windows = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, k), " "))
    return F.when(n >= k, windows).otherwise(F.array().cast("array<string>"))


def word_shingles(tokens: Column, k: int) -> Column:
    """Distinct word k-grams: array of space-joined k-token windows.

    ``transform(sequence(1, n-k+1), i -> array_join(slice(tokens, i, k)))``;
    documents shorter than k produce an empty array (guard in
    `_shingle_windows`).
    """
    return F.array_distinct(_shingle_windows(tokens, k))


def word_shingles_all(tokens: Column, k: int) -> Column:
    """ALL word k-gram windows in order (duplicates kept) — the positional
    variant of `word_shingles` for coverage/repetition measures, where
    each window position counts once. Empty array for docs shorter than
    k tokens (guard in `_shingle_windows`)."""
    return _shingle_windows(tokens, k)


def normalized_fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercase + collapsed whitespace.

    The exact-dedup key (reference has no analog; standard canonicalization).
    """
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def md5_hash60(s: Column) -> Column:
    """Deterministic 60-bit integer hash from the first 15 hex chars of md5.

    Portable across Spark (conv base16) and DuckDB ('0x…'::BIGINT) — the
    shared hash primitive for MinHash/SimHash oracles.
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "de": ("der", "die", "das", "und", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "es": ("el", "la", "y", "los", "que", "un"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")


def stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens that are in the given stopword list."""
    return F.size(
        F.filter(tokens, lambda t: F.lower(t).isin(*[F.lit(w) for w in words]))
    )

"""Text-analysis columns for large-scale training-data pipelines.

Extension surface beyond the reference (SURVEY §7.1 M5): language-ID
heuristics, quality scoring, token counting, document fingerprinting.
Everything is a native Catalyst expression (split / filter / aggregate
higher-order functions) — no Python in the hot path, so these run
JVM-side over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual marker profiles for the language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "les"],
    "de": ["der", "die", "und", "das", "ist"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    r"""Whitespace tokenization; empty/space-blank text → empty array
    (not ['']).

    Quirk, shared BIT-FOR-BIT by every DuckDB oracle
    (``string_split_regex(trim(text), '\s+')``): trim strips ASCII
    spaces only, so text padded with tabs/newlines yields empty-string
    edge tokens on BOTH engines — consistent, hash-stable, but callers
    that treat tokens as words (e.g. operators/keywords.py) should
    filter ``length(tok) > 0``. Changing this here requires changing
    every oracle's tokenizer in the same commit."""
    t = F.trim(_col(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: contiguous letter runs, digit runs, and
    single punctuation marks each count as one token (a cheap BPE
    proxy). The alternation pattern is RE2-safe, so the same regex runs
    in DuckDB for the oracle."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(BPE_ISH_PATTERN), F.lit(0))).cast(
        "long"
    )


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [A-Za-z0-9 or whitespace]."""
    t = _col(text)
    total = F.length(t)
    alnum = F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))
    return F.when(total > 0, (total - alnum) / total).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (quality-scoring signal)."""
    sw = stopwords or STOPWORDS_EN
    toks = tokens(text)
    sw_arr = F.array(*[F.lit(w) for w in sw])
    n_sw = F.size(F.filter(toks, lambda x: F.array_contains(sw_arr, F.lower(x))))
    n = F.size(toks)
    return F.when(n > 0, n_sw / n).otherwise(F.lit(0.0))


def mean_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def lang_marker_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-word hit counts (n-gram-heuristic language ID).

    Returns {lang: count-of-marker-tokens}. Argmax over these is the
    predicted language; on marker-free text every score is 0 → 'unk'.
    """
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, F.lower(x)))).cast(
            "long"
        )
    return out


def positional_fingerprint(text: Column | str) -> Column:
    """Deterministic order-sensitive document fingerprint.

    Position-weighted token hash: sum_i(i * (codepoint(first char)*131
    + len(token)) mod 2^31-1) mod 2^31-1. Order-sensitive (the position
    multiplies the token value, so swapped tokens change the sum) and
    expressible in both Spark and ANSI SQL, so it is oracle-checkable —
    use xxhash64 for production-strength fingerprints.
    """
    # The token array is bound as a LAMBDA VARIABLE (the one-element
    # array transform trick from operators/dedup.word_shingles):
    # inlining `tokens(text)` into the per-index lambda re-tokenizes
    # the document on EVERY element_at — higher-order-function
    # arguments sit outside codegen subexpression elimination, so the
    # fingerprint was O(words²) tokenizations per row. Bound once, it
    # is O(words), and the computed value is identical.
    def _fp_of(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(toks))
        vals = F.transform(
            idx,
            lambda i: (
                i.cast("long")
                * (
                    F.ascii(F.substring(F.element_at(toks, i), 1, 1)).cast("long") * 131
                    + F.length(F.element_at(toks, i))
                )
            )
            % 2147483647,
        )
        total = (
            F.aggregate(vals, F.lit(0).cast("long"), lambda acc, x: acc + x)
            % 2147483647
        )
        return F.when(F.size(toks) > 0, total).otherwise(F.lit(0)).cast("long")

    return F.element_at(
        F.transform(F.array(tokens(text)), lambda t: _fp_of(t)), 1
    )

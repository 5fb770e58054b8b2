"""Text-analysis functions for training-data pipelines.

All pure Column expressions (codegen'd, no Python). The reference's only
"text" functions are byte-level codecs and script classification
(util/Utils.java, BJOutput._getAddress — SURVEY.md §2.6 F1-F4); these are the
transcript/document-domain equivalents with the same shape: deterministic,
nullable-safe, vectorizable.

Every function here has an exact ANSI-SQL twin used by the DuckDB oracles in
``plans/queries.py`` — keep the formulas in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Small marker-word dictionaries for the language-ID heuristic. Deterministic
# tie-break order: en > es > de.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "with"),
    "es": ("el", "la", "de", "que", "los", "con"),
    "de": ("der", "die", "und", "das", "mit", "ist"),
}

STOPWORDS = LANG_MARKERS["en"] + ("a", "in", "for", "on", "by")


def tokens(text: Column) -> Column:
    """Lowercase alnum tokens, empties removed."""
    toks = F.split(F.lower(text), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace/punct token count."""
    return F.size(tokens(text))


def bpe_token_estimate(text: Column) -> Column:
    """BPE-ish token estimate: each word contributes ceil(len/4) subword
    tokens (a cheap, deterministic stand-in for a real tokenizer)."""
    per_word = F.transform(tokens(text), lambda t: F.ceil(F.length(t) / F.lit(4.0)))
    return F.coalesce(F.aggregate(per_word, F.lit(0).cast("long"), lambda a, x: a + x), F.lit(0))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(n > 0, stops / n).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowercasing."""
    lowered = F.lower(text)
    n = F.length(lowered)
    alnum = F.length(F.regexp_replace(lowered, "[^a-z0-9 ]", ""))
    return F.when(n > 0, (n - alnum) / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length saturation x stopword
    presence x (1 - punctuation noise)."""
    n_tok = token_count(text)
    length_part = F.least(F.lit(1.0), n_tok / F.lit(64.0))
    stop_part = F.lit(0.5) + F.lit(0.5) * stopword_ratio(text)
    noise_part = F.lit(1.0) - punct_ratio(text)
    return length_part * stop_part * noise_part


def lang_counts(text: Column) -> dict[str, Column]:
    toks = tokens(text)

    # closure factory keeps the lambda unary (PySpark derives higher-order-
    # function arity from the Python signature — a `m=markers` default
    # would make it binary and fail analysis)
    def counter(markers: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    return {lang: counter(markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """Argmax language by marker-word hits; ties resolve en > es > de;
    zero hits → 'und' (undetermined)."""
    c = lang_counts(text)
    best = F.greatest(*c.values())
    return (
        F.when(best == 0, F.lit("und"))
        .when(c["en"] == best, F.lit("en"))
        .when(c["es"] == best, F.lit("es"))
        .otherwise(F.lit("de"))
    )


def content_hash(text: Column) -> Column:
    """Exact-dup fingerprint (md5 hex — reproducible in any SQL oracle)."""
    return F.md5(text)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as strings (for Jaccard / MinHash).
    Empty array when the text has fewer than n tokens (note: a bare
    ``sequence(0, k-n)`` would generate a DESCENDING sequence for k<n)."""
    toks = tokens(text)
    k = F.size(toks)
    grams = F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(0), k - n), lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_shingles_positional(text: Column, n: int = 3) -> Column:
    """POSITIONAL word n-gram shingles — one entry per position, repeats
    kept. Winnowing needs this: its window-min selection is defined over
    the positional k-gram stream, and dropping repeats (array_distinct)
    would change window composition and break the shared-substring
    guarantee for texts with recurring k-grams."""
    toks = tokens(text)
    k = F.size(toks)
    return F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(0), k - n), lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        ),
    ).otherwise(F.array().cast("array<string>"))

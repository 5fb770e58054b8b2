"""Text-analysis functions for training-data pipelines.

Pure Column expressions (codegen'd, no Python) everywhere except the
shingle generators, which are Arrow-batched pandas UDFs because Spark's
``array_distinct`` is O(len²) per row and measurably dominates (see
:func:`_shingle_udf`). The reference's only
"text" functions are byte-level codecs and script classification
(util/Utils.java, BJOutput._getAddress — SURVEY.md §2.6 F1-F4); these are the
transcript/document-domain equivalents with the same shape: deterministic,
nullable-safe, vectorizable.

Every function here has an exact ANSI-SQL twin used by the DuckDB oracles in
``plans/queries.py`` — keep the formulas in sync.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


def shingle_list(text: str | None, n: int, distinct: bool = True) -> list[str]:
    """Pure-Python word n-gram shingles — THE single source of truth for
    shingle semantics (lowercase, split on [^a-z0-9]+, drop empties,
    space-joined n-grams, order-preserving distinct). Used by the Arrow
    UDF below AND by the driver/mapper sides of the postings-GEMM dedup
    paths (operators/dedup.py), so every path tokenizes identically."""
    toks = [w for w in _TOKRE.split(text.lower()) if w] if text is not None else []
    if len(toks) < n:
        return []
    gen = (" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
    return list(dict.fromkeys(gen)) if distinct else list(gen)


_TOKRE = re.compile(TOKEN_SPLIT_RE)


@lru_cache(maxsize=None)
def _shingle_udf(n: int, distinct: bool):
    """Arrow-batched shingle UDF, one compiled instance per (n, distinct).

    This is the ONE text function that is measurably faster in Python than
    as Column expressions (sf0.1, 5000 docs, local[32]):

    * Column-expression shingles + ``array_distinct``: 10.8 s — Spark's
      array_distinct is an O(len²) pairwise-equality scan per row, and it
      dominates (the grams themselves cost 0.3 s);
    * staged ``array_sort`` + adjacent-dedupe HOFs: worse (CollapseProject
      re-inlines the sort into every element_at — the SNIPPETS.md pitfall);
    * this Arrow UDF (regex split + dict.fromkeys): 2.4 s.

    Token semantics are IDENTICAL to :func:`tokens` (lowercase, split on
    [^a-z0-9]+, drop empties) so the DuckDB oracles reproduce it exactly
    — the shared :func:`shingle_list` body guarantees it.
    """

    @pandas_udf("array<string>")
    def udf(texts: pd.Series) -> pd.Series:
        return pd.Series([shingle_list(t, n, distinct) for t in texts])

    return udf


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as strings (for Jaccard / MinHash).
    Empty array when the text has fewer than n tokens. Arrow-vectorized
    (see :func:`_shingle_udf` for the measured rationale)."""
    return _shingle_udf(n, True)(text)


def word_shingles_positional(text: Column, n: int = 3) -> Column:
    """POSITIONAL word n-gram shingles — one entry per position, repeats
    kept. Winnowing needs this: its window-min selection is defined over
    the positional k-gram stream, and dropping repeats would change window
    composition and break the shared-substring guarantee for texts with
    recurring k-grams."""
    return _shingle_udf(n, False)(text)

"""Composed corpus-curation pass: the end-to-end workflow a training-data
pipeline runs over a raw document table, chaining this package's operators
in their canonical order:

    quality/lang filter → exact dedup → fuzzy dedup (near-dup clusters →
    keep one) → benchmark decontamination → per-source frequency cap →
    train/val/test split

Each stage is one of the individually-tested operators (functions/text.py,
operators/dedup.py, operators/cc.py, operators/sampling.py); this module
only composes them and reports per-stage counters — the DbUpdate.printStats
habit (reference DbUpdate.java:196-214) applied to corpus curation. Every
stage is deterministic at any parallelism, so the curated corpus (and its
split assignment) is reproducible byte-for-byte — the property that
matters when a 10^12-token corpus must be rebuilt identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from . import dedup, sampling
from .cc import connected_components


def curate(
    docs: DataFrame,
    evalset: DataFrame | None = None,
    *,
    min_quality: float = 0.25,
    langs: tuple[str, ...] | None = ("en",),
    ngram_n: int = 3,
    jaccard_threshold: float = 0.5,
    contamination_min_shared: int = 8,
    per_source_max: int | None = None,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> tuple[DataFrame, dict]:
    """Run the full curation pass; returns (curated DataFrame, counters).

    The returned frame is materialized stage-by-stage (persist + count per
    stage — the counters ARE the actions, nothing is counted twice); the
    caller gets a persisted final frame and should unpersist it when done.
    Stages whose parameters are None are skipped and absent from counters.
    """
    counters: dict[str, int] = {}
    cur = docs.persist()
    counters["input"] = cur.count()

    # 1. quality + language gate (pure Column math — one scan)
    cond = TX.quality_score(F.col(text_col)) >= F.lit(float(min_quality))
    if langs is not None:
        cond = cond & TX.lang_id(F.col(text_col)).isin(*langs)
    nxt = cur.where(cond).persist()
    counters["after_quality_lang"] = nxt.count()
    cur.unpersist()
    cur = nxt

    # 2. exact dedup (content-hash groupBy, min-id winner)
    nxt = dedup.dedup_exact(cur, id_col, text_col).persist()
    counters["after_exact_dedup"] = nxt.count()
    cur.unpersist()
    cur = nxt

    # 3. fuzzy dedup: near-dup pairs → connected clusters → keep the
    # cluster-min doc (transitive chains collapse to ONE survivor — the
    # t07_dedup_groups semantics)
    sh = dedup.shingle_docs(cur, id_col, text_col, ngram_n).persist()
    pairs = dedup.ngram_jaccard_pairs(
        cur, id_col, text_col, n=ngram_n, threshold=jaccard_threshold, sh=sh
    )
    # connected_components materializes eagerly, so the shingle frame can
    # be released right after (the t07 persist-hygiene rule)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    sh.unpersist()
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    nxt = cur.join(losers, id_col, "left_anti").persist()
    counters["after_fuzzy_dedup"] = nxt.count()
    cur.unpersist()
    cur = nxt

    # 4. benchmark decontamination (skip when no eval set supplied)
    if evalset is not None:
        contaminated = (
            dedup.cross_contamination(
                cur, evalset, id_col, text_col, n=ngram_n, min_shared=contamination_min_shared
            )
            .select(F.col("train_id").alias(id_col))
            .distinct()
        )
        nxt = cur.join(contaminated, id_col, "left_anti").persist()
        counters["after_decontamination"] = nxt.count()
        cur.unpersist()
        cur = nxt

    # 5. per-source frequency cap (skew-aware exact top-n-by-hash)
    if per_source_max is not None:
        nxt = sampling.per_key_cap(cur, source_col, per_source_max, id_col).persist()
        counters["after_source_cap"] = nxt.count()
        cur.unpersist()
        cur = nxt

    # 6. leakage-safe split assignment (same key ⇒ same split, any rerun)
    if splits is not None:
        nxt = sampling.hash_split(cur, id_col, splits).persist()
        counters["output"] = nxt.count()
        cur.unpersist()
        cur = nxt
    else:
        counters["output"] = counters[list(counters)[-1]]

    return cur, counters

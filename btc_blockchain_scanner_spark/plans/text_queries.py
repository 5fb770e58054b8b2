"""Text / training-data pipeline queries over the documents + embeddings
tables: dedup (exact, n-gram Jaccard, MinHash LSH, SimHash), text quality,
language ID, token stats, and embedding similarity search.

Every deterministic-SQL-expressible query carries a DuckDB oracle whose
formulas mirror functions/text.py exactly (same token regex, same ratios,
double arithmetic in the same order). MinHash/SimHash/ANN variants are
rows-only (hash functions aren't reproducible in DuckDB) — their semantics
are tested against the exact implementations in tests/test_text_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import dedup, similarity
from ..sources.tables import load
from .registry import query

# DuckDB token expression twin of functions.text.tokens()
_D_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_D_STOPS = "['the','and','of','to','is','with','a','in','for','on','by']"


@query(
    "t01_exact_dup_groups",
    oracle="""
    SELECT md5(text) AS content_md5, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
    FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
)
def t01_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy (single shuffle on the hash;
    min-id winner is deterministic)."""
    return dedup.exact_dup_groups(load(spark, sf_dir, "documents"))


@query(
    "t02_doc_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_D_TOKS} AS toks FROM documents),
    m AS (SELECT doc_id, text,
                 len(toks) AS n_tokens,
                 CAST(list_sum(list_transform(toks,
                      x -> CAST(ceil(length(x) / CAST(4 AS DOUBLE)) AS BIGINT))) AS BIGINT)
                   AS bpe_tokens,
                 len(list_filter(toks, x -> list_contains({_D_STOPS}, x))) AS n_stops
          FROM t)
    SELECT doc_id, n_tokens, bpe_tokens,
           CASE WHEN n_tokens > 0
                THEN CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END AS stop_ratio,
           least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(64 AS DOUBLE))
             * (CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE) *
                (CASE WHEN n_tokens > 0
                      THEN CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                      ELSE CAST(0 AS DOUBLE) END))
             * (CAST(1 AS DOUBLE) -
                (CASE WHEN length(lower(text)) > 0
                      THEN CAST(length(lower(text)) -
                           length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                           / CAST(length(lower(text)) AS DOUBLE)
                      ELSE CAST(0 AS DOUBLE) END))
             AS quality
    FROM m
    """,
)
def t02_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics (functions/text.py) — all codegen'd
    Column math, no UDF; the scan reads only (doc_id, text)."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        TX.bpe_token_estimate(t).alias("bpe_tokens"),
        TX.stopword_ratio(t).alias("stop_ratio"),
        TX.quality_score(t).alias("quality"),
    )


@query(
    "t03_doc_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_D_TOKS} AS toks FROM documents),
    c AS (SELECT doc_id, lang,
                 len(list_filter(toks, x -> list_contains(['the','and','of','to','is','with'], x))) AS c_en,
                 len(list_filter(toks, x -> list_contains(['el','la','de','que','los','con'], x))) AS c_es,
                 len(list_filter(toks, x -> list_contains(['der','die','und','das','mit','ist'], x))) AS c_de
          FROM t)
    SELECT lang,
           CASE WHEN greatest(c_en, c_es, c_de) = 0 THEN 'und'
                WHEN c_en = greatest(c_en, c_es, c_de) THEN 'en'
                WHEN c_es = greatest(c_en, c_es, c_de) THEN 'es'
                ELSE 'de' END AS lang_pred,
           COUNT(*) AS n
    FROM c GROUP BY 1, 2
    """,
)
def t03_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic vs the labeled lang column."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("lang", TX.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


@query(
    "t04_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents)
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
           (SELECT COUNT(DISTINCT tok) FROM (SELECT unnest(toks) AS tok FROM t)) AS distinct_tokens,
           CAST(SUM(len(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tokens
    FROM t
    """,
)
def t04_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics — whitespace/punct tokenization."""
    d = load(spark, sf_dir, "documents").select(TX.tokens(F.col("text")).alias("toks"))
    agg = d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("total_tokens"),
    )
    distinct = (
        d.select(F.explode("toks").alias("tok")).agg(F.countDistinct("tok").alias("distinct_tokens"))
    )
    return agg.crossJoin(distinct).select(
        "n_docs",
        "total_tokens",
        "distinct_tokens",
        (F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")).alias("avg_tokens"),
    )


@query(
    "t05_ngram_jaccard_dups",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len({_D_TOKS}) - 1, 1)),
               i -> array_to_string(({_D_TOKS})[i:i+2], ' '))) AS sh
      FROM documents
      WHERE len({_D_TOKS}) >= 3)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jacc
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5
    """,
)
def t05_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard >= 0.5. Spark side generates
    candidates via shared-shingle join (linear in corpus + collisions);
    the oracle brute-forces the same relation."""
    return dedup.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


@query("t06_minhash_lsh_dups")  # rows-only: hash permutations not in DuckDB
def t06_minhash_lsh_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms)+LSH(8 bands) candidates, exact-Jaccard verified at
    0.5 — must reproduce t05's pair set with high recall (asserted in
    tests); this is the 100 TB dedup path."""
    return dedup.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), n=3, num_perm=32, num_bands=8, threshold=0.5
    )


@query("t07_simhash_dups")  # rows-only: bit-vote signature not in DuckDB
def t07_simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs at Hamming<=3 via pigeonhole block
    banding."""
    return dedup.simhash_dup_pairs(load(spark, sf_dir, "documents"), max_hamming=3)


@query(
    "t08_emb_top1_neighbor",
    oracle="""
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
    scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               AS cos_sim
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 50)
    SELECT q_id, c_id FROM (
      SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rn
      FROM scored)
    WHERE rn = 1
    """,
)
def t08_emb_top1_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-1 cosine neighbor for the first 50 vectors (brute force,
    broadcast query side). cos_sim itself is excluded from the output —
    only the argmax (identical double arithmetic on both engines makes the
    ranking deterministic)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 50)
    top = similarity.brute_force_topk(q, emb, k=1)
    return top.select("q_id", "c_id")


@query(
    "t10_emb_dup_exact",
    oracle="""
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
    s AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               AS cos_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b FROM s WHERE cos_sim >= 0.35
    """,
)
def t10_emb_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact (broadcast cross join) — the
    baseline the LSH variant (t11) is measured against. Threshold 0.35 is
    calibrated to this corpus (max pairwise cosine ~0.51)."""
    emb = load(spark, sf_dir, "embeddings")
    return dedup.embedding_dup_pairs(emb, threshold=0.35, exact=True).select("id_a", "id_b")


@query("t11_emb_dup_lsh")  # rows-only: candidate set is LSH-approximate
def t11_emb_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via multi-table hyperplane LSH + exact verify —
    the scale path (recall vs t10 asserted in tests)."""
    emb = load(spark, sf_dir, "embeddings")
    return dedup.embedding_dup_pairs(
        emb, threshold=0.35, num_tables=12, planes_per_table=3
    ).select("id_a", "id_b")


@query("t12_winnow_dups")  # rows-only: fingerprint sketch
def t12_winnow_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint near-dup pairs (Schleimer et al.): shared
    selected k-gram hashes >= 3."""
    return dedup.winnow_dup_pairs(load(spark, sf_dir, "documents"), k=5, window=4, min_shared=3)


@query("t09_emb_lsh_topk")  # rows-only: approximate by design
def t09_emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-1 via random-hyperplane LSH buckets + in-bucket exact cosine;
    recall vs brute force asserted in tests."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 50)
    return similarity.lsh_topk(q, emb, k=1).select("q_id", "c_id")

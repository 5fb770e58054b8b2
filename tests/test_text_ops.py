"""Text-pipeline operators: exact dedup, MinHash-LSH recall vs exact
Jaccard, SimHash, ANN recall vs brute force."""

import pytest
from pyspark.sql import functions as F

from btc_blockchain_scanner_spark.operators import dedup, similarity
from btc_blockchain_scanner_spark.sources.tables import load


def docs_df(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "behind tall mountains and rivers flow quietly through green valleys "
        "carrying cold water toward the distant northern sea"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup: one token changed
        (4, "completely different content about spark and iceberg tables"),
        (5, "spark and iceberg tables are completely different content about"),
        (6, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    d = docs_df(spark)
    groups = dedup.exact_dup_groups(d).collect()
    assert len(groups) == 1 and groups[0].n_docs == 2 and groups[0].keep_id == 1
    kept = dedup.dedup_exact(d)
    assert kept.count() == 5
    assert kept.where(F.col("doc_id") == 2).count() == 0


def test_ngram_hub_cap_keeps_jaccard_exact(spark):
    # every doc shares one boilerplate sentence (hub shingles, df = n_docs);
    # docs 1/2 are near-dups of each other beyond the boilerplate.
    boiler = "this transcript is confidential property of the example corp"
    rows = [
        (1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
        (2, boiler + " alpha beta gamma delta epsilon zeta eta iota"),
        (3, boiler + " one two three four five six seven eight"),
        (4, boiler + " nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r.id_a, r.id_b, round(r.jacc, 6))
        for r in dedup.ngram_jaccard_pairs(d, threshold=0.5, max_shingle_freq=None).collect()
    }
    capped = {
        (r.id_a, r.id_b, round(r.jacc, 6))
        for r in dedup.ngram_jaccard_pairs(d, threshold=0.5, max_shingle_freq=3).collect()
    }
    # hub shingles (df=4 > 3) leave candidate generation, but the reported
    # jaccard still counts them — pair (1,2) survives with the EXACT value
    assert capped == uncapped
    assert any(a == 1 and b == 2 for a, b, _ in capped)
    # pairs (3,4): only shared shingles are boilerplate → below 0.5 anyway
    # sanity: candidate explosion actually pruned — hub shingles produce
    # 4*3/2=6 candidate pairs each; with the cap only (1,2) shares non-hub
    capped_low = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(d, threshold=0.01, max_shingle_freq=3).collect()
    }
    assert capped_low == {(1, 2)}


def test_minhash_lsh_recall_vs_exact(spark):
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(docs, n=3, num_perm=32, num_bands=8, threshold=0.5).collect()
    }
    # verification step guarantees precision == 1.0 (approx ⊆ exact)
    assert approx <= exact
    # banding with r=4,b=8 keeps recall high at j>=0.5
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.9, (recall, len(exact))


def test_simhash_arrow_matches_column_spec(spark):
    """The Arrow bit-vote signature must be BIT-identical to the Column
    reference implementation (simhash_from_hashes) on real and edge-case
    texts — including empty token lists."""
    rows = [(r.doc_id, r.text) for r in load(spark, "/root/testdata/sf0.001", "documents").limit(60).collect()]
    rows += [(9001, ""), (9002, "...!!!"), (9003, "one"), (9004, "go go go go go")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r._id, r._sig) for r in dedup.simhash_signatures(d).collect()}
    from btc_blockchain_scanner_spark.functions import text as TX

    hashed = d.select(
        F.col("doc_id").alias("_id"),
        F.transform(TX.tokens(F.col("text")), lambda t: F.xxhash64(t)).alias("_h"),
    ).repartition("_id")
    want = {
        (r._id, r._sig)
        for r in hashed.select("_id", dedup.simhash_from_hashes(F.col("_h")).alias("_sig")).collect()
    }
    assert got == want


def test_simhash_finds_near_dups(spark):
    d = docs_df(spark)
    pairs = {(r.id_a, r.id_b): r.hamming for r in dedup.simhash_dup_pairs(d, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0  # identical text → identical signature
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup within hamming 3
    assert (1, 4) not in pairs


def test_zero_norm_vectors_never_rank(spark):
    """A zero-norm vector has undefined cosine; it must neither appear as a
    neighbor nor pull in dup pairs (regression: NaN sorts above every double
    in Spark desc windows, so an unguarded 0/0 made zero vectors everyone's
    top-1)."""
    from btc_blockchain_scanner_spark.operators.dedup import embedding_dup_pairs
    from btc_blockchain_scanner_spark.operators.similarity import brute_force_topk, lsh_topk

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero-norm
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = brute_force_topk(e, e, k=1).collect()
    assert all(r.c_id != 2 for r in top), "zero vector ranked as a neighbor"
    assert all(r.q_id != 2 for r in top), "zero query produced a neighbor"
    topl = lsh_topk(e, e, k=1, num_tables=4, planes_per_table=2, dim=4).collect()
    assert all(r.c_id != 2 and r.q_id != 2 for r in topl)
    for exact in (True, False):
        pairs = embedding_dup_pairs(
            e, threshold=0.5, exact=exact, num_tables=4, planes_per_table=2, dim=4
        ).collect()
        assert all(2 not in (r.id_a, r.id_b) for r in pairs), f"exact={exact}"
        assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}, f"exact={exact}"


def test_ivf_recall_on_clustered_corpus(spark):
    """IVF ANN: on a corpus with real cluster structure (its operating
    assumption) probing 4/16 lists must recover ~all brute-force top-1
    neighbors; the uniform synthetic corpus caps IVF near 0.88 even at
    8 probes (documented in ivf_topk) — LSH is the data-oblivious
    alternative there."""
    import numpy as np

    from btc_blockchain_scanner_spark.operators.similarity import brute_force_topk, ivf_topk

    # 8 deterministic well-separated centers, 60 points each, small jitter
    rng_base = np.arange(8 * 64, dtype=np.float64).reshape(8, 64)
    centers = np.cos(rng_base * 2.654435) * 10.0  # fixed, spread out
    rows = []
    vid = 0
    for c in range(8):
        for j in range(60):
            jit = np.cos((np.arange(64) + 13 * j + 101 * c) * 1.618) * 0.05
            rows.append((vid, (centers[c] + jit).astype(np.float32).tolist()))
            vid += 1
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = e.where(F.col("vec_id") % 10 == 0)
    exact = {(r.q_id, r.c_id) for r in brute_force_topk(q, e, k=1).collect()}
    approx = {
        (r.q_id, r.c_id)
        for r in ivf_topk(q, e, k=1, n_centroids=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, recall


def test_ann_lsh_recall_vs_brute_force(spark):
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") < 30)
    exact = {r.q_id: (r.c_id, r.cos_sim) for r in similarity.brute_force_topk(q, emb, k=1).collect()}
    approx = {r.q_id: (r.c_id, r.cos_sim) for r in similarity.lsh_topk(q, emb, k=1).collect()}
    hits = sum(1 for k, v in exact.items() if approx.get(k, (None,))[0] == v[0])
    assert hits / len(exact) >= 0.5, hits  # multi-table ANN: top-1 agreement
    # every query gets a neighbor, and its cosine is a decent approximation
    assert len(approx) == len(exact)
    ratio = sum(approx[k][1] / v[1] for k, v in exact.items() if v[1] > 0) / len(exact)
    assert ratio >= 0.8, ratio


def test_cross_contamination_matches_bruteforce(spark, sf_dir):
    """Decontamination (cross-table shared-shingle flagging) vs a DuckDB
    brute-force intersect over the same corpus: eval set = first 10 docs,
    train = the rest."""
    import duckdb

    docs = load(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") >= 10)
    evalset = docs.where(F.col("doc_id") < 10)
    got = {
        (r.train_id, r.eval_id, r.shared_shingles)
        for r in dedup.cross_contamination(train, evalset, n=3, min_shared=4).collect()
    }

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    want = set(
        con.execute(
            f"""
            WITH s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len({toks}) - 1, 1)),
                       i -> array_to_string(({toks})[i:i+2], ' '))) AS sh
              FROM documents WHERE len({toks}) >= 3)
            SELECT t.doc_id, e.doc_id, len(list_intersect(t.sh, e.sh))
            FROM s t JOIN s e ON t.doc_id >= 10 AND e.doc_id < 10
            WHERE len(list_intersect(t.sh, e.sh)) >= 4
            """
        ).fetchall()
    )
    assert got == want
    assert got, "fixture should contain at least one contaminated pair"


def test_cross_contamination_broadcast_guard(spark, sf_dir):
    """ADVICE r4: the eval-side broadcast hint must be size-GUARDED. With
    the threshold forced to 0 the plan falls back to a shuffle join and
    the result is identical; None skips the sizing count entirely."""
    docs = load(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") >= 10)
    evalset = docs.where(F.col("doc_id") < 10)
    want = {
        (r.train_id, r.eval_id, r.shared_shingles)
        for r in dedup.cross_contamination(train, evalset, n=3, min_shared=4).collect()
    }
    for limit in (0, None):
        got = {
            (r.train_id, r.eval_id, r.shared_shingles)
            for r in dedup.cross_contamination(
                train, evalset, n=3, min_shared=4, broadcast_max_shingles=limit
            ).collect()
        }
        assert got == want


def test_gemm_and_join_paths_agree(spark):
    """r6: ngram_jaccard_pairs grew a postings-GEMM plan (closure-broadcast
    numpy counting) next to the shared-shingle join plan. Same contract,
    two physical plans — pin exact pair-set AND value parity on a corpus
    with near-dups, transitive chains, boilerplate hubs and short docs,
    at a permissive threshold so many pairs qualify."""
    boiler = "common shared preamble text that every single document carries along"
    rows = [
        (i, f"{boiler} item {i % 7} alpha beta gamma delta epsilon word{i % 3}")
        for i in range(30)
    ] + [(100, "tiny doc here"), (101, "tiny doc here"), (102, "unrelated standalone content piece")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for cap in (None, 5):
        gemm = {
            (r.id_a, r.id_b, round(r.jacc, 12))
            for r in dedup.ngram_jaccard_pairs(
                d, threshold=0.2, max_shingle_freq=cap
            ).collect()
        }
        join = {
            (r.id_a, r.id_b, round(r.jacc, 12))
            for r in dedup.ngram_jaccard_pairs(
                d, threshold=0.2, max_shingle_freq=cap, gemm_max_incidences=0
            ).collect()
        }
        assert gemm == join, (cap, gemm ^ join)
        assert gemm  # non-vacuous: the fixture must actually produce pairs


def test_cross_contamination_gemm_and_join_agree(spark):
    """Same two-plan parity pin for cross_contamination: the eval-postings
    GEMM stream (broadcast_max_shingles generous) vs the exploded shingle
    join (broadcast_max_shingles=None skips the GEMM eligibility)."""
    boiler = "shared benchmark sentence fragment appearing in train and eval splits"
    rows = [(i, f"{boiler} filler {i % 5} more filler tokens {i % 2}") for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    train = d.where(F.col("doc_id") % 4 != 0)
    evalset = d.where(F.col("doc_id") % 4 == 0)
    gemm = {
        (r.train_id, r.eval_id, r.shared_shingles)
        for r in dedup.cross_contamination(train, evalset, n=3, min_shared=3).collect()
    }
    join = {
        (r.train_id, r.eval_id, r.shared_shingles)
        for r in dedup.cross_contamination(
            train, evalset, n=3, min_shared=3, broadcast_max_shingles=None
        ).collect()
    }
    assert gemm == join
    assert gemm  # non-vacuous

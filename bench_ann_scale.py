"""At-scale evidence for the ANN paths (hyperplane LSH + IVF): 100k
synthetic 64-dim vectors with 100 PLANTED strong neighbors, so top-1
recall is measurable against known ground truth AND against the exact
GEMM baseline at 20-50x the driver-gate corpus.

Corpus: vec(i) = uniform [-1,1)^64 from a vectorized splitmix64 of
(i, dim) — order-free deterministic (kg/datagen.py recipe). Query k
copies corpus vector base(k)=997k and re-draws 4 of 64 dims → cosine vs
its base ≈ sqrt(60/64) ≈ 0.97, an unambiguous planted top-1 in a corpus
whose background pairwise cosines are near-orthogonal noise.

Reports one JSON line with wall + recall for exact / LSH / IVF.
Usage: python bench_ann_scale.py [n_vecs] [n_queries] [cpus]
       (defaults 100000, 100, 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 100
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
DIM = 64
Q_BASE_STRIDE = 997  # query k's planted neighbor is corpus id 997*k
Q_ID_OFFSET = 1_000_000_000
REDRAWN_DIMS = 4


def _vec_mapper(id_expr_to_base, id_out):
    """mapInPandas factory: ids → (id, embedding) with splitmix vectors."""

    def mapper(batches):
        import numpy as np
        import pandas as pd

        U = np.uint64

        def splitmix(x):
            with np.errstate(over="ignore"):
                z = (x + U(0x9E3779B97F4A7C15)).astype(U)
                z = (z ^ (z >> U(30))) * U(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> U(27))) * U(0x94D049BB133111EB)
                return z ^ (z >> U(31))

        def uniform(seed):  # (n, DIM) in [-1, 1)
            return (splitmix(seed) >> np.uint64(11)).astype(np.float64) / float(2**53) * 2 - 1

        dims = np.arange(DIM, dtype=np.int64)
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            base = id_expr_to_base(ids)
            with np.errstate(over="ignore"):
                seed = base[:, None].astype(U) * U(1_000_003) + dims[None, :].astype(U)
            V = uniform(seed)
            if id_out == "q":  # re-draw REDRAWN_DIMS dims with query-unique values
                for s in range(REDRAWN_DIMS):
                    p = (s * 13 + 3) % DIM
                    with np.errstate(over="ignore"):
                        rs = ids.astype(U) * U(7919) + U(s + 101)
                    V[:, p] = (splitmix(rs) >> np.uint64(11)).astype(np.float64) / float(2**53) * 2 - 1
            out_ids = ids if id_out == "c" else ids + Q_ID_OFFSET
            yield pd.DataFrame(
                {"vec_id": out_ids, "embedding": [row.astype(np.float32).tolist() for row in V]}
            )

    return mapper


def main() -> None:
    from pyspark.sql import functions as F

    from btc_blockchain_scanner_spark.operators import similarity
    from btc_blockchain_scanner_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS, app_name="ann_scale")
    schema = "vec_id long, embedding array<float>"
    corpus = (
        spark.range(0, N_VECS, numPartitions=CPUS * 2)
        .mapInPandas(_vec_mapper(lambda ids: ids, "c"), schema)
        .persist()
    )
    queries = (
        spark.range(0, N_QUERIES)
        .mapInPandas(_vec_mapper(lambda ids: ids * Q_BASE_STRIDE, "q"), schema)
        .persist()
    )
    corpus.count(), queries.count()  # materialize outside timed windows

    planted = {int(k + Q_ID_OFFSET): int(k * Q_BASE_STRIDE) for k in range(N_QUERIES)}

    def recall(df) -> float:
        got = {int(r.q_id): int(r.c_id) for r in df.select("q_id", "c_id").collect()}
        return sum(got.get(q) == c for q, c in planted.items()) / len(planted)

    report: dict = {"n_vecs": N_VECS, "n_queries": N_QUERIES, "cpus": CPUS, "dim": DIM}
    t0 = time.perf_counter()
    exact = similarity.brute_force_topk(queries, corpus, k=1)
    report["exact_recall"] = round(recall(exact), 4)
    report["exact_wall_sec"] = round(time.perf_counter() - t0, 2)

    # LSH: index (corpus signature GEMM) built ONCE and persisted; query
    # batches then pay only bucket-join + re-rank — the production shape
    # (signatures are a materialized table per corpus epoch).
    # 8 planes/table → ~N/256 per bucket; planted cos 0.97 (angle 14°):
    # p=0.92/plane, OR-amplified over 12 tables to ~0.9998
    t0 = time.perf_counter()
    cb = similarity._multi_table_buckets(
        corpus.select(F.col("vec_id").alias("_id"), F.col("embedding").alias("_v")),
        "_id", "_v", num_tables=12, planes_per_table=8, dim=DIM,
    ).persist()
    cb.count()
    report["lsh_index_wall_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    lsh = similarity.lsh_topk(
        queries, corpus, k=1, num_tables=12, planes_per_table=8, dim=DIM, corpus_buckets=cb
    )
    report["lsh_recall"] = round(recall(lsh), 4)
    report["lsh_query_wall_sec"] = round(time.perf_counter() - t0, 2)

    # IVF: same split — centroids + inverted lists built once, persisted.
    t0 = time.perf_counter()
    C = similarity.ivf_centroids(corpus, n_centroids=64, lloyd_iters=2)
    ca = similarity._assign_clusters(
        corpus, "vec_id", "embedding", C, n_probe=1
    ).select(F.col("_id").alias("c_id"), "_cluster").persist()
    ca.count()
    report["ivf_index_wall_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ivf = similarity.ivf_topk(
        queries, corpus, k=1, n_centroids=64, n_probe=8, dim=DIM, centroids=C, corpus_assign=ca
    )
    report["ivf_recall"] = round(recall(ivf), 4)
    report["ivf_query_wall_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()

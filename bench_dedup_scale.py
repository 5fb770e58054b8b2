"""At-scale evidence for the MinHash+LSH dedup path (the "genuine 100 TB
path" per PERFORMANCE.md): the driver gate exercises it at 500-5000 docs,
this script runs it at 100k docs with PLANTED near-duplicates so recall is
measurable against exact ground truth at a scale where the O(n²) baseline
(5·10^9 pairs) is no longer computable.

Corpus: doc i = 40 tokens drawn by a vectorized splitmix64 of (i, pos)
from a 5000-word vocabulary (same determinism recipe as kg/datagen.py —
order-free, reproducible at any parallelism). Every 20th doc is a
near-duplicate of its predecessor with 2 token substitutions → 5% planted
pairs at word-3-gram Jaccard ≈ (38-2·3)/(38+2·3) ≈ 0.73 > the 0.5
threshold, in dup-groups of exactly 2 (no adversarial clustering).

Reports one JSON line: wall, docs/s, pairs found, planted-pair recall.
Usage: python bench_dedup_scale.py [n_docs] [cpus]   (default 100000, 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
TOKENS_PER_DOC = 40
VOCAB = 5000
DUP_EVERY = 20  # doc i with i % DUP_EVERY == 1 near-duplicates doc i-1
SUBS = 2  # token substitutions per planted near-dup


def synth_docs(spark, n_docs: int):
    """(doc_id long, text string) — pure function of doc_id, numpy-vectorized."""
    from pyspark.sql import functions as F

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

        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            # a planted dup re-derives its BASE doc's tokens, then perturbs
            base = np.where(ids % DUP_EVERY == 1, ids - 1, ids)
            pos = np.arange(TOKENS_PER_DOC, dtype=np.int64)
            with np.errstate(over="ignore"):
                seed = base[:, None].astype(U) * U(1_000_003) + pos[None, :].astype(U)
            toks = (splitmix(seed) % U(VOCAB)).astype(np.int64)  # (n, T)
            is_dup = ids % DUP_EVERY == 1
            for s in range(SUBS):
                # substitute token at a deterministic position with a
                # doc-unique token so the pair is NEAR, not exact
                p = (s * 17 + 5) % TOKENS_PER_DOC
                with np.errstate(over="ignore"):
                    repl = (splitmix(ids.astype(U) * U(7919) + U(s)) % U(VOCAB)).astype(np.int64)
                toks[is_dup, p] = repl[is_dup]
            texts = ["w" + " w".join(map(str, row)) for row in toks]
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return (
        spark.range(0, n_docs, numPartitions=CPUS * 2)
        .mapInPandas(mapper, "doc_id long, text string")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from btc_blockchain_scanner_spark.operators import dedup
    from btc_blockchain_scanner_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS, app_name="dedup_scale")
    docs = synth_docs(spark, N_DOCS).persist()
    n = docs.count()  # materialize input OUTSIDE the timed window

    t0 = time.perf_counter()
    # 64 perms / 16 bands (r=4): P(candidate) at the planted pairs' j≈0.73
    # is 1-(1-0.73^4)^16 ≈ 0.995 — measured 0.98 recall vs 0.89 at 32/8
    # for ~1.3x the wall; the banding knob is the recall/cost dial.
    pairs = dedup.minhash_lsh_pairs(docs, n=3, num_perm=64, num_bands=16, threshold=0.5)
    pairs = pairs.persist()
    n_pairs = pairs.count()
    wall = time.perf_counter() - t0

    # planted ground truth: (i-1, i) for i % DUP_EVERY == 1
    planted = spark.range(1, N_DOCS, DUP_EVERY).select(
        (F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b")
    )
    n_planted = planted.count()
    n_found = planted.join(pairs, ["id_a", "id_b"], "left_semi").count()

    report = {
        "n_docs": n,
        "cpus": CPUS,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "pairs_found": n_pairs,
        "planted_pairs": n_planted,
        "planted_recall": round(n_found / n_planted, 4) if n_planted else None,
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()

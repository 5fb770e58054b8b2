"""Isolated-query timing harness for the r6 optimization round.

bench.py is FROZEN for measurement (the driver times the round-start
copy), so the extra evidence cited in OPTIMIZATION_r06.md comes from
here: each named query is materialized through the guide §1.4 noop sink
(every column of every row computed, nothing collected) in a fresh-ish
session, with the same cache hygiene as bench.py between queries.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [query ...]

Prints one JSON line: {"queries": {name: sec, ...}, "sf": ..., "cpus": N}.
Default query set = the ones this round touched.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT = [
    "t05_ngram_jaccard_dups",
    "t07_dedup_groups",
    "c01_decontamination",
    "t10_emb_dup_exact",
    "t08_emb_top1_neighbor",
    "t06_dedup_recall",
    "g01_bfs_closure",
    "j06_copart_pairs",
]


def main() -> None:
    from btc_blockchain_scanner_spark.session import get_spark
    import btc_blockchain_scanner_spark.plans as plans

    names = sys.argv[1:] or DEFAULT
    spark = get_spark(
        master=f"local[{CPUS}]", shuffle_partitions=CPUS, app_name="bench_extra"
    )
    qs = plans.queries()
    qs["q01_pricing_summary"](spark, SF_DIR).count()  # warm JVM/codegen

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        if name == "t06_dedup_recall":
            df.collect()  # rows-only evidence query; 6 tiny rows
        else:
            df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        # bench.py's inter-query hygiene (persisted intermediates + GC)
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 — GC nudge is best-effort
            pass
    spark.stop()
    print(json.dumps({"queries": timings, "sf": SF_DIR, "cpus": CPUS}), flush=True)


if __name__ == "__main__":
    main()

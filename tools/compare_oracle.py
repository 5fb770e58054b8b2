"""Local replica of the driver's correctness gate: run every queries()[name]
on Spark and oracle_sql()[name] on DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value multiset.

Usage: python tools/compare_oracle.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    import __spark_entry__ as entry_mod
    from btc_blockchain_scanner_spark.plans.registry import complex_toplevel_columns
    from btc_blockchain_scanner_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            # DRIVER-CONTRACT check (the r3 kg12 lesson): the driver's
            # canonicalizer sorts/hashes rows via pandas, which dies on
            # array/map/struct cells — this gate must fail on them locally
            # even though str(v) below would happily serialize them.
            bad = complex_toplevel_columns(sdf.schema)
            if bad:
                print(
                    f"FAIL {name}: driver-contract violation — complex "
                    f"top-level column(s) {bad}; serialize with concat_ws/"
                    "to_json (see plans/registry.py docstring)"
                )
                failures.append(name)
                continue
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        el = time.monotonic() - t0
        spark.catalog.clearCache()  # cache isolation between queries
        # localCheckpoint blocks aren't freed by clearCache — force the
        # py4j refs to drop so the ContextCleaner reaps them (see bench.py)
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(s_rows)} rows (no oracle) [{el:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
            if cs != cd:
                diff_s = list((cs - cd).items())[:3]
                diff_d = list((cd - cs).items())[:3]
                problems.append(f"values spark-only={diff_s} duck-only={diff_d}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(s_rows)} rows) [{el:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

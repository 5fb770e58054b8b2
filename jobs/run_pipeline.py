"""spark-submit entry point for the KG-construction pipeline — the
north_rule execution mode:

    python tools/package.py                     # → dist/btc_blockchain_scanner_spark.zip
    spark-submit \
        --master <cluster-master> \
        --deploy-mode client \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        --py-files dist/btc_blockchain_scanner_spark.zip \
        jobs/run_pipeline.py \
        --input /path/to/transcripts_parquet \
        --output /path/to/kg_out \
        --n-parts 256

Modes:
  full        (default) one resumable full pass: extraction → linking →
              canonicalization → graph materialization, per-partition
              checkpoints + counters (kg/pipeline.run — the RunFullScan
              analog, RunFullScan.java:104-160).
  incremental one batch into a persisted state dir (--state-dir): link
              against existing entities, contract + merge the canon map
              (kg/pipeline.incremental_update — the update_wallets --loop
              body, RunUpdateWallets2.java:107-133).

``--synth-convs N`` generates the deterministic synthetic transcript
table in place of --input (demo / smoke runs; kg/datagen.py).

The session comes from get_spark(from_submit=True): master, deploy mode
and resource sizing belong to the spark-submit command line; the job only
sets engine semantics (AQE + skew join, Arrow batching, zstd, dynamic
partition overwrite).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="transcripts parquet path (conv_id, turn_idx, role, text, tool, ts)")
    src.add_argument("--synth-convs", type=int, help="generate N synthetic conversations instead")
    p.add_argument("--output", required=True, help="pipeline output dir (full mode)")
    p.add_argument("--mode", choices=["full", "incremental"], default="full")
    p.add_argument("--state-dir", help="persisted state dir (incremental mode)")
    p.add_argument("--n-parts", type=int, default=256, help="conv_id hash partitions (full mode)")
    p.add_argument("--seed", type=int, default=42, help="synth generator seed")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from btc_blockchain_scanner_spark.kg import datagen, pipeline
    from btc_blockchain_scanner_spark.session import get_spark

    spark = get_spark(app_name="kg_pipeline", from_submit=True)
    if args.synth_convs is not None:
        # ADVICE r5: `if args.synth_convs:` treated --synth-convs 0 as
        # "read from --input" and crashed on input=None
        if args.synth_convs <= 0:
            raise SystemExit("--synth-convs must be a positive integer")
        transcripts = datagen.transcripts(spark, n_convs=args.synth_convs, seed=args.seed)
    else:
        transcripts = spark.read.parquet(args.input)

    if args.mode == "incremental":
        if not args.state_dir:
            raise SystemExit("--state-dir is required in incremental mode")
        stats = pipeline.incremental_update(spark, transcripts, args.state_dir)
        print(json.dumps({"mode": "incremental", "state_dir": args.state_dir, **stats}))
    else:
        res = pipeline.run(spark, transcripts, args.output, n_parts=args.n_parts)
        print(
            json.dumps(
                {
                    "mode": "full",
                    "out_dir": res.out_dir,
                    "counters": res.counters,
                    "processed_partitions": len(res.processed_partitions),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()

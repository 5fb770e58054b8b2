"""SparkSession factory with scale-oriented defaults.

The reference hand-tunes a thread topology (30 scan threads, 4 writer threads,
10k-60k row batches — RunFullScan.java:95-98, DbUpdate.java:71-76). On Spark the
equivalent knobs are shuffle partitioning, AQE, and Arrow batching; everything
else (pipelining, backpressure, spill) is the engine's job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Number of local cores the driver benchmarks with (see bench.py).
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "btc_blockchain_scanner_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults assume local mode for tests/bench but are the same settings a
    1000-executor cluster run would want (AQE, adaptive coalesce + skew join,
    Arrow UDF transport). ``spark.sql.shuffle.partitions`` defaults to the
    core count — at cluster scale this is overridden to ~2-3x total cores.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    # Parallelism implied by the master string, for shuffle sizing in local mode.
    if shuffle_partitions is None:
        if master.startswith("local["):
            n = master[len("local[") : -1]
            shuffle_partitions = DEFAULT_CPUS if n == "*" else int(n)
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # idempotent per-partition rewrites (checkpoint/resume path, M4/M5)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

"""Structured-Streaming incremental passes.

The reference is batch-with-polling (SURVEY.md §2.8): ``--loop N`` reruns
the incremental update every N seconds, resuming from a NumberFile
checkpoint. The Spark-native equivalent is Structured Streaming with
``Trigger.AvailableNow`` over the landing table: each invocation processes
exactly the files not yet recorded in the streaming checkpoint — the same
resume-from-watermark semantics with exactly-once sink writes, no hand
-rolled NumberFile.

At cluster scale the source would be an Iceberg table stream; here it is a
parquet directory stream (same API surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kg import extract


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema=None,
) -> None:
    """Incrementally extract mentions from newly-landed transcript files
    (RunFullScan --loop analog). Blocks until the available backlog is
    drained (Trigger.AvailableNow), then returns."""
    schema = schema or "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(input_dir)
    extracted = extract.extract(stream, repartition_on_conv=False)
    mentions = extract.mentions_from(extracted)
    q = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def loop_incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    stop_file: str,
    poll_seconds: float = 0.0,
    max_loops: int = 1000,
    schema=None,
) -> int:
    """``--loop N`` + stop-file graceful shutdown, end to end.

    Reference analog (SURVEY.md §2.8): RunFullScan.java:150-157 reruns the
    incremental update every N seconds and watches a stop file each batch
    (:506-513), renaming it on exit to acknowledge the shutdown. Here each
    iteration is one AvailableNow drain (exactly-once via the streaming
    checkpoint); before each iteration the stop file is checked, and on
    stop it is renamed to ``<stop_file>.done`` — the same handshake, so an
    operator's ``touch stop && wait-for stop.done`` works unchanged.

    Returns the number of drain iterations executed. ``max_loops`` bounds
    runaway tests; production callers pass effectively-infinite.
    """
    import os
    import time

    loops = 0
    for _ in range(max_loops):
        if os.path.exists(stop_file):
            os.rename(stop_file, stop_file + ".done")
            break
        incremental_extract(spark, input_dir, output_dir, checkpoint_dir, schema)
        loops += 1
        if poll_seconds:
            time.sleep(poll_seconds)
    return loops


def hourly_event_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
):
    """Windowed streaming aggregation with a watermark for late data —
    the streaming twin of e01_hourly_event_rollup. Returns the started
    query (memory sink) for tests to drain and inspect."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour"), "event_type", "n")
    )
    return (
        agg.writeStream.format("memory")
        .queryName("hourly_event_counts")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )

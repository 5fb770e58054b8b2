"""Bucketed tables: co-located joins with no exchange.

Reference analog: the four address tables are id-range partitioned and the
reference co-locates work by routing each id range to its own table/thread
(SURVEY.md §1.2; DbCachedAddressOne routes by address type + id range).
Spark's native form is hive-style bucketing: both sides of a recurring
equi-join are written ``bucketBy(n, key)`` so their partitioning is baked
into the table layout — the join plans as SortMergeJoin over the bucket
files with NO Exchange on either side. At 100 TB this converts the
biggest recurring shuffle (fact ⋈ fact on conv_id / entity_id) into a
local per-bucket merge.

Bucketing requires the session catalog (``saveAsTable``); plain
``.parquet()`` writes cannot carry bucket metadata. The warehouse dir is
``spark-warehouse/`` locally and the Iceberg catalog on a real deployment
(Iceberg bucket partition transforms express the same contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets lets the join skip its per-task sort too —
    the SortMergeJoin reads both sides' buckets already ordered."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket count.

    The plan contains no Exchange (asserted in tests): each task merges
    bucket i of both sides locally — the co-located join the reference
    gets from id-range table routing."""
    return spark.table(left_table).join(spark.table(right_table), key, how)

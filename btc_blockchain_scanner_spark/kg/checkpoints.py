"""Per-partition checkpoint manifest: lineage + counters + resume.

Reference analog (SURVEY.md §2.8): the NumberFile checkpoint —  a file
rewritten every batch with the last processed id (util/Utils.java:287-329,
used by RunUpdateSpent.java:98,130 etc.) — plus DbUpdate's run counters
(DbUpdate.java:196-214). Here the manifest is itself a partitioned table:
one row per conv_id-hash partition with the counters that FIXTURES.md §2
specifies (turns_scanned, mentions_found, triples_emitted), written with
dynamic partition overwrite so re-running a partition replaces exactly its
own manifest row (single-writer-per-partition, idempotent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("last_done", T.StringType(), True),
        T.StructField("turns_scanned", T.LongType(), True),
        T.StructField("mentions_found", T.LongType(), True),
        T.StructField("triples_emitted", T.LongType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)


class Manifest:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.isdir(self.path)

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)
        return self.spark.read.parquet(self.path)

    def done_partitions(self) -> set[str]:
        if not self.exists():
            return set()
        # parquet partition-column type inference may read "3" back as int 3;
        # normalize to strings so set algebra against pending keys works.
        return {
            str(r.partition_key)
            for r in self.read().select("partition_key").distinct().collect()
        }

    def record(self, counters: DataFrame) -> None:
        """Upsert counter rows (one per partition_key) — dynamic partition
        overwrite replaces only the partitions present in ``counters``."""
        (
            counters.select(
                "partition_key",
                "last_done",
                "turns_scanned",
                "mentions_found",
                "triples_emitted",
                F.current_timestamp().alias("updated_at"),
            )
            .repartition("partition_key")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_key")
            .parquet(self.path)
        )

"""Per-partition checkpoint manifest: lineage + counters + resume +
tail validation.

Reference analog (SURVEY.md §2.8): the NumberFile checkpoint —  a file
rewritten every batch with the last processed id (util/Utils.java:287-329,
used by RunUpdateSpent.java:98,130 etc.) — plus DbUpdate's run counters
(DbUpdate.java:196-214). Here the manifest is itself a partitioned table:
one row per conv_id-hash partition with the counters that FIXTURES.md §2
specifies (turns_scanned, mentions_found, triples_emitted), written with
dynamic partition overwrite so re-running a partition replaces exactly its
own manifest row (single-writer-per-partition, idempotent).

Tail validation (M5, DbValidationUtils.java:77-165): the reference walks
the table tail after a crash, compares stored counts against actual rows,
and deletes/reloads from the first inconsistent block. ``validated_done``
is the Spark-side analog: a manifest row only counts as *done* if the
partition's parquet FOOTER row counts (metadata-only, no data scan) match
the recorded counters; a truncated/corrupt/missing partition fails the
check and is re-extracted by the caller — dynamic partition overwrite is
the "delete from the first bad block" repair.
"""

from __future__ import annotations

import glob
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


def _is_dir(path: str) -> bool:
    """URI-aware directory test (same resolution rules as
    :func:`_partition_rowcount`)."""
    if "://" in path or path.startswith("file:"):
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        return filesystem.get_file_info(p).type == pafs.FileType.Directory
    return os.path.isdir(path)


class Manifest:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return _is_dir(self.path)

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

    def validated_done(self, expected: dict[str, str]) -> set[str]:
        """Done partitions whose on-disk data matches the manifest counters.

        ``expected`` maps a partitioned table's base path to the manifest
        counter column holding its expected row count, e.g.
        ``{mentions_path: "mentions_found", triples_path: "triples_emitted"}``.

        Row counts come from parquet footers only (pyarrow metadata — no
        data scan; on a cluster this is the same O(#files) listing a
        commit-protocol check performs). A partition whose footers are
        unreadable (truncated mid-write), whose directory is missing while
        the manifest expects rows, or whose count disagrees with the
        manifest is EXCLUDED — the caller re-extracts it, and the dynamic
        partition overwrite replaces the bad tail byte-identically.
        """
        if not self.exists():
            return set()
        cols = sorted(set(expected.values()))
        rows = self.read().select("partition_key", *cols).collect()
        ok: set[str] = set()
        for r in rows:
            key = str(r["partition_key"])
            good = True
            for path, col in expected.items():
                want = r[col] or 0
                have = _partition_rowcount(path, key)
                if have is None:
                    # empty partitions legitimately write no directory
                    good = want == 0
                else:
                    good = have == want
                if not good:
                    break
            if good:
                ok.add(key)
        return ok

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
            # counters has exactly one row per partition_key by contract —
            # a keyed repartition here shuffled ~n_parts rows into
            # shuffle.partitions tasks (mostly empty) before an 8-file
            # write; one task writes the whole tiny table faster. NOT
            # coalesce(1): coalesce back-propagates through the narrow
            # join into the createDataFrame pending-key frame, so ONE task
            # evaluates all ~32 Python-side input partitions SEQUENTIALLY
            # (~125 ms of Python-worker round-trip each ≈ 4 s measured for
            # an 8-row write); repartition(1) keeps the upstream parallel
            # and shuffles 8 rows (0.5 s measured — r6, guide §2.3).
            .repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_key")
            .parquet(self.path)
        )


def _partition_rowcount(base: str, key: str) -> int | None:
    """Row count of one hive partition from parquet footers, or None if the
    directory is absent or any footer is unreadable (= corrupt tail).

    Scheme-less paths walk the local filesystem (os/glob); URI-style paths
    (``file:``, ``hdfs://``, ``s3://``, ...) resolve through
    ``pyarrow.fs.FileSystem.from_uri`` — the Arrow-native twin of the
    Hadoop FileSystem API, so the M5 check is cluster-real without JVM
    round-trips (VERDICT r3 item 6; the r3 stopgap raised here). A scheme
    the local Arrow build lacks (e.g. hdfs without libhdfs) still raises
    loudly instead of silently reading every partition as "absent" and
    quietly disabling incremental resume."""
    import pyarrow.parquet as pq

    if "://" in base or base.startswith("file:"):
        from pyarrow import fs as pafs

        try:
            filesystem, root = pafs.FileSystem.from_uri(base)
        except Exception as e:  # unsupported scheme must stay LOUD
            raise NotImplementedError(
                f"tail validation cannot resolve {base!r} via pyarrow.fs "
                f"({e}) — unsupported scheme in this Arrow build; use "
                "Iceberg snapshot metadata for such deployments"
            ) from e
        pdir = f"{root.rstrip('/')}/partition_key={key}"
        if filesystem.get_file_info(pdir).type != pafs.FileType.Directory:
            return None
        total = 0
        for fi in filesystem.get_file_info(pafs.FileSelector(pdir)):
            if fi.type == pafs.FileType.File and fi.path.endswith(".parquet"):
                try:
                    total += pq.read_metadata(fi.path, filesystem=filesystem).num_rows
                except Exception:  # noqa: BLE001 — unreadable footer = corrupt
                    return None
        return total

    pdir = os.path.join(base, f"partition_key={key}")
    if not os.path.isdir(pdir):
        return None
    total = 0
    for f in glob.glob(os.path.join(pdir, "*.parquet")):
        try:
            total += pq.ParquetFile(f).metadata.num_rows
        except Exception:  # noqa: BLE001 — any unreadable footer = corrupt
            return None
    return total

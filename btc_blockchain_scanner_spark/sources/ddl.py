"""Schema bootstrap (S15 analog: RunSchema.java:59-99 create/truncate/drop
from bundled .sql resources).

Spark-native: `CREATE TABLE ... USING parquet` (or iceberg when a catalog
is configured) with explicit schemas for every pipeline table; idempotent
IF NOT EXISTS; truncate/drop helpers. The two-tier min/indexed scheme of
the reference (load fast, index later) maps to "write unsorted, then
rewrite sorted/partitioned" — a compaction job, not DDL, so not modeled.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# table name → (schema DDL, partition columns)
PIPELINE_TABLES: dict[str, tuple[str, str | None]] = {
    "transcripts": (
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        None,
    ),
    "mentions": (
        "conv_id string, turn_idx int, pos int, surface string, span_start int, "
        "span_end int, mention_type string, partition_key string",
        "partition_key",
    ),
    "triples": (
        "conv_id string, turn_idx int, subj_surface string, pred string, "
        "obj_surface string, subj_pos int, partition_key string",
        "partition_key",
    ),
    "entities": (
        "entity_id int, entity_type string, canonical_hash string, display_name string",
        None,
    ),
    "canon_map": ("entity_id int, canon_id int", None),
    "nodes": ("node_id long, label string, display_name string, canon_id int", None),
    "edges": (
        "src long, dst long, rel string, pos int, conv_id string, turn_idx int, edge_key long",
        None,
    ),
    "checkpoints": (
        "partition_key string, last_done string, turns_scanned long, mentions_found long, "
        "triples_emitted long, updated_at timestamp",
        "partition_key",
    ),
}


def create_schema(spark: SparkSession, location: str, fmt: str = "parquet") -> list[str]:
    """Create all pipeline tables (IF NOT EXISTS) under ``location``.
    Returns the list of created table names."""
    created = []
    for name, (schema, part) in PIPELINE_TABLES.items():
        part_clause = f"PARTITIONED BY ({part})" if part else ""
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} ({schema}) USING {fmt} "
            f"{part_clause} LOCATION '{location}/{name}'"
        )
        created.append(name)
    return created


def truncate(spark: SparkSession, name: str) -> None:
    spark.sql(f"TRUNCATE TABLE {name}")


def drop_schema(spark: SparkSession) -> None:
    for name in PIPELINE_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {name}")

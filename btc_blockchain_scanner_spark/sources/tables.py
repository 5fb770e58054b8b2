"""Table registry / scans over the driver-provided parquet star schema.

Reference analog: the provider abstraction ``BlockProvider → SrcBlock → ...``
(src/BlockProvider.java:16-27) and the per-table query facades
(db/facade/DbQuery*.java). Here a "source" is just a parquet (or Iceberg,
when a catalog is configured) scan — Catalyst handles column pruning and
predicate pushdown that the reference encodes by hand in ~40 SQL strings
(SURVEY.md §2.1 S1-S8, §4).

All reads go through :func:`load` so that swapping the storage layer
(parquet dir → Iceberg catalog) is a one-line change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Predicates/projections applied by the caller are
    pushed into the parquet scan by Catalyst (SURVEY.md §4: column pruning,
    partition pruning are free when the plan is declarative)."""
    if name not in TABLES and not name.startswith("_"):
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

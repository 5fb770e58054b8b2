"""Registry of (Spark query, DuckDB oracle SQL) pairs.

Contract (driver-facing, see repo-root ``__spark_entry__.py``):

* ``spark_fn(spark, sf_dir) -> DataFrame`` — the Spark implementation;
* ``oracle`` — equivalent ANSI SQL DuckDB runs on the same parquet tables
  (views: region nation customer supplier part orders lineitem events
  documents embeddings); ``None`` for non-SQL-expressible ops (iterative /
  stateful), which get a rows-only check.

Determinism rules (so a value-hash comparison passes):
* every computed column is aliased identically on both sides;
* floating sums go through DECIMAL casts so accumulation order (Spark
  partial aggregation vs DuckDB single-threaded) cannot change the value;
* ties are always broken by a unique key;
* timestamps are emitted as formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, Q] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Register a (spark_fn, oracle) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Q(name=name, spark_fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco

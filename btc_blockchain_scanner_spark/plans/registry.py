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

DRIVER SERIALIZATION CONTRACT (the r3 kg12 lesson): the driver's hash gate
canonicalizes result rows with pandas ``sort_values``/``factorize``, which
raises ``TypeError: unhashable type`` on any array/map/struct CELL — so no
registered query may emit a complex-typed TOP-LEVEL column. Serialize
arrays as canonical strings (``concat_ws(",", sort_array(...))`` on Spark,
``array_to_string(list_sort(...), ',')`` + ``COALESCE(..., '')`` on DuckDB
— the a06/kg12 pattern); structs/maps via ``to_json``. Library functions
keep their typed outputs; only the registered driver query serializes.
Enforced by :func:`complex_toplevel_columns` in tools/compare_oracle.py and
tests/test_driver_gate_contract.py, so a violating query fails locally
before it can ship red.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def complex_toplevel_columns(schema: "T.StructType") -> list[str]:
    """Names of top-level columns the driver's pandas hash gate cannot
    sort/hash (array/map/struct cells) — must be empty for every
    registered query (see module docstring)."""
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


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

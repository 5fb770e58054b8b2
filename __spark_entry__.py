"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``btc_blockchain_scanner_spark`` package; this
module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import btc_blockchain_scanner_spark.plans as plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: KG edge-degree over the
    extraction → linking → materialization pipeline (falls back to the
    pricing summary until the KG path lands)."""
    sf_dir = "/root/testdata/sf0.001"
    reg = plans.queries()
    name = "kg05_entity_degree" if "kg05_entity_degree" in reg else "q01_pricing_summary"
    return reg[name](spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ training-data
    pipeline extensions). Each callable takes (spark, sf_dir)."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    non-SQL-expressible iterative/stateful ops → rows-only check)."""
    return plans.oracle_sql()

"""Query registry backing ``__spark_entry__.py``.

Importing this package populates the registry with every implemented
operator/query (SURVEY.md §2 inventory + training-data-pipeline extensions).
"""

from .registry import REGISTRY, Q, query  # noqa: F401

# Populate the registry (import order = display order).
from . import relational_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import kg_queries  # noqa: E402,F401
from . import extended_queries  # noqa: E402,F401


def queries():
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql():
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

"""Closed vocabulary shared by the transcript generator, the extractor, and
the pure-Python reference-semantics oracle (tests).

The reference's extraction is byte-exact script parsing (BJOutput
_getAddress); ours is dictionary/pattern extraction over text. Keeping the
vocabulary closed makes the oracle triple set exactly computable, which is
how we evidence P/R >= 0.95 (it is 1.0 by construction when the pipeline is
correct — FIXTURES.md §1).
"""

from __future__ import annotations

# Canonical entities (surface == canonical key for these).
ENTITIES = (
    "spark",
    "flink",
    "kafka",
    "iceberg",
    "parquet",
    "arrow",
    "duckdb",
    "presto",
    "trino",
    "hive",
    "hadoop",
    "airflow",
    "dbt",
    "postgres",
    "mysql",
    "redis",
    "neo4j",
    "cassandra",
    "snowflake",
    "bigquery",
)

# Alias / misspelled surface forms → canonical entity key. These exercise
# the broadcast alias dictionary and the MinHash/LSH fuzzy-linking path
# (north_star). Every alias here is a distinct token that never collides
# with a canonical surface.
ALIASES = {
    "sprk": "spark",
    "apachespark": "spark",
    "kafkaa": "kafka",
    "icebrg": "iceberg",
    "parqet": "parquet",
    "duckdbb": "duckdb",
    "postgresql": "postgres",
    "pgsql": "postgres",
    "neofourj": "neo4j",
    "snowflk": "snowflake",
}

# Relation predicates. A triple is the token pattern: ENTITY PRED ENTITY
# at adjacent token positions.
PREDICATES = ("uses", "calls", "reads", "writes", "feeds", "beats")

# Filler words (never entities/predicates/aliases).
FILLERS = (
    "the",
    "a",
    "then",
    "we",
    "run",
    "job",
    "data",
    "table",
    "fast",
    "slow",
    "big",
    "small",
    "batch",
    "query",
    "plan",
    "node",
    "edge",
    "turn",
    "ok",
    "now",
)

# Hub entity: overrepresented to create the skew the canonicalization
# stage must survive (reference weak point: giant wallet relabels,
# RunUpdateWallets2.java:218-222; SURVEY.md §7.3 hard part (a)).
HUB_ENTITY = "spark"

ALL_SURFACES = tuple(ENTITIES) + tuple(ALIASES)

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "code", "browse")

"""Knowledge-graph construction pipeline (the north-star workload).

Plays the role the reference plays for Bitcoin → MySQL → Neo4j
(SURVEY.md §3): transcripts → mentions/triples (extraction, Arrow UDFs) →
entities (linking) → canon_map (connected-components canonicalization) →
nodes/edges (graph materialization), with per-partition checkpoints.
"""

from . import datagen, extract, link, canonicalize, materialize, checkpoints, pipeline  # noqa: F401

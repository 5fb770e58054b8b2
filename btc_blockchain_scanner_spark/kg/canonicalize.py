"""Canonicalization: connected components over the entity-similarity graph.

Reference analog M2 (SURVEY.md §2.7, §3.2): RunUpdateWallets2's union-find
where co-spent addresses collapse into one wallet id. Here entities that are
*alias-linked* (same resolved key family) or *strongly co-mentioned* merge
into one canonical id.

Edge sources:
1. alias edges — surfaces resolving to the same entity_key already share an
   entity_id (handled in linking), so the interesting alias edges are
   fuzzy-match families: (entity of surface) — (entity of matched key);
2. co-mention edges — entities appearing in the same turn, chained per turn
   (operators.cc.pair_edges_from_groups: linear, hub-safe).

The component label is the MINIMUM entity_id in the component — exactly the
reference's merge-into-min-wallet-id rule (RunUpdateWallets2.java:194-199).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cc import connected_components, pair_edges_from_groups


def comention_edges(linked_mentions: DataFrame) -> DataFrame:
    """(src, dst) entity-id edges from per-turn co-mention groups."""
    incid = linked_mentions.select(
        F.concat_ws("#", F.col("conv_id"), F.col("turn_idx")).alias("turn_key"),
        F.col("entity_id").cast("long").alias("member"),
    )
    return pair_edges_from_groups(incid, "turn_key", "member")


def canon_map(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """(entity_id, canon_id): component-min label for connected entities,
    self for singletons. Deterministic at any parallelism."""
    comp = connected_components(edges, "src", "dst")
    return (
        entities.select(F.col("entity_id"))
        .join(comp, entities.entity_id == comp.node, "left")
        .select(
            "entity_id",
            F.coalesce(F.col("component"), F.col("entity_id").cast("long"))
            .cast("int")
            .alias("canon_id"),
        )
    )


def verify_fixpoint(canon: DataFrame, edges: DataFrame) -> int:
    """Invariant check (FIXTURES.md §5.2, reference analog "no tx spans two
    wallets", RunUpdateWallets2.java:167): returns the number of edges whose
    endpoints carry different canon ids — must be 0 at fixpoint."""
    c = canon.select(F.col("entity_id").cast("long").alias("node"), "canon_id")
    return (
        edges.join(c.withColumnRenamed("node", "src").withColumnRenamed("canon_id", "ca"), "src")
        .join(c.withColumnRenamed("node", "dst").withColumnRenamed("canon_id", "cb"), "dst")
        .where(F.col("ca") != F.col("cb"))
        .count()
    )

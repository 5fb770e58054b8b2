"""Graph traversal operators beyond CC.

M7 (SURVEY.md §2.7): the reference's transitive related-address expansion
(db/DbQueries.java:39-64) — BFS over addr → spending-tx → addr. Here: an
iterative frontier-join loop with visited-set pruning, localCheckpoint per
hop (same lineage hygiene as CC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_reachable(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 10,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = True,
) -> DataFrame:
    """Nodes reachable from ``sources`` (column ``node``) within max_hops.

    Returns (node, hops) with the minimal hop count. Scale notes: the
    frontier join shuffles only the frontier (usually small) against the
    edge list; the visited set is the accumulated result, left-anti-joined
    to prune — both checkpointed per hop so plans stay flat.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if undirected:
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.distinct().localCheckpoint(eager=True)

    visited = sources.select(F.col("node"), F.lit(0).alias("hops")).distinct()
    visited = visited.localCheckpoint(eager=True)
    frontier = visited

    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, e.a == frontier.node)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt

    return visited

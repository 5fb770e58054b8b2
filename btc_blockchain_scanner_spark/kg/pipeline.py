"""End-to-end KG construction pipeline with resumable per-partition runs.

Mirrors the reference's `update` → `update_wallets` → `load_neo4j` command
sequence (SURVEY.md §3) as one orchestrated Spark job graph:

    transcripts ──extract(Arrow UDF)──▶ mentions, raw triples   [per-partition]
    mentions ──link (broadcast dict + LSH)──▶ entities, linked  [global]
    linked  ──CC canonicalize──▶ canon_map                       [global]
    triples+entities ──materialize──▶ nodes, edges               [global]
    counters ──▶ checkpoints manifest                            [per-partition]

Partitioning: partition_key = pmod(xxhash64(conv_id), n_parts) — the
conv_id-range analog of the reference's block-height batches. The
extraction stage writes mentions/triples with dynamic partition overwrite,
so a killed run resumes by recomputing only partitions missing from the
manifest and yields byte-identical output (M4/M5 semantics; tested in
tests/test_pipeline.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import canonicalize, extract, link, materialize
from .checkpoints import Manifest


def with_partition_key(df: DataFrame, n_parts: int) -> DataFrame:
    return df.withColumn(
        "partition_key", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_parts)).cast("string")
    )


@dataclass
class PipelineResult:
    out_dir: str
    counters: dict
    processed_partitions: list[str]


def _write_partitioned(df: DataFrame, path: str) -> None:
    (
        df.repartition("partition_key")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("partition_key")
        .parquet(path)
    )


def run(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_parts: int = 8,
    alias_dict: DataFrame | None = None,
    fail_after_extract_partitions: set[str] | None = None,
) -> PipelineResult:
    """Run (or resume) the pipeline.

    ``fail_after_extract_partitions`` is a test hook (dirty-tail fixture,
    FIXTURES.md §3): when set, extraction only covers those partitions and
    the run aborts before linking — simulating a mid-job kill.
    """
    alias_dict = alias_dict if alias_dict is not None else link.default_alias_dict(spark)
    manifest = Manifest(spark, f"{out_dir}/checkpoints")
    turns = with_partition_key(transcripts, n_parts)

    mentions_path = f"{out_dir}/mentions"
    triples_path = f"{out_dir}/triples"

    # M5 tail validation: a manifest row only counts as done if the
    # partition's parquet footers agree with its counters — a partition
    # whose data is truncated/corrupt while its manifest row says done is
    # re-extracted (DbValidationUtils.java:77-165 analog).
    done = manifest.validated_done(
        {mentions_path: "mentions_found", triples_path: "triples_emitted"}
    )
    all_parts = {str(i) for i in range(n_parts)}
    pending = sorted(all_parts - done, key=int)
    if fail_after_extract_partitions is not None:
        pending = sorted(set(pending) & fail_after_extract_partitions, key=int)

    if pending:
        batch = turns.where(F.col("partition_key").isin(pending))
        extracted = extract.extract(batch)
        # One pass over the UDF output for both tables: persist the struct.
        extracted = extracted.persist()
        mentions = extract.mentions_from(extracted).withColumn(
            "partition_key", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_parts)).cast("string")
        )
        triples = extract.triples_from(extracted).withColumn(
            "partition_key", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_parts)).cast("string")
        )
        # F4 sparse-flags side table (input_special analog): rows exist ONLY
        # for non-default mentions; readers re-attach via
        # extract.with_flag_defaults (coalesced defaults). Computed from the
        # persisted extraction struct directly — no mentions ⋈ turns join.
        flags = extract.mention_flags_from_extracted(extracted).withColumn(
            "partition_key", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_parts)).cast("string")
        )
        # The three sink jobs all branch off the SAME persisted extraction
        # and write to disjoint paths — overlap them from a small thread
        # pool (guide §2.6: actions are only sequential because the driver
        # calls them sequentially); each write keeps its own job.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            list(
                pool.map(
                    lambda t: _write_partitioned(*t),
                    [
                        (mentions, mentions_path),
                        (triples, triples_path),
                        (flags, f"{out_dir}/mention_flags"),
                    ],
                )
            )

        if fail_after_extract_partitions is not None:
            extracted.unpersist()
            raise RuntimeError("simulated mid-run failure (dirty-tail test hook)")

        # per-partition lineage counters (A8 analog: DbUpdate.printStats) —
        # ONE pass over the persisted extraction; hash-empty pending
        # partitions still get a manifest row (left join against the
        # pending-key list) so resume doesn't re-queue them forever.
        pend_df = spark.createDataFrame([(p,) for p in pending], "partition_key string")
        per_part = extracted.groupBy("partition_key").agg(
            F.count("*").alias("turns_scanned"),
            F.sum(F.size("ex.mentions")).alias("mentions_found"),
            F.sum(F.size("ex.triples")).alias("triples_emitted"),
        )
        counters = pend_df.join(per_part, "partition_key", "left").select(
            "partition_key",
            F.lit("batch-1").alias("last_done"),
            F.coalesce(F.col("turns_scanned"), F.lit(0)).cast("long").alias("turns_scanned"),
            F.coalesce(F.col("mentions_found"), F.lit(0)).cast("long").alias("mentions_found"),
            F.coalesce(F.col("triples_emitted"), F.lit(0)).cast("long").alias("triples_emitted"),
        )
        manifest.record(counters)
        extracted.unpersist()

    # Global stages (linking, canonicalization, materialization) recompute
    # over all extracted data — idempotent, like the reference's
    # update_wallets full sweep (SURVEY.md §3.2).
    mentions_all = spark.read.parquet(mentions_path)
    triples_all = spark.read.parquet(triples_path)

    linked_mentions, entities = link.link_mentions(mentions_all, alias_dict, spark=spark)
    # Materialize entities ONCE (was write-then-re-read — the same lineage
    # cut, but the checkpoint lets the state write below overlap the canon
    # computation instead of serializing in front of it; r6, guide §2.6).
    entities = entities.localCheckpoint(eager=True)

    surface_to_id = linked_mentions.select("surface", "entity_id").distinct()
    linked_triples = (
        triples_all.join(
            F.broadcast(surface_to_id.withColumnRenamed("surface", "subj_surface").withColumnRenamed("entity_id", "subj_entity")),
            "subj_surface",
        )
        .join(
            F.broadcast(surface_to_id.withColumnRenamed("surface", "obj_surface").withColumnRenamed("entity_id", "obj_entity")),
            "obj_surface",
        )
    )

    edges_sim = canonicalize.comention_edges(linked_mentions)
    edges = materialize.build_edges(linked_triples)
    # Three independent pieces of work (guide §2.6): the entities state
    # write, the edges sink (depends only on linked triples), and the canon
    # computation (CC materializes eagerly inside canon_map). The write
    # jobs never persist RDDs, so they cannot disturb CC's checkpoint
    # bookkeeping; canon's own localCheckpoint runs on this thread after
    # canon_map returns (CC already done).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_ent = pool.submit(
            lambda: entities.write.mode("overwrite").parquet(f"{out_dir}/entities")
        )
        f_edg = pool.submit(
            lambda: edges.write.mode("overwrite").parquet(f"{out_dir}/edges")
        )
        canon = canonicalize.canon_map(entities, edges_sim).localCheckpoint(eager=True)
        f_ent.result()
        f_edg.result()

    nodes = materialize.build_nodes(entities, canon)
    # canon state write ∥ nodes sink (nodes needs canon, so it waited)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_can = pool.submit(
            lambda: canon.write.mode("overwrite").parquet(f"{out_dir}/canon_map")
        )
        f_nod = pool.submit(
            lambda: nodes.write.mode("overwrite").parquet(f"{out_dir}/nodes")
        )
        f_can.result()
        f_nod.result()

    # lineage totals come from the manifest (no recompute of the input);
    # table counts are cheap parquet-footer scans.
    totals = (
        manifest.read()
        .agg(
            F.sum("turns_scanned").alias("t"),
            F.sum("mentions_found").alias("m"),
            F.sum("triples_emitted").alias("tr"),
        )
        .collect()[0]
    )
    counters_out = {
        "turns_scanned": totals["t"] or 0,
        "mentions_found": totals["m"] or 0,
        "triples_emitted": totals["tr"] or 0,
        "entities": entities.count(),
        "nodes": spark.read.parquet(f"{out_dir}/nodes").count(),
        "edges": spark.read.parquet(f"{out_dir}/edges").count(),
    }
    return PipelineResult(out_dir=out_dir, counters=counters_out, processed_partitions=pending)


def read_table(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, name))


def incremental_update(
    spark: SparkSession,
    new_transcripts: DataFrame,
    state_dir: str,
    alias_dict: DataFrame | None = None,
) -> dict:
    """One incremental KG batch — the ``update_wallets`` per-batch loop body
    (RunUpdateWallets2.java:107-133: fetch the next tx batch, resolve
    addresses against the EXISTING wallet table, merge wallets in place).

    Per batch of newly landed transcripts:

    1. extract mentions (Arrow UDF — batch only, not the corpus);
    2. link against the persisted ``entities`` state table — get-or-create
       keeps ids stable across batches (M1 watermark semantics);
    3. derive co-mention star edges for the batch;
    4. merge them into the persisted ``canon_map`` via
       :func:`canonicalize.incremental_canon_update` — CC runs over the
       CONTRACTED batch graph only, never the full edge history;
    5. upsert both state tables through the MERGE sink (atomic swap,
       crash-recoverable) and re-attach singleton entities so the canon
       map stays total over the entities table.

    Equivalent canonical STRUCTURE to a full recompute over all batches
    (property-tested); entity ids depend on arrival order, exactly like
    the reference's counter-assigned wallet ids. Returns the MERGE op
    counters per state table (DbUpdate.printStats analog).
    """
    from ..sources.merge import merge_upsert
    from . import canonicalize as canonmod

    if "://" in state_dir or state_dir.startswith("file:"):
        # the os.path.isdir state probes below would silently read a URI
        # path as "no existing state", reassign entity ids from scratch and
        # let merge_upsert's missing-target branch overwrite batch 1 —
        # silent state loss (ADVICE r4; the checkpoints.py r3 failure mode).
        # The POSIX merge sink is a documented Iceberg-MERGE stand-in
        # (sources/merge.py), so a remote state_dir is out of scope: fail
        # loudly before any work, exactly like the old _partition_rowcount
        # guard did.
        raise NotImplementedError(
            "incremental_update: URI state_dir is not supported by the "
            "local-POSIX merge sink (sources/merge.py docstring); pass a "
            "plain local path or swap in an Iceberg MERGE sink"
        )
    alias_dict = alias_dict if alias_dict is not None else link.default_alias_dict(spark)
    ents_path = f"{state_dir}/entities"
    canon_path = f"{state_dir}/canon_map"

    existing_ents = spark.read.parquet(ents_path) if os.path.isdir(ents_path) else None
    extracted = extract.extract(new_transcripts).persist()
    mentions = extract.mentions_from(extracted)
    linked, entities = link.link_mentions(
        mentions, alias_dict, entities=existing_ents, spark=spark
    )
    # cut lineage to the state paths NOW: both upserts below atomically
    # swap the very parquet dirs these plans read from — a lazy plan
    # evaluated after the first swap would chase deleted files
    entities = entities.localCheckpoint(eager=True)
    # The batch edge list is consumed TWICE: connected_components
    # materializes it (via the contracted graph) and the incremental
    # update's new-node pass re-derives endpoints from it — without a
    # persist the whole mention→star-edge chain (groupBy-min + join +
    # distinct over the batch mentions) recomputes per consumer (~2 s per
    # 5k-conv batch measured; r6, guide §2.6 "pay for a stage once").
    # Materialized lazily at CC's first action, released after the canon
    # checkpoint below.
    edges = canonmod.comention_edges(linked).persist()

    if os.path.isdir(canon_path):
        canon = canonmod.incremental_canon_update(spark.read.parquet(canon_path), edges)
    else:
        canon = canonmod.canon_map(entities, edges)
    # total-ize over the (updated) entities table: batch singletons and
    # never-edged entities canonicalize to themselves — the same read-time
    # coalesce canon_map performs
    canon = (
        entities.select("entity_id")
        .join(canon, "entity_id", "left")
        .select(
            "entity_id",
            F.coalesce(F.col("canon_id"), F.col("entity_id")).cast("int").alias("canon_id"),
        )
    ).localCheckpoint(eager=True)  # same swap-safety as entities above
    edges.unpersist()

    # Both state frames are fully materialized (localCheckpoint above), so
    # neither merge holds a lazy reference to the other's target dir — the
    # two upserts touch disjoint paths and can overlap (guide §2.6; ~0.7 s
    # of the smaller merge's job latency hidden per batch, measured r6).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_ents = pool.submit(merge_upsert, spark, ents_path, entities, ["entity_id"])
        f_canon = pool.submit(merge_upsert, spark, canon_path, canon, ["entity_id"])
        stats = {"entities": f_ents.result(), "canon_map": f_canon.result()}
    extracted.unpersist()
    return stats

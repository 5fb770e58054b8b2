"""End-to-end pipeline: P/R vs oracle, invariant audits (FIXTURES.md §5),
resume-from-dirty-tail, and parallelism determinism."""

import shutil

import pytest
from pyspark.sql import functions as F

from btc_blockchain_scanner_spark.kg import canonicalize, datagen, oracle, pipeline


@pytest.fixture(scope="module")
def run_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg"))
    tr = datagen.transcripts(spark, n_convs=40).cache()
    res = pipeline.run(spark, tr, out, n_parts=4)
    turns = [(r.conv_id, r.turn_idx, r.text) for r in tr.orderBy("conv_id", "turn_idx").collect()]
    return out, res, oracle.run(turns)


def test_triple_pr_vs_oracle(spark, run_dir):
    out, res, o = run_dir
    got = {
        tuple(r)
        for r in pipeline.read_table(spark, out, "edges")
        .selectExpr("conv_id", "turn_idx", "src", "rel", "dst", "pos")
        .collect()
    }
    truth = set(map(tuple, o["triples"]))
    p, r = oracle.precision_recall(got, truth)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0  # closed vocab → exact


def test_canon_matches_union_find(spark, run_dir):
    out, res, o = run_dir
    got = {(r.entity_id, r.canon_id) for r in pipeline.read_table(spark, out, "canon_map").collect()}
    assert got == set(o["canon"].items())


def test_invariants(spark, run_dir):
    out, res, o = run_dir
    edges = pipeline.read_table(spark, out, "edges")
    entities = pipeline.read_table(spark, out, "entities")
    canon = pipeline.read_table(spark, out, "canon_map")
    mentions = pipeline.read_table(spark, out, "mentions")

    # 1. no dangling edge endpoints (NeoQueries.java:95-102 audit analog)
    eids = entities.select(F.col("entity_id").cast("long").alias("id"))
    assert edges.join(eids, edges.src == eids.id, "left_anti").count() == 0
    assert edges.join(eids, edges.dst == eids.id, "left_anti").count() == 0

    # 2. every entity has a canon row; fixpoint stability
    assert entities.join(canon, "entity_id", "left_anti").count() == 0
    from btc_blockchain_scanner_spark.kg.link import default_alias_dict, link_mentions

    linked, _ = link_mentions(mentions, default_alias_dict(spark), spark=spark)
    sim_edges = canonicalize.comention_edges(linked)
    assert canonicalize.verify_fixpoint(canon, sim_edges) == 0

    # 3. checkpoint counters reconcile with table counts (per partition)
    cps = pipeline.read_table(spark, out, "checkpoints")
    m_per = (
        mentions.groupBy("partition_key").count().withColumnRenamed("count", "actual")
    )
    bad = (
        cps.join(m_per, "partition_key", "left")
        .where(F.col("mentions_found") != F.coalesce(F.col("actual"), F.lit(0)))
        .count()
    )
    assert bad == 0

    # 4. no orphan canon ids (unused-wallet audit analog)
    canon_ids = canon.select("canon_id").distinct()
    assert canon_ids.join(
        canon.select(F.col("entity_id").alias("canon_id")).distinct(), "canon_id", "left_anti"
    ).count() == 0


def test_resume_from_dirty_tail(spark, tmp_path):
    """Kill mid-run (only partitions 0/1 extracted, no manifest), then resume
    → output identical to a clean full run (M4/M5, FIXTURES.md §3)."""
    tr = datagen.transcripts(spark, n_convs=25).cache()

    clean_dir, dirty_dir = str(tmp_path / "clean"), str(tmp_path / "dirty")
    pipeline.run(spark, tr, clean_dir, n_parts=4)

    with pytest.raises(RuntimeError, match="simulated mid-run failure"):
        pipeline.run(spark, tr, dirty_dir, n_parts=4, fail_after_extract_partitions={"0", "1"})
    # resume: manifest is empty → all partitions recomputed (overwrite of the
    # dirty ones), globals rebuilt
    pipeline.run(spark, tr, dirty_dir, n_parts=4)

    for table in ("mentions", "triples", "entities", "canon_map", "nodes", "edges"):
        a = {tuple(r) for r in pipeline.read_table(spark, clean_dir, table).collect()}
        b = {tuple(r) for r in pipeline.read_table(spark, dirty_dir, table).collect()}
        assert a == b, f"{table} differs after resume"


def test_resume_skips_done_partitions(spark, tmp_path):
    out = str(tmp_path / "incr")
    tr = datagen.transcripts(spark, n_convs=15).cache()
    res1 = pipeline.run(spark, tr, out, n_parts=4)
    assert sorted(res1.processed_partitions, key=int) == ["0", "1", "2", "3"]
    res2 = pipeline.run(spark, tr, out, n_parts=4)
    assert res2.processed_partitions == []  # manifest says all done
    assert res1.counters == res2.counters


def test_pipeline_deterministic_across_parallelism(spark, tmp_path):
    tr = datagen.transcripts(spark, n_convs=20).cache()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    outs = {}
    try:
        for label, parts in (("lo", "3"), ("hi", "24")):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            d = str(tmp_path / label)
            pipeline.run(spark, tr, d, n_parts=4)
            outs[label] = {
                t: {tuple(r) for r in pipeline.read_table(spark, d, t).collect()}
                for t in ("mentions", "triples", "entities", "canon_map", "edges")
            }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert outs["lo"] == outs["hi"]

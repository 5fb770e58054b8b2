"""Composed curation pass: stage invariants, no surviving near-dups,
counters monotone, parallelism determinism."""

from pyspark.sql import functions as F

from btc_blockchain_scanner_spark.operators import curate, dedup
from btc_blockchain_scanner_spark.sources.tables import load


def test_curate_end_to_end(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    evalset = docs.where(F.col("doc_id") < 10)
    train = docs.where(F.col("doc_id") >= 10)

    out, counters = curate.curate(
        train,
        evalset,
        min_quality=0.2,
        langs=("en", "es", "de"),
        per_source_max=8,
        splits={"train": 0.9, "val": 0.1},
    )
    rows = out.collect()
    out.unpersist()

    # counters are monotone non-increasing through the drop stages
    order = [
        "input",
        "after_quality_lang",
        "after_exact_dedup",
        "after_fuzzy_dedup",
        "after_decontamination",
        "after_source_cap",
        "output",
    ]
    vals = [counters[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert counters["output"] == len(rows) > 0
    assert counters["output"] < counters["input"]  # fixture drops something

    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))  # no duplicates survive
    # every row carries a split; output ⊆ input domain
    assert {r.split for r in rows} <= {"train", "val"}
    assert set(ids) <= {r.doc_id for r in train.select("doc_id").collect()}

    # per-source cap honored
    per_src = {}
    for r in rows:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    assert max(per_src.values()) <= 8

    # NO near-dup pair survives inside the curated output (the fuzzy-dedup
    # postcondition, checked with the independent pair operator)
    survivors = spark.createDataFrame([(i,) for i in ids], "doc_id long").join(
        docs, "doc_id"
    )
    left = dedup.ngram_jaccard_pairs(survivors, n=3, threshold=0.5)
    assert left.count() == 0


def test_curate_deterministic_across_parallelism(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for label, parts in (("lo", "3"), ("hi", "17")):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            out, _ = curate.curate(docs, min_quality=0.2, langs=None, splits={"a": 0.5, "b": 0.5})
            results[label] = {(r.doc_id, r.split) for r in out.collect()}
            out.unpersist()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results["lo"] == results["hi"]

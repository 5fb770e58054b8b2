"""Datagen determinism + extraction semantics vs the pure-Python oracle.

Covers FIXTURES.md §1 invariants: order-deterministic generation at any
parallelism, per-turn text pass-through (F2 analog), extraction == oracle.
"""

from pyspark.sql import functions as F

from btc_blockchain_scanner_spark.kg import datagen, extract, oracle


def test_datagen_parallelism_independent(spark):
    a = datagen.transcripts(spark, n_convs=30, partitions=2).orderBy("conv_id", "turn_idx")
    b = datagen.transcripts(spark, n_convs=30, partitions=16).orderBy("conv_id", "turn_idx")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_datagen_schema_and_ordering(spark):
    df = datagen.transcripts(spark, n_convs=10)
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # dense contiguous turn_idx per conv
    per_conv = df.groupBy("conv_id").agg(
        F.count("*").alias("n"), F.max("turn_idx").alias("mx"), F.min("turn_idx").alias("mn")
    )
    bad = per_conv.where((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count()
    assert bad == 0
    # tool set only on tool turns
    assert df.where((F.col("role") != "tool") & F.col("tool").isNotNull()).count() == 0


def test_extraction_matches_oracle_and_preserves_text(spark):
    tr = datagen.transcripts(spark, n_convs=25)
    ex = extract.extract(tr)
    # per-turn text equality under stable ordering (the F2 invariant)
    out = ex.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    src = tr.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in src]

    mentions = extract.mentions_from(ex)
    triples = extract.triples_from(ex)
    got_m = {tuple(r) for r in mentions.collect()}
    got_t = {tuple(r) for r in triples.collect()}

    o_m, o_t = set(), set()
    for r in src:
        ms, ts = oracle.extract_turn(r.text)
        for pos, s, a, b, k in ms:
            o_m.add((r.conv_id, r.turn_idx, pos, s, a, b, k))
        for s, p, ob, pos in ts:
            o_t.add((r.conv_id, r.turn_idx, s, p, ob, pos))
    assert got_m == o_m
    assert got_t == o_t
    assert len(got_t) > 0 and len(got_m) > 0


def test_flags_fast_path_equals_join_path(spark):
    """mention_flags_from_extracted (pipeline fast path, no join) must emit
    exactly the rows of mention_flags_from (read-side mentions ⋈ turns)."""
    tr = datagen.transcripts(spark, n_convs=20)
    ex = extract.extract(tr).persist()
    fast = {tuple(r) for r in extract.mention_flags_from_extracted(ex).collect()}
    joined = {
        tuple(r)
        for r in extract.mention_flags_from(extract.mentions_from(ex), tr).collect()
    }
    ex.unpersist()
    assert fast == joined and len(fast) > 0


def test_synth_materialization_idempotent_and_parity(spark, tmp_path, monkeypatch):
    """plans/synth.py: the materialized parquet must hold exactly the
    regenerated rows (the oracle reads those bytes), and a second call must
    NOT rewrite (the _SUCCESS short-circuit the gate/bench rely on)."""
    import os

    from btc_blockchain_scanner_spark.plans import synth

    monkeypatch.setattr(synth, "SYNTH_DIR", str(tmp_path))
    m1 = synth.materialized_transcripts(spark, n_convs=15)
    want = {tuple(r) for r in datagen.transcripts(spark, n_convs=15).collect()}
    assert {tuple(r) for r in m1.collect()} == want
    path = synth.transcripts_path(15)
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    m2 = synth.materialized_transcripts(spark, n_convs=15)
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime  # no rewrite
    assert m2.count() == len(want)


def test_conversational_extraction_resolves_pronouns(spark):
    """Grouped applyInPandas extractor: pronouns resolve to the most recent
    canonical mention across TURN boundaries (state a per-turn UDF cannot
    carry), under stable (conv_id, turn_idx) ordering."""
    from btc_blockchain_scanner_spark.kg.vocab import ALIASES

    alias, canon = next(iter(ALIASES.items()))
    rows = [
        ("c1", 0, "user", f"tell me about {canon}", "", None),
        ("c1", 1, "assistant", "it is widely used and this matters", "", None),
        ("c1", 2, "user", f"compare {alias} then", "", None),
        ("c1", 3, "assistant", "that comparison favors it", "", None),
        ("c2", 0, "user", "it has no antecedent here", "", None),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {
        (r.conv_id, r.turn_idx, r.pos, r.surface, r.mention_type, r.source_token)
        for r in extract.extract_conversational(turns).collect()
    }
    expect = {
        ("c1", 0, 3, canon, "exact", None),
        # turn 1: both pronouns resolve to the canon mentioned in turn 0
        ("c1", 1, 0, canon, "pronoun", "it"),
        ("c1", 1, 5, canon, "pronoun", "this"),
        ("c1", 2, 1, alias, "alias", None),
        # turn 3: resolves to the ALIAS's canonical form from turn 2
        ("c1", 3, 0, ALIASES[alias], "pronoun", "that"),
        ("c1", 3, 3, ALIASES[alias], "pronoun", "it"),
    }
    assert got == expect  # c2's dangling pronoun emits nothing


def test_conversational_consistent_with_per_turn_and_parallelism(spark):
    """Non-pronoun rows must equal the per-turn Arrow extractor's mentions
    on the same transcripts, at any shuffle parallelism."""
    tr = datagen.transcripts(spark, n_convs=30).cache()
    per_turn = {
        (r.conv_id, r.turn_idx, r.pos, r.surface, r.mention_type)
        for r in extract.mentions_from(extract.extract(tr)).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    outs = []
    try:
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            outs.append(
                {
                    tuple(r)
                    for r in extract.extract_conversational(tr).collect()
                }
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert outs[0] == outs[1]
    non_pronoun = {
        (c, t, p, s, mt) for (c, t, p, s, mt, src) in outs[0] if mt != "pronoun"
    }
    assert non_pronoun == per_turn

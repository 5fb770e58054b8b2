"""Bucketed co-located joins (no Exchange) + salted skew aggregations."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from btc_blockchain_scanner_spark.operators import salting
from btc_blockchain_scanner_spark.sources import bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 5000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b")
    )
    bucketed.write_bucketed(left, "t_buck_left", "k", n_buckets=8)
    bucketed.write_bucketed(right, "t_buck_right", "k", n_buckets=8)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast: at test scale the optimizer would just
        # broadcast the small side; at the 100 TB scale this feature
        # exists for, neither side broadcasts — the assertion below is
        # that the BUCKET layout (not a broadcast) removes the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed.cobucketed_join(spark, "t_buck_left", "t_buck_right", "k")
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # no shuffle on either side
        got = {(r.k, r.a, r.b) for r in j.collect()}
        want = {(k, k * 2, k + 7) for k in range(0, 5000, 3)}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_buck_left")
        spark.sql("DROP TABLE IF EXISTS t_buck_right")


def test_salted_collect_set_matches_plain(spark):
    # hot key: 'hub' carries 90% of rows (the HUB_ENTITY shape)
    rows = [("hub", f"v{i % 97}") for i in range(5000)] + [
        (f"k{i % 11}", f"v{i % 13}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {
        (r.k, tuple(r.v_set))
        for r in salting.salted_collect_set(df, ["k"], "v", n_salts=16).collect()
    }
    want = {
        (r.k, tuple(r.s))
        for r in df.groupBy("k").agg(F.array_sort(F.collect_set("v")).alias("s")).collect()
    }
    assert got == want


def test_salted_count_distinct_matches_plain(spark):
    rows = [("hub", i % 997) for i in range(5000)] + [
        (f"k{i % 7}", i % 23) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r.k, r.v_n_distinct)
        for r in salting.salted_count_distinct(df, ["k"], "v", n_salts=16).collect()
    }
    want = {
        (r.k, r.n)
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == want


def test_salted_join_matches_plain_join(spark):
    # 'hub' is 90% of fact rows (the HUB_ENTITY shape); dim is small
    fact = spark.createDataFrame(
        [("hub", i) for i in range(4500)] + [(f"k{i % 9}", i) for i in range(500)],
        "k string, v long",
    )
    dim = spark.createDataFrame(
        [("hub", "H")] + [(f"k{i}", f"D{i}") for i in range(9)] + [("absent", "X")],
        "k string, d string",
    )
    got = {tuple(r) for r in salting.salted_join(fact, dim, "k", n_salts=8).collect()}
    want = {tuple(r) for r in fact.join(dim, "k").collect()}
    assert got == want
    # left join keeps unmatched fact rows exactly once
    fact2 = fact.union(spark.createDataFrame([("orphan", -1)], "k string, v long"))
    got_l = {
        tuple(r) for r in salting.salted_join(fact2, dim, "k", n_salts=8, how="left").collect()
    }
    want_l = {tuple(r) for r in fact2.join(dim, "k", "left").collect()}
    assert got_l == want_l


def test_salt_is_deterministic_across_parallelism(spark):
    df = spark.createDataFrame([(f"k{i}", i) for i in range(200)], "k string, v long")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = {tuple(r) for r in salting.with_salt(df, 8).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = {tuple(r) for r in salting.with_salt(df.repartition(13), 8).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_salted_join_rejects_dim_preserving_how(spark):
    """right/full would emit every unmatched dim row once per salt
    (n_salts phantom rows) — must raise, not silently multiply (ADVICE r4)."""
    import pytest

    fact = spark.createDataFrame([(1, "a")], "k int, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, d string")
    for how in ("right", "full", "outer", "full_outer", "cross"):
        with pytest.raises(ValueError, match="salted_join"):
            salting.salted_join(fact, dim, "k", n_salts=4, how=how)
    # semi/anti stay fact-preserving and allowed
    assert {r.k for r in salting.salted_join(fact, dim, "k", n_salts=4, how="left_semi").collect()} == {1}

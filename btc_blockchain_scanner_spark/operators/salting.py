"""Explicit key salting for skewed aggregations.

The hub entity is 40% of all mentions by construction (vocab.HUB_ENTITY —
the giant-wallet skew the reference fights with bulk relabels,
RunUpdateWallets2.java:218-222). Spark already defuses *algebraic*
aggregates (sum/count/min) via map-side partial aggregation, and AQE
splits skewed JOIN partitions — but non-algebraic aggregates
(collect_set / collect_list) funnel every row of a hot key through ONE
reduce task, and no partial-agg saves them.

Salting is the explicit fix: spread each key over ``n_salts`` sub-keys,
aggregate per (key, salt) — bounded task size — then merge the ≤n_salts
partial results per key. Two shuffles, both bounded; the merge input is
n_salts rows per key regardless of how hot the key is.

``pair_edges_from_groups`` (operators/cc.py) and the two-phase rank
(operators/rank.py) are special-case instances of the same idea; this
module is the general utility for user aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 32, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): hash of the whole row's
    partition-local position is NOT deterministic, so salt on a cheap
    uniform hash of all columns (content-derived → same row always gets
    the same salt at any parallelism)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_collect_set(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 32
) -> DataFrame:
    """groupBy(key).collect_set(value) that survives hot keys.

    Phase 1 collects per (key, salt) — each task sees at most ~1/n_salts
    of a hot key's rows; phase 2 flattens + dedups the ≤n_salts partial
    sets per key. Output column: ``{value_col}_set`` (sorted array for
    deterministic comparisons)."""
    out = f"{value_col}_set"
    salted = with_salt(df.select(*key_cols, value_col), n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.collect_set(value_col).alias("_part")
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.array_sort(F.array_distinct(F.flatten(F.collect_list("_part")))).alias(out))
    )


def salted_count_distinct(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 32
) -> DataFrame:
    """Exact count-distinct per key without funnelling a hot key through
    one task: salt on the VALUE (so duplicates of one value land in the
    same salt and dedup there), count distinct per (key, salt), sum the
    disjoint partial counts."""
    salted = df.select(*key_cols, value_col).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count_distinct(value_col).alias("_n")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").cast("long").alias(f"{value_col}_n_distinct")
    )


def salt_explode(n_salts: int) -> Column:
    """Replicate-side helper for a salted skew JOIN: the dim side
    cross-explodes each row to all n_salts salt variants so the equi-join
    on (key, salt) still matches every salted fact row — see
    :func:`salted_join`."""
    return F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))


def salted_join(
    fact: DataFrame, dim: DataFrame, on: str, n_salts: int = 32, how: str = "inner"
) -> DataFrame:
    """Skew-defusing equi-join: salt the (skewed) fact side with a
    content-derived salt, replicate each dim row across all ``n_salts``
    variants, join on (key, salt). A hot fact key spreads over n_salts
    reduce tasks instead of one — the classic salted-join recipe for when
    AQE's runtime skew split is unavailable (deterministic-plan
    requirements, or non-shuffle-join strategies AQE won't touch). Cost:
    the dim side is written n_salts times into the shuffle, so keep it to
    genuinely small dimensions (or broadcast instead when it fits).

    ``how`` is restricted to fact-side-preserving joins (inner / left /
    left_semi / left_anti): the dim side is REPLICATED n_salts times, so
    any dim-preserving variant (right/full) would emit every unmatched
    dim row once per salt — n_salts phantom rows (ADVICE r4). Those
    shapes don't need salting anyway (the unmatched-dim side is the
    small side); raise instead of returning wrong multiplicity."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched dim rows "
            f"{n_salts}x (dim side is salt-replicated); use a plain join "
            "for right/full shapes"
        )
    f = with_salt(fact, n_salts)
    d = dim.withColumn("_salt", salt_explode(n_salts))
    return f.join(d, [on, "_salt"], how).drop("_salt")

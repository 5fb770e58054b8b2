"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Schema (BASELINE.json input_hint): transcripts(conv_id string, turn_idx
int, role string, text string, tool string, ts timestamp).

Every column is a pure function of (seed, conv_index, turn_idx) — no RNG
state, no driver loops, no ``monotonically_increasing_id`` — so the
generated table is byte-identical at any parallelism (SURVEY.md §7.3 hard
part (b): the local[8] ≡ local[32] determinism precondition).

The conversation/turn skeleton is cheap Column math over ``spark.range``;
the text itself is built by an Arrow-batched pandas UDF whose hashes are
vectorized numpy splitmix64 — a ~100x faster path than a giant Column
expression tree (which falls out of whole-stage codegen and evaluates
interpreted at ~1ms/row).

Scale: ``spark.range(n_convs)`` parallelizes the generation; at 10^12-turn
scale the same plan runs over a partitioned range. The reference analog is
the one-time block staging job (RunPrepareBlockFiles.java:49-86).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .vocab import ALIASES, ENTITIES, FILLERS, HUB_ENTITY, PREDICATES, ROLES, TOOLS

_ALIAS_KEYS = tuple(ALIASES)

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)."""
    with np.errstate(over="ignore"):
        z = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def _h(seed: int, tag: int, conv_i: np.ndarray, turn_idx: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (
            _U64(seed) * _U64(0x2545F4914F6CDD1D)
            + _U64(tag) * _U64(0x9E3779B97F4A7C15)
            + conv_i.astype(_U64) * _U64(0xD6E8FEB86659FD93)
            + turn_idx.astype(_U64) * _U64(0xCA5A826395121157)
        )
    return _splitmix64(x)


def _pick(arr: tuple[str, ...], h: np.ndarray) -> np.ndarray:
    return np.asarray(arr, dtype=object)[(h % _U64(len(arr))).astype(np.int64)]


def _mention_token(h: np.ndarray) -> np.ndarray:
    """Entity mention surface: the hub entity 40% of the time (skew!), an
    alias/misspelling 20%, a uniform canonical entity otherwise."""
    branch = (h % _U64(10)).astype(np.int64)
    hi = h >> _U64(4)
    out = _pick(ENTITIES, hi)
    out = np.where(branch < 6, _pick(_ALIAS_KEYS, hi), out)
    out = np.where(branch < 4, HUB_ENTITY, out)
    return out


def _make_text_udf(seed: int):
    @pandas_udf("string")
    def text_udf(conv_i: pd.Series, turn_idx: pd.Series) -> pd.Series:
        ci = conv_i.to_numpy(dtype=np.int64).astype(_U64)
        ti = turn_idx.to_numpy(dtype=np.int64).astype(_U64)
        n = len(ci)

        def seg_filler(tag: int, n_mod: int, n_base: int) -> list[np.ndarray]:
            """Up to n_base+n_mod-1 filler tokens; None marks absent slots."""
            count = (_h(seed, tag, ci, ti) % _U64(n_mod)).astype(np.int64) + n_base
            cols = []
            for k in range(n_base + n_mod - 1):
                tok = _pick(FILLERS, _h(seed, tag * 1000 + k + 1, ci, ti))
                cols.append(np.where(k < count, tok, None))
            return cols

        def triple(tag: int, present: np.ndarray) -> list[np.ndarray]:
            subj = _mention_token(_h(seed, tag + 1, ci, ti))
            pred = _pick(PREDICATES, _h(seed, tag + 2, ci, ti))
            obj = _mention_token(_h(seed, tag + 3, ci, ti))
            return [
                np.where(present, subj, None),
                np.where(present, pred, None),
                np.where(present, obj, None),
            ]

        t1 = (_h(seed, 11, ci, ti) % _U64(3)) < 2   # ~67% carry a triple
        t2 = (_h(seed, 12, ci, ti) % _U64(4)) == 0  # ~25% a second one
        m = (_h(seed, 13, ci, ti) % _U64(3)) == 0   # ~33% a bare mention

        slots = (
            seg_filler(100, 3, 2)
            + triple(200, t1)
            + seg_filler(300, 3, 1)
            + triple(400, t2)
            + [np.where(m, _mention_token(_h(seed, 14, ci, ti)), None)]
            + seg_filler(500, 3, 1)
        )
        mat = np.stack(slots, axis=1)  # (rows, slots) of str|None
        texts = [" ".join(t for t in row if t is not None) for row in mat]
        return pd.Series(texts)

    return text_udf


def transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the deterministic transcripts table. Each conversation has
    3-18 turns; each turn text is filler tokens with 0-2 planted
    ``SUBJ PRED OBJ`` triple patterns and 0-1 extra bare mentions."""
    convs = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    convs = convs.select(
        F.col("id").alias("conv_i"),
        F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
        (3 + F.pmod(F.xxhash64(F.lit(seed), F.lit("nturns"), F.col("id")), F.lit(16)))
        .cast("int")
        .alias("n_turns"),
    )
    turns = convs.select(
        "conv_i",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    ci, ti = F.col("conv_i"), F.col("turn_idx")
    role_h = F.pmod(F.xxhash64(F.lit(seed), F.lit("role"), ci, ti), F.lit(len(ROLES)))
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (role_h + 1).cast("int"))
    tool_h = F.pmod(F.xxhash64(F.lit(seed), F.lit("tool"), ci, ti), F.lit(len(TOOLS)))
    tool = F.when(
        role == "tool", F.element_at(F.array(*[F.lit(t) for t in TOOLS]), (tool_h + 1).cast("int"))
    ).otherwise(F.lit(None).cast("string"))
    ts = F.timestamp_seconds(F.lit(1704067200) + ci * 3600 + ti.cast("long") * 60)

    text_udf = _make_text_udf(seed)
    return turns.select(
        "conv_id",
        ti.cast("int").alias("turn_idx"),
        role.alias("role"),
        text_udf(ci, ti).alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )

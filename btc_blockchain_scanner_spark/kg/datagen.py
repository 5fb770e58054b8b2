"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Schema (BASELINE.json input_hint): transcripts(conv_id string, turn_idx
int, role string, text string, tool string, ts timestamp).

Every column is a pure function of (seed, conv_index, turn_idx) built from
``xxhash64`` Column expressions over ``spark.range`` — no RNG state, no
driver loops, no ``monotonically_increasing_id`` — so the generated table is
byte-identical at any parallelism (SURVEY.md §7.3 hard part (b): the
local[8] ≡ local[32] determinism precondition).

Scale: ``spark.range(n_convs)`` parallelizes the generation; at 10^12-turn
scale the same expression tree runs over a partitioned range. The reference
analog is the one-time block staging job (RunPrepareBlockFiles.java:49-86).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .vocab import ALIASES, ENTITIES, FILLERS, HUB_ENTITY, PREDICATES, ROLES, TOOLS

_ALIAS_KEYS = tuple(ALIASES)


def _h(seed: int, *cols: Column | str | int) -> Column:
    """Deterministic non-negative 64-bit hash of (seed, *cols)."""
    parts = [F.lit(seed)] + [c if isinstance(c, Column) else F.lit(c) for c in cols]
    return F.abs(F.xxhash64(*parts))


def _pick(arr: tuple[str, ...], h: Column) -> Column:
    """Deterministically pick one element of a literal array by hash."""
    lit = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit, (h % len(arr) + 1).cast("int"))


def _mention_token(h: Column) -> Column:
    """An entity mention surface: the hub entity 40% of the time (skew!),
    an alias/misspelling 20%, a uniform canonical entity otherwise."""
    hi = F.floor(h / 10).cast("long")
    return (
        F.when(h % 10 < 4, F.lit(HUB_ENTITY))
        .when(h % 10 < 6, _pick(_ALIAS_KEYS, hi))
        .otherwise(_pick(ENTITIES, hi))
    )


def transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the deterministic transcripts table.

    Each conversation has 3-18 turns; each turn text is 4-9 filler tokens
    with 0-2 planted ``SUBJ PRED OBJ`` triple patterns and 0-1 extra bare
    mentions, all chosen by position hashes.
    """
    convs = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    convs = convs.select(
        F.col("id").alias("conv_i"),
        F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
        (3 + _h(seed, "nturns", F.col("id")) % 16).cast("int").alias("n_turns"),
    )
    turns = convs.select(
        "conv_i",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    ci, ti = F.col("conv_i"), F.col("turn_idx")

    def seg_filler(tag: str, n_mod: int, n_base: int) -> Column:
        """n_base..n_base+n_mod-1 filler tokens."""
        n = (_h(seed, tag + "_n", ci, ti) % n_mod + n_base).cast("int")
        idx = F.sequence(F.lit(0), n - 1)
        return F.transform(idx, lambda i: _pick(FILLERS, _h(seed, tag, ci, ti, i)))

    def triple_pattern(tag: str, present: Column) -> Column:
        subj = _mention_token(_h(seed, tag + "_s", ci, ti))
        pred = _pick(PREDICATES, _h(seed, tag + "_p", ci, ti))
        obj = _mention_token(_h(seed, tag + "_o", ci, ti))
        return F.when(present, F.array(subj, pred, obj)).otherwise(
            F.array().cast("array<string>")
        )

    t1_present = _h(seed, "t1?", ci, ti) % 3 < 2  # ~67% of turns carry a triple
    t2_present = _h(seed, "t2?", ci, ti) % 4 == 0  # ~25% a second one
    m_present = _h(seed, "m?", ci, ti) % 3 == 0  # ~33% a bare mention
    bare_mention = F.when(m_present, F.array(_mention_token(_h(seed, "m", ci, ti)))).otherwise(
        F.array().cast("array<string>")
    )

    tokens = F.concat(
        seg_filler("f1", 3, 2),
        triple_pattern("t1", t1_present),
        seg_filler("f2", 3, 1),
        triple_pattern("t2", t2_present),
        bare_mention,
        seg_filler("f3", 3, 1),
    )

    role = _pick(ROLES, _h(seed, "role", ci, ti))
    tool = F.when(role == "tool", _pick(TOOLS, _h(seed, "tool", ci, ti))).otherwise(
        F.lit(None).cast("string")
    )
    ts = F.timestamp_seconds(
        F.lit(1704067200) + ci * 3600 + ti.cast("long") * 60  # 2024-01-01 base
    )

    return turns.select(
        "conv_id",
        ti.cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat_ws(" ", tokens).alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )

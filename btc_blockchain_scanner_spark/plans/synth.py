"""Deterministic synthetic-input materialization for oracle parity.

The transcript/asset queries (kg10+, mm01+) run over generated-in-Spark
inputs, which DuckDB cannot see — so their oracle checks were rows-only.
Fix (VERDICT r02 items 2 & 7): the query materializes its deterministic
input to a well-known parquet path on first use, and the oracle SQL reads
the SAME bytes back with ``read_parquet``. Generation is a pure function
of (n, seed) at any parallelism (kg/datagen.py docstring), so the
materialized table is reproducible; the path embeds (n, seed, version) and
an existing ``_SUCCESS`` marker short-circuits re-writes.

On a cluster this directory is a shared staging prefix (the reference's
block-file staging dir, RunPrepareBlockFiles.java:49-86); locally /tmp.
"""

from __future__ import annotations

import hashlib
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

SYNTH_DIR = "/tmp/spark_graft_synth"


@lru_cache(maxsize=4)
def _generator_fp(kind: str) -> str:
    """Content fingerprint of the generator source — the path version tag.

    A hand-bumped version string (r3's ``_V = 'v1'``) silently serves a
    STALE /tmp table to BOTH the Spark query and the DuckDB oracle when the
    generator changes without a bump — oracle parity then masks the
    staleness (ADVICE r3). Hashing the generating module's source text makes
    the path change automatically with any generator edit; vocab is included
    for transcripts because datagen's output is a function of it."""
    import inspect

    from ..kg import datagen, vocab
    from ..operators import multimodal

    srcs = {
        "transcripts": (datagen, vocab),
        "assets": (multimodal,),
    }[kind]
    h = hashlib.md5()
    for mod in srcs:
        h.update(inspect.getsource(mod).encode())
    return h.hexdigest()[:10]


def transcripts_path(n_convs: int, seed: int = 42) -> str:
    return f"{SYNTH_DIR}/transcripts_{_generator_fp('transcripts')}_n{n_convs}_s{seed}"


def assets_path(n: int) -> str:
    return f"{SYNTH_DIR}/assets_{_generator_fp('assets')}_n{n}"


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _publish(df: DataFrame, path: str) -> None:
    """Race-safe install: write to a process-unique sibling dir, then
    os.rename into place. Two concurrent processes both writing straight
    to the final path with mode('overwrite') would delete each other's
    files mid-read; with rename, the loser just discards its copy and the
    winner's complete table is what every reader sees."""
    import shutil

    tmp = f"{path}._build{os.getpid()}"
    df.write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, path)
    except OSError:  # lost the race — a complete table is already installed
        shutil.rmtree(tmp, ignore_errors=True)


def materialized_transcripts(spark: SparkSession, n_convs: int, seed: int = 42) -> DataFrame:
    """Transcripts table, written once to the shared path, read back —
    both the Spark query and the DuckDB oracle consume identical bytes."""
    from ..kg import datagen

    path = transcripts_path(n_convs, seed)
    if not _done(path):
        _publish(datagen.transcripts(spark, n_convs=n_convs, seed=seed), path)
    return spark.read.parquet(path)


def materialized_assets(spark: SparkSession, n: int) -> DataFrame:
    from ..operators import multimodal

    path = assets_path(n)
    if not _done(path):
        _publish(multimodal.synthesize_assets(spark, n=n), path)
    return spark.read.parquet(path)

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual media decode is
STUBBED — this container has no image/audio libraries, so ``_decode_*``
raises ``NotImplementedError`` unless a deterministic fake is requested
(the default for tests/bench). Swapping in PIL/torchaudio later only
replaces the ``_decode_*`` bodies.

Design for 100 TB: payloads stay in executor memory one Arrow batch at a
time (``mapInPandas`` iterator form — never a full-partition materialize);
metadata travels in a typed struct column so filters on e.g. width push
down without touching bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_assets(spark: SparkSession, n: int = 100, partitions: int = 8) -> DataFrame:
    """Deterministic fake binary assets (payload = repeated sha256 stream of
    the asset id) — parallelism-independent like kg.datagen."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    base = spark.range(0, n, 1, partitions).select(
        F.col("id").alias("asset_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64(F.col("id")), F.lit(3)) + 1).cast("int")).alias(
            "kind"
        ),
    )
    # payload: sha2 hex of the id, repeated 4x, as UTF-8 bytes (256 bytes).
    # ASCII-range bytes on purpose: the DuckDB oracle (mm01) has no BLOB
    # digest function, but sha256(payload::VARCHAR) over ASCII bytes hashes
    # the identical byte stream Python's hashlib sees — exact sha parity.
    # The engine still treats payload as opaque binary throughout.
    payload = F.encode(
        F.repeat(F.sha2(F.col("asset_id").cast("string"), 256), 4), "UTF-8"
    )
    meta = F.struct(
        (F.pmod(F.xxhash64(F.col("asset_id"), F.lit("w")), F.lit(1920)) + 1)
        .cast("int")
        .alias("width"),
        (F.pmod(F.xxhash64(F.col("asset_id"), F.lit("h")), F.lit(1080)) + 1)
        .cast("int")
        .alias("height"),
        (F.pmod(F.xxhash64(F.col("asset_id"), F.lit("d")), F.lit(60000)) + 1)
        .cast("int")
        .alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )
    return base.select("asset_id", "kind", payload.alias("payload"), meta.alias("meta"))


def _decode_fake(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode': a dim-length float vector derived from
    the payload bytes (stands in for pixel/spectrogram features)."""
    h = hashlib.sha256(payload).digest()
    raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    arr = np.frombuffer(raw, dtype=np.uint32).astype(np.float32)
    return (arr % 1000) / 1000.0


def _decode_real(payload: bytes, kind: str):
    raise NotImplementedError(
        "media decode requires PIL/torchaudio/ffmpeg — not present in this "
        "environment; use fake=True (deterministic stub) or plug a decoder in"
    )


def extract_features(assets: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas (iterator form:
    one batch in memory at a time)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if payload is None:
                    feats.append(None)
                elif fake:
                    feats.append(_decode_fake(bytes(payload), dim).tolist())
                else:
                    feats.append(_decode_real(bytes(payload), kind))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload_sha": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "n_bytes": [len(bytes(p)) if p is not None else None for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return assets.repartition("asset_id").mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_ms: int = 10000) -> DataFrame:
    """Video → (asset_id, frame_ts_ms) sampling grid from metadata only —
    no byte touch; pure Column math so the payload column is pruned from
    the scan entirely."""
    v = assets.where(F.col("kind") == "video")
    return v.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )

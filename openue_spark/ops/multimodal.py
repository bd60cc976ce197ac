"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` payload columns with typed metadata structs.
Decode / feature-extraction / resize / frame-sampling run as Arrow-batched
pandas functions over mapInPandas — the Spark-side plumbing (schema,
partitioning, UDF signatures, batch shapes) is real and tested; the actual
codec step is STUBBED (this container ships no image/audio libraries):

- `decode_features(..., fake=True)` produces a deterministic hash-derived
  feature vector per payload (documented fake, stable across runs)
- `decode_features(..., fake=False)` raises NotImplementedError at the
  exact point a real decoder (PIL / torchaudio / pyav) would be called

At scale: payloads dominate bytes, so media tables should be scanned with
column pruning (never `select *`), partitioned by kind/date, and decoded
with small Arrow batches (`spark.sql.execution.arrow.maxRecordsPerBatch`)
to bound Python-worker memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def synth_media(spark: SparkSession, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table: payload bytes and metadata are pure
    functions of media_id (same contract as fixtures.transcripts_spark)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                kind = KINDS[i % 3]
                payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 8)
                meta = {
                    "width": 64 * (1 + i % 16) if kind != "audio" else None,
                    "height": 64 * (1 + (i // 3) % 12) if kind != "audio" else None,
                    "duration_ms": 1000 * (1 + i % 300) if kind != "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                }
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: bytes -> unit vector."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 8) // len(h) + 1))[: dim * 8], dtype=np.uint64)
    vec = (raw.astype(np.float64) / np.float64(2**64)) - 0.5
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """payload binary -> feature vector, Arrow-batched.

    fake=False marks where a real decoder (PIL.Image.open / soundfile /
    pyav) would run; unavailable in this container by design.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile/pyav (not in container); "
                    "use fake=True for the deterministic stand-in"
                )
            payloads = pdf["payload"].to_numpy()
            feats = [_fake_feature(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) for p in payloads],
                }
            )

    # column pruning matters: never ship meta/extra columns into Arrow
    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=_FEAT_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure metadata math (column ops); only the pixel
    rewrite itself would touch payload bytes (stubbed decode path)."""
    scale = F.when(
        F.greatest("meta.width", "meta.height") > max_side,
        F.lit(max_side) / F.greatest("meta.width", "meta.height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.where(F.col("kind") == "image").select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.round(scale, 4).alias("scale"),
        F.ceil(F.col("meta.width") * scale).cast("int").alias("new_width"),
        F.ceil(F.col("meta.height") * scale).cast("int").alias("new_height"),
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling plan: timestamps to decode, as an array column
    (explodes into per-frame decode work items downstream)."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.col("meta.duration_ms").alias("duration_ms"),
        F.expr(
            f"transform(sequence(0, cast(meta.duration_ms * {fps} / 1000.0 as int) - 1),"
            f" i -> cast(i * 1000.0 / {fps} as int))"
        ).alias("frame_ts_ms"),
    )

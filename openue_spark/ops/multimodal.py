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


def default_decoder(payload: bytes, kind: str) -> np.ndarray:
    """The real-codec integration seam.

    Contract: (payload bytes, kind) -> float64 feature vector of length
    FEATURE_DIM. A deployment with media libraries installs its own decoder
    by passing `decoder=` to decode_features, e.g.::

        def pil_decoder(payload, kind):
            img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img.resize((8, 8)), dtype=np.float64)
            vec = arr.mean(axis=2).ravel()[:FEATURE_DIM]
            return vec / (np.linalg.norm(vec) or 1.0)

        decode_features(media, fake=False, decoder=pil_decoder)

    The decoder runs INSIDE the Arrow batch loop on executors: ship it in a
    --py-files module (pickled by reference) or define it locally so
    cloudpickle serializes it by value; either way it must not capture
    driver-side resources or touch the filesystem per call. This default
    probes for PIL/soundfile/av and raises with guidance when none is
    present (this container ships none, by design).
    """
    for mod in ("PIL", "soundfile", "av"):
        try:
            __import__(mod)
        except ImportError:
            continue
        raise NotImplementedError(
            f"{mod} is importable — wire a {mod}-backed decoder via "
            "decode_features(media, fake=False, decoder=...); see the "
            "default_decoder docstring for the contract"
        )
    raise NotImplementedError(
        "real media decode needs an image/audio library (PIL, soundfile, or "
        "av — none importable here); pass decoder=<your fn> to "
        "decode_features(fake=False) or use fake=True for the deterministic "
        "stand-in"
    )


def decode_features(media: DataFrame, fake: bool = True, decoder=None) -> DataFrame:
    """payload binary -> feature vector, Arrow-batched.

    fake=True uses the deterministic hash stand-in; fake=False calls
    `decoder` (default: `default_decoder`, which documents the real-codec
    seam and raises until a library-backed decoder is supplied).
    """
    decode = _fake_feature if fake else (decoder or default_decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].to_numpy()
            if fake:
                feats = [_fake_feature(bytes(p)) for p in payloads]
            else:
                kinds = pdf["kind"].to_numpy()
                feats = [decode(bytes(p), str(k)) for p, k in zip(payloads, kinds)]
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
    (explodes into per-frame decode work items downstream). A clip shorter
    than one frame interval plans ZERO frames — sequence(0, n-1) with
    n <= 0 would otherwise produce a DESCENDING [0, -1] array and emit a
    bogus negative-timestamp decode item."""
    n_frames = f"cast(meta.duration_ms * {fps} / 1000.0 as int)"
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.col("meta.duration_ms").alias("duration_ms"),
        F.expr(
            f"CASE WHEN {n_frames} < 1 THEN array()"
            f" ELSE transform(sequence(0, {n_frames} - 1),"
            f" i -> cast(i * 1000.0 / {fps} as int)) END"
        ).alias("frame_ts_ms"),
    )

"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` payload columns with typed metadata structs.
Decode / feature-extraction / resize / frame-sampling run as Arrow-batched
pandas functions over mapInPandas — the Spark-side plumbing (schema,
partitioning, UDF signatures, batch shapes) is real and tested. Codec
status (this container ships no image/audio libraries):

- `decode_features(..., fake=True)` produces a deterministic hash-derived
  feature vector per payload (documented fake, stable across runs)
- `decode_features(..., fake=False, decoder=ppm_decoder)` is a REAL image
  decode end to end: `ppm_decoder` parses binary Netpbm PPM (P6) payloads
  with numpy alone — actual pixels, mean-pooled into the feature grid —
  proving the seam on a genuine codec with zero external deps
- `decode_features(..., fake=False)` without a decoder raises
  NotImplementedError at the exact point a library-backed decoder
  (PIL / torchaudio / pyav) would be called; an importorskip-gated test
  cross-checks ppm_decoder against PIL's PPM reader where PIL exists

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


# --- a REAL image codec on the seam (no external libraries) --------------
#
# Netpbm binary PPM (P6) is a published image format simple enough to
# decode correctly with numpy alone, which makes the `decoder=` seam
# provable in this container without PIL: real header grammar (whitespace-
# separated tokens, '#' comments), real pixel bytes, real downsampling.
# A deployment with PIL/pyav swaps in its own decoder unchanged — the
# opt-in PIL test (tests/test_ops.py, importorskip-gated) cross-checks
# this decoder against PIL's PPM reader wherever PIL exists.


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6) payload."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8 RGB.

    Implements the Netpbm header grammar: magic, then width/height/maxval
    as whitespace-separated decimal tokens, '#'-to-newline comments
    allowed between tokens, exactly one whitespace byte before the raster.
    """
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            nl = payload.index(b"\n", pos)
            pos = nl + 1
            continue
        end = pos
        while end < len(payload) and payload[end : end + 1].isdigit():
            end += 1
        if end == pos:
            raise ValueError(f"bad PPM header near byte {pos}")
        vals.append(int(payload[pos:end]))
        pos = end
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    pos += 1  # the single whitespace byte separating header from raster
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3)


def _mean_pool(gray: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Mean-pool a 2-D array onto a (gh, gw) grid (vectorized reduceat)."""
    # tiny images: nearest-neighbor upsample so every grid cell is nonempty
    if gray.shape[0] < gh:
        gray = np.repeat(gray, -(-gh // gray.shape[0]), axis=0)
    if gray.shape[1] < gw:
        gray = np.repeat(gray, -(-gw // gray.shape[1]), axis=1)
    h, w = gray.shape
    re = np.linspace(0, h, gh + 1).astype(int)
    ce = np.linspace(0, w, gw + 1).astype(int)
    sums = np.add.reduceat(np.add.reduceat(gray, re[:-1], axis=0), ce[:-1], axis=1)
    counts = np.outer(np.diff(re), np.diff(ce))
    return sums / counts


def ppm_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Real image decoder for the `decoder=` seam: P6 pixels -> grayscale
    -> 4x4 mean-pooled grid -> FEATURE_DIM unit vector. Raises on
    non-image kinds (an audio payload reaching an image decoder is a
    pipeline routing bug, not something to hash around)."""
    if kind != "image":
        raise ValueError(f"ppm_decoder got kind={kind!r}; route images only")
    gray = decode_ppm(payload).mean(axis=2)
    vec = _mean_pool(gray, 4, 4).ravel()[:FEATURE_DIM]
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def synth_ppm_media(spark: SparkSession, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic VALID-PPM image table (media_id-pure like synth_media):
    per-id gradient + hash-phase pixels, so every payload decodes and
    distinct ids give distinct features."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                h, w = 8 + i % 9, 8 + (i // 9) % 9
                phase = int.from_bytes(
                    hashlib.sha256(f"img-{i}".encode()).digest()[:2], "big"
                )
                yy, xx = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [
                        (yy * 31 + phase) % 256,
                        (xx * 17 + phase // 3) % 256,
                        ((yy + xx) * 7 + i) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                meta = {
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                    "sample_rate": None,
                }
                rows.append((i, "image", encode_ppm(px), meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


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

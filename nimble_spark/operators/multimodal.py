"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
mapInPandas operators.

The decode kernels are STUBBED (image/audio libraries are not in this
container): ``decode=fake`` produces deterministic synthetic features
from the bytes so the Spark-side plumbing — schema, partition sizing,
UDF signatures, batch shapes — is real and testable; ``decode=real``
raises NotImplementedError where PIL/ffmpeg would be called.

Scale notes: binary payloads ride the scan (never through a shuffle —
features are extracted before any groupBy); mapInPandas streams Arrow
batches so peak memory is one batch of payloads per core, and
`maxRecordsPerBatch` bounds it.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads derived
    from seeded digests) — the test stand-in for a real media lake."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        meta = {
            "width": 64 + (i % 8) * 32 if kind == "image" else None,
            "height": 64 + (i % 5) * 32 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 * (1 + i % 10) if kind == "video" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        }
        rows.append((i, kind, payload, meta))
    # Few partitions for a tiny synthetic table: each partition spawns a
    # Python worker in mapInPandas; 32 workers for 64 rows is all startup.
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature vector from payload bytes (stands in
    for a real decode→embed kernel; replace with PIL/torchaudio)."""
    d = hashlib.sha256(payload).digest()
    return [((d[j % 32] << 8 | d[(j + 7) % 32]) % 1000) / 1000.0 for j in range(dim)]


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_digest": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(op, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int, decode: str = "fake") -> DataFrame:
    """Image resize plumbing: filters to kind=image *before* the Python
    stage (predicate stays JVM-side), then batch-transforms payloads."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real resize requires PIL")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": width,
                    "out_height": height,
                    # fake: size-proportional deterministic slice
                    "payload": pdf["payload"].map(
                        lambda b: bytes(b)[: max(16, (width * height) % max(len(bytes(b)), 1))]
                    ),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(op, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, decode: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (fan-out inside mapInPandas, schema carries frame_idx)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real frame extraction requires ffmpeg")
            out = {"media_id": [], "frame_idx": [], "frame_digest": []}
            for _, row in pdf.iterrows():
                n_frames = row["meta"]["n_frames"] or 0
                for fi in range(0, n_frames, every_n):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(fi)
                    out["frame_digest"].append(
                        hashlib.sha256(bytes(row["payload"]) + fi.to_bytes(4, "big")).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(op, schema)

"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed through Arrow-batched mapInPandas operators.

Decode is REAL and dependency-free (nimble_spark/functions/codecs.py):
images are PPM (P6), audio is WAV (PCM16), video is a RAWVID frame
sequence of PPMs — complete pure-Python codecs, not stubs. The
``decode="fake"`` path remains for plumbing tests (deterministic
digest-derived features, no byte parsing); swap the kernels for
PIL/torchaudio/ffmpeg when native libs are available — the Spark-side
shapes (schemas, batch flow, JVM-side filters) don't change.

Scale notes: binary payloads ride the scan (never through a shuffle —
features are extracted before any groupBy); mapInPandas streams Arrow
batches so peak memory is one batch of payloads per core, and
`maxRecordsPerBatch` bounds it. Kind filters stay JVM-side so Python
workers only ever see rows they will decode.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nimble_spark.functions.codecs import (
    decode_ppm,
    decode_rawvid,
    decode_wav,
    encode_ppm,
    encode_rawvid,
    encode_wav,
    resize_ppm_nearest,
)

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
        T.StructField("decoded_width", T.IntegerType()),
        T.StructField("decoded_height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

# synthesis formulas (shared with the DuckDB oracles, which recompute
# them in SQL — the differential gate then proves the decoders read
# the real bytes back out of the payloads)
_VID_FRAME_W = 8
_VID_FRAME_H = 8


def _img_dims(i: int) -> tuple[int, int]:
    return 64 + (i % 8) * 32, 64 + (i % 5) * 32


def _n_samples(i: int) -> int:
    return 1600 * (1 + i % 5)


def _n_frames(i: int) -> int:
    return 30 * (1 + i % 10)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL payloads: valid
    PPM images, PCM16 WAV audio, RAWVID frame streams — the test
    stand-in for a media lake, decodable by any conforming reader."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        if kind == "image":
            w, h = _img_dims(i)
            pixels = (d * (3 * w * h // len(d) + 1))[: 3 * w * h]
            payload = encode_ppm(w, h, pixels)
            meta = (w, h, None, None, "ppm")
        elif kind == "audio":
            ns = _n_samples(i)
            samples = [
                int.from_bytes(d[(2 * j) % 32 : (2 * j) % 32 + 2], "little", signed=True)
                for j in range(ns)
            ]
            payload = encode_wav(16000, samples)
            meta = (None, None, 16000, None, "wav")
        else:
            nf = _n_frames(i)
            fpx = 3 * _VID_FRAME_W * _VID_FRAME_H
            frames = [
                encode_ppm(
                    _VID_FRAME_W,
                    _VID_FRAME_H,
                    ((d + bytes([fi % 256])) * (fpx // 33 + 1))[:fpx],
                )
                for fi in range(nf)
            ]
            payload = encode_rawvid(frames)
            meta = (None, None, None, nf, "rawvid")
        rows.append((i, kind, payload, meta))
    # Few partitions for a tiny synthetic table: each partition spawns a
    # Python worker in mapInPandas; 32 workers for 64 rows is all startup.
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic digest-derived vector (plumbing-test path — no
    byte parsing; stands in for a learned embedding kernel)."""
    d = hashlib.sha256(payload).digest()
    return [((d[j % 32] << 8 | d[(j + 7) % 32]) % 1000) / 1000.0 for j in range(dim)]


def _real_features(kind: str, payload: bytes) -> dict:
    """Decode the payload with the real codec for its kind and derive
    deterministic features + decoded structure fields."""
    out = {
        "decoded_width": None,
        "decoded_height": None,
        "sample_rate": None,
        "n_samples": None,
        "n_frames": None,
    }
    if kind == "image":
        img = decode_ppm(payload)
        out["decoded_width"], out["decoded_height"] = img.width, img.height
        hist = [0] * FEATURE_DIM
        for b in img.pixels:
            hist[b * FEATURE_DIM // 256] += 1
        total = max(len(img.pixels), 1)
        out["features"] = [c / total for c in hist]
    elif kind == "audio":
        wav = decode_wav(payload)
        out["sample_rate"], out["n_samples"] = wav.sample_rate, len(wav.samples)
        n = max(len(wav.samples), 1)
        win = max(n // FEATURE_DIM, 1)
        feats = []
        for j in range(FEATURE_DIM):
            seg = wav.samples[j * win : (j + 1) * win] or [0]
            feats.append((sum(s * s for s in seg) / len(seg)) ** 0.5 / 32768.0)
        out["features"] = feats
    else:  # video
        frames = decode_rawvid(payload)
        out["n_frames"] = len(frames)
        feats = []
        for fb in frames[:FEATURE_DIM]:
            img = decode_ppm(fb)
            feats.append(sum(img.pixels) / len(img.pixels) / 255.0)
        feats += [0.0] * (FEATURE_DIM - len(feats))
        out["features"] = feats
    return out


def extract_features(media: DataFrame, decode: str = "real") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).
    ``decode="real"`` parses the actual bytes (PPM/WAV/RAWVID);
    ``decode="fake"`` derives features from a digest without parsing
    (plumbing-only path)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                rec = {
                    "media_id": row["media_id"],
                    "kind": row["kind"],
                    "n_bytes": len(payload),
                    "content_digest": hashlib.sha256(payload).hexdigest(),
                    "decoded_width": None,
                    "decoded_height": None,
                    "sample_rate": None,
                    "n_samples": None,
                    "n_frames": None,
                }
                if decode == "real":
                    rec.update(_real_features(row["kind"], payload))
                else:
                    rec["features"] = _fake_decode(payload)
                recs.append(rec)
            yield pd.DataFrame(recs, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.mapInPandas(op, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int, decode: str = "real") -> DataFrame:
    """Image resize: filters to kind=image *before* the Python stage
    (predicate stays JVM-side), then batch-transforms payloads.
    ``decode="real"`` is a true nearest-neighbor PPM resample
    re-encoded as PPM; ``fake`` slices bytes (plumbing-only)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                payloads = [
                    encode_ppm(
                        width,
                        height,
                        resize_ppm_nearest(decode_ppm(bytes(b)), width, height).pixels,
                    )
                    for b in pdf["payload"]
                ]
            else:
                payloads = [
                    bytes(b)[: max(16, (width * height) % max(len(bytes(b)), 1))]
                    for b in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": width,
                    "out_height": height,
                    "payload": payloads,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(op, RESIZE_SCHEMA)


CLIP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("clip_samples", T.LongType()),
        T.StructField("clip_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def clip_audio(media: DataFrame, start_s: float, end_s: float) -> DataFrame:
    """Audio clip extraction: decode the WAV payload, slice the sample
    range [start_s, end_s) at the stream's own sample rate, re-encode
    as WAV — the segment-extraction step of a speech training
    pipeline. Kind filter stays JVM-side; payloads never cross a
    shuffle (mapInPandas, narrow)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, nb, payloads = [], [], [], []
            for _, row in pdf.iterrows():
                wav = decode_wav(bytes(row["payload"]))
                lo = int(start_s * wav.sample_rate)
                hi = min(int(end_s * wav.sample_rate), len(wav.samples))
                seg = wav.samples[lo:hi] if lo < hi else []
                out = encode_wav(wav.sample_rate, seg)
                ids.append(row["media_id"])
                ns.append(len(seg))
                nb.append(len(out))
                payloads.append(out)
            yield pd.DataFrame(
                {"media_id": ids, "clip_samples": ns, "clip_bytes": nb, "payload": payloads}
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(op, CLIP_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, decode: str = "real") -> DataFrame:
    """Video frame sampling: one output row per sampled frame (fan-out
    inside mapInPandas). ``real`` decodes the RAWVID container and each
    sampled PPM frame (dims prove the frame bytes were parsed)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_w", T.IntegerType()),
            T.StructField("frame_h", T.IntegerType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "frame_w", "frame_h", "frame_digest")}
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                if decode == "real":
                    frames = decode_rawvid(payload)
                    for fi in range(0, len(frames), every_n):
                        img = decode_ppm(frames[fi])
                        out["media_id"].append(row["media_id"])
                        out["frame_idx"].append(fi)
                        out["frame_w"].append(img.width)
                        out["frame_h"].append(img.height)
                        out["frame_digest"].append(
                            hashlib.sha256(frames[fi]).hexdigest()[:16]
                        )
                else:
                    n_frames = row["meta"]["n_frames"] or 0
                    for fi in range(0, n_frames, every_n):
                        out["media_id"].append(row["media_id"])
                        out["frame_idx"].append(fi)
                        out["frame_w"].append(None)
                        out["frame_h"].append(None)
                        out["frame_digest"].append(
                            hashlib.sha256(payload + fi.to_bytes(4, "big")).hexdigest()[:16]
                        )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(op, schema)


AHASH_GRID = 4  # 4×4 blocks → 16-bit hash


def image_ahash(media: DataFrame, grid: int = AHASH_GRID) -> DataFrame:
    """Perceptual average-hash over decoded image pixels — the
    image-dedup primitive (near-identical images differ in few hash
    bits). Per image: grayscale each pixel (integer channel sum),
    integer-sum per grid block (exact, order-free), block mean vs the
    mean of block means decides each bit. All divisions happen once
    per block in float64, identically to the SQL oracle, so the hash
    is bit-for-bit reproducible. Payloads never cross a shuffle; the
    output is (media_id, 16-bit int)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("ahash", T.LongType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "ahash": []}
            import numpy as np

            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_ppm(bytes(payload))
                w, h = img.width, img.height
                gray = (
                    np.frombuffer(img.pixels, np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, 3)
                    .sum(axis=2)
                )
                bx = (np.arange(w) * grid) // w
                by = (np.arange(h) * grid) // h
                idx = (by[:, None] * grid + bx[None, :]).ravel()
                # integer block sums (exact, order-free); one float64
                # division per block, same op order as the SQL oracle
                sums = np.bincount(idx, weights=gray.ravel(), minlength=grid * grid)
                cnts = np.bincount(idx, minlength=grid * grid) * 3
                means = sums / cnts
                gm = float(np.sum(means)) / means.size
                bits = int(sum(1 << j for j, m in enumerate(means) if m > gm))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(bits)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(op, schema)


def video_motion(media: DataFrame) -> DataFrame:
    """Per-video motion profile: decode the RAWVID container, decode
    every PPM frame, and sum absolute pixel deltas between
    consecutive frames — the scene-cut / motion-sampling primitive
    (a training pipeline keyframes videos by exactly this signal,
    then samples frames near the peaks). Pure integer arithmetic
    (numpy int64), so the result is exact and oracle-checkable;
    payloads stay scan-local."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("total_motion", T.LongType()),
            T.StructField("max_motion", T.LongType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"media_id": [], "n_frames": [], "total_motion": [], "max_motion": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_rawvid(bytes(payload))
                pix = [
                    np.frombuffer(decode_ppm(fb).pixels, np.uint8).astype(np.int64)
                    for fb in frames
                ]
                deltas = [
                    int(np.abs(a - b).sum()) for a, b in zip(pix, pix[1:])
                ]
                out["media_id"].append(mid)
                out["n_frames"].append(len(frames))
                out["total_motion"].append(sum(deltas))
                out["max_motion"].append(max(deltas) if deltas else 0)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(op, schema)


def audio_loudness(media: DataFrame, quiet_thr: int = 1000) -> DataFrame:
    """Per-clip loudness profile over REAL decoded PCM16 samples:
    RMS level, quiet-sample count (|s| < thr), absolute peak — the
    silence-trim / loudness-normalization signals of an audio
    training pipeline. Integer sums of squares are exact (int64); the
    single RMS division+sqrt happens once per clip in float64 with
    the same op order as the SQL oracle."""
    import math

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("n_quiet", T.LongType()),
            T.StructField("peak", T.LongType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "rms": [], "n_quiet": [], "peak": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                wav = decode_wav(bytes(payload))
                x = np.asarray(wav.samples, dtype=np.int64)
                n = len(x)
                sumsq = int((x * x).sum())
                rms = math.floor(math.sqrt(sumsq / n) / 32768 * 10000 + 0.5) / 10000
                out["media_id"].append(mid)
                out["n_samples"].append(n)
                out["rms"].append(rms)
                out["n_quiet"].append(int((np.abs(x) < quiet_thr).sum()))
                out["peak"].append(int(np.abs(x).max()))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(op, schema)

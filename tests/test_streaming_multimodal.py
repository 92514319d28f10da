"""Streaming window operators + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_streaming_tumbling_matches_batch(spark):
    from nimble_spark.streaming.windows import read_events_stream, tumbling_counts, run_to_completion
    from nimble_spark.tables import load

    stream = read_events_stream(spark, f"{SF_SMALL}/events.parquet")
    out = run_to_completion(tumbling_counts(stream), "t_tumbling")
    batch = (
        load(spark, SF_SMALL, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    got = {(r["win_start"], r["event_type"]): r["n"] for r in out.collect()}
    want = {(r["win_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_streaming_session_window_runs(spark):
    from nimble_spark.streaming.windows import read_events_stream, session_aggregate, run_to_completion

    stream = read_events_stream(spark, f"{SF_SMALL}/events.parquet")
    out = run_to_completion(session_aggregate(stream), "t_session")
    assert out.count() > 0


def test_stateful_user_counts(spark):
    from nimble_spark.streaming.windows import read_events_stream, stateful_user_counts
    from nimble_spark.tables import load

    stream = read_events_stream(spark, f"{SF_SMALL}/events.parquet")
    q = (
        stateful_user_counts(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT user_id, max(n_events) AS n FROM t_stateful GROUP BY user_id")
    want = load(spark, SF_SMALL, "events").groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    g = {r["user_id"]: r["n"] for r in got.collect()}
    w = {r["user_id"]: r["n"] for r in want.collect()}
    assert g == w


# ---- multimodal ----


def test_stream_upsert_commit_shadowing(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1, mtime-ordered files):
    the later batch's rows must shadow the earlier batch's rows for
    overlapping keys, and read_upserted resolves exactly one row per
    key."""
    import os
    import time

    from nimble_spark.streaming.sink import read_upserted, stream_upsert_to_table

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 101, 10.0), (2, 201, 20.0), (3, 301, 30.0)],
        "user_id LONG, event_id LONG, value DOUBLE",
    ).coalesce(1).write.parquet(src + "/b0")
    time.sleep(1.1)  # distinct mtimes → deterministic batch order
    spark.createDataFrame(
        [(2, 202, 22.0), (3, 300, 33.0)],  # key 3: LOWER event_id, later commit
        "user_id LONG, event_id LONG, value DOUBLE",
    ).coalesce(1).write.parquet(src + "/b1")
    for d in ("b0", "b1"):
        for f in os.listdir(f"{src}/{d}"):
            if f.endswith(".parquet"):
                os.rename(f"{src}/{d}/{f}", f"{src}/{d}_{f}")

    schema = "user_id LONG, event_id LONG, value DOUBLE"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    table = str(tmp_path / "table")
    q = stream_upsert_to_table(
        stream, table, key="user_id", order_cols=["event_id"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in read_upserted(spark, table, key="user_id", order_cols=["event_id"]).collect()
    }
    # key 1: only batch 0. key 2: batch 1 wins. key 3: batch 1 wins
    # DESPITE the lower event_id — commit order shadows order_cols.
    assert got == {1: (101, 10.0), 2: (202, 22.0), 3: (300, 33.0)}

    # materializing compaction: shadowed rows physically drop, the
    # resolved view is unchanged, and later upserts still compose
    from nimble_spark.sources.table import read_manifest, read_table
    from nimble_spark.streaming.sink import compact_upserts

    rows_before = read_table(spark, table).count()
    compact_upserts(spark, table, key="user_id", order_cols=["event_id"])
    assert read_manifest(table)["rows"] == 3 < rows_before
    got2 = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in read_upserted(spark, table, key="user_id", order_cols=["event_id"]).collect()
    }
    assert got2 == got


def test_media_features_shape(spark):
    from nimble_spark.operators.multimodal import FEATURE_DIM, extract_features, synthesize_media

    media = synthesize_media(spark, n=30)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0 and len(r["content_digest"]) == 64
    # deterministic: same payload → same features
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert again == first


def test_media_real_decode_structure(spark):
    from nimble_spark.operators.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=9)
    rows = {r["media_id"]: r for r in extract_features(media, decode="real").collect()}
    assert rows[0]["kind"] == "image" and rows[0]["decoded_width"] == 64
    assert rows[1]["kind"] == "audio" and rows[1]["sample_rate"] == 16000
    assert rows[1]["n_samples"] == 1600 * 2
    assert rows[2]["kind"] == "video" and rows[2]["n_frames"] == 30 * 3
    # image features are a normalized histogram
    assert abs(sum(rows[0]["features"]) - 1.0) < 1e-5


def test_media_corrupt_payload_raises(spark):
    from nimble_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    bad = spark.createDataFrame(
        [(0, "image", b"NOT A PPM AT ALL", (None, None, None, None, "ppm"))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):  # ValueError surfaces as PythonException
        extract_features(bad, decode="real").collect()


def test_codec_roundtrips():
    from nimble_spark.functions.codecs import (
        decode_ppm, decode_rawvid, decode_wav,
        encode_ppm, encode_rawvid, encode_wav, resize_ppm_nearest,
    )

    px = bytes(range(256)) * 3  # 16x16 RGB
    img = decode_ppm(encode_ppm(16, 16, px))
    assert (img.width, img.height, img.pixels) == (16, 16, px)
    small = resize_ppm_nearest(img, 4, 4)
    assert (small.width, small.height, len(small.pixels)) == (4, 4, 48)
    # nearest-neighbor keeps exact source pixel values
    assert small.pixels[:3] == px[:3]

    samples = [0, 1000, -1000, 32767, -32768]
    wav = decode_wav(encode_wav(8000, samples))
    assert wav.sample_rate == 8000 and wav.samples == samples

    frames = [encode_ppm(2, 2, bytes(12)), encode_ppm(2, 2, bytes(range(12)))]
    assert decode_rawvid(encode_rawvid(frames)) == frames


def test_resize_and_frames(spark):
    from nimble_spark.operators.multimodal import resize_images, sample_frames, synthesize_media

    media = synthesize_media(spark, n=30)
    resized = resize_images(media, 32, 32)
    assert resized.count() == media.filter(F.col("kind") == "image").count()
    frames = sample_frames(media, every_n=10)
    # every video contributes ceil(n_frames/10) rows
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.count() >= n_videos
    assert frames.select("media_id").distinct().count() == n_videos

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


def test_media_real_decode_raises(spark):
    from nimble_spark.operators.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=3)
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        extract_features(media, decode="real").collect()


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

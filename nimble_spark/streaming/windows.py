"""Structured Streaming surface (SURVEY.md §2.6 streaming row).

The reference is a batch file format; its tables are nevertheless
valid streaming sources/sinks (file-based). This module provides the
streaming counterparts of the batch event-window operators in
operators/events_ts.py — tumbling/sliding/session windows with
watermarked late-data handling, plus a custom stateful operator
(running per-user counters) via applyInPandasWithState.

Scale notes: watermark + append mode bounds state; session windows
merge state per key; the stateful op keys by user_id so state shards
across executors. File source supports exactly-once with checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based streaming source over the events table. `path` may be
    a directory or a single parquet file (basePath must be a directory,
    so point it at the parent when given a file glob).

    The stream schema is probed from the files themselves (a batch
    footer read — metadata only, no data scan), so the same loader
    works whether the corpus generation stored ``ts`` as
    TIMESTAMP(NANOS)/int64 or timestamp[us]; the ts normalization is
    shared with the batch loader (tables.normalize_events_ts) so the
    two paths can never diverge again."""
    import os

    from nimble_spark.tables import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if not os.path.isdir(path):
        # FileStreamSource requires a directory source (it force-sets
        # basePath to the given path); select the file by glob instead.
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return normalize_events_ts(reader.parquet(path))


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts (append-able once the
    watermark passes the window end — late rows beyond 2h dropped)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_v")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming session windows (state merges as events arrive)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n", "sum_v")
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each `left_type`
    event with the same user's `right_type` events inside
    [left.ts, left.ts + within). The time-range predicate + both-side
    watermarks bound the join state — each side buffers only rows
    whose event time is within (watermark + within) of the stream
    head, so state is O(rate × window), not O(stream). The classic
    funnel/attribution shape (click → purchase within 30 min)."""
    a = (
        left.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("a_id"),
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", watermark)
    )
    b = (
        right.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("b_id"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", watermark)
    )
    cond = (
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") < F.col("a_ts") + F.expr(f"INTERVAL {within}"))
    )
    return a.join(b, cond).select(
        F.col("a_user").alias("user_id"), "a_id", "b_id"
    )


def run_to_completion(stream_df: DataFrame, name: str, mode: str | None = None) -> DataFrame:
    """Drive a file-backed stream to completion synchronously and
    return the materialized result (memory sink). Test/dev harness —
    production uses a real sink + trigger.

    ``mode`` overrides the plan-sniffed output mode — needed when a
    STATIC side of a stream-static join aggregates (the textual plan
    then contains Aggregate but the streaming side has none, and
    complete mode would be rejected)."""
    if mode is None:
        plan = stream_df._jdf.queryExecution().analyzed().toString()
        if "FlatMapGroupsInPandasWithState" in plan:
            mode = "update"  # required by applyInPandasWithState(update)
        elif "Aggregate" in plan:
            mode = "complete"
        else:
            mode = "append"
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


# ---------------------------------------------------------------------------
# Custom stateful operator: per-user running counters with timeout
# ---------------------------------------------------------------------------


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """applyInPandasWithState: per-user event counter + running value
    sum, emitting one row per user per micro-batch. The custom-
    stateful-operator surface (SURVEY §2.6) — state is a (count, sum)
    pair per key, sharded by user_id."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
    )

    def fn(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based streaming source over the documents table — the
    streaming-ingest entry of the LLM corpus pipeline (new crawl
    shards land as files; each becomes a micro-batch)."""
    import os

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if not os.path.isdir(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)

"""Time-series / event-window operators over the `events` table.

Batch analogues of the Structured Streaming windows (tumbling,
sliding, session) — the streaming versions live in
nimble_spark/streaming/; these batch forms are the oracle-checkable
surface. `events.ts` is nanosecond parquet; Spark reads it at
microsecond precision — all bucket edges here are ≥1 minute so the
truncation is semantics-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nimble_spark.functions.exact import davg, davg_sql, dsum, dsum_sql, rnd
from nimble_spark.registry import register
from nimble_spark.tables import load

R4 = 4


@register(
    "q_tumbling_window",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*)              AS n,
           {dsum_sql("value")}   AS sum_v,
           FLOOR((MAX(value)) * 10000 + 0.5) / 10000  AS max_v
    FROM events
    GROUP BY 1, 2
    """,
    category="time_window",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (F.window)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("sum_v"),
            rnd(F.max("value"), 4).alias("max_v"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_v",
            "max_v",
        )
    )


@register(
    "q_sliding_window",
    oracle=f"""
    WITH shifted AS (
      SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE)
               - INTERVAL 30 MINUTE AS w, value
      FROM events
    )
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS win_start,
           COUNT(*) AS n, {davg_sql("value")} AS avg_v
    FROM shifted
    GROUP BY w
    """,
    category="time_window",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour width, 30-minute slide — each event lands
    in 2 overlapping windows (Spark expands via the window generator)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), davg("value").alias("avg_v"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
            "avg_v",
        )
    )


@register(
    "q_session_window",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
             epoch_ns(ts) // 1000 AS tus
      FROM events
    ), flagged AS (
      SELECT user_id, ts, value, tus,
             CASE WHEN LAG(tus) OVER w IS NULL
                       OR tus - LAG(tus) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n, {dsum_sql("value")} AS sum_v
    FROM sessions
    GROUP BY user_id, sid
    """,
    category="time_window",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap) — Spark's SessionWindow merge,
    oracle reproduces it with gaps-and-islands SQL."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_v"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n",
            "sum_v",
        )
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    category="scalar_fn",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction (get_json_object)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
    )


@register(
    "q_time_bucket_gap_fill",
    oracle="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)) AS d,
             COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM buckets),
    cal AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds
    )
    SELECT strftime(cal.d, '%Y-%m-%d') AS day, COALESCE(buckets.n, 0) AS n
    FROM cal LEFT JOIN buckets ON cal.d = buckets.d
    """,
    category="time_window",
)
def q_time_bucket_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (gap-fill): generate the full day range
    via sequence() and left-join observed daily counts."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    return (
        cal.join(daily, "d", "left")
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), F.coalesce("n", F.lit(0)).alias("n"))
    )

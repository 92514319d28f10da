"""Window-function operator surface — SURVEY.md §2.6 row 3.

Ranking, offset (lag/lead), running/moving frames, value frames
(RANGE), distribution functions — all via ``pyspark.sql.Window``.

Scale notes: each window spec is one shuffle on its partition keys;
specs sharing (partitionBy, orderBy) reuse the same sort. Partition
keys here (suppkey, custkey, user) are high-cardinality → no single
reducer hot-spots. A window WITHOUT partitionBy would serialize the
whole dataset through one task at 100 TB — every spec here partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nimble_spark.functions.exact import rnd
from nimble_spark.registry import register
from nimble_spark.tables import load

R4 = 4


@register(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             FLOOR((l_extendedprice) * 10000 + 0.5) / 10000 AS price,
             ROW_NUMBER()  OVER w AS rn,
             RANK()        OVER w AS rnk,
             DENSE_RANK()  OVER w AS drnk
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
    ) t WHERE rn <= 3
    """,
    category="window",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3-per-group via ranking window functions."""
    l = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
    return (
        l.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            rnd("l_extendedprice", 4).alias("price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * 10000 + 0.5) / 10000 AS running_total,
           FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                 OVER w3 AS DOUBLE) / COUNT(*) OVER w3) * 10000 + 0.5) / 10000                              AS moving_avg3,
           COUNT(*) OVER (PARTITION BY o_custkey)                                       AS n_orders
    FROM orders
    WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    category="window",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average + partition count (sums go
    through DECIMAL so frame-evaluation order can't move the result)."""
    o = load(spark, sf_dir, "orders")
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec_price = F.col("o_totalprice").cast("decimal(27,6)")
    w_run = wo.rowsBetween(W.unboundedPreceding, 0)
    w3 = wo.rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        rnd(F.sum(dec_price).over(w_run).cast("double"), 4).alias("running_total"),
        rnd(
            F.sum(dec_price).over(w3).cast("double") / F.count(F.lit(1)).over(w3), 4).alias("moving_avg3"),
        F.count(F.lit(1)).over(W.partitionBy("o_custkey")).alias("n_orders"),
    )


@register(
    "q_window_offset",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT user_id, event_id,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           FLOOR((value - COALESCE(LAG(value) OVER w, 0)) * 10000 + 0.5) / 10000 AS delta_v,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="window",
)
def q_window_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/last_value offset window functions."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        rnd(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 4).alias("delta_v"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"),
    )


@register(
    "q_window_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4)       OVER w                     AS quartile,
           FLOOR((PERCENT_RANK() OVER w) * 10000 + 0.5) / 10000           AS pr,
           FLOOR((CUME_DIST()    OVER w) * 10000 + 0.5) / 10000           AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    category="window",
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile, percent_rank, cume_dist."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 4).alias("pr"),
        rnd(F.cume_dist().over(w), 4).alias("cd"),
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           FLOOR((SUM(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                                       RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS qty_range_sum
    FROM lineitem
    WHERE l_suppkey <= 10
    """,
    category="window",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) window frame, vs the ROWS frames above."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = W.partitionBy("l_suppkey").orderBy("l_quantity").rangeBetween(-5, 0)
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        rnd(F.sum("l_quantity").over(w), 4).alias("qty_range_sum"),
    )


@register(
    "q_sessionize",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             epoch_ns(ts) // 1000 AS tus
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id, tus,
             CASE WHEN LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
                       OR tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
                          > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
    ), sessions AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions
    GROUP BY user_id, session_id
    """,
    category="window",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands): 30-minute inactivity gap.

    Classic lag + cumulative-sum pattern — one shuffle on user_id,
    both window specs share the same sort. This is the batch analogue
    of the streaming session_window operator in streaming/.
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = e.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )

"""Event-stream (batch view) operators over the events table.

Time handling: all outputs render timestamps as UTC ISO strings so the
value-hash is representation-independent across engines (the session
timezone is pinned to UTC in session.py; the correctness driver's session
may differ, so we format *from epoch seconds*, which is absolute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.operators.common import T

D204 = "decimal(20,4)"


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup per event type: counts + decimal-exact value sums.

    The batch twin of a streaming windowed aggregation (SURVEY.md §2.8:
    the reference is batch-only; the engine's streaming module mirrors this
    exact shape with a watermark)."""
    ev = T(spark, sf_dir, "events")
    hour_epoch = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    return (
        ev.groupBy(hour_epoch.alias("hour_epoch"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D204)).alias("sum_value_d"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            "hour_epoch",
            "event_type",
            "n_events",
            F.col("sum_value_d").cast("double").alias("sum_value"),
            "n_users",
        )
        .orderBy("hour_epoch", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS hour_epoch,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag window → session
    boundary flags → running-sum session ids → per-user session stats.

    The classic two-window sessionizer; in streaming this is
    ``session_window(ts, '30 minutes')`` — the batch plan shuffles once on
    user_id and both windows share that partitioning (no extra exchange)."""
    ev = T(spark, sf_dir, "events").select("user_id", F.unix_timestamp("ts").alias("t"))
    w = Window.partitionBy("user_id").orderBy("t")
    new_sess = (
        F.when(F.col("t") - F.lag("t").over(w) > 1800, 1).otherwise(0)
    )
    sess = ev.withColumn("is_new", new_sess).withColumn(
        "session_idx", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("t") - F.min("t")).alias("duration_s"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("duration_s").alias("max_session_s"),
        )
        .orderBy("user_id")
    )


EVENTS_SESSIONIZE_SQL = """
WITH t AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
), flagged AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM t
), sess AS (
  SELECT user_id, t,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
), per_session AS (
  SELECT user_id, session_idx, COUNT(*) AS n_events,
         MAX(t) - MIN(t) AS duration_s
  FROM sess GROUP BY user_id, session_idx
)
-- CAST: avoid HUGEINT in an output column (r1 driver hash FAIL cause)
SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
       MAX(duration_s) AS max_session_s
FROM per_session GROUP BY user_id ORDER BY user_id
"""


QUERIES: dict[str, tuple] = {
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "events_sessionize": (events_sessionize, EVENTS_SESSIONIZE_SQL),
}

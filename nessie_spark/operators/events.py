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


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted per
    day-offset they return — the canonical product-analytics triangle.

    Two aggregations sharing the user_id shuffle: first-day per user
    (min), then distinct (cohort, offset, user) → counts. Day arithmetic
    on epoch days (integer, timezone-proof in both engines)."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


EVENTS_RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day
  FROM events
), first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
)
SELECT cohort_day, day_offset, COUNT(*) AS n_users
FROM (
  SELECT DISTINCT ev.user_id, cohort_day, ev.day - cohort_day AS day_offset
  FROM ev JOIN first USING (user_id)
)
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase per user: a step counts only
    when it happens AT OR AFTER the previous step's first occurrence
    (min-timestamp cascade — the standard funnel semantics, expressed as
    conditional aggregation instead of a self-join per step)."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("t"))).alias("t_view"),
    )
    steps = (
        ev.join(per_user, "user_id")
        .groupBy("user_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("t") >= F.col("t_view")),
                    F.col("t"),
                )
            ).alias("t_click"),
        )
    )
    final = (
        ev.join(steps, "user_id")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("t") >= F.col("t_click")),
                    F.col("t"),
                )
            ).alias("t_purchase"),
        )
    )
    return final.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("viewed"),
        F.sum(F.when(F.col("t_click").isNotNull(), 1).otherwise(0)).alias("clicked_after_view"),
        F.sum(F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)).alias("purchased_after_click"),
    )


EVENTS_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
), v AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN t END) AS t_view
  FROM ev GROUP BY user_id
), c AS (
  SELECT ev.user_id, t_view,
         MIN(CASE WHEN event_type = 'click' AND t >= t_view THEN t END) AS t_click
  FROM ev JOIN v USING (user_id)
  GROUP BY ev.user_id, t_view
), p AS (
  SELECT ev.user_id, t_view, t_click,
         MIN(CASE WHEN event_type = 'purchase' AND t >= t_click THEN t END) AS t_purchase
  FROM ev JOIN c USING (user_id)
  GROUP BY ev.user_id, t_view, t_click
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
       CAST(SUM(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
       CAST(SUM(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click
FROM p
"""


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 behavioral paths: the most frequent CONSECUTIVE 3-step
    event_type sequences inside a session (30-min gap rule, same as
    ``events_sessionize``). Event order within a user is made total by
    (t, event_id) — timestamp ties would otherwise make the paths (and
    the gate) nondeterministic. Tie-break on the path string keeps the
    rank-10 cut deterministic too.

    Scale shape: one shuffle on user_id that BOTH window passes (session
    ids, then lead-2 paths) share; the path count partially aggregates
    map-side, and only the tiny (n_distinct_paths ≤ |types|³) aggregate
    reaches the final top-k sort."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("t"), "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    sess = ev.withColumn(
        "is_new", F.when(F.col("t") - F.lag("t").over(w) > 1800, 1).otherwise(0)
    ).withColumn(
        "session_idx",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = Window.partitionBy("user_id", "session_idx").orderBy("t", "event_id")
    paths = sess.select(
        F.concat_ws(
            " > ",
            "event_type",
            F.lead("event_type", 1).over(w2),
            F.lead("event_type", 2).over(w2),
        ).alias("path"),
        F.lead("event_type", 2).over(w2).alias("_ok"),
    ).where(F.col("_ok").isNotNull())
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(10)
    )


EVENTS_TOP_PATHS_SQL = """
WITH t AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id, event_type
  FROM events
), flagged AS (
  SELECT *, CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 1800
                 THEN 1 ELSE 0 END AS is_new
  FROM t
), sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
), paths AS (
  SELECT event_type || ' > '
         || LEAD(event_type, 1) OVER w || ' > '
         || LEAD(event_type, 2) OVER w AS path,
         LEAD(event_type, 2) OVER w AS _ok
  FROM sess
  WINDOW w AS (PARTITION BY user_id, session_idx ORDER BY t, event_id)
)
SELECT path, COUNT(*) AS n_paths
FROM paths WHERE _ok IS NOT NULL
GROUP BY path ORDER BY n_paths DESC, path LIMIT 10
"""


QUERIES: dict[str, tuple] = {
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "events_sessionize": (events_sessionize, EVENTS_SESSIONIZE_SQL),
    "events_retention_cohorts": (events_retention_cohorts, EVENTS_RETENTION_SQL),
    "events_funnel": (events_funnel, EVENTS_FUNNEL_SQL),
    "events_top_paths": (events_top_paths, EVENTS_TOP_PATHS_SQL),
}

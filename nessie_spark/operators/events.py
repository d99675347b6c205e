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


def events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: attach to every event the latest order placed by the
    same customer at-or-before the event time (``o_custkey = user_id``,
    ``o_orderdate <= ts``; ties broken toward the larger o_orderkey).
    Events whose user has no prior order keep NULL order columns. The
    as-of join is the canonical time-series operator Spark's DataFrame
    API lacks natively (SURVEY.md custom-operator clause).

    Scale shape: NOT the naive range join (events ⨝ orders on key +
    inequality explodes to |events|·|orders-per-key| intermediate rows
    and falls off Catalyst's equi-join fast path). Instead both sides are
    tagged and unioned, then ONE window over (user, time) carries the
    most recent order forward via last(..., ignorenulls) — a single
    shuffle on the user key, linear in |events| + |orders|, and skew maps
    to per-user row counts only. Time is compared at whole-second epoch
    (orders are midnight-stamped, so flooring event timestamps loses
    nothing), keeping the arithmetic integer-exact across engines."""
    ev = T(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
        F.lit(1).alias("side"),
        "event_id",
        "event_type",
    )
    od = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.unix_timestamp("o_orderdate").cast("long").alias("t"),
        F.lit(0).alias("side"),
        "o_orderkey",
        "o_totalprice",
    )
    u = ev.unionByName(od, allowMissingColumns=True)
    # orders sort before events at equal t (side 0 < 1) so same-instant
    # orders count as "at-or-before"; o_orderkey last in the ordering
    # makes the running last() pick the max-orderkey order on date ties.
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side", F.col("o_orderkey").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.select(
            "*",
            F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
            F.last("o_totalprice", ignorenulls=True).over(w).alias("asof_totalprice"),
            F.last(F.when(F.col("side") == 0, F.col("t")), ignorenulls=True)
            .over(w)
            .alias("_ot"),
        )
        .where(F.col("side") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            "event_type",
            "asof_orderkey",
            "asof_totalprice",
            (F.col("t") - F.col("_ot")).cast("long").alias("asof_age_sec"),
        )
        .orderBy("event_id")
    )


ANOM_WINDOW = 24  # trailing observed hours in the baseline
_Z_SCALE = 1_000_000


def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-count anomaly detection per event type: z-score of each
    hour's event count against the trailing ``ANOM_WINDOW`` *observed*
    hours (ROWS, not RANGE — zero-event hours emit no row, so the
    baseline is the last 24 data points; at pipeline scale a dense hour
    spine would make them equivalent). Rows without a full baseline are
    withheld — a 5-hour-old type has no meaningful z.

    Cross-engine float discipline: mean/variance are derived from the
    integer window sums (Σc, Σc²) with the two-pass-free formula
    var = (Σc² − (Σc)²/n)/n, so both engines evaluate the identical
    double expression from identical integers (no Welford-vs-naive
    stddev divergence); z is rounded once to fixed-point and the
    anomaly flag compares integers (|z_fp| ≥ 2e6 ⇔ |z| ≥ 2σ).

    Scale shape: one groupBy (hour, type) then one window partitioned by
    event_type — both shuffles are on the tiny hourly aggregate, never
    the raw events; skew maps to hours-per-type, which is bounded by the
    calendar."""
    ev = T(spark, sf_dir, "events")
    hour_epoch = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    hourly = ev.groupBy(
        hour_epoch.alias("hour_epoch"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(-ANOM_WINDOW, -1)
    )
    stats = hourly.select(
        "event_type",
        "hour_epoch",
        "n_events",
        F.count(F.lit(1)).over(w).alias("n_base"),
        F.sum("n_events").over(w).alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("s2"),
    ).where(F.col("n_base") == ANOM_WINDOW)
    n = float(ANOM_WINDOW)
    mean = F.col("s1").cast("double") / n
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n) / n
    z_fp = F.when(
        var > 0.0,
        F.round((F.col("n_events") - mean) / F.sqrt(var) * _Z_SCALE).cast("long"),
    ).otherwise(F.lit(None).cast("long"))
    return (
        stats.select(
            "event_type",
            "hour_epoch",
            "n_events",
            z_fp.alias("z_fp"),
            F.coalesce(F.abs(z_fp) >= 2 * _Z_SCALE, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour_epoch")
    )


EVENTS_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_epoch,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, hour_epoch, n_events,
         COUNT(*) OVER w AS n_base,
         CAST(SUM(n_events) OVER w AS BIGINT) AS s1,
         CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch
               ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT event_type, hour_epoch, n_events,
         CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / {ANOM_WINDOW}.0)
                   / {ANOM_WINDOW}.0 > 0.0
              THEN CAST(ROUND(
                     (n_events - CAST(s1 AS DOUBLE) / {ANOM_WINDOW}.0)
                     / sqrt((CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * s1 / {ANOM_WINDOW}.0)
                            / {ANOM_WINDOW}.0)
                     * {_Z_SCALE}) AS BIGINT)
              ELSE NULL END AS z_fp
  FROM stats WHERE n_base = {ANOM_WINDOW}
)
SELECT event_type, hour_epoch, n_events, z_fp,
       COALESCE(abs(z_fp) >= {2 * _Z_SCALE}, FALSE) AS is_anomaly
FROM z ORDER BY event_type, hour_epoch
"""


EVENTS_ASOF_SQL = """
WITH ranked AS (
  SELECT e.event_id, e.user_id, e.event_type,
         o.o_orderkey AS asof_orderkey,
         o.o_totalprice AS asof_totalprice,
         CAST(floor(epoch(e.ts)) AS BIGINT)
           - CAST(epoch(o.o_orderdate) AS BIGINT) AS asof_age_sec,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
  FROM events e
  LEFT JOIN orders o
    ON o.o_custkey = e.user_id
   AND CAST(epoch(o.o_orderdate) AS BIGINT) <= CAST(floor(epoch(e.ts)) AS BIGINT)
)
SELECT event_id, user_id, event_type, asof_orderkey, asof_totalprice,
       asof_age_sec
FROM ranked WHERE rk = 1
ORDER BY event_id
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types within
    sessions (30-min gap rule, (t, event_id)-total order — same machinery
    as ``events_top_paths``): for every observed (current → next) pair,
    the transition count and conditional probability P(next | current).
    The behavioral-model summary that funnels and path mining both
    approximate.

    Scale shape: one user_id shuffle shared by both window passes, then a
    (cur, next) count with full map-side combine — at most |types|² rows
    ever reach the final stage, so the per-current normalization join is a
    broadcast regardless of corpus size."""
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
    pairs = sess.select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type", 1).over(w2).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    cells = pairs.groupBy("cur_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    totals = cells.groupBy("cur_type").agg(F.sum("n").alias("n_from"))
    return (
        cells.join(F.broadcast(totals), "cur_type")
        .select(
            "cur_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_from"), 6).alias("p"),
        )
        .orderBy("cur_type", "next_type")
    )


EVENTS_MARKOV_SQL = """
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
), pairs AS (
  SELECT event_type AS cur_type,
         LEAD(event_type, 1) OVER (PARTITION BY user_id, session_idx
                                   ORDER BY t, event_id) AS next_type
  FROM sess
), cells AS (
  SELECT cur_type, next_type, COUNT(*) AS n
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY cur_type, next_type
), totals AS (
  SELECT cur_type, CAST(SUM(n) AS BIGINT) AS n_from FROM cells GROUP BY cur_type
)
SELECT c.cur_type, c.next_type, c.n,
       ROUND(CAST(c.n AS DOUBLE) / t.n_from, 6) AS p
FROM cells c JOIN totals t USING (cur_type)
ORDER BY c.cur_type, c.next_type
"""


def events_rolling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windows per user stream (SURVEY §2.5 notes
    ``rowsBetween`` frames are absent in the reference — this evidences
    them): running event index, inter-event gap, a 4-row rolling value
    sum, and the running cumulative value, all over one ordered pass.

    Determinism: (user_id, ts) is unique in the fixture, and the order key
    is (t_us, event_id) anyway, so every window is total-ordered.
    Cross-engine exactness: timestamps as integer epoch MICROseconds
    (subsecond fixture precision), value fixed-pointed once per item to
    micro-units so every frame sum is an integer reduction.

    Scale: one shuffle on user_id; all four windows share the same sort
    order so Spark computes them in a single Window operator chain — no
    extra exchange per column, and per-user state is O(frame) not
    O(stream)."""
    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.round(F.col("value") * 1e6, 0).cast("long").alias("v_micro"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.row_number().over(w).alias("rn"),
            # -1 sentinel for the stream head: a nullable integer column
            # canonicalizes as float on one engine and int on the other
            F.coalesce(
                F.col("t_us") - F.lag("t_us", 1).over(w), F.lit(-1).cast("long")
            ).alias("gap_us"),
            F.sum("v_micro").over(w.rowsBetween(-3, 0)).alias("roll4_value_micro"),
            F.sum("v_micro")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum_value_micro"),
        )
        .orderBy("user_id", "rn")
    )


EVENTS_ROLLING_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         CAST(ROUND(value * 1e6) AS BIGINT) AS v_micro
  FROM events
)
SELECT user_id, event_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS INT) AS rn,
       COALESCE(t_us - LAG(t_us, 1) OVER (PARTITION BY user_id ORDER BY t_us, event_id),
                CAST(-1 AS BIGINT)) AS gap_us,
       CAST(SUM(v_micro) OVER (PARTITION BY user_id ORDER BY t_us, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll4_value_micro,
       CAST(SUM(v_micro) OVER (PARTITION BY user_id ORDER BY t_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_value_micro
FROM ev
ORDER BY user_id, rn
"""


def events_user_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user spend deciles: ntile(10) + percent-rank + cumulative
    distribution over total event value — the ranked-cohort view (SURVEY
    §2.5's W1/W6 family; adds the ntile/percent_rank window functions no
    other registry query exercises).

    Cross-engine exactness: percent_rank and cume_dist are emitted as
    integer parts-per-million computed with integer division over
    (row_number, count) — never a rounded double ratio, so the hash can't
    drift on rounding-mode ties. The order key (total_value_micro,
    user_id) is unique, making every rank total-ordered.

    Scale: the events→users groupBy is map-side combined, so the global
    window's input is the *user dimension*, orders of magnitude smaller
    than the fact table. At 10^9 users the unpartitioned window becomes the
    bottleneck (one task); `events_user_deciles_distributed` is the
    implemented swap-in (plans/rank.global_row_number — range-partitioned
    sort with folded per-partition offsets, no single-task stage), proven
    byte-identical against this query's own oracle."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 1e6, 0).cast("long").alias("v_micro")
    )
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v_micro").alias("total_value_micro"),
    )
    w = Window.orderBy("total_value_micro", "user_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = per_user.select(
        "user_id",
        "n_events",
        "total_value_micro",
        F.ntile(10).over(w).alias("decile"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    return ranked.select(
        "user_id",
        "n_events",
        "total_value_micro",
        "decile",
        F.when(F.col("n") == 1, F.lit(0).cast("long"))
        .otherwise(F.expr("((rn - 1) * 1000000) div (n - 1)"))
        .alias("pct_rank_ppm"),
        F.expr("(rn * 1000000) div n").alias("cume_ppm"),
    ).orderBy("user_id")


EVENTS_USER_DECILES_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS total_value_micro
  FROM events GROUP BY user_id
), ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (ORDER BY total_value_micro, user_id) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(NTILE(10) OVER (ORDER BY total_value_micro, user_id) AS INT) AS decile
  FROM per_user
)
SELECT user_id, n_events, total_value_micro, decile,
       CASE WHEN n = 1 THEN CAST(0 AS BIGINT)
            ELSE ((rn - 1) * 1000000) // (n - 1) END AS pct_rank_ppm,
       (rn * 1000000) // n AS cume_ppm
FROM ranked
ORDER BY user_id
"""


def events_time_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user trailing ONE-HOUR event count and value
    sum at every event — the time-based sibling of
    `events_rolling_windows`' ROWS frames (completing SURVEY §2.5's window
    coverage: rows frames, rank family, and now value-range frames).

    Cross-engine exactness: the order key is integer epoch MICROseconds
    and the frame bound is the integer 3_600_000_000, so the frame
    membership test is pure integer arithmetic; values are fixed-pointed
    to micro-units before the in-frame sum. RANGE frames include ALL
    peers of the current order value on both engines, so ties need no
    tie-break — the frame is a pure function of t_us.

    Scale: one shuffle on user_id; the running frame is O(window span)
    state per stream, evaluated in a single Window node."""
    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.round(F.col("value") * 1e6, 0).cast("long").alias("v_micro"),
    )
    HOUR_US = 3_600_000_000
    w = Window.partitionBy("user_id").orderBy("t_us").rangeBetween(-HOUR_US, 0)
    return (
        ev.select(
            "user_id",
            "event_id",
            "t_us",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.sum("v_micro").over(w).alias("sum_1h_micro"),
        )
        .orderBy("user_id", "t_us", "event_id")
    )


EVENTS_TIME_ROLLING_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         CAST(ROUND(value * 1e6) AS BIGINT) AS v_micro
  FROM events
)
SELECT user_id, event_id, t_us,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY t_us
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h,
       CAST(SUM(v_micro) OVER (PARTITION BY user_id ORDER BY t_us
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_1h_micro
FROM ev
ORDER BY user_id, t_us, event_id
"""


def events_user_deciles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events_user_deciles` on the 10^9-user plan: the single-task global
    window is replaced by plans/rank.global_row_number (range-partitioned
    sort + per-partition offset folding — the ranking stage runs at full
    cluster width; the only unpartitioned window left is over ONE row per
    partition). ntile/percent-rank/cume-dist are then pure integer
    expressions of (rank, n): ntile's exact SQL semantics — the first
    n mod k tiles get the extra row — are reproduced with div/mod
    arithmetic, so this query shares `events_user_deciles`' DuckDB oracle
    verbatim and the gate proves the two plans byte-identical."""
    from nessie_spark.plans.rank import global_row_number

    ev = T(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 1e6, 0).cast("long").alias("v_micro")
    )
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v_micro").alias("total_value_micro"),
    )
    ranked = global_row_number(per_user, ["total_value_micro", "user_id"], col="rn")
    nrow = per_user.agg(F.count(F.lit(1)).alias("n"))
    df = ranked.crossJoin(F.broadcast(nrow))
    # exact NTILE(10): big tiles of size n div 10 + 1 for the first
    # n mod 10 tiles, small tiles of n div 10 after; degenerate n <= 10
    # collapses to tile = rank (one row per tile, matching SQL NTILE)
    tile = (
        F.when(F.col("n") <= 10, F.col("rn"))
        .when(
            F.expr("rn <= (n % 10) * (n div 10 + 1)"),
            F.expr("(rn - 1) div (n div 10 + 1) + 1"),
        )
        .otherwise(
            F.expr("n % 10 + (rn - 1 - (n % 10) * (n div 10 + 1)) div (n div 10) + 1")
        )
    )
    return df.select(
        "user_id",
        "n_events",
        "total_value_micro",
        tile.cast("int").alias("decile"),
        F.when(F.col("n") == 1, F.lit(0).cast("long"))
        .otherwise(F.expr("((rn - 1) * 1000000) div (n - 1)"))
        .alias("pct_rank_ppm"),
        F.expr("(rn * 1000000) div n").alias("cume_ppm"),
    ).orderBy("user_id")



def events_bucketed_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (plans/bucket.py): views and purchases are
    each written hash-bucketed by ``user_id`` (the one shuffle, paid at
    write time), then the per-user attribution join AND the follow-up
    aggregation both run with ZERO Exchange — plan-asserted in
    tests/test_bucketed_join.py. The recurring-pipeline shape: at 100 TB,
    re-used bucketed layouts turn every daily join on the same key into a
    shuffle-free map-side merge.

    Output: one row per user with at least one view and one purchase —
    n_views, n_buys, and n_pairs (the join cardinality |views|x|buys|),
    which the DuckDB oracle reproduces with a plain join."""
    import os as _os
    import tempfile as _tempfile

    from nessie_spark.plans.bucket import bucketed_join, write_bucketed

    ev = T(spark, sf_dir, "events")
    # FIXED table names + path, overwritten in place: the result is lazy
    # (the caller collects after we return), so a try/finally cleanup here
    # would delete the data before it is read — instead each invocation
    # replaces the previous one's files/catalog entries, keeping repeated
    # gate/bench runs bounded at one copy instead of leaking per call
    base = _os.path.join(_tempfile.gettempdir(), "nessie-bucketed-reg")
    vt = write_bucketed(
        ev.where("event_type = 'view'").select("user_id", "event_id"),
        "nessie_reg_views_b", "user_id", 8,
        path=_os.path.join(base, "views_b"),
    )
    bt = write_bucketed(
        ev.where("event_type = 'purchase'").select(
            "user_id", F.col("event_id").alias("buy_id")
        ),
        "nessie_reg_buys_b", "user_id", 8,
        path=_os.path.join(base, "buys_b"),
    )
    return (
        bucketed_join(spark, vt, bt, "user_id")
        .groupBy("user_id")
        .agg(
            F.countDistinct("event_id").alias("n_views"),
            F.countDistinct("buy_id").alias("n_buys"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .orderBy("user_id")
    )


EVENTS_BUCKETED_JOIN_SQL = """
WITH v AS (SELECT user_id, event_id FROM events WHERE event_type = 'view'),
     b AS (SELECT user_id, event_id AS buy_id FROM events WHERE event_type = 'purchase')
SELECT v.user_id,
       COUNT(DISTINCT v.event_id) AS n_views,
       COUNT(DISTINCT b.buy_id) AS n_buys,
       COUNT(*) AS n_pairs
FROM v JOIN b ON v.user_id = b.user_id
GROUP BY v.user_id
ORDER BY v.user_id
"""


QUERIES: dict[str, tuple] = {
    "events_rolling_windows": (events_rolling_windows, EVENTS_ROLLING_SQL),
    "events_user_deciles": (events_user_deciles, EVENTS_USER_DECILES_SQL),
    "events_time_rolling": (events_time_rolling, EVENTS_TIME_ROLLING_SQL),
    "events_user_deciles_distributed": (
        events_user_deciles_distributed,
        EVENTS_USER_DECILES_SQL,
    ),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "events_sessionize": (events_sessionize, EVENTS_SESSIONIZE_SQL),
    "events_retention_cohorts": (events_retention_cohorts, EVENTS_RETENTION_SQL),
    "events_funnel": (events_funnel, EVENTS_FUNNEL_SQL),
    "events_top_paths": (events_top_paths, EVENTS_TOP_PATHS_SQL),
    "events_asof_order": (events_asof_order, EVENTS_ASOF_SQL),
    "events_hourly_anomalies": (events_hourly_anomalies, EVENTS_ANOMALY_SQL),
    "events_markov_transitions": (events_markov_transitions, EVENTS_MARKOV_SQL),
    "events_bucketed_user_join": (events_bucketed_user_join, EVENTS_BUCKETED_JOIN_SQL),
}

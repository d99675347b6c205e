"""Structured-streaming ops: availableNow file-stream run must reproduce the
batch results (the streaming/batch parity contract of streaming/ops.py)."""

import pyspark.sql.functions as F

from nessie_spark.streaming import dedup_stream, hourly_rollup_stream

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _stream_src(spark, tmp_path):
    src = str(tmp_path / "src")
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(2000)
    )
    batch.write.mode("overwrite").parquet(src)
    return batch, spark.readStream.schema(EVENTS_DDL).parquet(src)


def test_hourly_rollup_stream_matches_batch(spark, tmp_path):
    batch, stream = _stream_src(spark, tmp_path)
    out = hourly_rollup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.hour_epoch, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("select * from rollup_test").collect()
    }
    expect = {
        (r.hour_epoch, r.event_type): (r.n_events, r.sum_value)
        for r in (
            batch.groupBy(
                (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("hour_epoch"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
            )
            .collect()
        )
    }
    assert got == expect


def test_dedup_stream_drops_duplicates(spark, tmp_path):
    src = str(tmp_path / "dsrc")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    dup = batch.unionByName(batch)  # every event twice
    dup.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    out = dedup_stream(stream, ["event_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("select count(distinct event_id) c, count(*) n from dedup_test").collect()[0]
    assert n.c == n.n == 500


def test_sessionize_stateful_matches_batch_across_microbatches(spark, tmp_path):
    """applyInPandasWithState sessionizer == batch events_sessionize, with
    the input split time-wise into 2 files processed as separate
    micro-batches (maxFilesPerTrigger=1) so state must carry across."""
    from nessie_spark.streaming import sessionize_stateful

    src = str(tmp_path / "ssrc")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(2000)
        .select("user_id", F.unix_timestamp("ts").alias("t"))
    )
    ev.cache()
    cut = ev.agg(F.percentile_approx("t", 0.5).alias("m")).collect()[0].m
    ev.where(F.col("t") <= cut).coalesce(1).write.parquet(f"{src}/b=0")
    ev.where(F.col("t") > cut).coalesce(1).write.parquet(f"{src}/b=1")

    stream = (
        spark.readStream.schema("user_id long, t long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b=*")
    )
    q = (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName("sess_state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode emits once per user per batch — the final emission is the
    # one with the largest n_events (monotone across batches; sink row order
    # is not contractual)
    got = {}
    for r in spark.sql("select * from sess_state_test").collect():
        cur = got.get(r.user_id)
        if cur is None or r.n_events > cur[1]:
            got[r.user_id] = (r.n_sessions, r.n_events, r.max_session_s)

    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    win = w.partitionBy("user_id").orderBy("t")
    sess = ev.withColumn(
        "is_new",
        F.when(F.col("t") - F.lag("t").over(win) > 1800, 1).otherwise(0),
    ).withColumn(
        "sid", F.sum("is_new").over(win.rowsBetween(w.unboundedPreceding, 0))
    )
    expect = {
        r.user_id: (r.n_sessions, r.n_events, r.max_session_s)
        for r in (
            sess.groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n"), (F.max("t") - F.min("t")).alias("d"))
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.sum("n").alias("n_events"),
                F.max("d").alias("max_session_s"),
            )
            .collect()
        )
    }
    ev.unpersist()
    assert got == expect


def test_hourly_rollup_drops_late_rows(spark, tmp_path):
    """Watermark contract: in append mode, a row arriving after the
    watermark has passed its window is dropped (bounded state — the 100 TB
    streaming failure mode the ops module documents)."""
    from pyspark.sql import Row

    from nessie_spark.streaming import hourly_rollup_stream

    src = str(tmp_path / "late")
    h0 = 1_700_000_000 - (1_700_000_000 % 3600)

    def ev(eid, ts_s, val):
        return Row(event_id=eid, ts=ts_s, user_id=1, event_type="x",
                   value=float(val), props="")

    b0 = spark.createDataFrame(
        [ev(1, h0 + 10, 1.0), ev(2, h0 + 20, 1.0),
         ev(3, h0 + 36000, 1.0)]  # clock-advancer: +10 h
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1 = spark.createDataFrame(
        [ev(4, h0 + 30, 100.0),   # LATE: watermark is h0+8h by now
         ev(5, h0 + 36010, 1.0)]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # Feed the two micro-batches EXPLICITLY: write b0, drain, then write b1
    # and drain again. (The previous maxFilesPerTrigger=1 form raced on
    # file-stream modtime ordering — both files written in the same second
    # could land in one batch / reversed order, so the watermark never
    # advanced before the late row arrived.)
    b0.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(src)
    q = (
        hourly_rollup_stream(stream)
        .writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()  # batch 1: watermark advances to h0+10h-2h
    b1.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()  # batch 2: late row < watermark -> dropped
    q.stop()
    got = {
        r.hour_epoch: (r.n_events, r.sum_value)
        for r in spark.sql("select * from late_test").collect()
    }
    # h0's window finalized with only the two on-time rows; the late
    # value=100 row must not appear anywhere
    assert got.get(h0) == (2, 2.0)
    assert all(abs(v[1]) < 50 for v in got.values())


def test_join_streams_attributed_matches_batch(spark, tmp_path):
    """Stream-stream interval join parity: draining two file streams must
    reproduce the batch inner join with the same interval predicate."""
    from nessie_spark.streaming import join_streams_attributed

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    views_b = ev.where("event_type = 'view'")
    buys_b = ev.where("event_type = 'purchase'")
    vsrc, bsrc = str(tmp_path / "views"), str(tmp_path / "buys")
    views_b.write.mode("overwrite").parquet(vsrc)
    buys_b.write.mode("overwrite").parquet(bsrc)
    views_s = spark.readStream.schema(EVENTS_DDL).parquet(vsrc)
    buys_s = spark.readStream.schema(EVENTS_DDL).parquet(bsrc)

    q = (
        join_streams_attributed(views_s, buys_s)
        .writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.l_event_id, r.r_event_id, r.delay_s)
        for r in spark.sql("select * from attr_test").collect()
    }
    expect = {
        (r.user_id, r.l_event_id, r.r_event_id, r.delay_s)
        for r in join_streams_attributed(views_b, buys_b).collect()
    }
    assert got == expect
    assert expect  # non-vacuous: sf0.001 must contain attributable pairs
    assert all(0 <= d <= 1800 for (_, _, _, d) in expect)


def test_join_streams_attributed_evicts_late_rows(spark, tmp_path):
    """State-eviction contract: a right-side row older than the advanced
    watermark is dropped, and a left row whose attribution window closed
    never matches — bounded state on both sides."""
    from pyspark.sql import Row

    from nessie_spark.streaming import join_streams_attributed

    t0 = 1_700_000_000

    def ev(eid, ts_s, etype):
        return Row(event_id=eid, ts=ts_s, user_id=1, event_type=etype,
                   value=1.0, props="")

    vsrc, bsrc = str(tmp_path / "v2"), str(tmp_path / "b2")
    # batch 1: one view at t0, clock-advancers at t0+8h on both streams
    spark.createDataFrame([ev(1, t0, "view"), ev(2, t0 + 28800, "view")]) \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .coalesce(1).write.mode("append").parquet(vsrc)
    spark.createDataFrame([ev(3, t0 + 28800, "purchase")]) \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .coalesce(1).write.mode("append").parquet(bsrc)
    views_s = spark.readStream.schema(EVENTS_DDL).parquet(vsrc)
    buys_s = spark.readStream.schema(EVENTS_DDL).parquet(bsrc)
    q = (
        join_streams_attributed(views_s, buys_s)
        .writeStream.format("memory")
        .queryName("attr_late")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()  # watermarks advance to ~t0+7h on both sides
    # batch 2: a purchase 10 min after the t0 view — in the interval, but
    # its event time is far below the watermark, so state for the t0 view
    # was evicted and the row itself is late -> no match may appear
    spark.createDataFrame([ev(4, t0 + 600, "purchase")]) \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .coalesce(1).write.mode("append").parquet(bsrc)
    q.processAllAvailable()
    q.stop()
    got = {
        (r.l_event_id, r.r_event_id)
        for r in spark.sql("select * from attr_late").collect()
    }
    assert (1, 4) not in got  # late purchase must NOT attribute
    assert (2, 3) in got      # on-time pair (delay 0) must attribute

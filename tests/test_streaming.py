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

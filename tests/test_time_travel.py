"""Time travel: AS OF timestamp, tag refs, and expired-snapshot errors."""

from pyspark.sql import functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import compact as C
from nessie_spark.lakehouse import expire as E
from nessie_spark.lakehouse import jobs
from nessie_spark.lakehouse.scan import scan
from nessie_spark.operators.maintenance import maintenance_time_travel


def test_registry_query_all_invariants_hold(spark):
    row = maintenance_time_travel(spark, "unused").collect()[0].asDict()
    flags = {k: v for k, v in row.items() if isinstance(v, bool)}
    assert all(flags.values()), flags


def test_asof_expired_snapshot_raises(spark, tmp_path):
    t = jobs.create_images_table(str(tmp_path / "images"))
    jobs.append(spark, t, synth.images_df(spark, 48, seed=1), job_id="a1")
    t = t.refresh()
    ts_s1 = t.snapshot(t.current_snapshot_id)["ts_millis"]
    import time

    time.sleep(0.005)
    C.compact(spark, t, target_bytes=64 * 1024, job_id="c1")
    t = t.refresh()
    # expire everything but the current snapshot → the s1 timestamp now
    # points at history the table can no longer serve: error, not a guess
    E.expire_snapshots(spark, t, retain_last=1)
    t = t.refresh()
    try:
        snap = t.snapshot_as_of(ts_s1)
    except ValueError as e:
        assert "no longer possible" in str(e)
    else:
        # same-millisecond edge: ts_s1 resolved to the (current) compaction
        # snapshot, which the table can still serve
        assert snap["snapshot_id"] == t.current_snapshot_id
        assert scan(spark, t, as_of_ts_millis=ts_s1).count() == 48


def test_asof_between_commits_resolves_to_earlier(spark, tmp_path):
    import time

    t = jobs.create_images_table(str(tmp_path / "images"))
    jobs.append(spark, t, synth.images_df(spark, 32, seed=2), job_id="a1")
    t = t.refresh()
    s1 = t.current_snapshot_id
    ts_s1 = t.snapshot(s1)["ts_millis"]
    time.sleep(0.005)
    jobs.append(spark, t, synth.images_df(spark, 16, seed=3).withColumn(
        "image_id", F.concat(F.lit("b-"), F.col("image_id"))
    ), job_id="a2")
    t = t.refresh()
    ts_s2 = t.snapshot(t.current_snapshot_id)["ts_millis"]
    assert t.snapshot_as_of(ts_s2 - 1)["snapshot_id"] == s1 or ts_s2 == ts_s1
    assert scan(spark, t, as_of_ts_millis=ts_s1).count() == 32
    assert scan(spark, t, as_of_ts_millis=ts_s2).count() == 48

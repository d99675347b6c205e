"""Bucketed co-located join (plans/bucket.py): the pre-shuffled layout must
make the join AND the follow-up same-key aggregation run with zero Exchange
nodes, and produce exactly the rows of the plain shuffle join."""

import pyspark.sql.functions as F

from nessie_spark.plans.bucket import bucketed_join, exchange_count, write_bucketed

SF = "/root/testdata/sf0.001"


def _sides(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    views = ev.where("event_type = 'view'").select("user_id", "event_id")
    buys = ev.where("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("buy_id")
    )
    return views, buys


def test_bucketed_join_has_zero_exchanges(spark, tmp_path):
    views, buys = _sides(spark)
    vt = write_bucketed(views, "tbj_views", "user_id", 8, path=str(tmp_path / "v"))
    bt = write_bucketed(buys, "tbj_buys", "user_id", 8, path=str(tmp_path / "b"))
    joined = bucketed_join(spark, vt, bt, "user_id")
    assert exchange_count(joined) == 0
    # the aggregation on the bucket key rides the same partitioning — the
    # whole pipeline after the bucketed write is shuffle-free
    agg = joined.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))
    assert exchange_count(agg) == 0


def test_bucketed_join_matches_shuffle_join(spark, tmp_path):
    views, buys = _sides(spark)
    vt = write_bucketed(views, "tbj_views2", "user_id", 8, path=str(tmp_path / "v2"))
    bt = write_bucketed(buys, "tbj_buys2", "user_id", 8, path=str(tmp_path / "b2"))
    got = sorted(
        (r.user_id, r.event_id, r.buy_id)
        for r in bucketed_join(spark, vt, bt, "user_id").collect()
    )
    expect = sorted(
        (r.user_id, r.event_id, r.buy_id)
        for r in views.join(buys, "user_id").collect()
    )
    assert got == expect and expect


def test_write_bucketed_caps_file_count(spark, tmp_path):
    """The repartition-before-bucketBy contract: files ≈ buckets, not
    tasks × buckets (the small-file explosion the module docstring
    warns about)."""
    views, _ = _sides(spark)
    write_bucketed(
        views.repartition(16), "tbj_files", "user_id", 8, path=str(tmp_path / "f")
    )
    files = [p for p in (tmp_path / "f").glob("*.parquet")]
    assert 0 < len(files) <= 8

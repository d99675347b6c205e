"""Incremental (CDC-style) append scan + Structured Streaming auto-ingest.

The append-delta contract: ``scan_incremental(from, to]`` returns exactly
the rows added by append snapshots in range, skips pure-rewrite
maintenance snapshots (same logical rows), and refuses to cross a
row-changing merge — Iceberg incremental-read semantics.
"""

import os

import pytest
from pyspark.sql import functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import compact, jobs
from nessie_spark.lakehouse.scan import scan, scan_incremental
from nessie_spark.streaming.ingest import ingest_batch, start_auto_ingest
from tests.conftest import make_table


def _ids(df):
    return {r["image_id"] for r in df.select("image_id").collect()}


@pytest.fixture(scope="module")
def table_history(spark, tmp_path_factory):
    """append A (s1) → compact (s2) → append B (s3)."""
    root = str(tmp_path_factory.mktemp("incr") / "images")
    t, s1 = make_table(spark, root, n=120, mean_rows=12)
    compact.compact(spark, t, target_bytes=1 << 20, job_id="c1")
    t = t.refresh()
    s2 = t.current_snapshot_id
    df_b = synth.images_df(spark, 40, seed=43).withColumn(
        "image_id", F.concat(F.lit("b-"), "image_id")
    )
    s3 = jobs.append(spark, t, df_b, job_id="ingest-b")
    return t.refresh(), s1, s2, s3


def test_incremental_after_compact_sees_only_new_append(spark, table_history):
    t, s1, s2, s3 = table_history
    delta = scan_incremental(spark, t, from_snapshot_id=s1)
    ids = _ids(delta)
    assert len(ids) == 40 and all(i.startswith("b-") for i in ids)


def test_incremental_full_history_equals_current_scan(spark, table_history):
    t, s1, s2, s3 = table_history
    assert _ids(scan_incremental(spark, t)) == _ids(scan(spark, t))


def test_incremental_empty_range_and_pinned_to(spark, table_history):
    t, s1, s2, s3 = table_history
    assert scan_incremental(spark, t, from_snapshot_id=s1, to_snapshot_id=s2).count() == 0
    assert _ids(scan_incremental(spark, t, to_snapshot_id=s1)) == _ids(
        scan(spark, t, snapshot_id=s1)
    )


def test_incremental_refuses_merge_snapshot(spark, tmp_path):
    from nessie_spark.lakehouse import merge

    root = str(tmp_path / "images")
    t, s1 = make_table(spark, root, n=60, mean_rows=12)
    src = scan(spark, t).limit(5).withColumn("caption", F.lit("edited"))
    merge.merge_into(spark, t, src, job_id="m1")
    t = t.refresh()
    with pytest.raises(ValueError, match="merge"):
        scan_incremental(spark, t, from_snapshot_id=s1).count()


def test_streaming_auto_ingest_exactly_once(spark, tmp_path):
    root = str(tmp_path / "images")
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    jobs.create_images_table(root)

    synth.images_df(spark, 50, seed=7).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(
        synth.images_df(spark, 1, seed=7).schema
    ).option("maxFilesPerTrigger", "1").parquet(src_dir)
    q = start_auto_ingest(stream, root, ckpt, stream_id="s1")
    assert q.awaitTermination(180)

    from nessie_spark.lakehouse.table import Table

    t = Table.load(root)
    assert scan(spark, t).count() == 50
    ops = [s["operation"] for s in t.meta["snapshots"]]
    assert ops and all(o == "append" for o in ops)

    # replayed micro-batch (same batch_id) must be a metadata no-op
    batch = synth.images_df(spark, 50, seed=7)
    first = ingest_batch(root, "s1", batch, batch_id=0)
    again = ingest_batch(root, "s1", batch, batch_id=0)
    assert first == again
    assert scan(spark, Table.load(root)).count() == 50

    # a NEW file arriving + restart drains only the delta (checkpoint)
    snap_before = Table.load(root).current_snapshot_id
    synth.images_df(spark, 20, seed=8).withColumn(
        "image_id", F.concat(F.lit("n-"), "image_id")
    ).write.mode("append").parquet(src_dir)
    q2 = start_auto_ingest(stream, root, ckpt, stream_id="s1")
    assert q2.awaitTermination(180)
    t = Table.load(root)
    assert scan(spark, t).count() == 70
    delta = scan_incremental(spark, t, from_snapshot_id=snap_before)
    ids = _ids(delta)
    assert len(ids) == 20 and all(i.startswith("n-") for i in ids)


def test_streaming_auto_compact_maintains_file_count(spark, tmp_path):
    """Continuous maintenance: tiny per-batch files accumulate until the
    small-file threshold trips, then compaction rewrites them inline —
    exactly-once for the maintenance commit too (derived job_id)."""
    from nessie_spark.lakehouse.table import Table
    from nessie_spark.streaming.ingest import ingest_batch

    root = str(tmp_path / "images")
    jobs.create_images_table(root)
    for b in range(6):
        batch = synth.images_df(spark, 10, seed=b).withColumn(
            "image_id", F.concat(F.lit(f"b{b}-"), "image_id")
        )
        ingest_batch(root, "ac", batch, batch_id=b, auto_compact_small_files=4)

    t = Table.load(root)
    ops = [s["operation"] for s in t.meta["snapshots"]]
    assert "compact" in ops  # maintenance ran inline at least once
    assert scan(spark, t).count() == 60  # no rows lost or duplicated
    live = t.file_entries().num_rows
    assert live < 6  # small files were folded together

    # replaying the last batch (same batch_id) is a full no-op: neither a
    # second append nor a second compaction commit
    snaps_before = len(t.meta["snapshots"])
    ingest_batch(
        root, "ac",
        synth.images_df(spark, 10, seed=5).withColumn(
            "image_id", F.concat(F.lit("b5-"), "image_id")
        ),
        batch_id=5, auto_compact_small_files=4,
    )
    t = Table.load(root)
    assert len(t.meta["snapshots"]) == snaps_before
    assert scan(spark, t).count() == 60


def test_streaming_matview_stays_consistent(spark, tmp_path):
    """foreachBatch → incremental matview refresh: appends via auto_ingest
    keep the view equal to a full re-aggregate WITHOUT rebuilds — after the
    first (initial) batch every refresh must run in incremental/noop mode
    (last_mode audit in the view state)."""
    import json

    from nessie_spark.lakehouse.matview import read_matview
    from nessie_spark.lakehouse.table import Table

    root = str(tmp_path / "images")
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    view = str(tmp_path / "mv")
    jobs.create_images_table(root)
    synth.images_df(spark, 40, seed=11).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(
        synth.images_df(spark, 1, seed=11).schema
    ).option("maxFilesPerTrigger", "1").parquet(src_dir)
    mvspec = [
        {"view_root": view, "name": "by_fmt", "group_cols": ["fmt"], "sums": ["w", "h"]}
    ]
    q = start_auto_ingest(stream, root, ckpt, stream_id="mv1", matviews=mvspec)
    assert q.awaitTermination(180)

    def _full_agg(t):
        return {
            (r["fmt"],): (r["cnt"], r["sum_w"], r["sum_h"])
            for r in scan(spark, t)
            .groupBy("fmt")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("w").cast("long")).alias("sum_w"),
                F.sum(F.col("h").cast("long")).alias("sum_h"),
            )
            .collect()
        }

    def _view_agg():
        return {
            (r["fmt"],): (r["cnt"], r["sum_w"], r["sum_h"])
            for r in read_matview(spark, view).collect()
        }

    t = Table.load(root)
    assert _view_agg() == _full_agg(t)
    st = json.load(open(os.path.join(view, "_matview.json")))
    assert st["anchor_snapshot_id"] == t.current_snapshot_id

    # second wave of files + stream restart: the view follows incrementally
    synth.images_df(spark, 20, seed=12).withColumn(
        "image_id", F.concat(F.lit("z-"), "image_id")
    ).write.mode("append").parquet(src_dir)
    q2 = start_auto_ingest(stream, root, ckpt, stream_id="mv1", matviews=mvspec)
    assert q2.awaitTermination(180)

    t = Table.load(root)
    assert scan(spark, t).count() == 60
    assert _view_agg() == _full_agg(t)
    st = json.load(open(os.path.join(view, "_matview.json")))
    assert st["last_mode"] in ("incremental", "noop")  # never a rebuild
    assert st["version"] > 1  # it DID refresh past the initial build

    # replayed micro-batch: append short-circuits, refresh is a pure noop
    ver_before = st["version"]
    ingest_batch(
        root, "mv1", synth.images_df(spark, 40, seed=11), batch_id=0, matviews=mvspec
    )
    st = json.load(open(os.path.join(view, "_matview.json")))
    assert st["version"] == ver_before  # noop path rewrites no data dir
    assert _view_agg() == _full_agg(Table.load(root))

"""Streaming upsert ingest: foreachBatch MERGE INTO with exactly-once
replay safety — the CDC pattern Iceberg/Delta streaming sinks use.

Engine graft of the reference's correction loop (Retag.correct applies a
fixed label; here a stream of corrected image rows lands as copy-on-write
row updates), composed from streaming/ingest.py + lakehouse/merge.py.
"""

import pyspark.sql.functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import jobs
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import Table
from nessie_spark.streaming.ingest import ingest_batch, start_auto_ingest


def _captions(spark, root):
    return {
        r.image_id: r.caption
        for r in scan(spark, Table.load(root)).select("image_id", "caption").collect()
    }


def test_upsert_batch_updates_and_inserts(spark, tmp_path):
    root = str(tmp_path / "images")
    t = jobs.create_images_table(root)
    jobs.append(spark, t, synth.images_df(spark, 40, seed=3), job_id="seed")

    # 10 corrections (existing ids, new caption) + 5 brand-new rows
    upd = (
        synth.images_df(spark, 10, seed=3)
        .withColumn("caption", F.concat(F.lit("fixed: "), "caption"))
    )
    new = synth.images_df(spark, 5, seed=3).withColumn(
        "image_id", F.concat(F.lit("n-"), "image_id")
    )
    snap = ingest_batch(root, "up", upd.unionByName(new), batch_id=0, mode="upsert")
    assert snap is not None

    caps = _captions(spark, root)
    assert len(caps) == 45
    assert sum(1 for c in caps.values() if c.startswith("fixed: ")) == 10
    assert sum(1 for k in caps if k.startswith("n-")) == 5

    # replayed micro-batch (same batch_id) = metadata no-op, same snapshot
    again = ingest_batch(root, "up", upd.unionByName(new), batch_id=0, mode="upsert")
    assert again == snap
    assert len(_captions(spark, root)) == 45


def test_upsert_latest_wins_with_version_col(spark, tmp_path):
    root = str(tmp_path / "images")
    t = jobs.create_images_table(root)
    jobs.append(spark, t, synth.images_df(spark, 8, seed=5), job_id="seed")

    base = synth.images_df(spark, 4, seed=5)
    v1 = base.withColumn("caption", F.lit("v1")).withColumn("ver", F.lit(1))
    v2 = base.withColumn("caption", F.lit("v2")).withColumn("ver", F.lit(2))
    ingest_batch(
        root, "up", v1.unionByName(v2), batch_id=0, mode="upsert",
        version_col="ver",
    )
    caps = _captions(spark, root)
    assert len(caps) == 8
    assert sum(1 for c in caps.values() if c == "v2") == 4
    assert not any(c == "v1" for c in caps.values())
    # the stream-only ordering column never reached the table
    assert "ver" not in scan(spark, Table.load(root)).columns


def test_streaming_upsert_end_to_end(spark, tmp_path):
    root = str(tmp_path / "images")
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = jobs.create_images_table(root)
    jobs.append(spark, t, synth.images_df(spark, 30, seed=11), job_id="seed")

    # stream: corrections for 12 existing ids + 6 new ids, across files
    upd = (
        synth.images_df(spark, 12, seed=11)
        .withColumn("caption", F.concat(F.lit("fixed: "), "caption"))
    )
    new = synth.images_df(spark, 6, seed=11).withColumn(
        "image_id", F.concat(F.lit("n-"), "image_id")
    )
    upd.write.mode("append").parquet(src_dir)
    new.write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema(synth.images_df(spark, 1, seed=11).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = start_auto_ingest(stream, root, ckpt, stream_id="cdc", mode="upsert")
    assert q.awaitTermination(180)

    t = Table.load(root)
    caps = _captions(spark, root)
    assert len(caps) == 36
    assert sum(1 for c in caps.values() if c.startswith("fixed: ")) == 12
    ops = [s["operation"] for s in t.meta["snapshots"]]
    assert "merge" in ops and ops[0] == "append"

    # restart on the same checkpoint drains nothing new: no extra snapshots
    n_snaps = len(t.meta["snapshots"])
    q2 = start_auto_ingest(stream, root, ckpt, stream_id="cdc", mode="upsert")
    assert q2.awaitTermination(180)
    assert len(Table.load(root).meta["snapshots"]) == n_snaps

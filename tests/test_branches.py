"""Named branches: commit-to-branch isolation, fast-forward, refusals."""

import pytest
from pyspark.sql import functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import jobs
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import CommitConflict
from nessie_spark.operators.maintenance import maintenance_branches


def _tbl(spark, tmp_path, n=32):
    t = jobs.create_images_table(str(tmp_path / "images"))
    jobs.append(spark, t, synth.images_df(spark, n, seed=1), job_id="a1")
    return t.refresh()


def _extra(spark, n, seed, prefix):
    return synth.images_df(spark, n, seed=seed).withColumn(
        "image_id", F.concat(F.lit(prefix), F.col("image_id"))
    )


def test_registry_query_all_invariants_hold(spark):
    row = maintenance_branches(spark, "unused").collect()[0].asDict()
    flags = {k: v for k, v in row.items() if isinstance(v, bool)}
    assert all(flags.values()), flags


def test_branch_commit_isolated_until_fast_forward(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.create_branch("dev")
    jobs.append(spark, t.refresh(), _extra(spark, 8, 2, "d-"), job_id="b1",
                to_ref="dev")
    t = t.refresh()
    assert scan(spark, t).count() == 32          # main untouched
    assert scan(spark, t, ref="dev").count() == 40
    # time travel never exposes branch-only commits (no made-current event)
    import time
    assert t.snapshot_as_of(int(time.time() * 1000) + 10_000)["snapshot_id"] == 1
    t.fast_forward("main", "dev")
    t = t.refresh()
    assert scan(spark, t).count() == 40


def test_commit_to_tag_and_staged_branch_commit_refused(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.create_tag("v1")
    with pytest.raises(ValueError, match="tag"):
        jobs.append(spark, t.refresh(), _extra(spark, 4, 3, "x-"),
                    job_id="b2", to_ref="v1")
    with pytest.raises(ValueError, match="exclusive"):
        t.refresh().commit("append", to_ref="anything", stage_only=True)
    with pytest.raises(KeyError):
        jobs.append(spark, t.refresh(), _extra(spark, 4, 4, "y-"),
                    job_id="b3", to_ref="nope")


def test_branch_to_branch_fast_forward_and_tag_guard(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.create_branch("dev")
    t = t.refresh()
    t.create_branch("release")  # both at s1
    jobs.append(spark, t.refresh(), _extra(spark, 8, 5, "d-"), job_id="b4",
                to_ref="dev")
    t = t.refresh()
    head = t.fast_forward("release", "dev")
    t = t.refresh()
    assert t.resolve_ref("release") == head == t.resolve_ref("dev")
    with pytest.raises(ValueError, match="branch"):
        t.replace_tag("release", 1)  # retyping a branch is refused


def test_divergent_fast_forward_refused(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.create_branch("old", snapshot_id=1)
    jobs.append(spark, t.refresh(), _extra(spark, 8, 6, "m-"), job_id="b5")
    jobs.append(spark, t.refresh(), _extra(spark, 8, 7, "o-"), job_id="b6",
                to_ref="old")
    t = t.refresh()
    with pytest.raises(CommitConflict, match="ancestor"):
        t.fast_forward("main", "old")


def test_expire_retains_branch_ancestry(spark, tmp_path):
    from nessie_spark.lakehouse import expire as E

    t = _tbl(spark, tmp_path)
    t.create_branch("keep")
    jobs.append(spark, t.refresh(), _extra(spark, 8, 8, "k-"), job_id="b7",
                to_ref="keep")
    jobs.append(spark, t.refresh(), _extra(spark, 8, 9, "m-"), job_id="b8")
    t = t.refresh()
    E.expire_snapshots(spark, t)
    t = t.refresh()
    # the branch head and its rows survive routine expiry
    assert scan(spark, t, ref="keep").count() == 40


def test_streaming_ingest_onto_branch(spark, tmp_path):
    from nessie_spark.streaming.ingest import ingest_batch, start_auto_ingest

    root = str(tmp_path / "images")
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = jobs.create_images_table(root)
    jobs.append(spark, t, synth.images_df(spark, 24, seed=1), job_id="base")
    t = t.refresh()
    t.create_branch("ingest")

    synth.images_df(spark, 30, seed=2).withColumn(
        "image_id", F.concat(F.lit("s-"), F.col("image_id"))
    ).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(
        synth.images_df(spark, 1, seed=2).schema
    ).option("maxFilesPerTrigger", "1").parquet(src_dir)
    q = start_auto_ingest(stream, root, ckpt, stream_id="br", to_ref="ingest")
    assert q.awaitTermination(180)

    t = t.refresh()
    assert scan(spark, t).count() == 24            # main untouched
    assert scan(spark, t, ref="ingest").count() == 54

    # replay on the branch is still exactly-once
    batch = synth.images_df(spark, 30, seed=2).withColumn(
        "image_id", F.concat(F.lit("s-"), F.col("image_id"))
    )
    first = ingest_batch(root, "br", batch, batch_id=0, to_ref="ingest")
    again = ingest_batch(root, "br", batch, batch_id=0, to_ref="ingest")
    assert first == again
    t = t.refresh()
    assert scan(spark, t, ref="ingest").count() == 54

    t.fast_forward("main", "ingest")
    t = t.refresh()
    assert scan(spark, t).count() == 54

    # incompatible combinations are refused loudly
    with pytest.raises(ValueError, match="branch ingest"):
        ingest_batch(root, "br", batch, batch_id=9, to_ref="ingest",
                     auto_compact_small_files=4)
    with pytest.raises(ValueError, match="branch ingest"):
        ingest_batch(root, "br", batch, batch_id=9, to_ref="ingest",
                     mode="upsert")


def test_drop_tag_refuses_branch_without_force(spark, tmp_path):
    """drop_tag is the only ref-deletion path (CLI --job drop-tag): it must
    not silently destroy a branch — branch-only snapshots lose their
    retention anchor and the next expire/GC collects them."""
    t = _tbl(spark, tmp_path)
    t.create_branch("wip")
    t = t.refresh()
    with pytest.raises(ValueError, match="branch"):
        t.drop_tag("wip")
    assert "wip" in t.refresh().meta["refs"]
    t.drop_tag("wip", force=True)  # the explicit escape hatch
    assert "wip" not in t.refresh().meta["refs"]
    # plain tags still drop without force
    t = t.refresh()
    t.create_tag("v9")
    t.refresh().drop_tag("v9")
    assert "v9" not in t.refresh().meta["refs"]

"""Snapshot rollback (Iceberg rollback_to_snapshot) + metadata tables.

Reference parity note: the reference engine has no table layer; these are
engine features mandated by the north rule's snapshot-isolation contract
(BASELINE.json: "matching ... snapshot isolation", "snapshot expiry via
BFS reachability"). Rollback is the standard Iceberg undo workflow: make
an old snapshot current, then expire reclaims the abandoned branch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import compact as C
from nessie_spark.lakehouse import expire as E
from nessie_spark.lakehouse import jobs
from nessie_spark.lakehouse.scan import scan, scan_incremental
from tests.conftest import make_table


@pytest.fixture()
def branched_table(spark, tmp_path):
    """s1 append(256) -> s2 compact -> s3 append(64 'extra-')."""
    t, _ = make_table(spark, str(tmp_path / "images"))
    C.compact(spark, t, target_bytes=256 * 1024, job_id="rb-compact")
    t = t.refresh()
    extra = synth.images_df(spark, 64, seed=99).withColumn(
        "image_id", F.concat(F.lit("extra-"), F.col("image_id"))
    )
    jobs.append(spark, t, extra, job_id="rb-extra")
    return t.refresh()


def test_rollback_restores_prior_rowset(spark, branched_table):
    t = branched_table
    assert t.current_snapshot_id == 3
    ids_s2 = {r.image_id for r in scan(spark, t, snapshot_id=2).select("image_id").collect()}

    t.rollback(2)
    assert t.current_snapshot_id == 2
    ids_now = {r.image_id for r in scan(spark, t).select("image_id").collect()}
    assert ids_now == ids_s2
    # the abandoned snapshot remains time-travelable until expiry
    assert scan(spark, t, snapshot_id=3).count() == 256 + 64
    # reload from disk sees the rollback (it was a durable versioned commit)
    assert t.refresh().current_snapshot_id == 2


def test_commit_after_rollback_takes_fresh_id_and_parents_at_target(spark, branched_table):
    t = branched_table
    t.rollback(2)
    jobs.append(
        spark,
        t,
        synth.images_df(spark, 16, seed=7).withColumn(
            "image_id", F.concat(F.lit("post-"), F.col("image_id"))
        ),
        job_id="rb-post",
    )
    t = t.refresh()
    snap = t.snapshot()
    assert snap["snapshot_id"] == 4  # never reuses abandoned id 3
    assert snap["parent_id"] == 2
    assert scan(spark, t).count() == 256 + 16  # extra- rows absent, post- present


def test_expire_after_rollback_reclaims_abandoned_branch(spark, branched_table):
    t = branched_table
    files_s3_only = {
        e["file_path"] for e in t.file_entries(3).to_pylist()
    } - {e["file_path"] for e in t.file_entries(2).to_pylist()}
    assert files_s3_only  # s3 added real files

    t.rollback(2)
    rep = E.expire_snapshots(spark, t)
    assert rep.expired_snapshots == [3]
    assert set(rep.deleted_data_files) == files_s3_only
    assert sorted(rep.retained_snapshots) == [1, 2]
    t = t.refresh()
    assert scan(spark, t).count() == 256
    assert E.gc_orphans(spark, t, dry_run=True) == []


def test_rollback_unknown_snapshot_raises(spark, branched_table):
    with pytest.raises(KeyError):
        branched_table.rollback(99)


def test_incremental_scan_skips_abandoned_branch(spark, branched_table):
    t = branched_table
    t.rollback(2)
    jobs.append(
        spark,
        t,
        synth.images_df(spark, 16, seed=7).withColumn(
            "image_id", F.concat(F.lit("post-"), F.col("image_id"))
        ),
        job_id="rb-post",
    )
    t = t.refresh()
    # delta (2, 4]: only s4's 16 rows — abandoned s3 has an id in range but
    # is NOT an ancestor of 4 and must not contribute
    delta = scan_incremental(spark, t, from_snapshot_id=2, to_snapshot_id=4)
    assert delta.count() == 16
    assert delta.where(F.col("image_id").startswith("extra-")).count() == 0
    # anchoring at the abandoned snapshot itself is an error, not silence
    with pytest.raises(ValueError, match="not an ancestor"):
        scan_incremental(spark, t, from_snapshot_id=3, to_snapshot_id=4)


def test_tags_anchor_retention_and_scan(spark, branched_table):
    t = branched_table
    t.create_tag("audit", snapshot_id=3)
    t.rollback(2)
    # scan by ref reads the tagged snapshot regardless of current
    assert scan(spark, t, ref="audit").count() == 256 + 64
    refs = {r.name: r.snapshot_id for r in t.refs_df(spark).collect()}
    assert refs == {"audit": 3}

    # default expire retains the tag's head even though it left current
    # ancestry — tags are retention anchors
    rep = E.expire_snapshots(spark, t)
    assert rep.expired_snapshots == []
    assert scan(spark, t.refresh(), ref="audit").count() == 256 + 64

    # after dropping the tag the branch is reclaimable
    t = t.refresh()
    t.drop_tag("audit")
    rep = E.expire_snapshots(spark, t)
    assert rep.expired_snapshots == [3]
    with pytest.raises(KeyError):
        t.resolve_ref("audit")

    with pytest.raises(ValueError):
        t.create_tag("dup", snapshot_id=2)
        t.create_tag("dup", snapshot_id=2)


def test_explicit_keep_heads_drops_dangling_refs(spark, branched_table):
    t = branched_table
    t.create_tag("doomed", snapshot_id=3)
    E.expire_snapshots(spark, t, keep_heads=[2])
    t = t.refresh()
    assert t.refs == {}  # dangling ref dropped with its snapshot
    assert {s["snapshot_id"] for s in t.meta["snapshots"]} == {1, 2}


def test_metadata_tables(spark, branched_table):
    t = branched_table
    snaps = t.snapshots_df(spark)
    assert snaps.count() == 3
    cur = snaps.where("is_current").first()
    assert cur.snapshot_id == 3 and cur.total_record_count == 256 + 64
    assert snaps.where("snapshot_id = 2").first().total_record_count == 256
    ops = {r.snapshot_id: r.operation for r in snaps.collect()}
    assert ops == {1: "append", 2: "compact", 3: "append"}

    # $manifests matches manifest_paths, $files matches file_entries
    assert t.manifests_df(spark).count() == len(t.manifest_paths())
    assert t.files_df(spark).count() == t.file_entries().num_rows

    # $partitions reconciles with $files (unpartitioned table: one '' row)
    parts = t.partitions_df(spark).collect()
    assert [p.partition for p in parts] == [""]
    assert parts[0].file_count == t.files_df(spark).count()
    assert parts[0].record_count == 256 + 64
    assert parts[0].last_added_snapshot_id == 3

    t.rollback(2)
    hist = t.history_df(spark).orderBy("made_current_ts", "snapshot_id").collect()
    assert [h.action for h in hist] == ["append", "compact", "append", "rollback"]
    anc = {h.snapshot_id: h.is_current_ancestor for h in hist}
    assert anc[2] and anc[1] and not anc[3]
    assert t.snapshots_df(spark).where("is_current").first().snapshot_id == 2


def test_history_seeded_for_pre_feature_tables(spark, branched_table):
    """Regression: a table whose metadata predates the history log gets
    the full past synthesized into the log on its next commit, not a
    one-entry history."""
    import json
    import os

    from nessie_spark import synth
    from nessie_spark.lakehouse import jobs

    t = branched_table  # 3 snapshots with a real history log
    meta = dict(t.meta)
    meta.pop("history")
    t._write_version(t.version + 1, meta)  # simulate a pre-feature table
    t = t.refresh()
    assert "history" not in t.meta

    jobs.append(
        spark, t,
        synth.images_df(spark, 8, seed=5).withColumn(
            "image_id", F.concat(F.lit("h-"), F.col("image_id"))
        ),
        job_id="hist-seed",
    )
    t = t.refresh()
    hist = t.history_df(spark).orderBy("made_current_ts", "snapshot_id").collect()
    assert [h.snapshot_id for h in hist] == [1, 2, 3, 4]
    assert hist[-1].action == "append"

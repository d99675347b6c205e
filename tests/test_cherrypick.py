"""Cherry-pick publish (Iceberg ``cherrypick_snapshot``): the WAP escape
hatch when a concurrent commit lands after staging — strict fast-forward
publish refuses, cherry-pick replays the staged delta on the new head.

Covers: fast-forward delegation, append replay over a moved head, rewrite
(delete+add) replay, the rewrite-conflict refusal when a concurrent job
already rewrote the same files, and the MoR-delete / schema-change guards.
"""

import pyspark.sql.functions as F
import pytest

from nessie_spark import synth
from nessie_spark.lakehouse import jobs
from nessie_spark.lakehouse.compact import compact
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import CommitConflict
from tests.conftest import make_table


def _staged_append(spark, t, n=16, seed=11, prefix="wap-", job_id="stage1"):
    df = synth.images_df(spark, n, seed=seed).withColumn(
        "image_id", F.concat(F.lit(prefix), F.col("image_id"))
    )
    return jobs.append(spark, t, df, job_id=job_id, stage_only=True)


def _concurrent_append(spark, t, n=8, seed=3, job_id="mid"):
    jobs.append(
        spark, t,
        synth.images_df(spark, n, seed=seed).withColumn(
            "image_id", F.concat(F.lit("mid-"), F.col("image_id"))
        ),
        job_id=job_id,
    )


def test_cherrypick_fast_forwards_when_head_unmoved(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"))
    sid = _staged_append(spark, t)
    t = t.refresh()
    got = t.cherrypick_snapshot(sid)
    assert got == sid  # no replay, no duplicate snapshot
    t = t.refresh()
    assert t.current_snapshot_id == sid
    assert scan(spark, t).count() == 256 + 16


def test_cherrypick_append_replays_over_moved_head(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"))
    sid = _staged_append(spark, t)
    t = t.refresh()
    _concurrent_append(spark, t)
    t = t.refresh()
    with pytest.raises(CommitConflict):
        t.refresh().publish_snapshot(sid)
    new_id = t.cherrypick_snapshot(sid)
    assert new_id != sid
    t = t.refresh()
    assert t.current_snapshot_id == new_id
    snap = t.snapshot(new_id)
    assert snap["operation"] == "cherry-pick"
    assert snap["summary"]["source_snapshot_id"] == sid
    # full row set: base + concurrent + staged
    ids = [r.image_id for r in scan(spark, t).select("image_id").collect()]
    assert len(ids) == 256 + 8 + 16 == len(set(ids))
    assert sum(i.startswith("wap-") for i in ids) == 16
    assert sum(i.startswith("mid-") for i in ids) == 8
    # the source snapshot's staged marker is retired
    assert not t.snapshot(sid).get("staged")


def _stage_rewrite(t, n_files=2):
    """Hand-stage a REAL shadow rewrite: copy the first n_files to new
    paths (content identical) and stage a commit that deletes the originals
    and adds the copies — a nonzero delta on both sides."""
    import os
    import shutil

    import pyarrow as pa

    from nessie_spark.lakehouse.table import FILE_ENTRY_SCHEMA

    entries = t.file_entries()
    victim = entries.slice(0, n_files).to_pylist()
    deleted = set()
    added_rows = []
    for i, e in enumerate(victim):
        new_rel = f"data/staged-rw-{i}.parquet"
        shutil.copyfile(
            os.path.join(t.root, e["file_path"]), os.path.join(t.root, new_rel)
        )
        deleted.add(e["file_path"])
        added_rows.append(dict(e, file_path=new_rel))
    added = pa.Table.from_pylist(added_rows, schema=FILE_ENTRY_SCHEMA)
    return t.commit(
        "rewrite", added=added, deleted_paths=deleted,
        summary={"job_id": "staged-rw"}, stage_only=True,
    ), deleted


def test_cherrypick_rewrite_replays_and_keeps_row_set(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"))
    t = t.refresh()
    sid, _deleted = _stage_rewrite(t)
    _concurrent_append(spark, t.refresh())
    t = t.refresh()
    new_id = t.cherrypick_snapshot(sid)
    assert new_id != sid
    t = t.refresh()
    ids = [r.image_id for r in scan(spark, t).select("image_id").collect()]
    # rewrite preserved every base row exactly once, concurrent rows intact
    assert len(ids) == 256 + 8 == len(set(ids))


def test_cherrypick_rewrite_conflicts_with_concurrent_rewrite(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"))
    t = t.refresh()
    sid, _deleted = _stage_rewrite(t, n_files=3)
    # a concurrent compaction rewrites (among others) the same files
    compact(spark, t.refresh(), target_bytes=1 << 20, job_id="mid-compact")
    t = t.refresh()
    with pytest.raises(CommitConflict, match="re-stage"):
        t.cherrypick_snapshot(sid)


def test_cherrypick_rewrite_refuses_pending_head_deletes(spark, tmp_path):
    """A staged REWRITE must not replay onto a head with pending
    merge-on-read deletes: the replay re-stamps its rows with a new
    added_snapshot_id > the delete's sid, lifting them out of the delete's
    applicability window — rows the user deleted would silently come back.
    (Staged APPENDS replay fine; this is the rewrite-only guard the
    compact/zorder/MERGE paths already enforce via
    require_no_pending_deletes.)"""
    from nessie_spark.lakehouse import deletes

    t, _ = make_table(spark, str(tmp_path / "tb"))
    t = t.refresh()
    sid, deleted = _stage_rewrite(t)
    # concurrent MoR delete of a row that lives in a rewritten file
    victim = (
        spark.read.parquet(*[str(tmp_path / "tb" / p) for p in sorted(deleted)[:1]])
        .select("image_id").limit(1).collect()[0].image_id
    )
    deletes.delete_where(spark, t.refresh(), F.col("image_id") == victim, job_id="cc-del")
    t = t.refresh()
    before = scan(spark, t).count()
    with pytest.raises(CommitConflict, match="un-delete"):
        t.cherrypick_snapshot(sid)
    # the deleted row stayed deleted and the head never moved
    t = t.refresh()
    assert scan(spark, t).count() == before
    assert not scan(spark, t).where(F.col("image_id") == victim).count()


def test_cherrypick_refuses_mor_delete_snapshots(spark, tmp_path):
    """A staged snapshot whose delta is a merge-on-read delete file can't
    replay: the delete's applicability window (added_snapshot_id < D) is
    anchored to the parent's state."""
    t, _ = make_table(spark, str(tmp_path / "tb"))
    t = t.refresh()
    sid = t.commit(
        "delete",
        summary={"job_id": "staged-del"},
        new_delete_entries=[{
            "file_path": "metadata/fake-delete.parquet", "n_keys": 1,
            "min_key": "a", "max_key": "a", "file_size_bytes": 10,
        }],
        stage_only=True,
    )
    _concurrent_append(spark, t.refresh())
    t = t.refresh()
    with pytest.raises(ValueError, match="merge-on-read"):
        t.cherrypick_snapshot(sid)

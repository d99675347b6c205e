"""Write-audit-publish (Iceberg WAP): staged commits keep the current
pointer in place, publish is a strict fast-forward, drop_staged returns the
branch to ordinary expiry, and pending audits survive routine expiry."""

import os

import pyspark.sql.functions as F
import pytest

from nessie_spark import synth
from nessie_spark.lakehouse import expire, jobs
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import CommitConflict
from tests.conftest import make_table


def _staged_append(spark, t, n=16, seed=11, prefix="wap-", job_id="stage1"):
    df = synth.images_df(spark, n, seed=seed).withColumn(
        "image_id", F.concat(F.lit(prefix), F.col("image_id"))
    )
    return jobs.append(spark, t, df, job_id=job_id, stage_only=True)


def test_stage_does_not_move_current_and_publish_fast_forwards(spark, tmp_path):
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    sid = _staged_append(spark, t)
    t = t.refresh()
    # readers keep seeing the pre-stage table; the staged snapshot is
    # pinned-readable for the audit
    assert t.current_snapshot_id == snap0
    assert scan(spark, t).count() == 256
    assert scan(spark, t, snapshot_id=sid).count() == 256 + 16
    # idempotent job rerun returns the same staged snapshot
    assert _staged_append(spark, t) == sid

    t.publish_snapshot(sid)
    t = t.refresh()
    assert t.current_snapshot_id == sid
    assert scan(spark, t).count() == 256 + 16
    hist = t.meta["history"]
    assert hist[-1]["action"] == "publish" and hist[-1]["snapshot_id"] == sid
    # the staged marker is retired: publishing twice is an error
    with pytest.raises(ValueError, match="not staged"):
        t.publish_snapshot(sid)


def test_publish_after_intervening_commit_conflicts(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"))
    sid = _staged_append(spark, t, job_id="stage1")
    t = t.refresh()
    # a normal commit lands while the audit runs
    jobs.append(
        spark, t,
        synth.images_df(spark, 8, seed=3).withColumn(
            "image_id", F.concat(F.lit("mid-"), F.col("image_id"))
        ),
        job_id="mid",
    )
    t = t.refresh()
    with pytest.raises(CommitConflict, match="fast-forward"):
        t.publish_snapshot(sid)
    # recovery: re-stage on the new current, then publish
    sid2 = _staged_append(spark, t, prefix="wap2-", job_id="stage2")
    t = t.refresh()
    t.publish_snapshot(sid2)
    t = t.refresh()
    assert scan(spark, t).count() == 256 + 8 + 16


def test_audit_snapshot_verdicts(spark, tmp_path):
    from nessie_spark.lakehouse.verify import audit_snapshot

    t, _ = make_table(spark, str(tmp_path / "tb"))
    # clean staged batch passes and reports the delta
    good = _staged_append(spark, t, n=16, job_id="good")
    t = t.refresh()
    rep = audit_snapshot(spark, t, good)
    assert rep["passed"] and rep["new_rows"] == 16 and rep["duplicate_ids"] == 0
    t.publish_snapshot(good)
    t = t.refresh()
    # batch re-sending existing ids fails the duplicate check
    bad = jobs.append(
        spark, t, synth.images_df(spark, 8, seed=42), job_id="bad", stage_only=True
    )
    t = t.refresh()
    rep = audit_snapshot(spark, t, bad)
    assert not rep["passed"] and rep["duplicate_ids"] == 8
    t.drop_staged(bad)


def test_drop_staged_and_expiry_rules(spark, tmp_path):
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    sid = _staged_append(spark, t, job_id="stage1")
    t = t.refresh()
    staged_files = [
        e["file_path"]
        for e in t.file_entries(sid).to_pylist()
        if e["added_snapshot_id"] == sid
    ]
    assert staged_files
    # a PENDING staged snapshot survives routine expiry (it is a head)
    rep = expire.expire_snapshots(spark, t)
    assert sid in rep.retained_snapshots
    assert all(os.path.exists(os.path.join(t.root, p)) for p in staged_files)
    # after the audit fails, drop returns the branch to ordinary expiry
    t = t.refresh()
    t.drop_staged(sid)
    t = t.refresh()
    assert t.current_snapshot_id == snap0
    rep = expire.expire_snapshots(spark, t)
    assert sid in rep.expired_snapshots
    assert not any(os.path.exists(os.path.join(t.root, p)) for p in staged_files)
    assert scan(spark, t.refresh()).count() == 256

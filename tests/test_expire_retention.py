"""Retention-policy snapshot expiry (Iceberg expire_snapshots knobs):
retain_last / older_than_millis trim ancestor history, heads and refs
always survive, and files still live in a retained snapshot are never
deleted."""

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
def chain_table(spark, tmp_path):
    """s1 append(256 small files) -> s2 compact -> s3 append(64) -> s4 compact."""
    t, _ = make_table(spark, str(tmp_path / "images"))
    C.compact(spark, t, target_bytes=256 * 1024, job_id="ret-c1")
    t = t.refresh()
    extra = synth.images_df(spark, 64, seed=99).withColumn(
        "image_id", F.concat(F.lit("extra-"), F.col("image_id"))
    )
    jobs.append(spark, t, extra, job_id="ret-a2")
    t = t.refresh()
    C.compact(spark, t, target_bytes=512 * 1024, job_id="ret-c2")
    return t.refresh()


def test_retain_last_trims_old_ancestors(spark, chain_table):
    t = chain_table
    assert t.current_snapshot_id == 4
    def files_of(*sids):
        out = set()
        for s in sids:
            out |= {e["file_path"] for e in t.file_entries(s).to_pylist()}
        return out

    expired_refs, retained_refs = files_of(1, 2), files_of(3, 4)

    rep = E.expire_snapshots(spark, t, retain_last=2)
    assert rep.expired_snapshots == [1, 2]
    assert sorted(rep.retained_snapshots) == [3, 4]
    # exactly the files referenced ONLY by expired snapshots are reclaimed
    # (a file carried from s1 into retained s3 stays even if s4 rewrote it)
    assert set(rep.deleted_data_files) == expired_refs - retained_refs
    assert expired_refs - retained_refs  # the compacted-away small files

    t = t.refresh()
    assert scan(spark, t).count() == 256 + 64
    with pytest.raises(KeyError):
        t.snapshot(1)
    # incremental across the trimmed boundary raises, never silently skips
    with pytest.raises(ValueError, match="expired"):
        scan_incremental(spark, t)
    # within the retained suffix it still works (3 is a rewrite-free append)
    assert scan_incremental(spark, t, from_snapshot_id=3).count() == 0
    assert E.gc_orphans(spark, t, dry_run=True) == []


def test_older_than_cutoff(spark, chain_table):
    t = chain_table
    cutoff = t.snapshot(3)["ts_millis"]  # s1, s2 are older than s3's commit
    rep = E.expire_snapshots(spark, t, older_than_millis=cutoff)
    assert rep.expired_snapshots == [1, 2]
    assert sorted(rep.retained_snapshots) == [3, 4]


def test_both_knobs_must_agree_to_expire(spark, chain_table):
    t = chain_table
    cutoff = t.snapshot(3)["ts_millis"]
    # retain_last=3 protects s2 (position 2 < 3) even though it's old;
    # only s1 fails BOTH conditions
    rep = E.expire_snapshots(spark, t, retain_last=3, older_than_millis=cutoff)
    assert rep.expired_snapshots == [1]


def test_ref_head_survives_retention(spark, chain_table):
    t = chain_table
    t.create_tag("audit", snapshot_id=1)
    rep = E.expire_snapshots(spark, t, retain_last=1)
    # s1 is a ref head (depth 0 on its own lineage) -> retained; s2, s3 expire
    assert rep.expired_snapshots == [2, 3]
    assert sorted(rep.retained_snapshots) == [1, 4]
    t = t.refresh()
    assert scan(spark, t, ref="audit").count() == 256
    assert scan(spark, t).count() == 256 + 64


def test_no_knobs_keeps_full_ancestry(spark, chain_table):
    rep = E.expire_snapshots(spark, chain_table, dry_run=True)
    assert rep.expired_snapshots == []
    assert sorted(rep.retained_snapshots) == [1, 2, 3, 4]


def test_plain_expire_survives_retention_holes(spark, chain_table):
    """Regression: after a retention expiry leaves a parent-chain hole
    (ref head far below current), a routine knob-less expire must not
    KeyError walking into the expired parent."""
    t = chain_table
    t.create_tag("audit", snapshot_id=1)
    E.expire_snapshots(spark, t, retain_last=1)  # leaves {1, 4}, hole at 2-3
    t = t.refresh()
    rep = E.expire_snapshots(spark, t)  # must not crash on s4.parent_id=3
    assert rep.expired_snapshots == []
    assert sorted(rep.retained_snapshots) == [1, 4]
    assert scan(spark, t.refresh()).count() == 256 + 64

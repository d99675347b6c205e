"""Policy-driven maintenance scheduler (lakehouse/maintain.py): health
signals from manifest stats only, action planning against thresholds,
dependency-ordered execution, healthy-table no-op, and sweep resume."""

import pyspark.sql.functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import deletes, jobs, zorder
from nessie_spark.lakehouse.maintain import (
    MaintenancePolicy,
    maintain,
    plan_maintenance,
    table_health,
)
from nessie_spark.lakehouse.scan import scan
from tests.conftest import make_table

POL = MaintenancePolicy(target_bytes=256 * 1024, compact_min_small_files=4,
                        expire_retain_last=3)


def test_health_signals_on_fragmented_table(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=96, mean_rows=8)  # fragmented
    h = table_health(t, POL)
    assert h.live_files > 4 and h.small_files >= 4
    assert h.live_rows == 96
    assert h.zorder_overlap_pct == 1.0  # never clustered
    assert h.pending_delete_keys == 0
    acts = plan_maintenance(h, POL)
    assert "compact" in acts and "cluster" in acts
    assert "purge-deletes" not in acts and "expire" not in acts


def test_maintain_executes_in_order_and_heals(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=96, mean_rows=8)
    deletes.delete_where(spark, t, F.col("image_id") < "img_000000000008",
                         job_id="m-del")
    t = t.refresh()
    rows_mor = scan(spark, t).count()
    rep = maintain(spark, t, POL, job_id="sweep1")
    t = t.refresh()
    assert rep.actions[0] == "purge-deletes"  # unblocks the rewrites
    assert "compact" in rep.actions and "cluster" in rep.actions
    assert scan(spark, t).count() == rows_mor
    after = rep.health_after
    assert after.pending_delete_keys == 0
    assert after.zorder_overlap_pct == 0.0
    assert after.small_files < POL.compact_min_small_files
    # the healed table plans nothing (expire threshold high enough here)
    rep2 = maintain(spark, t, MaintenancePolicy(
        target_bytes=256 * 1024, compact_min_small_files=4,
        expire_retain_last=20), job_id="sweep2")
    assert rep2.actions == [] and rep2.snapshots == {}


def test_dry_run_changes_nothing(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=48)
    head = t.current_snapshot_id
    rep = maintain(spark, t, POL, dry_run=True)
    t = t.refresh()
    assert rep.actions and t.current_snapshot_id == head
    assert rep.health_after is None


def test_expire_triggers_on_deep_history(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=32)
    for k in range(4):
        extra = synth.images_df(spark, 4, seed=70 + k).withColumn(
            "image_id", F.concat(F.lit(f"m{k}-"), "image_id")
        )
        jobs.append(spark, t, extra, job_id=f"m-a{k}")
        t = t.refresh()
    h = table_health(t, POL)
    assert h.ancestor_snapshots == 5
    assert "expire" in plan_maintenance(h, POL)
    rep = maintain(spark, t, POL, job_id="sweep-exp")
    t = t.refresh()
    # +1: the expire commit itself heads the chain above the retained suffix
    assert rep.health_after.ancestor_snapshots <= POL.expire_retain_last + 1
    assert scan(spark, t).count() == 32 + 16


def test_sweep_resume_is_idempotent(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=96, mean_rows=8)
    rep = maintain(spark, t, POL, job_id="rs")
    t = t.refresh()
    head = t.current_snapshot_id
    # rerunning the same sweep id replans on the HEALED table → no actions
    # (and even forced actions would short-circuit on the job markers)
    rep2 = maintain(spark, t, MaintenancePolicy(
        target_bytes=256 * 1024, compact_min_small_files=4,
        expire_retain_last=20), job_id="rs")
    t = t.refresh()
    assert t.current_snapshot_id == head
    assert rep2.actions == []


def test_clustered_then_appended_decays_overlap(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=64)
    zorder.cluster(spark, t, target_bytes=64 * 1024, job_id="m-z")
    t = t.refresh()
    assert table_health(t, POL).zorder_overlap_pct == 0.0
    extra = synth.images_df(spark, 32, seed=8).withColumn(
        "image_id", F.concat(F.lit("d-"), "image_id")
    )
    jobs.append(spark, t, extra, job_id="m-decay")
    t = t.refresh()
    assert table_health(t, POL).zorder_overlap_pct > 0.0


def test_metadata_version_cap_triggers_expire(spark, tmp_path):
    """A long commit log alone (healthy layout otherwise) trips the
    metadata_versions_max policy: the sweep expires AND truncates the
    version log."""
    import os

    from nessie_spark import synth
    from nessie_spark.lakehouse.table import Table

    root = str(tmp_path / "tb" / "images")
    t = jobs.create_images_table(root)
    for i in range(6):
        jobs.append(spark, t.refresh(), synth.images_df(spark, 4, seed=i + 1)
                    .withColumn("image_id", F.concat(F.lit(f"c{i}-"), F.col("image_id"))),
                    job_id=f"a{i}")
    t = t.refresh()
    policy = MaintenancePolicy(
        metadata_versions_max=3, expire_retain_last=None,
        compact_min_small_files=10**9,
    )
    h = table_health(t, policy)
    assert h.metadata_versions == 7
    assert "expire" in plan_maintenance(h, policy)
    maintain(spark, t, policy=policy, job_id="sweep-mv")
    mdir = os.path.join(root, "metadata")
    vs = [f for f in os.listdir(mdir) if f.startswith("v") and f.endswith(".json")]
    assert len(vs) <= policy.metadata_versions_max + 1  # + expiry's own commit
    t2 = Table.load(root)
    assert scan(spark, t2).count() == 24

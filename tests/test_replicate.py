"""CDC replication (lakehouse/replicate.py): initial copy, incremental
net-change apply across appends / deletes / merges, crash resume,
layout-independence of pure rewrites, and the full-diff fallback."""

import pandas as pd
import pyspark.sql.functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import compact, deletes, expire, jobs, merge, zorder
from nessie_spark.lakehouse.replicate import (
    create_replica,
    sync_replica,
    verify_replica,
)
from nessie_spark.lakehouse.scan import scan
from tests.conftest import make_table


def test_initial_then_incremental_sync(spark, tmp_path):
    src, _ = make_table(spark, str(tmp_path / "src"), n=80)
    dst = create_replica(src, str(tmp_path / "dst"))

    r0 = sync_replica(spark, src, dst, name="r")
    dst = dst.refresh()
    assert r0.mode == "initial" and r0.inserted == 80
    assert verify_replica(spark, src, dst) == 0

    # source DML: append + MoR delete + merge update
    extra = synth.images_df(spark, 16, seed=5).withColumn(
        "image_id", F.concat(F.lit("n-"), "image_id")
    )
    jobs.append(spark, src, extra, job_id="r-app")
    src = src.refresh()
    deletes.delete_where(spark, src, F.col("image_id") < "img_000000000008",
                         job_id="r-del")
    src = src.refresh()
    deletes.purge_deletes(spark, src, job_id="r-purge")
    src = src.refresh()
    rows = []
    for i in range(20, 30):
        r = synth.row_for(42, i)
        r["caption"] = r["caption"] + " v2"
        rows.append(r)
    srcdf = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGES_SCHEMA)
    merge.merge_into(spark, src, srcdf, job_id="r-merge")
    src = src.refresh()

    r1 = sync_replica(spark, src, dst, name="r")
    dst = dst.refresh()
    assert r1.mode == "incremental"
    assert verify_replica(spark, src, dst) == 0
    # updated rows visible with their new captions on the replica
    assert (
        scan(spark, dst).where(F.col("caption").endswith("v2")).count() == 10
    )
    # idempotent re-sync
    r2 = sync_replica(spark, src, dst, name="r")
    assert r2.mode == "noop"


def test_pure_rewrites_move_nothing(spark, tmp_path):
    src, _ = make_table(spark, str(tmp_path / "src"), n=48)
    dst = create_replica(src, str(tmp_path / "dst"))
    sync_replica(spark, src, dst, name="r")
    dst = dst.refresh()
    compact.compact(spark, src, target_bytes=256 * 1024, job_id="r-c")
    src = src.refresh()
    zorder.cluster(spark, src, target_bytes=256 * 1024, job_id="r-z")
    src = src.refresh()
    r = sync_replica(spark, src, dst, name="r")
    dst = dst.refresh()
    assert r.deleted == 0 and r.inserted == 0 and r.mode == "incremental"
    assert verify_replica(spark, src, dst) == 0


def test_resume_after_partial_sync(spark, tmp_path):
    src, _ = make_table(spark, str(tmp_path / "src"), n=48)
    dst = create_replica(src, str(tmp_path / "dst"))
    sync_replica(spark, src, dst, name="r")
    dst = dst.refresh()
    deletes.delete_where(spark, src, F.col("image_id") < "img_000000000004",
                         job_id="r-d2")
    src = src.refresh()
    # simulate a crash: run only the delete half with the derived job id
    from nessie_spark.lakehouse.changelog import scan_changelog

    st_anchor = None
    import json as _json
    import os as _os

    with open(_os.path.join(dst.root, "_replica.json")) as fh:
        st_anchor = _json.load(fh)["anchor_snapshot_id"]
    keys = scan_changelog(
        spark, src, from_snapshot_id=st_anchor, net_changes=True
    ).select("image_id").distinct()
    deletes.delete_keys(spark, dst, keys, job_id="s2-del")
    dst = dst.refresh()
    # resume: the delete short-circuits, the rest applies
    r = sync_replica(spark, src, dst, name="r", job_id="s2")
    dst = dst.refresh()
    assert verify_replica(spark, src, dst) == 0


def test_full_diff_fallback_after_window_expiry(spark, tmp_path):
    src, _ = make_table(spark, str(tmp_path / "src"), n=48)
    dst = create_replica(src, str(tmp_path / "dst"))
    sync_replica(spark, src, dst, name="r")
    dst = dst.refresh()
    src = src.refresh()
    src.drop_tag("replica:r")
    src = src.refresh()
    for k in range(2):
        extra = synth.images_df(spark, 8, seed=60 + k).withColumn(
            "image_id", F.concat(F.lit(f"f{k}-"), "image_id")
        )
        jobs.append(spark, src, extra, job_id=f"r-f{k}")
        src = src.refresh()
    expire.expire_snapshots(spark, src, retain_last=1)
    src = src.refresh()
    r = sync_replica(spark, src, dst, name="r")
    dst = dst.refresh()
    assert r.mode == "full-diff"
    # only the changed rows moved: 16 new inserts, no spurious deletes
    assert r.inserted == 16 and r.deleted == 0
    assert verify_replica(spark, src, dst) == 0

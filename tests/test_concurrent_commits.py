"""True concurrent writers against one table root.

The commit protocol is an atomic ``O_CREAT|O_EXCL`` create of the next
version file with optimistic retry (table.py commit loop): losers refresh
and rebuild their snapshot against the new parent. These tests run REAL
racing threads (not sequenced conflicts like test_wap) and assert the
serialized outcome: every writer lands exactly once, no rows are lost,
and maintenance racing an append never drops the appended files.
"""

import threading

from pyspark.sql import functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import jobs
from nessie_spark.lakehouse.compact import compact
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import Table
from tests.conftest import make_table


def _append_prefixed(spark, root, prefix, n, seed, errors):
    try:
        t = Table.load(root)
        df = synth.images_df(spark, n, seed=seed).withColumn(
            "image_id", F.concat(F.lit(prefix), F.col("image_id"))
        )
        jobs.append(spark, t, df, job_id=f"app-{prefix}")
    except Exception as e:  # surfaced by the main thread
        errors.append(e)


def test_concurrent_appends_all_land(spark, tmp_path):
    root = str(tmp_path / "tb")
    t, _ = make_table(spark, root, n=64)
    base = scan(spark, t).count()
    errors: list[Exception] = []
    threads = [
        threading.Thread(
            target=_append_prefixed, args=(spark, root, f"w{i}-", 16, 100 + i, errors)
        )
        for i in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    t = t.refresh()
    assert scan(spark, t).count() == base + 4 * 16
    # one snapshot per writer, ids strictly increasing along the chain
    snaps = sorted(s["snapshot_id"] for s in t.meta["snapshots"])
    assert len(snaps) == 5 and snaps == list(range(1, 6))
    # each writer's rows are all present exactly once
    ids = [r.image_id for r in scan(spark, t).select("image_id").collect()]
    assert len(ids) == len(set(ids))
    for i in range(4):
        assert sum(1 for x in ids if x.startswith(f"w{i}-")) == 16
    # losing attempts leave orphan manifests/manifest-lists; gc reclaims
    # them and every snapshot still scans afterwards
    from nessie_spark.lakehouse.expire import gc_orphans

    swept = gc_orphans(spark, t)
    assert all(s.startswith("metadata/") for s in swept)
    assert scan(spark, t).count() == base + 4 * 16
    for s in t.meta["snapshots"]:
        scan(spark, t, snapshot_id=s["snapshot_id"]).count()
    assert gc_orphans(spark, t) == []


def test_compact_racing_append_preserves_both(spark, tmp_path):
    root = str(tmp_path / "tb")
    t, _ = make_table(spark, root, n=192)  # many small files
    base = scan(spark, t).count()
    errors: list[Exception] = []

    def _compact():
        try:
            compact(spark, Table.load(root), target_bytes=256 * 1024, job_id="cc")
        except Exception as e:
            errors.append(e)

    ta = threading.Thread(target=_compact)
    tb = threading.Thread(
        target=_append_prefixed, args=(spark, root, "race-", 24, 777, errors)
    )
    ta.start()
    tb.start()
    ta.join()
    tb.join()
    assert not errors, errors
    t = t.refresh()
    # both commits serialized: all original rows compacted-but-present,
    # all appended rows present
    ids = [r.image_id for r in scan(spark, t).select("image_id").collect()]
    assert len(ids) == base + 24
    assert sum(1 for x in ids if x.startswith("race-")) == 24
    assert len(ids) == len(set(ids))

"""Executor-side sharded FFD planner: packing invariants + compaction
equivalence with the driver planner."""

from nessie_spark.lakehouse import compact
from nessie_spark.lakehouse.scan import scan
from nessie_spark.plans.ffd import ffd_pack_distributed
from tests.conftest import make_table


def test_ffd_pack_distributed_invariants(spark):
    # deterministic pseudo-random sizes, enough rows for several shards
    sizes = [((i * 2654435761) % 97) + 3 for i in range(200)]
    df = spark.createDataFrame(
        [(f"f{i:04d}", s) for i, s in enumerate(sizes)],
        "file_path string, file_size_bytes long",
    )
    target = 120
    packed = ffd_pack_distributed(spark, df, target, shard_rows=32)

    covered = [p for paths, _ in packed for p in paths]
    assert sorted(covered) == sorted(f"f{i:04d}" for i in range(200))
    size_of = {f"f{i:04d}": s for i, s in enumerate(sizes)}
    for paths, nbytes in packed:
        assert nbytes == sum(size_of[p] for p in paths)
        if len(paths) > 1:  # oversize singletons may exceed target
            assert nbytes <= target
    # after the cross-shard merge, at most ONE bin is under half capacity
    assert sum(1 for _, b in packed if b * 2 < target) <= 1

    # deterministic across invocations (resume correctness)
    again = ffd_pack_distributed(spark, df, target, shard_rows=32)
    assert packed == again


def test_compact_distributed_planner_matches_driver_rowset(spark, tmp_path):
    r1, r2 = str(tmp_path / "a" / "images"), str(tmp_path / "b" / "images")
    t1, _ = make_table(spark, r1, n=96, mean_rows=12)
    t2, _ = make_table(spark, r2, n=96, mean_rows=12)
    res_d = compact.compact(spark, t1, target_bytes=1 << 20, job_id="cd", planner="driver")
    res_x = compact.compact(
        spark, t2, target_bytes=1 << 20, job_id="cx",
        planner="distributed", planner_shard_rows=8,
    )
    assert res_d.snapshot_id is not None and res_x.snapshot_id is not None
    ids1 = {r["image_id"] for r in scan(spark, t1.refresh()).select("image_id").collect()}
    ids2 = {r["image_id"] for r in scan(spark, t2.refresh()).select("image_id").collect()}
    assert ids1 == ids2 and len(ids1) == 96
    # the distributed plan actually sharded (resume determinism relies on it)
    assert res_x.bins_planned >= 1

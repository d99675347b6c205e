"""Curation pipeline (lakehouse/pipeline.py): phash near-dup detection,
star-dedup loser selection, MoR delete of an explicit key set, and the
resumable detect → delete → purge → compact → cluster composition."""

import pyspark.sql.functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import deletes, jobs
from nessie_spark.lakehouse.pipeline import (
    dedup_pipeline,
    neardup_losers,
    phash_neardup_pairs,
)
from nessie_spark.lakehouse.scan import scan
from tests.conftest import make_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "image_id string, phash long")


def _ids(df):
    return {r.image_id for r in df.select("image_id").collect()}


def test_pairs_find_all_near_dups_within_hamming(spark):
    base = 0x0123456789ABCDEF
    rows = [
        ("a", base),
        ("b", base ^ 0b1),                      # hamming 1
        ("c", base ^ 0b11 << 20),               # hamming 2 vs a
        ("d", base ^ (0b111 << 60)),            # hamming 3, high bits
        ("e", base ^ 0xF),                      # hamming 4 — excluded
        ("f", -(2**63) + 5),                    # far away
    ]
    pairs = phash_neardup_pairs(_df(spark, rows), hamming_max=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[("a", "b")] == 1
    assert got[("a", "c")] == 2
    assert got[("a", "d")] == 3
    assert ("a", "e") not in got
    assert all("f" not in k for k in got)
    # b vs c: 3 differing bits; b vs d: 4 → excluded
    assert got[("b", "c")] == 3
    assert ("b", "d") not in got


def test_exact_cliques_collapse_before_pair_join(spark):
    # 4-member exact clique + one near-dup of the clique value
    rows = [("k0", 7), ("k1", 7), ("k2", 7), ("k3", 7), ("n", 7 ^ 2)]
    pairs = phash_neardup_pairs(_df(spark, rows), hamming_max=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # only the representative (k0) pairs with the near-dup
    assert got == {("k0", "n")}
    losers = _ids(neardup_losers(_df(spark, rows), hamming_max=3))
    assert losers == {"k1", "k2", "k3", "n"}


def test_star_dedup_over_chain(spark):
    # a~b (1 bit), b~c (1 bit), a~c (2 bits): all linked; min id survives
    rows = [("a", 8), ("b", 8 ^ 1), ("c", 8 ^ 1 ^ 4)]
    assert _ids(neardup_losers(_df(spark, rows), hamming_max=3)) == {"b", "c"}
    # chain where the ends are NOT within hamming_max: transitive deletion
    rows = [("a", 0), ("b", 0b11), ("c", 0b1111)]  # a-b:2, b-c:2, a-c:4
    assert _ids(neardup_losers(_df(spark, rows), hamming_max=3)) == {"b", "c"}


def test_delete_keys_records_only_visible_ids(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"))
    keys = spark.createDataFrame(
        [("img_000000000003",), ("img_000000000003",), ("ghost-id",)],
        "image_id string",
    )
    res = deletes.delete_keys(spark, t, keys, job_id="dk1")
    assert res.n_keys == 1
    t = t.refresh()
    assert "img_000000000003" not in _ids(scan(spark, t))
    # rerun with same job id: committed marker short-circuit
    again = deletes.delete_keys(spark, t, keys, job_id="dk1")
    assert again.snapshot_id == res.snapshot_id and again.n_keys == 0
    # on the cleaned table the same key set is no longer visible → no-op
    res2 = deletes.delete_keys(spark, t, keys, job_id="dk2")
    assert res2.snapshot_id is None and res2.n_keys == 0


def _planted_table(spark, root, n=128):
    """Base rows (hot_pct=5 → exact-dup cliques) + 1-bit near-dup copies of
    every 16th non-hot image."""
    t = jobs.create_images_table(root)
    base = synth.images_df(spark, n, seed=42)
    idx = F.substring("image_id", 5, 12).cast("long")
    near = (
        base.withColumn("_i", idx)
        .where((F.col("_i") % 16 == 8))  # %100>=5 for n=128 → never hot
        .select(
            F.concat(F.lit("zdup-"), "image_id").alias("image_id"),
            "bytes", "w", "h", "fmt", "caption",
            F.expr("phash ^ shiftleft(1L, cast(_i % 63 as int))").alias("phash"),
        )
    )
    jobs.append(spark, t, base, job_id="ingest",
                file_boundaries=synth.lognormal_file_boundaries(
                    n, seed=1, mean_rows=24))
    jobs.append(spark, t.refresh(), near, job_id="ingest-dups")
    return t.refresh()


def test_pipeline_end_to_end_and_rerun_idempotent(spark, tmp_path):
    t = _planted_table(spark, str(tmp_path / "tb"))
    before = _ids(scan(spark, t))
    expected_losers = _ids(
        neardup_losers(scan(spark, t, columns=["image_id", "phash"]))
    )
    assert expected_losers, "fixture must plant duplicates"

    res = dedup_pipeline(spark, t, job_id="p1", target_bytes=256 * 1024)
    t = t.refresh()
    assert res.losers == len(expected_losers)
    after = _ids(scan(spark, t))
    assert after == before - expected_losers
    # survivors are near-dup free and no deletes remain pending
    assert neardup_losers(
        scan(spark, t, columns=["image_id", "phash"])
    ).count() == 0
    assert not t.delete_files()
    assert res.delete_snapshot and res.purge_snapshot and res.cluster_snapshot

    # full rerun with the same job id: every stage short-circuits
    head = t.current_snapshot_id
    res2 = dedup_pipeline(spark, t, job_id="p1", target_bytes=256 * 1024)
    t = t.refresh()
    assert t.current_snapshot_id == head
    assert res2.delete_snapshot == res.delete_snapshot
    assert "delete" in res2.stages_skipped


def test_pipeline_resumes_after_partial_run(spark, tmp_path):
    t = _planted_table(spark, str(tmp_path / "tb"))
    losers = neardup_losers(scan(spark, t, columns=["image_id", "phash"]))
    # simulate a crash after the delete stage committed
    pre = deletes.delete_keys(spark, t, losers, job_id="p2-del")
    t = t.refresh()
    res = dedup_pipeline(spark, t, job_id="p2", target_bytes=256 * 1024)
    t = t.refresh()
    assert "delete" in res.stages_skipped
    assert res.delete_snapshot == pre.snapshot_id
    assert res.losers == pre.n_keys  # original count reported, not 0
    assert res.purge_snapshot and res.cluster_snapshot
    assert not t.delete_files()


def test_detect_plan_has_no_cartesian_product(spark):
    """The detect stage must stay a banded equi-join: no CartesianProduct /
    BroadcastNestedLoopJoin and no per-row Python anywhere in the plan."""
    import contextlib
    import io

    rows = [(f"id{i}", i * 37) for i in range(64)]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        neardup_losers(_df(spark, rows)).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_pipeline_on_clean_table_is_layout_only(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=64)
    # make_table uses hot_pct default (5): drop the exact dups first
    r1 = dedup_pipeline(spark, t, job_id="c1", target_bytes=256 * 1024)
    t = t.refresh()
    rows = scan(spark, t).count()
    r2 = dedup_pipeline(spark, t, job_id="c2", target_bytes=256 * 1024)
    t = t.refresh()
    assert r2.losers == 0
    assert r2.delete_snapshot is None and r2.purge_snapshot is None
    assert scan(spark, t).count() == rows
    assert r1.losers > 0  # the planted hot cliques


def test_phash_clusters_transitive_closure(spark):
    """maintenance_phash_clusters groups the planted dup1-/dup2- copies
    with their base image transitively (dup1 vs dup2 can exceed the
    pairwise Hamming cut yet share a cluster via the base), the canonical
    is the min image_id, and sizes are consistent."""
    from nessie_spark.operators.maintenance import maintenance_phash_clusters

    got = maintenance_phash_clusters(spark, "unused").collect()
    assert got, "planted dups must produce clusters"
    by_canon = {}
    for r in got:
        by_canon.setdefault(r.canonical_id, []).append(r)
        assert r.canonical_id <= r.image_id  # min-label canonical
    for canon, members in by_canon.items():
        assert len(members) == members[0].cluster_size >= 2
        # every 32nd base image carries both a dup1- and dup2- copy:
        names = {m.image_id for m in members}
        if any(n.startswith("dup2-") for n in names):
            base = next(n for n in names if n.startswith("dup2-"))[5:]
            assert f"dup1-{base}" in names and base in names

"""Changelog (CDC) scan (lakehouse/changelog.py): per-snapshot insert/delete
streams, carried-row cancellation through CoW merge, full-row recovery for
MoR deletes, rewrite transparency, net-changes collapse, ancestry rules."""

import pyspark.sql.functions as F
import pytest

from nessie_spark import synth
from nessie_spark.lakehouse import compact, deletes, jobs, merge, zorder
from nessie_spark.lakehouse.changelog import scan_changelog
from nessie_spark.lakehouse.scan import scan
from tests.conftest import make_table


def _changes(df):
    return {
        (r.image_id, r._change_type, r._change_snapshot_id)
        for r in df.select("image_id", "_change_type", "_change_snapshot_id").collect()
    }


def test_append_only_changelog_is_all_inserts(spark, tmp_path):
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    batch = synth.images_df(spark, 300, seed=7).where(F.col("image_id") >= "img_000000000256")
    n_new = batch.count()
    snap1 = jobs.append(spark, t, batch, job_id="a1")
    t = t.refresh()
    cl = scan_changelog(spark, t)
    assert cl.where(F.col("_change_type") == "delete").count() == 0
    assert cl.count() == 256 + n_new
    # windowed: only the second append
    cl1 = scan_changelog(spark, t, from_snapshot_id=snap0)
    assert cl1.count() == n_new
    assert {r._change_snapshot_id for r in cl1.select("_change_snapshot_id").collect()} == {snap1}
    # ordinals are chain positions, oldest first
    assert cl.select(F.min("_change_ordinal")).first()[0] == 0


def test_rewrites_emit_no_changes(spark, tmp_path):
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    compact.compact(spark, t, job_id="c1")
    t = t.refresh()
    zorder.cluster(spark, t, job_id="z1")
    t = t.refresh()
    assert scan_changelog(spark, t, from_snapshot_id=snap0).count() == 0


def test_mor_delete_emits_full_deleted_rows(spark, tmp_path):
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    deletes.delete_where(
        spark, t, F.col("image_id") < "img_000000000010", job_id="d1"
    )
    t = t.refresh()
    cl = scan_changelog(spark, t, from_snapshot_id=snap0)
    rows = cl.collect()
    assert len(rows) == 10
    assert all(r._change_type == "delete" for r in rows)
    # full rows, not just keys: the payload columns are populated
    assert all(r.bytes is not None and r.caption is not None for r in rows)


def test_cow_merge_cancels_carried_rows(spark, tmp_path):
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    # update 5 rows' captions + insert 3 brand-new rows
    upd = (
        synth.images_df(spark, 5, seed=42)
        .withColumn("caption", F.concat(F.lit("edited: "), F.col("caption")))
    )
    new = synth.images_df(spark, 259, seed=42).where(
        F.col("image_id") >= "img_000000000256"
    )
    res = merge.merge_into(spark, t, upd.unionByName(new), job_id="m1")
    t = t.refresh()
    cl = scan_changelog(spark, t, from_snapshot_id=snap0)
    got = _changes(cl)
    sid = res.snapshot_id
    upd_ids = {f"img_{i:012d}" for i in range(5)}
    new_ids = {f"img_{i:012d}" for i in range(256, 259)}
    want = (
        {(i, "delete", sid) for i in upd_ids}
        | {(i, "insert", sid) for i in upd_ids}
        | {(i, "insert", sid) for i in new_ids}
    )
    # carried rows (rewritten but unchanged) emit NOTHING
    assert got == want
    ins = {r.image_id: r.caption for r in cl.where("_change_type = 'insert'").collect()}
    assert all(ins[i].startswith("edited: ") for i in upd_ids)


def test_net_changes_collapses_insert_then_delete(spark, tmp_path):
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    batch = synth.images_df(spark, 300, seed=7).where(
        F.col("image_id") >= "img_000000000256"
    )
    jobs.append(spark, t, batch, job_id="a1")
    t = t.refresh()
    deletes.delete_where(
        spark, t, F.col("image_id") >= "img_000000000256", job_id="d1"
    )
    t = t.refresh()
    raw = scan_changelog(spark, t, from_snapshot_id=snap0)
    net = scan_changelog(spark, t, from_snapshot_id=snap0, net_changes=True)
    # raw sees insert+delete per transient row; net sees nothing
    assert raw.count() == 2 * batch.count()
    assert net.count() == 0


def test_net_changes_keeps_final_update_only(spark, tmp_path):
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    for tag in ("one", "two"):
        upd = (
            synth.images_df(spark, 4, seed=42)
            .withColumn("caption", F.concat(F.lit(f"{tag}: "), F.col("caption")))
        )
        merge.merge_into(spark, t, upd, job_id=f"m-{tag}")
        t = t.refresh()
    net = scan_changelog(spark, t, from_snapshot_id=snap0, net_changes=True)
    rows = net.where("image_id = 'img_000000000000'").collect()
    per_key = {(r._change_type, r.caption.split(" ")[0]) for r in rows}
    # one delete of the ORIGINAL row, one insert of the FINAL edit; the
    # intermediate "one:" version cancels out
    assert per_key == {("delete", "a"), ("insert", "two:")}
    assert net.count() == 8


def test_changelog_matches_snapshot_diff(spark, tmp_path):
    """Replaying the changelog over the from-snapshot reproduces the
    to-snapshot row set — the CDC contract."""
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    upd = synth.images_df(spark, 3, seed=42).withColumn("caption", F.lit("x"))
    merge.merge_into(spark, t, upd, job_id="m1")
    t = t.refresh()
    deletes.delete_where(spark, t, F.col("image_id") == "img_000000000100", job_id="d1")
    t = t.refresh()
    net = scan_changelog(spark, t, from_snapshot_id=snap0, net_changes=True)
    before = {r.image_id: r.caption for r in scan(spark, t, snapshot_id=snap0).collect()}
    # within one snapshot, apply deletes before inserts (an update is
    # delete(old)+insert(new) at the same ordinal); 'delete' < 'insert'
    for r in net.orderBy("_change_ordinal", "_change_type").collect():
        if r._change_type == "delete":
            before.pop(r.image_id)
        else:
            before[r.image_id] = r.caption
    after = {r.image_id: r.caption for r in scan(spark, t).collect()}
    assert before == after


def test_changelog_ancestry_rules(spark, tmp_path):
    t, snap0 = make_table(spark, str(tmp_path / "tb"))
    with pytest.raises(ValueError, match="not in table history"):
        scan_changelog(spark, t, from_snapshot_id=999)
    # empty window is fine
    assert scan_changelog(spark, t, from_snapshot_id=snap0).count() == 0


def test_net_changes_preserve_duplicate_multiplicity(spark, tmp_path):
    """The same row appended in two snapshots nets to TWO inserts (a
    consumer counting rows must see the true multiplicity), typed and
    stamped by the last touch."""
    t, _ = make_table(spark, str(tmp_path / "tb"), n=16)
    dup = synth.images_df(spark, 4, seed=42)  # ids img_0..3 again, same bytes
    jobs.append(spark, t, dup, job_id="dup-again")
    t = t.refresh()
    net = scan_changelog(spark, t, net_changes=True)
    counts = {
        r.image_id: r.n
        for r in net.groupBy("image_id").agg(F.count("*").alias("n")).collect()
    }
    for i in range(4):
        assert counts[f"img_{i:012d}"] == 2, counts
    for i in range(4, 16):
        assert counts[f"img_{i:012d}"] == 1
    assert net.where(F.col("_change_type") == "delete").count() == 0


def test_merge_branch_cancels_by_multiplicity(spark, tmp_path):
    """A rewrite that drops ONE of two fully identical rows must emit ONE
    delete — bidirectional existence anti-joins would cancel both copies
    and emit nothing (r3 ADVICE: the docstring's duplicate-multiplicity
    guarantee). Built by hand: append a file holding the same row twice,
    then commit a merge-op snapshot replacing it with a one-copy file."""
    import os

    import pyarrow as pa

    from nessie_spark.lakehouse.table import FILE_ENTRY_SCHEMA
    from nessie_spark.lakehouse.writer import (
        IMAGES_ARROW,
        stats_entry_for,
        write_table_file,
    )

    t, snap0 = make_table(spark, str(tmp_path / "tb"), n=8)
    one = synth.images_df(spark, 1, seed=42)
    snap1 = jobs.append(spark, t, one.unionByName(one), job_id="dup2")
    t = t.refresh()

    dup_paths = {
        p
        for p in t.file_entries(snap1, columns=["file_path"])
        .column("file_path")
        .to_pylist()
        if "dup2" in p
    }
    full = pa.Table.from_pylist(
        [r.asDict() for r in one.collect()], schema=IMAGES_ARROW
    )
    rel = "data/manual-merge-p00000.parquet"
    size = write_table_file(full, os.path.join(t.root, rel))
    entry = stats_entry_for(full, rel, size)
    t.commit(
        "merge",
        added=pa.Table.from_pylist([entry], schema=FILE_ENTRY_SCHEMA),
        deleted_paths=dup_paths,
    )
    t = t.refresh()

    cl = scan_changelog(spark, t, from_snapshot_id=snap1)
    rows = cl.collect()
    assert len(rows) == 1, rows
    assert rows[0]._change_type == "delete"
    assert rows[0].image_id == "img_000000000000"

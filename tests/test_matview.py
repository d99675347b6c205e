"""Incrementally-maintained materialized views (lakehouse/matview.py):
initial build, changelog-driven refresh across appends / MoR deletes /
CoW merges, pure-rewrite no-ops, group disappearance, anchor tagging,
and the rebuild fallback when history is expired mid-window."""

import pandas as pd
import pyspark.sql.functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import compact, deletes, expire, jobs, merge, zorder
from nessie_spark.lakehouse.matview import read_matview, refresh_matview
from nessie_spark.lakehouse.scan import scan
from tests.conftest import make_table


def _recompute(spark, t, group_cols=("fmt",), sums=("w", "h")):
    df = scan(spark, t)
    aggs = [F.count(F.lit(1)).alias("cnt")] + [
        F.sum(F.col(c).cast("long")).alias(f"sum_{c}") for c in sums
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def _rows(df):
    return {
        tuple(r[c] for c in df.columns): None for r in df.collect()
    }.keys()


def _assert_matches(spark, t, view_root):
    got = sorted(map(tuple, read_matview(spark, view_root).collect()))
    want = sorted(map(tuple, _recompute(spark, t).collect()))
    assert got == want


def test_initial_then_incremental_across_dml(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=96)
    vr = str(tmp_path / "view")

    r0 = refresh_matview(spark, t, vr, name="fmtstats")
    assert r0.mode == "initial"
    _assert_matches(spark, t, vr)

    # append (new rows, both fmts)
    extra = synth.images_df(spark, 32, seed=9).withColumn(
        "image_id", F.concat(F.lit("x-"), "image_id")
    )
    jobs.append(spark, t.refresh(), extra, job_id="mv-app")
    t = t.refresh()
    r1 = refresh_matview(spark, t, vr, name="fmtstats")
    assert r1.mode == "incremental" and r1.groups_changed >= 1
    _assert_matches(spark, t, vr)

    # MoR delete + merge update in one window
    deletes.delete_where(spark, t, F.col("image_id") < "img_000000000010",
                         job_id="mv-del")
    t = t.refresh()
    deletes.purge_deletes(spark, t, job_id="mv-purge")
    t = t.refresh()
    rows = []
    for i in range(10, 20):
        r = synth.row_for(42, i)
        r["w"] = r["w"] + 1000  # move the sums
        rows.append(r)
    src = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGES_SCHEMA)
    merge.merge_into(spark, t, src, job_id="mv-merge")
    t = t.refresh()
    r2 = refresh_matview(spark, t, vr, name="fmtstats")
    assert r2.mode == "incremental"
    _assert_matches(spark, t, vr)


def test_pure_rewrites_are_noops(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=64)
    vr = str(tmp_path / "view")
    refresh_matview(spark, t, vr, name="v")
    compact.compact(spark, t, target_bytes=256 * 1024, job_id="mv-c")
    t = t.refresh()
    zorder.cluster(spark, t, target_bytes=256 * 1024, job_id="mv-z")
    t = t.refresh()
    r = refresh_matview(spark, t, vr, name="v")
    assert r.mode == "noop" and r.groups_changed == 0
    _assert_matches(spark, t, vr)
    # and the anchor advanced: a further refresh with no commits is a noop
    assert refresh_matview(spark, t, vr, name="v").mode == "noop"


def test_group_disappears_when_count_reaches_zero(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=64)
    vr = str(tmp_path / "view")
    refresh_matview(spark, t, vr, name="v")
    fmts = {r.fmt for r in read_matview(spark, vr).collect()}
    assert fmts == {"png", "jpeg"}
    deletes.delete_where(spark, t, F.col("fmt") == "jpeg", job_id="mv-dj")
    t = t.refresh()
    r = refresh_matview(spark, t, vr, name="v")
    assert r.mode == "incremental"
    assert {r_.fmt for r_ in read_matview(spark, vr).collect()} == {"png"}
    _assert_matches(spark, t, vr)


def test_anchor_tag_pins_history_and_rebuild_fallback(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "tb"), n=64)
    vr = str(tmp_path / "view")
    refresh_matview(spark, t, vr, name="v")
    t = t.refresh()
    assert "matview:v" in t.refs

    # several commits, then routine expiry: the tagged anchor survives and
    # the incremental window stays reconstructable
    for k in range(2):
        extra = synth.images_df(spark, 8, seed=50 + k).withColumn(
            "image_id", F.concat(F.lit(f"e{k}-"), "image_id")
        )
        jobs.append(spark, t, extra, job_id=f"mv-a{k}")
        t = t.refresh()
    expire.expire_snapshots(spark, t)
    t = t.refresh()
    r = refresh_matview(spark, t, vr, name="v")
    assert r.mode == "incremental"
    _assert_matches(spark, t, vr)

    # force an unreconstructable window: drop the tag, expire hard, append
    t.drop_tag("matview:v")
    t = t.refresh()
    extra = synth.images_df(spark, 8, seed=99).withColumn(
        "image_id", F.concat(F.lit("z-"), "image_id")
    )
    jobs.append(spark, t, extra, job_id="mv-z2")
    t = t.refresh()
    expire.expire_snapshots(spark, t, retain_last=1)
    t = t.refresh()
    r2 = refresh_matview(spark, t, vr, name="v")
    assert r2.mode == "rebuild"
    _assert_matches(spark, t, vr)


def test_schema_change_refused(spark, tmp_path):
    import pytest

    t, _ = make_table(spark, str(tmp_path / "tb"), n=32)
    vr = str(tmp_path / "view")
    refresh_matview(spark, t, vr, name="v", group_cols=["fmt"], sums=["w"])
    with pytest.raises(ValueError, match="cannot change"):
        refresh_matview(spark, t, vr, name="v", group_cols=["fmt"], sums=["h"])


def test_null_group_keys_merge_correctly(spark, tmp_path):
    """A NULL group value is a real group (pre-evolution rows of an added
    column): the incremental merge must match it null-safely — one NULL
    row in the view, never two, and delete-only NULL deltas must land."""
    from nessie_spark.lakehouse import evolve

    t, _ = make_table(spark, str(tmp_path / "tb"), n=48)
    evolve.add_column(t, "quality", "long")
    t = t.refresh()
    vr = str(tmp_path / "view")
    refresh_matview(spark, t, vr, name="v", group_cols=["quality"], sums=["w"])

    # delta touching BOTH the NULL group (more pre-style rows) and a
    # non-null group
    batch = (
        synth.images_df(spark, 16, seed=3)
        .withColumn("image_id", F.concat(F.lit("n-"), "image_id"))
        .withColumn(
            "quality",
            F.when(F.col("w") % 2 == 0, F.lit(7)).cast("long"),
        )
    )
    jobs.append(spark, t, batch, job_id="nv-app")
    t = t.refresh()
    r = refresh_matview(spark, t, vr, name="v")
    assert r.mode == "incremental"
    view = read_matview(spark, vr).collect()
    null_rows = [x for x in view if x.quality is None]
    assert len(null_rows) == 1, view

    def _recount():
        return sorted(
            map(
                tuple,
                scan(spark, t)
                .groupBy("quality")
                .agg(F.count(F.lit(1)).alias("cnt"),
                     F.sum(F.col("w").cast("long")).alias("sum_w"))
                .collect(),
            ),
            key=str,
        )

    assert sorted(map(tuple, view), key=str) == _recount()

    # delete-only delta against the NULL group
    deletes.delete_where(
        spark, t, F.col("quality").isNull() & (F.col("image_id") < "img_000000000024"),
        job_id="nv-del",
    )
    t = t.refresh()
    r2 = refresh_matview(spark, t, vr, name="v")
    assert r2.mode == "incremental"
    assert sorted(map(tuple, read_matview(spark, vr).collect()), key=str) == _recount()

"""CDC-driven near-ingest dedup: delta rows checked against the pre-delta
snapshot's key index — and rewrite-only maintenance between the snapshots
must not re-flag old rows."""

from pyspark.sql import functions as F

from nessie_spark import synth
from nessie_spark.lakehouse import compact, jobs
from nessie_spark.lakehouse.consumer import incremental_dedup_report
from tests.conftest import make_table


def test_incremental_dedup_flags_only_new_duplicates(spark, tmp_path):
    root = str(tmp_path / "images")
    t, s1 = make_table(spark, root, n=64, mean_rows=12)
    # rewrite-only maintenance in between: contributes nothing to the delta
    compact.compact(spark, t, target_bytes=1 << 20, job_id="c")
    t = t.refresh()

    # delta: 8 fresh rows (hot_pct=0 — the synth hot-phash planting would
    # add its own cross-batch duplicates), 3 copies of NON-hot base rows
    # (base ids 0-4 carry planted hot phashes), plus one intra-delta twin
    fresh = synth.images_df(spark, 8, seed=77, hot_pct=0).withColumn(
        "image_id", F.concat(F.lit("new-"), "image_id")
    )
    dup_of_base = (
        synth.images_df(spark, 64, seed=42)
        .where(F.col("image_id").isin("img_000000000007", "img_000000000011", "img_000000000013"))
        .withColumn("image_id", F.concat(F.lit("copy-"), "image_id"))
    )
    twin = fresh.limit(1).withColumn("image_id", F.concat(F.lit("twin-"), "image_id"))
    jobs.append(spark, t, fresh.unionByName(dup_of_base).unionByName(twin), job_id="delta")
    t = t.refresh()

    rep = incremental_dedup_report(spark, t, from_snapshot_id=s1).collect()
    by_id = {r["image_id"]: r for r in rep}

    # expected sets computed FROM the data (tiny 32px synth images can
    # collide on phash naturally, so hardcoded ids would be brittle)
    from collections import Counter

    from nessie_spark.lakehouse.scan import scan, scan_incremental

    base_ph = {
        r["phash"] for r in scan(spark, t, snapshot_id=s1, columns=["phash"]).collect()
    }
    delta_rows = scan_incremental(spark, t, from_snapshot_id=s1).select(
        "image_id", "phash"
    ).collect()
    ph_counts = Counter(r["phash"] for r in delta_rows)
    exp_base = {r["image_id"] for r in delta_rows if r["phash"] in base_ph}
    exp_delta = {r["image_id"] for r in delta_rows if ph_counts[r["phash"]] > 1}

    assert {r["image_id"] for r in rep if r["base_dup"]} == exp_base
    assert {r["image_id"] for r in rep if r["delta_dup"]} == exp_delta
    # the planted cases are inside those sets
    assert {f"copy-img_{i:012d}" for i in (7, 11, 13)} <= exp_base
    assert {"new-img_000000000000", "twin-new-img_000000000000"} <= exp_delta
    # only flagged delta rows are reported — old rows never re-reported
    # despite the compact rewrite in between
    assert set(by_id) == exp_base | exp_delta


def test_incremental_dedup_from_history_start_and_pk_key(spark, tmp_path):
    root = str(tmp_path / "images")
    t, s1 = make_table(spark, root, n=32, mean_rows=12)
    dup = (
        synth.images_df(spark, 32, seed=42)
        .where(F.col("image_id") == "img_000000000007")
        .withColumn("image_id", F.concat(F.lit("copy-"), "image_id"))
    )
    jobs.append(spark, t, dup, job_id="d")
    t = t.refresh()
    # from the beginning of history: base is empty, everything is delta;
    # the original and its copy form an intra-delta pair
    rep0 = incremental_dedup_report(spark, t, from_snapshot_id=0).collect()
    flagged = {r["image_id"] for r in rep0}
    assert {"img_000000000007", "copy-img_000000000007"} <= flagged
    assert all(not r["base_dup"] for r in rep0)
    # primary-key variant must not hit ambiguous-column joins
    rep_pk = incremental_dedup_report(
        spark, t, from_snapshot_id=s1, key="image_id"
    ).collect()
    assert rep_pk == []  # image_ids are unique by construction

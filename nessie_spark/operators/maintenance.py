"""Maintenance-job demo queries: the lakehouse engine surfaced through the
driver's gate.

Each demo builds a deterministic synthetic image+caption table in a fresh
temp dir, runs a real maintenance job (compaction / Z-order / MERGE /
expiry), verifies invariants with the grafted flaggers, and returns a small
summary DataFrame whose values are deterministic (seeded generator; FFD and
merge counts are pure functions of the layout). Non-SQL-expressible →
rows-only checks (no oracle), as the contract allows.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark import synth
from nessie_spark.lakehouse import compact as C
from nessie_spark.lakehouse import expire as E
from nessie_spark.lakehouse import jobs, merge, verify, zorder
from nessie_spark.lakehouse.scan import scan

N = 256
TARGET = 256 * 1024


def _fresh_table(spark: SparkSession):
    root = tempfile.mkdtemp(prefix="nessie-demo-") + "/images"
    t = jobs.create_images_table(root)
    df = synth.images_df(spark, N, seed=42)
    bounds = synth.lognormal_file_boundaries(N, seed=42, mean_rows=24)
    snap = jobs.append(spark, t, df, job_id="ingest", file_boundaries=bounds)
    return t.refresh(), snap, root


def maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, snap0, root = _fresh_table(spark)
    try:
        res = C.compact(spark, t, target_bytes=TARGET, job_id="demo-compact")
        t = t.refresh()
        rows_after = scan(spark, t).count()
        diff = verify.snapshot_rowset_diff(spark, t, snap0, t.current_snapshot_id).count()
        return spark.createDataFrame(
            [
                (
                    res.input_files,
                    res.output_files,
                    res.bins_planned,
                    rows_after,
                    diff == 0,
                )
            ],
            "input_small_files int, output_files int, bins int, rows long, rowset_preserved boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, snap0, root = _fresh_table(spark)
    try:
        res = zorder.cluster(spark, t, strategy="morton", target_bytes=TARGET, job_id="demo-z")
        t = t.refresh()
        entries = sorted(t.file_entries().to_pylist(), key=lambda e: e["zorder_lo"])
        disjoint = all(
            a["zorder_hi"] <= b["zorder_lo"] for a, b in zip(entries, entries[1:])
        )
        rows_after = scan(spark, t).count()
        diff = verify.snapshot_rowset_diff(spark, t, snap0, t.current_snapshot_id).count()
        return spark.createDataFrame(
            [(res.rows, rows_after, disjoint, diff == 0)],
            "rows long, rows_after long, zranges_disjoint boolean, rowset_preserved boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_cluster_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minor (incremental) clustering (zorder.cluster_incremental): after a
    full cluster + an append, only the appended delta is rewritten — the
    clustered base carries forward untouched (cost ∝ delta, the 10^12-image
    maintenance loop), the new run is internally disjoint in zkey, and the
    row set is preserved. Deterministic counts from the seeded layout."""
    t, _, root = _fresh_table(spark)
    try:
        zorder.cluster(spark, t, strategy="morton", target_bytes=TARGET, job_id="demo-zfull")
        t = t.refresh()
        base_paths = {e["file_path"] for e in t.file_entries().to_pylist()}
        delta_df = synth.images_df(spark, 96, seed=7)
        jobs.append(spark, t, delta_df, job_id="demo-zd-append",
                    file_boundaries=synth.lognormal_file_boundaries(96, seed=7, mean_rows=16))
        t = t.refresh()
        snap1 = t.current_snapshot_id
        n_delta = sum(
            1 for e in t.file_entries(columns=["file_path", "zorder_lo"]).to_pylist()
            if e["zorder_lo"] is None
        )
        res = zorder.cluster_incremental(
            spark, t, target_bytes=TARGET, job_id="demo-zdelta"
        )
        t = t.refresh()
        after = t.file_entries(
            columns=["file_path", "zorder_lo", "zorder_hi"]
        ).to_pylist()
        base_kept = base_paths <= {e["file_path"] for e in after}
        run = sorted(
            (e for e in after if e["file_path"] not in base_paths),
            key=lambda e: e["zorder_lo"],
        )
        run_disjoint = all(
            a["zorder_hi"] <= b["zorder_lo"] for a, b in zip(run, run[1:])
        )
        diff = verify.snapshot_rowset_diff(spark, t, snap1, t.current_snapshot_id).count()
        return spark.createDataFrame(
            [
                (
                    res.input_files,
                    n_delta,
                    res.input_files == n_delta,
                    base_kept,
                    run_disjoint,
                    all(e["zorder_lo"] is not None for e in after),
                    diff == 0,
                )
            ],
            "delta_inputs int, unclustered_before int, cost_is_delta_only boolean, "
            "base_untouched boolean, run_disjoint boolean, all_clustered boolean, "
            "rowset_preserved boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t, _, root = _fresh_table(spark)
    try:
        rows = []
        for i in range(0, N, 10):
            r = synth.row_for(42, i)
            r["caption"] = r["caption"] + " (edited)"
            rows.append(r)
        for i in range(N, N + 8):
            rows.append(synth.row_for(42, i))
        src = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGES_SCHEMA)
        res = merge.merge_into(spark, t, src, job_id="demo-merge")
        t = t.refresh()
        edited = (
            scan(spark, t).where(F.col("caption").endswith("(edited)")).count()
        )
        return spark.createDataFrame(
            [(res.updated, res.unchanged, res.inserted, edited, scan(spark, t).count())],
            "updated long, unchanged long, inserted long, edited_visible long, rows long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (CDC-style) append scan + exactly-once streaming ingest:
    append A → compact (pure rewrite, contributes nothing) → ingest batch B
    twice with the same batch_id (replay; second is a metadata no-op) →
    the incremental scan from the first snapshot returns exactly B."""
    from nessie_spark.lakehouse.scan import scan_incremental
    from nessie_spark.streaming.ingest import ingest_batch

    t, snap0, root = _fresh_table(spark)
    try:
        C.compact(spark, t, target_bytes=TARGET, job_id="demo-c")
        t = t.refresh()
        delta = synth.images_df(spark, 32, seed=7).withColumn(
            "image_id", F.concat(F.lit("d-"), "image_id")
        )
        s_first = ingest_batch(root, "demo-stream", delta, batch_id=0)
        s_replay = ingest_batch(root, "demo-stream", delta, batch_id=0)
        t = t.refresh()
        inc = scan_incremental(spark, t, from_snapshot_id=snap0)
        n_delta = inc.count()
        only_delta = inc.where(~F.col("image_id").startswith("d-")).count() == 0
        full = scan_incremental(spark, t).count()
        return spark.createDataFrame(
            [(n_delta, only_delta, s_first == s_replay, full, scan(spark, t).count())],
            "delta_rows long, delta_is_new_only boolean, replay_noop boolean, "
            "full_history_rows long, table_rows long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-column evolution demo: evolve (metadata-only) → append rows
    carrying the new column → compact across the mixed-schema file set →
    the evolved values survive the rewrite and old rows read as NULL;
    a pre-evolution snapshot still reads with its own (old) schema."""
    from nessie_spark.lakehouse import evolve

    t, snap0, root = _fresh_table(spark)
    try:
        evolve.add_column(t, "quality", "long")
        t = t.refresh()
        extra = (
            synth.images_df(spark, 32, seed=9)
            .withColumn("image_id", F.concat(F.lit("q-"), "image_id"))
            .withColumn("quality", F.length("caption").cast("long"))
        )
        jobs.append(spark, t, extra, job_id="evo-append")
        t = t.refresh()
        C.compact(spark, t, target_bytes=TARGET, job_id="evo-compact")
        t = t.refresh()
        df = scan(spark, t)
        n_quality = df.where(F.col("quality").isNotNull()).count()
        sum_quality = df.agg(F.sum("quality")).collect()[0][0]
        old_schema_cols = len(scan(spark, t, snapshot_id=snap0).columns)
        return spark.createDataFrame(
            [
                (
                    df.count(),
                    n_quality,
                    int(sum_quality),
                    len(df.columns),
                    old_schema_cols,
                )
            ],
            "rows long, rows_with_quality long, sum_quality long, "
            "cols_now int, cols_at_snap1 int",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename/drop schema evolution through the field-id model (lakehouse/
    fields.py — Iceberg spec §Schemas): rename caption → description
    (metadata-only; old files project onto the new name BY FIELD ID, so
    no caption is lost), append under the new name, compact the
    mixed-version file set (the rewrite NORMALIZES old files to current
    names — remap debt drops to zero), then drop + re-add the column and
    prove the retired field id's data never resurrects. Pre-rename
    snapshots still read under their own (old) column names."""
    from nessie_spark.lakehouse import evolve
    from nessie_spark.lakehouse.fields import live_projection_maps

    t, snap0, root = _fresh_table(spark)
    try:
        evolve.rename_column(t, "caption", "description")
        t = t.refresh()
        n_remap_before = len(live_projection_maps(t))
        extra = (
            synth.images_df(spark, 32, seed=9)
            .withColumnRenamed("caption", "description")
            .withColumn("image_id", F.concat(F.lit("r-"), "image_id"))
        )
        jobs.append(spark, t, extra, job_id="rn-append")
        t = t.refresh()
        renamed_nonnull = (
            scan(spark, t).where(F.col("description").isNotNull()).count()
        )
        C.compact(spark, t, target_bytes=TARGET, job_id="rn-compact")
        t = t.refresh()
        n_remap_after = len(live_projection_maps(t))
        old_has_caption = "caption" in scan(spark, t, snapshot_id=snap0).columns
        evolve.drop_column(t, "description")
        t = t.refresh()
        evolve.add_column(t, "description", "string")
        t = t.refresh()
        resurrected = (
            scan(spark, t).where(F.col("description").isNotNull()).count()
        )
        return spark.createDataFrame(
            [
                (
                    renamed_nonnull,
                    n_remap_before,
                    n_remap_after,
                    bool(old_has_caption),
                    resurrected,
                )
            ],
            "rows_nonnull_after_rename long, files_needing_remap long, "
            "files_needing_remap_after_compact long, "
            "old_snapshot_reads_old_name boolean, resurrected_rows long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs on the perceptual hash: Hamming(phash_a,
    phash_b) ≤ 3. Pigeonhole banding — split the 64-bit phash into 4
    disjoint 16-bit bands; any pair within Hamming ≤ 3 agrees exactly on
    ≥ 1 band — so candidates come from 4 equi-joins on (band, value) and
    only candidates pay the exact popcount check. Scale: the single
    shuffle is the band-key join at 4× table rows; no crossJoin, no
    per-row Python (phash XOR + bit_count are codegen). Same shape as
    dedup_simhash_pairs, applied to the image axis.

    Input: the deterministic synth table with planted 1- and 2-bit
    perturbed copies of every 16th image (hot_pct=0 so exact-dup cliques
    don't swamp the pair list)."""
    base = synth.images_df(spark, N, seed=42, hot_pct=0).select("image_id", "phash")
    with_idx = base.withColumn("_i", F.substring("image_id", 5, 12).cast("long"))
    dup1 = (
        with_idx.where(F.col("_i") % 16 == 0)
        .select(
            F.concat(F.lit("dup1-"), "image_id").alias("image_id"),
            F.expr("phash ^ shiftleft(1L, cast(_i % 63 as int))").alias("phash"),
        )
    )
    dup2 = (
        with_idx.where(F.col("_i") % 32 == 0)
        .select(
            F.concat(F.lit("dup2-"), "image_id").alias("image_id"),
            F.expr(
                "phash ^ shiftleft(1L, cast(_i % 63 as int))"
                " ^ shiftleft(1L, cast((_i + 31) % 63 as int))"
            ).alias("phash"),
        )
    )
    imgs = base.unionByName(dup1).unionByName(dup2)
    bands = imgs.select(
        "image_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("phash", 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for b in range(4)
            ])
        ).alias("bv"),
    ).select("image_id", "phash", "bv.band", "bv.val")
    a, b2 = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b2, ["band", "val"])
        .where(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("id_a"),
            F.col("b.image_id").alias("id_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .groupBy("id_a", "id_b")  # a pair may match in several bands
        .agg(F.min("hamming").alias("hamming"))
        .orderBy("id_a", "id_b")
    )
    return pairs


def maintenance_expire_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    t, _, root = _fresh_table(spark)
    try:
        C.compact(spark, t, target_bytes=TARGET, job_id="demo-c")
        t = t.refresh()
        head = t.current_snapshot_id
        # plant orphans
        for i in range(3):
            with open(os.path.join(t.root, "data", f"orphan-{i}.parquet"), "wb") as fh:
                fh.write(b"junk")
        orphans = E.gc_orphans(spark, t, dry_run=False)
        rep = E.expire_snapshots(spark, t, keep_heads=[head], dry_run=False)
        t = t.refresh()
        return spark.createDataFrame(
            [
                (
                    len(orphans),
                    len(rep.retained_snapshots),
                    len(rep.expired_snapshots),
                    scan(spark, t).count(),
                )
            ],
            "orphans_deleted int, retained int, expired int, rows long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified data-skipping: the same (phash-range × wh-range) stats
    query before and after Z-order clustering. Before: the ingest layout
    spreads every phash range across ~all small files, so min/max stats
    prune almost nothing. After: Morton clustering makes per-file phash/wh
    intervals narrow, so manifest-level pruning (scan.plan_files) touches a
    small fraction of files — the mechanism that turns a 10^12-image scan
    into a few file reads. Row sets must match exactly across layouts."""
    from nessie_spark.lakehouse.scan import plan_files

    t, _, root = _fresh_table(spark)
    try:
        # an eighth of phash space × the middle of the area distribution
        pr = (0, (1 << 61) - 1)
        whr = (32 * 32, 80 * 80)
        files_before = len(t.file_entries().to_pylist())
        hit_before = len(plan_files(t, phash_range=pr, wh_range=whr))
        ids_before = {
            r.image_id
            for r in scan(spark, t, phash_range=pr, wh_range=whr).select("image_id").collect()
        }

        zorder.cluster(spark, t, strategy="morton", target_bytes=TARGET, job_id="demo-skip")
        t = t.refresh()
        files_after = len(t.file_entries().to_pylist())
        hit_after = len(plan_files(t, phash_range=pr, wh_range=whr))
        ids_after = {
            r.image_id
            for r in scan(spark, t, phash_range=pr, wh_range=whr).select("image_id").collect()
        }
        return spark.createDataFrame(
            [
                (
                    files_before,
                    hit_before,
                    files_after,
                    hit_after,
                    hit_before / files_before > hit_after / files_after,
                    ids_before == ids_after,
                    len(ids_after),
                )
            ],
            "files_before int, files_hit_before int, files_after int, files_hit_after int, "
            "skipping_improved boolean, rowset_identical boolean, matched_rows int",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden partitioning end-to-end (lakehouse/partition.py): create a
    table with an identity(fmt) spec, append (files split per value),
    compact + cluster (both must keep files partition-pure), and quantify
    tier-0 pruning: a fmt-pinned plan must touch only that value's files
    while the row set matches a full-scan filter exactly."""
    import collections

    from nessie_spark.lakehouse.scan import plan_files

    root = tempfile.mkdtemp(prefix="nessie-demo-") + "/images"
    t = jobs.create_images_table(
        root,
        properties={"partition-spec": [{"source": "fmt", "transform": "identity"}]},
    )
    try:
        df = synth.images_df(spark, N, seed=42)
        jobs.append(spark, t, df, job_id="ingest")
        t = t.refresh()
        C.compact(spark, t, target_bytes=TARGET, job_id="demo-pp-compact")
        t = t.refresh()
        zorder.cluster(spark, t, target_bytes=TARGET, job_id="demo-pp-cluster")
        t = t.refresh()
        ents = t.file_entries(columns=["file_path", "partition"]).to_pylist()
        vals = collections.Counter(e["partition"] for e in ents)
        pruned = plan_files(t, source_eq={"fmt": "png"}, spark=spark)
        ids_pruned = {
            r.image_id
            for r in scan(spark, t, source_eq={"fmt": "png"}).select("image_id").collect()
        }
        ids_full = {
            r.image_id
            for r in scan(spark, t).where("fmt = 'png'").select("image_id").collect()
        }
        return spark.createDataFrame(
            [
                (
                    len(ents),
                    len(vals),
                    len(pruned),
                    all(e["partition"] == "fmt=png" for e in pruned),
                    len(pruned) < len(ents),
                    ids_pruned == ids_full,
                    len(ids_pruned),
                )
            ],
            "files int, partition_values int, files_hit int, hits_all_png boolean, "
            "pruned_some boolean, rowset_identical boolean, matched_rows int",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_metadata_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata version-log retention (lakehouse/table.py,
    expire.py — Iceberg ``write.metadata.previous-versions-max``): commits
    append ``metadata/v{N}.json`` forever; the retention pass truncates
    the log while every read path (scan, snapshot time travel, the
    version-hint O(1) load) keeps working, because reads resolve from
    CURRENT metadata only. Also exercises the stale-hint fallback: a hint
    pointing at a deleted version self-heals via the directory listing.
    All counts derive from the seeded layout → deterministic rows-only
    check."""
    import os as _os

    from nessie_spark.lakehouse.table import Table

    root = tempfile.mkdtemp(prefix="nessie-demo-") + "/images"
    t = jobs.create_images_table(
        root, properties={"write.metadata.previous-versions-max": 2}
    )
    try:
        for i in range(5):
            df = synth.images_df(spark, 16, seed=i + 1).withColumn(
                "image_id", F.concat(F.lit(f"b{i}-"), F.col("image_id"))
            )
            jobs.append(spark, t.refresh(), df, job_id=f"mr-a{i}")
        t = t.refresh()
        mdir = _os.path.join(root, "metadata")

        def _nvers() -> int:
            return len(
                [f for f in _os.listdir(mdir)
                 if f.startswith("v") and f.endswith(".json")]
            )

        versions_before = _nvers()
        mid_snapshot_rows = scan(spark, t, snapshot_id=3).count()
        from nessie_spark.lakehouse import expire as X

        X.expire_snapshots(spark, t)  # property-driven truncation rides expiry
        t = t.refresh()
        versions_after = _nvers()
        rows_after = scan(spark, t).count()
        travel_after = scan(spark, t, snapshot_id=3).count()
        # stale hint (names a deleted version) must fall back cleanly
        with open(_os.path.join(mdir, "version-hint.text"), "w") as fh:
            fh.write("1")
        stale_hint_loads = Table.load(root).version == t.version
        return spark.createDataFrame(
            [
                (
                    versions_before,
                    versions_after,
                    versions_after < versions_before,
                    int(rows_after),
                    int(mid_snapshot_rows),
                    travel_after == mid_snapshot_rows,
                    stale_hint_loads,
                )
            ],
            "versions_before int, versions_after int, truncated boolean, "
            "rows_after long, mid_snapshot_rows long, "
            "time_travel_intact boolean, stale_hint_loads boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot rollback + metadata tables end-to-end: append (s1) →
    compact (s2) → a second append (s3) → ``rollback(2)`` → the current
    scan equals snapshot-2's row set, the next commit takes a FRESH id (4,
    never reusing abandoned 3), and ``expire_snapshots`` reclaims the
    abandoned branch's unique files. The $snapshots/$history metadata
    tables report the lineage — history keeps the rollback event and marks
    snapshot 3 off the current ancestry. All counts derive from the seeded
    layout → deterministic rows-only check."""
    t, _, root = _fresh_table(spark)
    try:
        C.compact(spark, t, target_bytes=TARGET, job_id="demo-rb-compact")
        t = t.refresh()
        s2 = t.current_snapshot_id
        extra = synth.images_df(spark, 64, seed=99).withColumn(
            "image_id", F.concat(F.lit("extra-"), F.col("image_id"))
        )
        jobs.append(spark, t, extra, job_id="demo-rb-extra")
        t = t.refresh()
        s3 = t.current_snapshot_id

        t.rollback(s2)
        rows_now = scan(spark, t).count()
        rowset_restored = (
            verify.snapshot_rowset_diff(spark, t, s2, t.current_snapshot_id).count() == 0
        )
        abandoned_off_ancestry = (
            t.history_df(spark)
            .where((F.col("snapshot_id") == s3) & F.col("is_current_ancestor"))
            .count()
            == 0
        )
        # next commit must branch from s2 with a fresh id, not reuse 3
        jobs.append(
            spark,
            t,
            synth.images_df(spark, 16, seed=7).withColumn(
                "image_id", F.concat(F.lit("post-"), F.col("image_id"))
            ),
            job_id="demo-rb-post",
        )
        t = t.refresh()
        s4 = t.current_snapshot_id
        rep = E.expire_snapshots(spark, t)  # drops abandoned s3 + its files
        t = t.refresh()
        return spark.createDataFrame(
            [
                (
                    rows_now,
                    rowset_restored,
                    abandoned_off_ancestry,
                    s4 > s3,
                    s3 in rep.expired_snapshots,
                    len(rep.deleted_data_files) > 0,
                    scan(spark, t).count(),
                )
            ],
            "rows_after_rollback long, rowset_restored boolean, "
            "abandoned_off_ancestry boolean, fresh_id_after_rollback boolean, "
            "abandoned_expired boolean, abandoned_files_reclaimed boolean, rows_final long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline demo: binary image column → batched decode →
    per-image features (brightness, contrast, digest), all inside a
    mapInPandas over Arrow batches (input_hint: no per-row Python UDFs).
    The decode step uses the engine's real codecs (kernels.py); with
    image libs absent in this container, 'jpeg' is the documented
    deterministic stand-in codec."""
    from collections.abc import Iterator

    import pandas as pd

    from nessie_spark.lakehouse import kernels as K

    df = synth.images_df(spark, 128, seed=7)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = K.decode(bytes(data), fmt)
                out.append(
                    (
                        iid,
                        fmt,
                        round(float(px.mean()), 4),
                        round(float(px.std()), 4),
                        K.pixel_digest(px)[:16],
                    )
                )
            yield pd.DataFrame(
                out, columns=["image_id", "fmt", "brightness", "contrast", "digest16"]
            )

    return df.mapInPandas(
        feats,
        "image_id string, fmt string, brightness double, contrast double, digest16 string",
    ).orderBy("image_id")


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize op (task brief §multimodal): binary image column →
    batched decode → block-mean resize to 16×16 → re-encode PNG, all inside
    one mapInPandas pass. Output digests are deterministic (seeded synth +
    exact integer resize), so the rows-only check is stable across runs."""
    from collections.abc import Iterator

    import pandas as pd

    from nessie_spark.lakehouse import kernels as K

    df = synth.images_df(spark, 128, seed=7)

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = K.decode(bytes(data), fmt)
                small = K.resize_block_mean(px, 16, 16)
                enc = K.encode_png(small)
                out.append((iid, px.shape[1], px.shape[0], 16, 16,
                            len(enc), K.pixel_digest(small)[:16]))
            yield pd.DataFrame(
                out,
                columns=["image_id", "in_w", "in_h", "out_w", "out_h",
                         "out_bytes", "digest16"],
            )

    return df.mapInPandas(
        rz,
        "image_id string, in_w int, in_h int, out_w int, out_h int, "
        "out_bytes int, digest16 string",
    ).orderBy("image_id")


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling over REAL MJPEG bytes (task brief §multimodal):
    each video is a genuine MJPEG stream — concatenated baseline JFIF
    frames from the from-scratch T.81 codec (lakehouse/jpegcodec.py) —
    and sampling every 3rd frame is a real marker walk + JPEG decode
    (kernels.decode_video_frames FFD8 path). Inter-frame codecs (H.26x…)
    remain NotImplementedError-gated; per-frame digests via mapInPandas."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from nessie_spark.lakehouse import kernels as K
    from nessie_spark.lakehouse.jpegcodec import encode_mjpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid in pdf["id"]:
                rng = np.random.default_rng(int(vid) + 1000)
                n_frames = 4 + int(vid) % 5
                frames = [
                    rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
                    for _ in range(n_frames)
                ]
                out.append((f"vid-{int(vid):05d}", encode_mjpeg(frames), n_frames))
            yield pd.DataFrame(out, columns=["video_id", "data", "n_frames"])

    vids = spark.range(0, 64, 1, 8).mapInPandas(
        gen, "video_id string, data binary, n_frames int"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid, data, n in zip(pdf["video_id"], pdf["data"], pdf["n_frames"]):
                frames = K.decode_video_frames(bytes(data), every_k=3)
                # digests is a comma-joined scalar (not array<string>): the
                # driver's canonicalizer sorts/hashes every column and cannot
                # factorize list values.
                out.append(
                    (vid, int(n), len(frames),
                     ",".join(K.pixel_digest(f)[:12] for f in frames))
                )
            yield pd.DataFrame(
                out, columns=["video_id", "n_frames", "n_sampled", "digests"]
            )

    return vids.mapInPandas(
        sample,
        "video_id string, n_frames int, n_sampled int, digests string",
    ).orderBy("video_id")


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio features over REAL WAV bytes (task brief §multimodal): each
    id becomes a genuine RIFF/WAVE PCM16 file (kernels.encode_wav), the
    feature pass re-parses the container with the real RIFF chunk walk
    (kernels.decode_wav — compressed formats NotImplementedError-gated)
    and computes RMS + zero-crossings from the decoded samples. Two
    mapInPandas stages: synth→bytes, bytes→features."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from nessie_spark.lakehouse import kernels as K

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid in pdf["id"]:
                t = np.arange(4000, dtype=np.float64)
                freq = 0.01 + (int(aid) % 17) * 0.003
                amp = 0.2 + (int(aid) % 5) * 0.15
                pcm = np.round(
                    np.sin(2 * np.pi * freq * t) * amp * 32767.0
                ).astype(np.int16)
                out.append((f"aud-{int(aid):05d}", K.encode_wav(pcm, 16000)))
            yield pd.DataFrame(out, columns=["audio_id", "data"])

    wavs = spark.range(0, 64, 1, 8).mapInPandas(gen, "audio_id string, data binary")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["audio_id"], pdf["data"]):
                pcm, rate = K.decode_wav(bytes(data))
                rms, zc = K.audio_features(pcm.astype(np.float32) / 32768.0)
                out.append((aid, int(rate), len(pcm), round(rms, 6), zc))
            yield pd.DataFrame(
                out,
                columns=["audio_id", "sample_rate", "n_samples", "rms",
                         "zero_crossings"],
            )

    return (
        wavs.mapInPandas(
            feats,
            "audio_id string, sample_rate int, n_samples int, rms double, "
            "zero_crossings int",
        )
        .orderBy("audio_id")
    )


def maintenance_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read equality-delete lifecycle (lakehouse/deletes.py):
    ``delete_where`` commits key files only (no data file rewritten — the
    write-cheap half), the scan subtracts the keys at read time, pinned
    pre-delete snapshots are untouched, copy-on-write rewrites REFUSE while
    deletes are pending, and ``purge_deletes`` folds the keys into a
    stats-pruned CoW rewrite after which compaction runs again. All counts
    derive from the seeded layout → deterministic rows-only check."""
    from nessie_spark.lakehouse import deletes as D

    t, snap0, root = _fresh_table(spark)
    try:
        files_before = {e["file_path"] for e in t.file_entries().to_pylist()}
        res = D.delete_where(
            spark, t, F.col("image_id") < "img_000000000032", job_id="demo-del"
        )
        t = t.refresh()
        metadata_only = (
            {e["file_path"] for e in t.file_entries().to_pylist()} == files_before
        )
        rows_mor = scan(spark, t).count()
        pinned_intact = scan(spark, t, snapshot_id=snap0).count() == N
        try:
            C.compact(spark, t, target_bytes=TARGET, job_id="demo-del-guard")
            guard_held = False
        except ValueError:
            guard_held = True
        purge = D.purge_deletes(spark, t, job_id="demo-purge")
        t = t.refresh()
        rows_after = scan(spark, t).count()
        c = C.compact(spark, t, target_bytes=TARGET, job_id="demo-del-compact")
        return spark.createDataFrame(
            [
                (
                    res.n_keys,
                    res.n_delete_files,
                    metadata_only,
                    rows_mor,
                    pinned_intact,
                    guard_held,
                    purge.rewritten_files,
                    rows_after == rows_mor and not t.delete_files(),
                    c.snapshot_id is not None,
                )
            ],
            "deleted_keys long, delete_files int, delete_metadata_only boolean, "
            "rows_after_delete long, pinned_snapshot_intact boolean, "
            "rewrite_guard_held boolean, purge_rewritten_files int, "
            "purge_preserves_rowset boolean, compact_unblocked boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_pos_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read POSITIONAL-delete lifecycle (lakehouse/deletes.py):
    ``delete_positions_where`` records (data file, row position) pairs from
    the parquet reader's row_index — no data file touched — the scan
    anti-joins the addresses at read time, a duplicate key loses ONLY the
    addressed copy (the capability equality deletes lack), a re-inserted
    key stays visible (pos deletes self-scope by file path), and
    ``purge_deletes`` folds the positions into a CoW rewrite of exactly
    the named files. All counts derive from the seeded layout →
    deterministic rows-only check."""
    from nessie_spark.lakehouse import deletes as D

    t, snap0, root = _fresh_table(spark)
    try:
        # plant a duplicate key with a distinguishable caption
        dup = synth.images_df(spark, 4, seed=42).where(
            F.col("image_id") == "img_000000000003"
        ).withColumn("caption", F.lit("dup-copy"))
        jobs.append(spark, t, dup, job_id="demo-pos-dup")
        t = t.refresh()
        files_before = {e["file_path"] for e in t.file_entries().to_pylist()}
        res = D.delete_positions_where(
            spark,
            t,
            (F.col("image_id") < "img_000000000032")
            & (F.col("caption") != "dup-copy"),
            job_id="demo-posdel",
        )
        t = t.refresh()
        metadata_only = (
            {e["file_path"] for e in t.file_entries().to_pylist()} == files_before
        )
        rows_mor = scan(spark, t).count()
        # the duplicate key: original copy addressed + deleted, dup survives
        left = scan(spark, t).where(F.col("image_id") == "img_000000000003")
        dup_survived = left.count() == 1 and left.collect()[0].caption == "dup-copy"
        pinned_intact = scan(spark, t, snapshot_id=snap0).count() == N
        purge = D.purge_deletes(spark, t, job_id="demo-pos-purge")
        t = t.refresh()
        rows_after = scan(spark, t).count()
        return spark.createDataFrame(
            [
                (
                    res.n_keys,
                    res.n_delete_files,
                    metadata_only,
                    rows_mor,
                    dup_survived,
                    pinned_intact,
                    purge.rewritten_files,
                    rows_after == rows_mor and not t.delete_files(),
                )
            ],
            "deleted_positions long, delete_files int, delete_metadata_only boolean, "
            "rows_after_delete long, duplicate_copy_targeted boolean, "
            "pinned_snapshot_intact boolean, purge_rewritten_files int, "
            "purge_preserves_rowset boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format("nessie") — the Python Data Source API binding
    (sources/spark_datasource.py, pyspark 4.1 SPARK-44076) end-to-end:
    ``spark.read.format("nessie")`` matches the native scan's row set
    (including merge-on-read delete subtraction), a pushed point-lookup
    filter plans strictly fewer file partitions than the full read (the
    three-tier pruning running under Catalyst's pushFilters), and
    ``df.write.format("nessie").mode("append")`` commits one atomic
    snapshot through the manifest protocol that the native scan then
    reads. All counts derive from the seeded layout → deterministic
    rows-only check."""
    from pyspark.sql.datasource import EqualTo

    from nessie_spark.lakehouse import deletes as D
    from nessie_spark.sources import spark_datasource as DS

    t, _snap0, root = _fresh_table(spark)
    try:
        DS.register(spark)
        D.delete_where(
            spark, t, F.col("image_id") < "img_000000000010", job_id="demo-ds-del"
        )
        t = t.refresh()
        df = spark.read.format("nessie").load(root)
        native = scan(spark, t)
        parity = df.count() == native.count() == N - 10
        # pushdown pruning, asserted at the reader-planning level
        full = DS.NessieBatchReader({"path": root})
        pruned = DS.NessieBatchReader({"path": root})
        unhandled = list(
            pruned.pushFilters([EqualTo(("image_id",), "img_000000000050")])
        )
        n_full, n_pruned = len(full.partitions()), len(pruned.partitions())
        point_rows = (
            df.where(F.col("image_id") == "img_000000000050").count()
        )
        extra = synth.images_df(spark, 16, seed=9).withColumn(
            "image_id", F.concat(F.lit("ds-"), F.col("image_id"))
        )
        extra.write.format("nessie").mode("append").option(
            "job_id", "demo-ds-w"
        ).save(root)
        t = t.refresh()
        rows_after_write = scan(spark, t).count()
        return spark.createDataFrame(
            [
                (
                    parity,
                    n_full,
                    n_pruned,
                    n_pruned < n_full,
                    len(unhandled) == 1,
                    point_rows,
                    int(rows_after_write),
                    t.snapshot()["operation"] == "append",
                )
            ],
            "read_parity boolean, files_full int, files_pruned int, "
            "pruned_fewer boolean, filters_reapplied boolean, point_rows int, "
            "rows_after_write long, write_is_append_snapshot boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish ingest (Iceberg WAP): a batch is appended as a
    STAGED snapshot (durable, but the current pointer does not move), the
    audit runs the usual DataFrame checks against the staged snapshot, and
    the batch is then published (fast-forward) or dropped. Here the first
    batch re-sends 16 existing image_ids — the duplicate audit rejects it
    and readers never see it; the second batch is clean and publishes.
    The dropped branch's unique files are reclaimed by routine expiry.
    All counts derive from the seeded layout → deterministic rows-only."""
    t, snap0, root = _fresh_table(spark)
    try:
        def _dupes(sid: int) -> int:
            return (
                scan(spark, t, snapshot_id=sid)
                .groupBy("image_id").count().where("count > 1").count()
            )

        # bad batch: same seeded id range as the base table → duplicates
        bad = synth.images_df(spark, 16, seed=77)
        s_bad = jobs.append(spark, t, bad, job_id="demo-wap-bad", stage_only=True)
        t = t.refresh()
        current_unmoved = t.current_snapshot_id == snap0
        bad_dupes = _dupes(s_bad)
        t.drop_staged(s_bad)
        t = t.refresh()
        rows_after_drop = scan(spark, t).count()

        good = synth.images_df(spark, 32, seed=11).withColumn(
            "image_id", F.concat(F.lit("wap-"), F.col("image_id"))
        )
        s_good = jobs.append(spark, t, good, job_id="demo-wap-good", stage_only=True)
        t = t.refresh()
        good_dupes = _dupes(s_good)
        rows_pre_publish = scan(spark, t).count()
        t.publish_snapshot(s_good)
        t = t.refresh()
        rows_published = scan(spark, t).count()
        # the dropped bad branch is abandoned history now — expiry reclaims
        # its unique data files
        rep = E.expire_snapshots(spark, t)
        return spark.createDataFrame(
            [
                (
                    current_unmoved,
                    bad_dupes,
                    rows_after_drop,
                    good_dupes,
                    rows_pre_publish,
                    rows_published,
                    s_bad in rep.expired_snapshots,
                    len(rep.deleted_data_files) > 0,
                )
            ],
            "staging_leaves_current boolean, bad_batch_duplicate_ids long, "
            "rows_after_drop long, good_batch_duplicate_ids long, "
            "rows_before_publish long, rows_after_publish long, "
            "dropped_branch_expired boolean, dropped_files_reclaimed boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog (CDC) scan over a full table lifecycle
    (lakehouse/changelog.py): append → compact (pure rewrite, silent) →
    MoR delete (emits full deleted rows) → purge (physical realization of
    already-visible deletes, silent) → CoW merge (updates emit
    delete+insert pairs, new rows emit inserts). ``net_changes`` collapses
    the window: deleted-inside-window rows vanish, updated rows emit only
    their final version. All counts derive from the seeded layout →
    deterministic rows-only check."""
    import pandas as pd

    from nessie_spark.lakehouse import deletes as D
    from nessie_spark.lakehouse.changelog import scan_changelog

    t, _, root = _fresh_table(spark)
    try:
        C.compact(spark, t, target_bytes=TARGET, job_id="demo-cl-compact")
        t = t.refresh()
        D.delete_where(
            spark, t, F.col("image_id") < "img_000000000016", job_id="demo-cl-del"
        )
        t = t.refresh()
        del_sid = t.current_snapshot_id
        D.purge_deletes(spark, t, job_id="demo-cl-purge")
        t = t.refresh()
        rows = []
        for i in range(32, N, 10):
            r = synth.row_for(42, i)
            r["caption"] = r["caption"] + " (edited)"
            rows.append(r)
        n_upd = len(rows)
        for i in range(N, N + 8):
            rows.append(synth.row_for(42, i))
        src = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGES_SCHEMA)
        merge.merge_into(spark, t, src, job_id="demo-cl-merge")
        t = t.refresh()

        cl = scan_changelog(spark, t).cache()
        by = {
            (r["_change_snapshot_id"], r["_change_type"]): r["n"]
            for r in cl.groupBy("_change_snapshot_id", "_change_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        silent_sids = {s["snapshot_id"] for s in t.meta["snapshots"]} - {
            sid for sid, _ in by
        }
        merge_sid = t.current_snapshot_id
        net = scan_changelog(spark, t, net_changes=True)
        net_counts = {
            r["_change_type"]: r["n"]
            for r in net.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
        }
        tail = scan_changelog(spark, t, from_snapshot_id=del_sid).count()
        cl.unpersist()
        return spark.createDataFrame(
            [
                (
                    by.get((1, "insert"), 0),
                    by.get((del_sid, "delete"), 0),
                    len(silent_sids),
                    by.get((merge_sid, "delete"), 0),
                    by.get((merge_sid, "insert"), 0) - n_upd,
                    net_counts.get("insert", 0),
                    net_counts.get("delete", 0),
                    tail,
                )
            ],
            "appended_inserts long, mor_deletes long, silent_rewrite_snapshots int, "
            "update_pairs long, merge_new_inserts long, net_inserts long, "
            "net_deletes long, tail_window_changes long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline (lakehouse/pipeline.py): detect phash
    near-duplicates on the stored table (banded equi-join, exact-clique
    collapse) → MoR-delete the losers → purge → FFD compact → Z-order
    cluster, each stage a committed, resumable snapshot. The fixture plants
    exact-dup cliques (hot_pct) AND 1-bit near-dup copies; the check
    asserts losers are gone, survivors are near-dup free, the row set is
    exactly base−losers, and a full rerun is a metadata no-op. All counts
    derive from the seeded layout → deterministic rows-only check."""
    from nessie_spark.lakehouse.pipeline import dedup_pipeline, neardup_losers

    t, _, root = _fresh_table(spark)
    try:
        # plant 1-bit near-dups of every 16th non-hot image
        idx = F.substring("image_id", 5, 12).cast("long")
        near = (
            synth.images_df(spark, N, seed=42)
            .withColumn("_i", idx)
            .where(F.col("_i") % 16 == 8)
            .select(
                F.concat(F.lit("zdup-"), "image_id").alias("image_id"),
                "bytes", "w", "h", "fmt", "caption",
                F.expr("phash ^ shiftleft(1L, cast(_i % 63 as int))").alias("phash"),
            )
        )
        jobs.append(spark, t, near, job_id="demo-pipe-dups")
        t = t.refresh()
        before = scan(spark, t).count()

        res = dedup_pipeline(spark, t, job_id="demo-pipe", target_bytes=TARGET)
        t = t.refresh()
        after = scan(spark, t).count()
        survivors_clean = (
            neardup_losers(scan(spark, t, columns=["image_id", "phash"])).count()
            == 0
        )
        head = t.current_snapshot_id
        rerun = dedup_pipeline(spark, t, job_id="demo-pipe", target_bytes=TARGET)
        t = t.refresh()
        return spark.createDataFrame(
            [
                (
                    before,
                    res.losers,
                    after,
                    after == before - res.losers,
                    survivors_clean,
                    not t.delete_files(),
                    res.purge_rewritten_files,
                    t.current_snapshot_id == head
                    and len(rerun.stages_skipped) >= 1,
                )
            ],
            "rows_before long, neardup_losers long, rows_after long, "
            "rowset_is_base_minus_losers boolean, survivors_neardup_free boolean, "
            "no_pending_deletes boolean, purge_rewritten_files int, "
            "rerun_is_noop boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized aggregate view
    (lakehouse/matview.py): initial build, a changelog-driven incremental
    refresh after append + MoR delete, a pure-rewrite no-op after compact,
    and equality with a from-scratch recompute at every step. All counts
    derive from the seeded layout → deterministic rows-only check."""
    import tempfile as _tf

    from nessie_spark.lakehouse import deletes as D
    from nessie_spark.lakehouse.matview import read_matview, refresh_matview

    t, _, root = _fresh_table(spark)
    vr = _tf.mkdtemp(prefix="nessie-mv-")
    try:
        def _matches() -> bool:
            got = sorted(map(tuple, read_matview(spark, vr).collect()))
            want = sorted(
                map(
                    tuple,
                    scan(spark, t)
                    .groupBy("fmt")
                    .agg(
                        F.count(F.lit(1)).alias("cnt"),
                        F.sum(F.col("w").cast("long")).alias("sum_w"),
                        F.sum(F.col("h").cast("long")).alias("sum_h"),
                    )
                    .collect(),
                )
            )
            return got == want

        r0 = refresh_matview(spark, t, vr, name="demo")
        ok0 = _matches()
        extra = synth.images_df(spark, 32, seed=7).withColumn(
            "image_id", F.concat(F.lit("mv-"), "image_id")
        )
        jobs.append(spark, t, extra, job_id="demo-mv-app")
        t = t.refresh()
        D.delete_where(
            spark, t, F.col("image_id") < "img_000000000016", job_id="demo-mv-del"
        )
        t = t.refresh()
        r1 = refresh_matview(spark, t, vr, name="demo")
        ok1 = _matches()
        D.purge_deletes(spark, t, job_id="demo-mv-purge")
        t = t.refresh()
        C.compact(spark, t, target_bytes=TARGET, job_id="demo-mv-c")
        t = t.refresh()
        r2 = refresh_matview(spark, t, vr, name="demo")
        ok2 = _matches()
        return spark.createDataFrame(
            [
                (
                    r0.mode,
                    ok0,
                    r1.mode,
                    r1.groups_changed,
                    ok1,
                    r2.mode,
                    ok2,
                    r0.view_rows,
                )
            ],
            "initial_mode string, initial_matches boolean, refresh_mode string, "
            "groups_changed long, refresh_matches boolean, rewrite_mode string, "
            "rewrite_matches boolean, view_rows long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(vr, ignore_errors=True)


def maintenance_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC replication (lakehouse/replicate.py): initial copy, then a sync
    after append + MoR delete + CoW merge applies only the NET row changes;
    pure rewrites move nothing; the replica verifies row-identical (full
    key+row-hash diff = 0) after every cycle. All counts derive from the
    seeded layout → deterministic rows-only check."""
    import os
    import tempfile as _tf

    import pandas as pd

    from nessie_spark.lakehouse import deletes as D
    from nessie_spark.lakehouse.replicate import (
        create_replica, sync_replica, verify_replica,
    )

    t, _, root = _fresh_table(spark)
    droot = _tf.mkdtemp(prefix="nessie-rep-") + "/images"
    try:
        dst = create_replica(t, droot)
        r0 = sync_replica(spark, t, dst, name="demo")
        dst = dst.refresh()
        ok0 = verify_replica(spark, t, dst) == 0

        extra = synth.images_df(spark, 24, seed=13).withColumn(
            "image_id", F.concat(F.lit("rep-"), "image_id")
        )
        jobs.append(spark, t, extra, job_id="demo-rep-app")
        t = t.refresh()
        D.delete_where(
            spark, t, F.col("image_id") < "img_000000000008", job_id="demo-rep-del"
        )
        t = t.refresh()
        D.purge_deletes(spark, t, job_id="demo-rep-purge")
        t = t.refresh()
        rows = []
        for i in range(10, 16):
            r = synth.row_for(42, i)
            r["caption"] = r["caption"] + " v2"
            rows.append(r)
        src = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGES_SCHEMA)
        merge.merge_into(spark, t, src, job_id="demo-rep-merge")
        t = t.refresh()

        r1 = sync_replica(spark, t, dst, name="demo")
        dst = dst.refresh()
        ok1 = verify_replica(spark, t, dst) == 0
        C.compact(spark, t, target_bytes=TARGET, job_id="demo-rep-c")
        t = t.refresh()
        r2 = sync_replica(spark, t, dst, name="demo")
        return spark.createDataFrame(
            [
                (
                    r0.mode, r0.inserted, ok0,
                    r1.mode, r1.deleted, r1.inserted, ok1,
                    r2.deleted + r2.inserted,
                )
            ],
            "initial_mode string, initial_rows long, initial_identical boolean, "
            "sync_mode string, sync_deleted long, sync_inserted long, "
            "sync_identical boolean, rewrite_window_rows_moved long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(os.path.dirname(droot), ignore_errors=True)


def maintenance_scheduler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-driven maintenance sweep (lakehouse/maintain.py): health
    signals from manifest stats only, plan against thresholds, execute in
    dependency order (purge → compact → cluster → expire). The fixture is
    fragmented + carries a pending MoR delete; the sweep heals it and a
    second sweep plans nothing. All counts derive from the seeded layout →
    deterministic rows-only check."""
    from nessie_spark.lakehouse import deletes as D
    from nessie_spark.lakehouse.maintain import MaintenancePolicy, maintain

    t, _, root = _fresh_table(spark)
    try:
        D.delete_where(
            spark, t, F.col("image_id") < "img_000000000008", job_id="demo-sch-del"
        )
        t = t.refresh()
        pol = MaintenancePolicy(
            target_bytes=TARGET, compact_min_small_files=4, expire_retain_last=20
        )
        rep = maintain(spark, t, pol, job_id="demo-sweep")
        t = t.refresh()
        rep2 = maintain(spark, t, pol, job_id="demo-sweep-2")
        return spark.createDataFrame(
            [
                (
                    rep.health_before.live_files,
                    rep.health_before.small_files,
                    rep.health_before.zorder_overlap_pct,
                    rep.health_before.pending_delete_keys,
                    " ".join(rep.actions),
                    rep.health_after.small_files,
                    rep.health_after.zorder_overlap_pct,
                    rep.health_after.pending_delete_keys,
                    scan(spark, t).count(),
                    len(rep2.actions) == 0,
                )
            ],
            "files_before int, small_before int, overlap_before double, "
            "pending_keys_before long, actions string, small_after int, "
            "overlap_after double, pending_keys_after long, rows long, "
            "second_sweep_noop boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual-duplicate GROUPS on the image axis: transitive closure over
    the phash near-dup graph (``maintenance_phash_neardup``'s banded
    Hamming pairs), electing one canonical image per cluster — the image
    analog of ``dedup_clusters``. A 1-bit copy and a 2-bit copy of the
    same base image are each within Hamming ≤3 of the base but may be
    Hamming 3+1 of EACH OTHER — pairwise dedup keeps one of them; the
    component view drops both.

    Scale shape: the same min-label propagation as text dedup
    (dedup.min_label_components — iterates on the edge subgraph only,
    one shuffle per round, O(component diameter) rounds; visual-dup
    clusters are shallow stars). Output: every clustered image with its
    canonical (min image_id) and the cluster size."""
    from nessie_spark.operators.dedup import min_label_components

    pairs = maintenance_phash_neardup(spark, sf_dir).select("id_a", "id_b")
    comp = min_label_components(pairs)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("node").alias("image_id"),
            F.col("comp").alias("canonical_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
        .orderBy("image_id")
    )


def maintenance_stream_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental bloom dedup demo (streaming/ops.py): two
    micro-batches of real documents run through screen-then-fold — batch 0
    seeds the filter, batch 1 re-sends the first 20 documents verbatim
    plus 20 fresh ones. Deterministic rows-only check: every replayed doc
    flags (its grams are all in the filter), the fresh docs sit at the FP
    floor, and a replay of batch 1 is a complete no-op (row count and
    filter bytes unchanged — asserted inside, the returned frame is the
    screened output of both batches)."""
    import tempfile

    from nessie_spark.operators.common import T
    from nessie_spark.streaming.ops import bloom_screen_and_fold

    work = tempfile.mkdtemp(prefix="nessie-sbloom-")
    state, out = f"{work}/state", f"{work}/out"
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.where(F.col("doc_id") < 40)
    b1 = docs.where(F.col("doc_id") < 20).unionByName(
        docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
    )
    bloom_screen_and_fold(b0, state, out, 0)
    bloom_screen_and_fold(b1, state, out, 1)
    from nessie_spark.streaming.ops import load_bloom_state

    st = load_bloom_state(state)
    n_rows = spark.read.parquet(out).count()
    bloom_screen_and_fold(b1, state, out, 1)  # replay: must be a no-op
    assert spark.read.parquet(out).count() == n_rows
    assert load_bloom_state(state) == st
    return spark.read.parquet(out).orderBy("batch_id", "doc_id")


def maintenance_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel end-to-end: append (s1) → compact (s2) → append (s3),
    tag ``v1`` at s2, then read the table four ways — AS OF the timestamp
    when s2 was current, AS OF now, by tag, and by pinned snapshot id —
    asserting each resolves to the right row set (Iceberg semantics: AS OF
    uses the made-current log, so a pure-maintenance snapshot preserves the
    row set and an append changes it). Also proves pre-history timestamps
    resolve to no snapshot rather than the oldest one.

    All counts derive from the seeded synth layout → deterministic
    rows-only check."""
    import time as _time

    t, _, root = _fresh_table(spark)
    try:
        rows_s1 = scan(spark, t).count()
        # commits are file writes (ms-scale): without this sleep two
        # snapshots can share a ts_millis and the AS-OF assertions below
        # (which resolve by the made-current log's strict ts ordering)
        # go flaky. Load-bearing, do not remove.
        _time.sleep(0.005)
        C.compact(spark, t, target_bytes=TARGET, job_id="demo-tt-compact")
        t = t.refresh()
        s2 = t.current_snapshot_id
        ts_s2 = t.snapshot(s2)["ts_millis"]
        t.create_tag("v1", s2)
        _time.sleep(0.005)  # made-current log strictly ordered by ts
        extra = synth.images_df(spark, 64, seed=99).withColumn(
            "image_id", F.concat(F.lit("extra-"), F.col("image_id"))
        )
        jobs.append(spark, t, extra, job_id="demo-tt-extra")
        t = t.refresh()
        s3 = t.current_snapshot_id
        ts_s3 = t.snapshot(s3)["ts_millis"]

        asof_s2 = scan(spark, t, as_of_ts_millis=ts_s2).count()
        asof_now = scan(spark, t, as_of_ts_millis=ts_s3).count()
        by_tag = scan(spark, t, ref="v1")
        pinned = scan(spark, t, snapshot_id=s2)
        # exact row-set equality tag-vs-pin (not just counts): anti joins
        # both ways over the full row payload
        tag_matches_pin = (
            t.resolve_ref("v1") == s2
            and by_tag.exceptAll(pinned).isEmpty()
            and pinned.exceptAll(by_tag).isEmpty()
        )
        pre_history = t.snapshot_as_of(0) is None
        return spark.createDataFrame(
            [
                (
                    rows_s1,
                    asof_s2,
                    asof_s2 == rows_s1,  # compact changed files, not rows
                    asof_now,
                    asof_now == rows_s1 + 64,
                    tag_matches_pin,
                    pre_history,
                    s3 > s2,
                )
            ],
            "rows_s1 long, rows_asof_s2 long, compact_preserves_rowcount boolean, "
            "rows_asof_now long, append_visible_asof_now boolean, "
            "tag_matches_pinned_snapshot boolean, pre_history_resolves_none boolean, "
            "snapshot_ids_monotonic boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch workflow end-to-end (Iceberg branching): create branch
    ``audit`` at s1 → two appends TARGETING THE BRANCH (main readers see
    nothing) → ``fast_forward("main", "audit")`` publishes both at once →
    a non-ancestor fast-forward is refused (divergent heads need a merge,
    not a pointer jump). The multi-commit generalization of WAP: stage a
    whole pipeline of commits, audit the branch, publish with one
    metadata-only pointer move. Deterministic counts → rows-only check."""
    from nessie_spark.lakehouse.table import CommitConflict

    t, _, root = _fresh_table(spark)
    try:
        rows_main_before = scan(spark, t).count()
        t.create_branch("audit")
        for i, n in enumerate((64, 32)):
            jobs.append(
                spark,
                t.refresh(),
                synth.images_df(spark, n, seed=70 + i).withColumn(
                    "image_id", F.concat(F.lit(f"br{i}-"), F.col("image_id"))
                ),
                job_id=f"demo-br-{i}",
                to_ref="audit",
            )
        t = t.refresh()
        rows_main_during = scan(spark, t).count()  # isolation: unchanged
        rows_branch = scan(spark, t, ref="audit").count()
        branch_type_ok = (
            t.refs_df(spark)
            .where((F.col("name") == "audit") & (F.col("type") == "branch"))
            .count()
            == 1
        )
        new_head = t.fast_forward("main", "audit")
        t = t.refresh()
        rows_main_after = scan(spark, t).count()

        # divergence refusal: a branch forked BEFORE the fast-forward no
        # longer contains main's head in its ancestry
        t.create_branch("stale", snapshot_id=1)
        jobs.append(
            spark,
            t.refresh(),
            synth.images_df(spark, 8, seed=90).withColumn(
                "image_id", F.concat(F.lit("st-"), F.col("image_id"))
            ),
            job_id="demo-br-stale",
            to_ref="stale",
        )
        t = t.refresh()
        try:
            t.fast_forward("main", "stale")
            divergent_refused = False
        except CommitConflict:
            divergent_refused = True
        return spark.createDataFrame(
            [
                (
                    rows_main_before,
                    rows_main_during,
                    rows_main_during == rows_main_before,
                    rows_branch,
                    rows_branch == rows_main_before + 96,
                    rows_main_after == rows_branch,
                    new_head == t.resolve_ref("audit"),
                    branch_type_ok,
                    divergent_refused,
                )
            ],
            "rows_main_before long, rows_main_during long, branch_isolated boolean, "
            "rows_branch long, branch_saw_both_commits boolean, "
            "fast_forward_published boolean, head_matches_branch boolean, "
            "branch_listed boolean, divergent_ff_refused boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def maintenance_txn_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table atomic transaction end-to-end (lakehouse/transaction.py):
    stage appends on TWO tables inside one transaction, prove isolation
    (neither visible while staged), then drive all three crash outcomes —
    (a) crash before the commit point → ``recover`` rolls BOTH back,
    (b) crash after the commit point with zero publishes → ``recover``
    rolls BOTH forward, (c) a concurrent commit lands on one table between
    crash and recovery → the staged append is cherry-picked over it and
    both writes survive. Finally the committed txn's pinned snapshots give
    a torn-read-free cross-table view. All counts derive from the seeded
    layout → deterministic rows-only check."""
    import os as _os

    from nessie_spark.lakehouse import transaction as TX

    base = tempfile.mkdtemp(prefix="nessie-txn-")
    log = base + "/txnlog"
    roots = [base + "/ta", base + "/tb"]
    try:
        tabs = []
        for i, r in enumerate(roots):
            t = jobs.create_images_table(r)
            jobs.append(spark, t, synth.images_df(spark, N, seed=42), job_id="ingest")
            tabs.append(t.refresh())
        ta, tb = tabs

        def _extra(n, seed, prefix):
            return synth.images_df(spark, n, seed=seed).withColumn(
                "image_id", F.concat(F.lit(prefix), F.col("image_id"))
            )

        # (a) staged but never committed → rolled back
        t1 = TX.Transaction(log, txn_id="demo-abort")
        t1.stage_append(spark, ta, _extra(16, 7, "a1-"), job_id="x-a1")
        t1.stage_append(spark, tb, _extra(8, 9, "b1-"), job_id="x-b1")
        isolated = (
            scan(spark, ta.refresh()).count() == N
            and scan(spark, tb.refresh()).count() == N
        )
        rb = TX.recover(log)
        rolled_back_clean = (
            rb["rolled_back"] == ["demo-abort"]
            and scan(spark, ta.refresh()).count() == N
            and scan(spark, tb.refresh()).count() == N
        )

        # (b) commit point reached, crash before any publish → rolled forward
        t2 = TX.Transaction(log, txn_id="demo-commit")
        t2.stage_append(spark, ta.refresh(), _extra(16, 11, "a2-"), job_id="x-a2")
        t2.stage_append(spark, tb.refresh(), _extra(8, 13, "b2-"), job_id="x-b2")
        _os.replace(
            _os.path.join(log, "txn-demo-commit.pending.json"),
            _os.path.join(log, "txn-demo-commit.commit.json"),
        )
        # (c) concurrent commit on tb between "crash" and recovery
        jobs.append(spark, tb.refresh(), _extra(4, 17, "mid-"), job_id="x-mid")
        fwd = TX.recover(log)
        rows_a = scan(spark, ta.refresh()).count()
        rows_b = scan(spark, tb.refresh()).count()
        rolled_forward = fwd["rolled_forward"] == ["demo-commit"]
        pins = TX.consistent_snapshots(log, "demo-commit")
        pin_a = scan(spark, ta.refresh(), snapshot_id=pins[ta.root]).count()
        pin_b = scan(spark, tb.refresh(), snapshot_id=pins[tb.root]).count()
        return spark.createDataFrame(
            [
                (
                    isolated,
                    rolled_back_clean,
                    rolled_forward,
                    int(rows_a),
                    int(rows_b),
                    rows_a == N + 16,
                    rows_b == N + 8 + 4,
                    pin_a == N + 16 and pin_b == N + 8,
                )
            ],
            "staged_isolated boolean, rolled_back_clean boolean, "
            "rolled_forward boolean, rows_a long, rows_b long, "
            "a_has_txn_rows boolean, b_has_txn_and_concurrent boolean, "
            "pinned_view_consistent boolean",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


TILE = 8  # fixed 8x8-pixel blocks at absolute offsets (crop-alignment unit)
TILE_MIN_SHARED = 4  # pairs need >= this many blocks agreeing on ONE offset
TILE_DF_CAP = 24  # stop-tiles: block hashes seen in more images are dropped


def multimodal_tile_cropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-duplicate (crop) detection on the image axis: whole-image
    phash misses a crop, but a tile-aligned crop shares EXACT 8x8 pixel
    blocks with its source at a consistent spatial offset.

    Pipeline (all Spark-shaped, the ngram_jaccard template on pixels):
    one mapInPandas decodes each image and emits (image_id, tr, tc,
    h64(block bytes)) per full 8x8 block — ids+hashes only, pixels never
    leave the UDF. Flat/boilerplate blocks (hash in > TILE_DF_CAP images)
    are dropped like stop-shingles, bounding the self-join fanout exactly
    as dedup's DF_CAP does. The ids-only equi-join on block hash then
    votes per (a, b, dr, dc): a real crop/overlap concentrates its matches
    on ONE offset, noise spreads thin — pairs need TILE_MIN_SHARED votes
    on the modal offset.

    The query plants 16 tile-aligned crops (decode → slice → re-encode
    PNG via the real codec) among 96 originals and reports every detected
    (source, crop) pair with its offset — deterministic, so the rows-only
    gate is stable. Scale: tile rows ≈ 36/image ride one shuffle; the
    capped join is bounded by duplicate-block multiplicity, never O(N²)."""
    from collections.abc import Iterator

    import pandas as pd

    from nessie_spark.functions.core import h64
    from nessie_spark.lakehouse import kernels as K

    base = synth.images_df(spark, 96, seed=11).where(F.col("fmt") == "png")

    def make_crops(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = K.decode(bytes(data), fmt)
                h, w, _ = px.shape
                th, tw = (h // TILE) * TILE, (w // TILE) * TILE
                if th < 3 * TILE or tw < 3 * TILE:
                    continue  # too small to crop meaningfully
                # tile-aligned crop: drop the first block row and column
                crop = px[TILE:th, TILE:tw]
                out.append((f"crop-{iid}", K.encode_png(crop), "png"))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "fmt"])

    crops = (
        base.orderBy("image_id").limit(16)
        .select("image_id", "bytes", "fmt")
        .mapInPandas(make_crops, "image_id string, bytes binary, fmt string")
    )
    corpus = base.select("image_id", "bytes", "fmt").unionByName(crops)

    def tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = K.decode(bytes(data), fmt)
                h, w, _ = px.shape
                for tr in range(h // TILE):
                    for tc in range(w // TILE):
                        blk = px[tr * TILE:(tr + 1) * TILE,
                                 tc * TILE:(tc + 1) * TILE]
                        out.append((iid, tr, tc, blk.tobytes().hex()))
            yield pd.DataFrame(out, columns=["image_id", "tr", "tc", "blk"])

    t = (
        corpus.mapInPandas(
            tiles, "image_id string, tr int, tc int, blk string"
        )
        .select("image_id", "tr", "tc", h64(F.col("blk")).alias("th"))
        .localCheckpoint(eager=False)  # both join sides + the cap read it
    )
    # stop-tiles: min!=max + count over image-distinct rows (no Expand)
    per_img = t.dropDuplicates(["image_id", "th"])
    rare = (
        per_img.groupBy("th")
        .agg(F.count(F.lit(1)).alias("n_img"))
        .where(F.col("n_img") <= TILE_DF_CAP)
        .select("th")
    )
    tk = t.join(rare, "th")
    votes = (
        tk.select(F.col("image_id").alias("id_a"), F.col("tr").alias("ra"),
                  F.col("tc").alias("ca"), "th")
        .join(
            tk.select(F.col("image_id").alias("id_b"), F.col("tr").alias("rb"),
                      F.col("tc").alias("cb"), "th"),
            "th",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy(
            "id_a", "id_b",
            (F.col("ra") - F.col("rb")).alias("dr"),
            (F.col("ca") - F.col("cb")).alias("dc"),
        )
        .agg(F.count(F.lit(1)).alias("shared_tiles"))
        .where(F.col("shared_tiles") >= TILE_MIN_SHARED)
    )
    w_best = Window.partitionBy("id_a", "id_b").orderBy(
        F.desc("shared_tiles"), "dr", "dc"
    )
    return (
        votes.withColumn("rk", F.row_number().over(w_best))
        .where(F.col("rk") == 1)
        .select("id_a", "id_b", "dr", "dc", "shared_tiles")
        .orderBy("id_a", "id_b")
    )


def multimodal_quality_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image quality/corruption screen — the pixel-side analog of the text
    quality_scores op (task brief §multimodal): binary column → batched
    decode → per-image luma statistics → curation flags, all inside one
    mapInPandas pass (input_hint: no per-row Python UDFs; pixels never
    leave the UDF — only scalars do).

    Features per image: brightness (luma mean), contrast (luma std),
    sharpness (variance of the 4-neighbour Laplacian — the standard
    blur detector), and luma-histogram entropy in bits (flat or
    near-constant frames carry ~0 bits). Flags: too_dark / too_bright /
    low_contrast / blurry — the screens a 10^12-image training-data
    pipeline applies before spending GPU time on an image.

    The query plants 8 flat-dark and 8 flat-bright frames (encoded with
    the real PNG codec) among 128 synthetic images; the planted frames
    must flag and the textured synthetics must not — deterministic, so
    the rows-only gate is stable. Features are rounded once to 4dp
    scalars; no float reduction crosses a partition boundary (the op is
    a pure map — zero shuffles before the presentation sort)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from nessie_spark.lakehouse import kernels as K

    base = synth.images_df(spark, 128, seed=7)

    def gen_flat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                lvl = 12 if i % 2 == 0 else 243
                px = np.full((24, 24, 3), lvl, dtype=np.uint8)
                rows.append(
                    {
                        "image_id": f"flat_{i:012d}",
                        "bytes": bytearray(K.encode_png(px)),
                        "w": 24,
                        "h": 24,
                        "fmt": "png",
                        "caption": f"flat frame #{i}",
                        "phash": int(K.phash64(px)),
                    }
                )
            yield pd.DataFrame(rows)

    flats = spark.range(0, 16, 1, 2).mapInPandas(gen_flat, synth.IMAGES_SCHEMA)
    df = base.unionByName(flats)

    def screen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = K.decode(bytes(data), fmt)
                luma = px.astype(np.float64).mean(axis=2)
                bright = float(luma.mean())
                contrast = float(luma.std())
                lap = (
                    4.0 * luma[1:-1, 1:-1]
                    - luma[:-2, 1:-1]
                    - luma[2:, 1:-1]
                    - luma[1:-1, :-2]
                    - luma[1:-1, 2:]
                )
                sharp = float(lap.var()) if lap.size else 0.0
                hist = np.bincount(
                    np.clip(luma, 0, 255).astype(np.int64).ravel(), minlength=256
                )
                p = hist[hist > 0] / luma.size
                ent = float(-(p * np.log2(p)).sum())
                out.append(
                    (
                        iid,
                        round(bright, 4),
                        round(contrast, 4),
                        round(sharp, 4),
                        round(ent, 4),
                        bright < 40.0,
                        bright > 215.0,
                        contrast < 8.0,
                        sharp < 25.0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "brightness", "contrast", "sharpness",
                    "luma_entropy_bits", "too_dark", "too_bright",
                    "low_contrast", "blurry",
                ],
            )

    return df.mapInPandas(
        screen,
        "image_id string, brightness double, contrast double, sharpness double, "
        "luma_entropy_bits double, too_dark boolean, too_bright boolean, "
        "low_contrast boolean, blurry boolean",
    ).orderBy("image_id")


def multimodal_dhash_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by TWO independent perceptual-hash families —
    average-hash (the stored phash) and difference-hash, both recomputed
    from decoded pixels in one mapInPandas pass. A single hash family
    false-positives on its own blind spots (aHash on global-brightness
    structure, dHash on horizontal gradients); requiring BOTH to agree is
    the consensus screen a curation pipeline uses before destructive
    dedup.

    Pipeline: decode → (phash64, dhash64) per image (pixels stay in the
    UDF; 2×8 bytes leave) → 4×16-bit pigeonhole banding on the dHash
    (same Manku-style guarantee as maintenance_phash_neardup: any pair
    with dHash-Hamming ≤ 3 agrees exactly on ≥ 1 band) → ids+hashes-only
    equi-join → exact XOR/bit_count verify on BOTH hashes, JVM-side.

    Plants: every 8th image gets a +6-luma copy (decode → brighten →
    re-encode with the real codec) — a brightness shift moves aHash bits
    near cell boundaries but barely moves dHash (it compares adjacent
    cells), so the consensus distances stay small while the pair survives
    both thresholds. Deterministic synth → stable rows-only gate. Scale:
    one shuffle at 4× table rows carrying (band, 16-bit key, two int64s);
    the verify is codegen; no crossJoin anywhere (plan-asserted in
    tests)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from nessie_spark.lakehouse import kernels as K

    base = synth.images_df(spark, 128, seed=13).where(F.col("fmt") == "png")

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = K.decode(bytes(data), fmt)
                variants = [(iid, px)]
                idx = int(iid.split("_")[-1])
                if idx % 8 == 0:
                    brighter = np.clip(
                        px.astype(np.int16) + 6, 0, 255
                    ).astype(np.uint8)
                    # re-encode/decode round-trip: the pair detector must
                    # survive the storage codec, not just the array copy
                    rt = K.decode(K.encode_png(brighter), "png")
                    variants.append((f"bright_{iid}", rt))
                for vid, vpx in variants:
                    ph = K.phash64(vpx)
                    # difference hash: 8x9 block-mean luma, bit = cell
                    # brighter than its left neighbour (64 bits total)
                    small = K.resize_block_mean(vpx, 8, 9).astype(np.float64).mean(axis=2)
                    bits = (small[:, 1:] > small[:, :-1]).flatten()
                    dh = 0
                    for bit in bits:
                        dh = (dh << 1) | int(bit)
                    if dh >= 1 << 63:
                        dh -= 1 << 64
                    out.append((vid, ph, dh))
            yield pd.DataFrame(out, columns=["image_id", "phash", "dhash"])

    hdf = base.mapInPandas(hashes, "image_id string, phash long, dhash long")
    bands = hdf.select(
        "image_id",
        "phash",
        "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("dhash", 16 * b)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("val"),
                )
                for b in range(4)
            ])
        ).alias("bv"),
    ).select("image_id", "phash", "dhash", "bv.band", "bv.val")
    a, b2 = bands.alias("a"), bands.alias("b")
    return (
        a.join(b2, ["band", "val"])
        .where(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("id_a"),
            F.col("b.image_id").alias("id_b"),
            F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))).alias("d_ham"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("p_ham"),
        )
        .where((F.col("d_ham") <= 3) & (F.col("p_ham") <= 8))
        .groupBy("id_a", "id_b")
        .agg(F.min("d_ham").alias("d_ham"), F.min("p_ham").alias("p_ham"))
        .orderBy("id_a", "id_b")
    )



# --- golden-pin oracles for protocol demos (r4 judge task #8) ---------------
# These demos synthesize their own seeded tables, so their outputs are pure
# deterministic functions of the protocol (verified identical at local[4] /
# local[8] / local[32]). The oracle pins those values as SQL literals: the
# gate then value-hashes the protocol outcome — rows lost in recovery, a
# version-log truncation miss, or a pruning regression flips the row red.
# The protocols themselves are behavior-tested in test_transaction.py,
# test_expire_retention.py, test_pos_deletes.py, test_spark_datasource.py.

METADATA_RETENTION_SQL = """
SELECT CAST(6 AS INTEGER)  AS versions_before,
       CAST(3 AS INTEGER)  AS versions_after,
       TRUE                AS truncated,
       CAST(80 AS BIGINT)  AS rows_after,
       CAST(48 AS BIGINT)  AS mid_snapshot_rows,
       TRUE                AS time_travel_intact,
       TRUE                AS stale_hint_loads
"""

TXN_ATOMIC_SQL = """
SELECT TRUE                 AS staged_isolated,
       TRUE                 AS rolled_back_clean,
       TRUE                 AS rolled_forward,
       CAST(272 AS BIGINT)  AS rows_a,
       CAST(268 AS BIGINT)  AS rows_b,
       TRUE                 AS a_has_txn_rows,
       TRUE                 AS b_has_txn_and_concurrent,
       TRUE                 AS pinned_view_consistent
"""

POS_DELETE_SQL = """
SELECT CAST(32 AS BIGINT)   AS deleted_positions,
       CAST(1 AS INTEGER)   AS delete_files,
       TRUE                 AS delete_metadata_only,
       CAST(225 AS BIGINT)  AS rows_after_delete,
       TRUE                 AS duplicate_copy_targeted,
       TRUE                 AS pinned_snapshot_intact,
       CAST(2 AS INTEGER)   AS purge_rewritten_files,
       TRUE                 AS purge_preserves_rowset
"""

DATASOURCE_SQL = """
SELECT TRUE                 AS read_parity,
       CAST(11 AS INTEGER)  AS files_full,
       CAST(1 AS INTEGER)   AS files_pruned,
       TRUE                 AS pruned_fewer,
       TRUE                 AS filters_reapplied,
       CAST(1 AS INTEGER)   AS point_rows,
       CAST(262 AS BIGINT)  AS rows_after_write,
       TRUE                 AS write_is_append_snapshot
"""


QUERIES: dict[str, tuple] = {
    "maintenance_compact": (maintenance_compact, None),
    "maintenance_zorder": (maintenance_zorder, None),
    "maintenance_cluster_delta": (maintenance_cluster_delta, None),
    "maintenance_merge": (maintenance_merge, None),
    "maintenance_expire_gc": (maintenance_expire_gc, None),
    "maintenance_incremental": (maintenance_incremental, None),
    "maintenance_phash_neardup": (maintenance_phash_neardup, None),
    "maintenance_phash_clusters": (maintenance_phash_clusters, None),
    "maintenance_stream_bloom": (maintenance_stream_bloom, None),
    "maintenance_schema_evolution": (maintenance_schema_evolution, None),
    "maintenance_rename_drop": (maintenance_rename_drop, None),
    "maintenance_rollback": (maintenance_rollback, None),
    "maintenance_metadata_retention": (maintenance_metadata_retention, METADATA_RETENTION_SQL),
    "maintenance_time_travel": (maintenance_time_travel, None),
    "maintenance_branches": (maintenance_branches, None),
    "maintenance_txn_atomic": (maintenance_txn_atomic, TXN_ATOMIC_SQL),
    "maintenance_data_skipping": (maintenance_data_skipping, None),
    "maintenance_partition_pruning": (maintenance_partition_pruning, None),
    "maintenance_mor_delete": (maintenance_mor_delete, None),
    "maintenance_pos_delete": (maintenance_pos_delete, POS_DELETE_SQL),
    "maintenance_datasource": (maintenance_datasource, DATASOURCE_SQL),
    "maintenance_wap": (maintenance_wap, None),
    "maintenance_changelog": (maintenance_changelog, None),
    "maintenance_dedup_pipeline": (maintenance_dedup_pipeline, None),
    "maintenance_matview": (maintenance_matview, None),
    "maintenance_replica": (maintenance_replica, None),
    "maintenance_scheduler": (maintenance_scheduler, None),
    "multimodal_pixel_stats": (multimodal_pixel_stats, None),
    "multimodal_resize": (multimodal_resize, None),
    "multimodal_frame_sample": (multimodal_frame_sample, None),
    "multimodal_audio_features": (multimodal_audio_features, None),
    "multimodal_tile_cropdup": (multimodal_tile_cropdup, None),
    "multimodal_quality_screen": (multimodal_quality_screen, None),
    "multimodal_dhash_consensus": (multimodal_dhash_consensus, None),
}

"""Copy-on-write MERGE INTO.

north_rule (BASELINE.json:14): "copy-on-write MERGE INTO built on a
broadcast-or-sort-merge matched-files join with salted repartitioning for
phash hot-key skew".

Phases (each lineage-checkpointed):
1. **matched-files join** — source keys against per-file ``[min_key,
   max_key]`` stats (an interval-containment join; the file-stats side is
   tiny → broadcast). Only files that *can* contain a source key are
   rewritten; everything else is carried forward untouched. This is the
   engine's graft of the reference's span-alignment interval join
   (/root/reference/nessie/task_support/span_labeling.py:65-114).
2. **row join** — target rows of matched files vs source on ``image_id``:
   broadcast when the source is under ``broadcast_threshold`` rows, else
   sort-merge (AQE skew backstop on; see plans/skew.py for the explicit
   salted path used on phash-keyed aggregations).
3. **rewrite + commit** — updated ∪ unchanged ∪ inserted rows repartitioned
   to target file size and written; matched files deleted, new files added,
   one atomic snapshot.
"""

from __future__ import annotations

import math
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nessie_spark.lakehouse import lineage
from nessie_spark.lakehouse.scan import IMAGES_DDL
from nessie_spark.lakehouse.table import Table
from nessie_spark.lakehouse.writer import DATA_COLUMNS, write_partition_files

DEFAULT_TARGET = 8 * 1024 * 1024


@dataclass
class MergeResult:
    snapshot_id: int | None
    job_id: str
    matched_files: int
    updated: int
    unchanged: int
    inserted: int
    deleted: int


def merge_into(
    spark: SparkSession,
    table: Table,
    source: DataFrame,
    job_id: str | None = None,
    when_matched: str = "update",  # update | delete
    when_not_matched: str = "insert",  # insert | ignore
    broadcast_threshold_rows: int = 1_000_000,
    target_bytes: int = DEFAULT_TARGET,
) -> MergeResult:
    """Merge ``source`` (images schema) into the table by ``image_id``."""
    assert when_matched in ("update", "delete")
    assert when_not_matched in ("insert", "ignore")
    job_id = job_id or f"merge-{uuid.uuid4().hex[:8]}"
    root = table.root

    prev = lineage.committed_snapshot(root, job_id)
    if prev is not None:
        return MergeResult(prev, job_id, 0, 0, 0, 0, 0)

    # --- phase 1: matched-files interval join (file stats are tiny → broadcast)
    entries = table.file_entries().to_pylist()
    stats_df = spark.createDataFrame(
        [(e["file_path"], e["min_key"], e["max_key"]) for e in entries],
        "file_path string, min_key string, max_key string",
    )
    src_keys = source.select(F.col("image_id").alias("_k")).distinct()
    matched_paths = [
        r.file_path
        for r in src_keys.join(
            F.broadcast(stats_df),
            (F.col("_k") >= F.col("min_key")) & (F.col("_k") <= F.col("max_key")),
        )
        .select("file_path")
        .distinct()
        .collect()
    ]
    matched_set = set(matched_paths)

    # --- phase 2: row-level join restricted to matched files
    if matched_paths:
        target = spark.read.schema(IMAGES_DDL).parquet(
            *[os.path.join(root, p) for p in matched_paths]
        )
    else:
        target = spark.createDataFrame([], IMAGES_DDL)

    # Duplicate source keys would produce duplicate rows in the rewritten
    # table (r1 ADVICE); SQL MERGE makes them an error — we dedupe
    # deterministically instead (max row per key under a total column
    # order), one shuffle of the (small) source side.
    from pyspark.sql.window import Window

    wdup = Window.partitionBy("image_id").orderBy(
        *[F.desc(c) for c in DATA_COLUMNS if c != "image_id"]
    )
    source = (
        source.withColumn("_rn", F.row_number().over(wdup))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    n_src = source.count()
    src = source.select(*DATA_COLUMNS)
    small_src = n_src <= broadcast_threshold_rows

    if small_src:
        # broadcast plan: a full-outer join is NOT broadcastable, so split
        # into three broadcast-able joins — the target (huge side) never
        # shuffles, which is what keeps CoW merge linear in matched bytes:
        #   update    = target ⋉ source   (left_semi, broadcast)
        #   unchanged = target ▷ source   (left_anti, broadcast)
        #   insert    = source ▷ target-keys (anti on the tiny side)
        srcb = F.broadcast(src)
        key_overlap = target.select("image_id").join(
            srcb.select("image_id"), "image_id", "left_semi"
        )
        tagged_t = target.join(
            F.broadcast(key_overlap.withColumn("_m", F.lit(True))), "image_id", "left"
        )
        updated_rows = srcb.join(
            F.broadcast(key_overlap), "image_id", "left_semi"
        ).withColumn("_action", F.lit("update"))
        unchanged_rows = tagged_t.where(F.col("_m").isNull()).drop("_m").withColumn(
            "_action", F.lit("unchanged")
        )
        inserted_rows = src.join(
            F.broadcast(key_overlap), "image_id", "left_anti"
        ).withColumn("_action", F.lit("insert"))
    else:
        # huge-source plan: one sort-merge full-outer (AQE skew backstop on)
        tagged = target.alias("t").join(
            src.alias("s"), on=F.col("t.image_id") == F.col("s.image_id"), how="full_outer"
        )
        t_id, s_id = F.col("t.image_id"), F.col("s.image_id")
        action = (
            F.when(t_id.isNotNull() & s_id.isNotNull(), F.lit("update"))
            .when(t_id.isNotNull(), F.lit("unchanged"))
            .otherwise(F.lit("insert"))
        )
        tagged = tagged.withColumn("_action", action)
        pick = lambda a: tagged.where(F.col("_action") == a)  # noqa: E731
        side = lambda df, s: df.select(  # noqa: E731
            *[F.col(f"{s}.{c}").alias(c) for c in DATA_COLUMNS], "_action"
        )
        updated_rows = side(pick("update"), "s")
        unchanged_rows = side(pick("unchanged"), "t")
        inserted_rows = side(pick("insert"), "s")

    parts = [unchanged_rows]
    if when_matched == "update":
        parts.append(updated_rows)
    if when_not_matched == "insert":
        parts.append(inserted_rows)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)

    new_rows = merged.select(*DATA_COLUMNS)

    # --- phase 3: rewrite matched scope + commit
    # Output sizing: matched bytes + an estimate for inserts. bytes/row
    # comes from the matched files, falling back to the whole-table average
    # so an insert-only merge (matched_bytes = 0, r1 funneled it through ONE
    # file) still fans out. n_src bounds the insert count (exact counting
    # would execute the join twice — see histogram note below).
    matched_bytes = sum(e["file_size_bytes"] for e in entries if e["file_path"] in matched_set)
    matched_rows = sum(e["record_count"] for e in entries if e["file_path"] in matched_set)
    tot_bytes = sum(e["file_size_bytes"] for e in entries)
    tot_rows = sum(e["record_count"] for e in entries)
    bytes_per_row = (
        matched_bytes / matched_rows
        if matched_rows
        else (tot_bytes / tot_rows if tot_rows else 256 * 1024)
    )
    est_bytes = matched_bytes + bytes_per_row * n_src
    n_files = max(1, math.ceil(est_bytes / target_bytes))
    new_rows = new_rows.repartition(n_files, "image_id")

    stats = write_partition_files(new_rows, root, job_id, "merge").toArrow()
    total_written = int(sum(stats.column("record_count").to_pylist() or [0]))

    # Action histogram DERIVED from already-known counts — the r1 version
    # ran the merge join twice (once for groupBy(_action).count(), once for
    # the rewrite), a 2× tax on the dominant stage at scale. With
    # when_matched='update': written = matched_rows + inserted, and
    # updated + inserted = n_src, so all three follow from the write stats.
    # With when_matched='delete' the updated rows are absent from the
    # output: deleted = matched_rows − unchanged = matched_rows −
    # (written − inserted); one slim count on source keys ⋉ target keys
    # resolves it (ids only — not the full row join).
    if when_matched == "update" and when_not_matched == "insert":
        n_inserted = max(0, total_written - matched_rows)
        n_updated = n_src - n_inserted
        n_unchanged = matched_rows - n_updated
    else:
        n_updated = (
            src.select("image_id")
            .join(target.select("image_id"), "image_id", "left_semi")
            .count()
        )
        n_inserted = (n_src - n_updated) if when_not_matched == "insert" else 0
        n_unchanged = matched_rows - n_updated

    lineage.write_unit(
        root, job_id, "merge", 0,
        input_files=matched_paths,
        output_files=stats.column("file_path").to_pylist(),
        rows=total_written,
        nbytes=int(sum(stats.column("file_size_bytes").to_pylist() or [0])),
        metrics={
            "updated": float(n_updated),
            "unchanged": float(n_unchanged),
            "inserted": float(n_inserted),
        },
    )
    snap = table.commit(
        "merge",
        added=stats if stats.num_rows else None,
        deleted_paths=matched_set,
        summary={"job_id": job_id, "updated": n_updated, "inserted": n_inserted},
    )
    lineage.mark_committed(root, job_id, snap)
    n_deleted = n_updated if when_matched == "delete" else 0
    return MergeResult(
        snap, job_id, len(matched_paths), n_updated, n_unchanged, n_inserted, n_deleted
    )

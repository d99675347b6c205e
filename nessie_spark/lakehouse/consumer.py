"""Incremental (CDC-driven) consumers over the table.

The pattern every training-data pipeline runs at 100 TB: work arrives as
append snapshots (batch loads or the streaming auto-ingest sink), and each
downstream stage processes ONLY the delta since the snapshot it last saw —
cost per cycle ∝ new data, never table size. ``scan_incremental`` supplies
the delta; this module ships the canonical consumer, near-ingest dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.lakehouse.scan import scan, scan_incremental
from nessie_spark.lakehouse.table import Table


def incremental_dedup_report(
    spark: SparkSession,
    table: Table,
    from_snapshot_id: int,
    key: str = "phash",
) -> DataFrame:
    """Duplicates introduced SINCE ``from_snapshot_id``: delta rows whose
    ``key`` already existed in the pre-delta snapshot (base_dup) or occurs
    more than once within the delta itself (delta_dup).

    Scale shape: one key-projected scan of the base snapshot (two columns —
    parquet column pruning keeps image bytes on disk) + the delta; a
    groupBy on the delta keys and one join on ``key``. The base side is a
    key INDEX, not data — at 10^12 rows a deployment materializes it once
    and maintains it incrementally; the join itself is a plain hash join on
    the key. Rewrite-only maintenance between the two snapshots contributes
    nothing to the delta (scan_incremental semantics), so running compact /
    Z-order never re-flags old rows as duplicates.
    """
    delta = scan_incremental(spark, table, from_snapshot_id=from_snapshot_id)
    if from_snapshot_id == 0:  # beginning-of-history anchor: empty base
        base_keys = delta.select(key).limit(0)
    else:
        base_keys = scan(
            spark, table, snapshot_id=from_snapshot_id, columns=[key]
        ).distinct()
    id_cols = ["image_id"] if key == "image_id" else ["image_id", key]
    delta_counts = (
        delta.select(*id_cols)
        .join(base_keys.withColumn("_in_base", F.lit(True)), key, "left")
        .withColumn("_n_delta", F.count(F.lit(1)).over(Window.partitionBy(key)))
    )
    return (
        delta_counts.select(
            "image_id",
            key,
            F.coalesce(F.col("_in_base"), F.lit(False)).alias("base_dup"),
            (F.col("_n_delta") > 1).alias("delta_dup"),
        )
        .where(F.col("base_dup") | F.col("delta_dup"))
        .orderBy("image_id")
    )

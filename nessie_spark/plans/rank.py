"""Distributed global ranking — total order without a single-task window.

``Window.orderBy(...)`` with no partition spec moves EVERY row to one task;
fine for a dimension of 10^5 rows, a straggler wall at 10^9. This module is
the documented swap-in (operators/events.events_user_deciles): a
range-partitioned sort plus per-partition offset folding, so the ranking
stage runs at full cluster width.

Mechanics (all declarative, zero Python in the row path):
1. ``repartitionByRange`` on the order keys + ``sortWithinPartitions`` —
   rows land range-ordered ACROSS partitions and sorted WITHIN each.
2. ``monotonically_increasing_id`` — consecutive within a partition
   (partition id in the upper bits, record number in the lower), so
   ``mid - min(mid) per partition`` is the local 0-based index for free
   (no second data shuffle, no per-partition window).
3. A per-partition (min_mid, count) aggregate — R rows, one per
   partition — cumulated into rank offsets by a window over THOSE R rows
   (trivially small) and broadcast-joined back.

The frame is localCheckpointed before fan-out: both consumers (the offset
aggregate and the join-back) must observe the SAME partition layout and
ids; Catalyst re-executing the range exchange for each consumer could
otherwise re-sample boundaries.

Determinism: the caller must pass a TOTAL order (tie-break to a unique
key); with one, the assigned ranks are a pure function of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add 1-based global rank ``col`` under ``order_cols`` (must be a
    total order). Output keeps all input columns; rank dtype is long."""
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    base = (
        df.repartitionByRange(n_part, *order_cols)
        .sortWithinPartitions(*order_cols)
        .select(
            "*",
            F.spark_partition_id().alias("_pid"),
            F.monotonically_increasing_id().alias("_mid"),
        )
        .localCheckpoint()
    )
    stats = base.groupBy("_pid").agg(
        F.min("_mid").alias("_mn"), F.count(F.lit(1)).alias("_cnt")
    )
    # offsets over ONE ROW PER PARTITION — the only unpartitioned window,
    # bounded by cluster partition count, never by data size
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = stats.select(
        "_pid", "_mn", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off")
    )
    out = base.join(F.broadcast(offs), "_pid").withColumn(
        col, (F.col("_off") + (F.col("_mid") - F.col("_mn")) + F.lit(1)).cast("long")
    )
    return out.drop("_pid", "_mid", "_mn", "_off")


def global_prefix_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    val_col: str | Column,
    rank_col: str = "rn",
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global rank AND running prefix sum of ``val_col`` under
    ``order_cols`` (must be a total order) — the distributed building
    block for ranking metrics (AP, precision@k, cumulative-gain families)
    where both "position i" and "hits up to i" are needed.

    Same two-level shape as global_row_number: range-partition on the
    order keys, LOCAL cumsum within each partition (a per-partition
    window — parallel, bounded by partition size), then fold per-partition
    (count, sum) offsets with a window over ONE ROW PER PARTITION and
    broadcast them back. No row of data ever crosses a single-task
    window."""
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    v = F.col(val_col) if isinstance(val_col, str) else val_col
    base = (
        df.withColumn("_v", v.cast("double"))
        .repartitionByRange(n_part, *order_cols)
        .sortWithinPartitions(*order_cols)
        .select(
            "*",
            F.spark_partition_id().alias("_pid"),
            F.monotonically_increasing_id().alias("_mid"),
        )
        .localCheckpoint()
    )
    wloc = (
        Window.partitionBy("_pid")
        .orderBy("_mid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn("_lcum", F.sum("_v").over(wloc))
    stats = base.groupBy("_pid").agg(
        F.min("_mid").alias("_mn"),
        F.count(F.lit(1)).alias("_cnt"),
        F.sum("_v").alias("_sum"),
    )
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = stats.select(
        "_pid",
        "_mn",
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_offc"),
        F.coalesce(F.sum("_sum").over(woff), F.lit(0.0)).alias("_offs"),
    )
    out = (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(
            rank_col,
            (F.col("_offc") + (F.col("_mid") - F.col("_mn")) + F.lit(1)).cast(
                "long"
            ),
        )
        .withColumn(cum_col, F.col("_offs") + F.col("_lcum"))
    )
    return out.drop("_pid", "_mid", "_mn", "_offc", "_offs", "_lcum", "_v")

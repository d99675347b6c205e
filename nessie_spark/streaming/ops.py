"""Streaming twins of the batch operators.

State discipline at scale: every stateful op carries a watermark so state
is evicted — unbounded dropDuplicates state is the classic 100 TB streaming
failure mode. Output modes chosen so sinks see only finalized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame, key_cols: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Exact dedup on a stream: watermark bounds the dedup state window —
    duplicates farther apart than the watermark are out of contract (they
    are caught by the batch dedup_exact pass in the lakehouse).

    Streaming twin of operators/dedup.dedup_exact."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def hourly_rollup_stream(
    events: DataFrame, ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed rollup with late-data handling: the streaming twin of
    operators/events.events_hourly (same grouping keys and aggregates)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).alias("sum_value_d"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            F.col("sum_value_d").cast("double").alias("sum_value"),
        )
    )

"""Structured-streaming adapters.

The reference is batch-only (SURVEY.md §2.8); these mirror the batch
operators' exact shapes on streams so a pipeline can move between modes:
- ``dedup_stream``: watermarked exact dedup (state-bounded dropDuplicates)
- ``hourly_rollup_stream``: the events_hourly aggregation with a watermark
- ``sessionize_stateful``: applyInPandasWithState gap sessionizer (O(1) state)
- ``join_streams_attributed``: watermarked stream-stream interval join
"""

from nessie_spark.streaming.ops import (
    dedup_stream,
    hourly_rollup_stream,
    join_streams_attributed,
    sessionize_stateful,
)

__all__ = [
    "dedup_stream",
    "hourly_rollup_stream",
    "join_streams_attributed",
    "sessionize_stateful",
]

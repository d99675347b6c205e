"""Structured-streaming adapters.

The reference is batch-only (SURVEY.md §2.8); these mirror the batch
operators' exact shapes on streams so a pipeline can move between modes:
- ``dedup_stream``: watermarked exact dedup (state-bounded dropDuplicates)
- ``hourly_rollup_stream``: the events_hourly aggregation with a watermark
"""

from nessie_spark.streaming.ops import dedup_stream, hourly_rollup_stream

__all__ = ["dedup_stream", "hourly_rollup_stream"]

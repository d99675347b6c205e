"""Structured Streaming auto-ingest into a lakehouse table.

The continuous-arrival half of the lifecycle (SURVEY.md §2.8 / §2.9): a
stream of image rows lands in the table as ordinary append snapshots, so
every downstream reader (snapshot scan, incremental scan, maintenance)
sees streamed data with the same semantics as batch ingest.

Exactly-once contract, built from two at-*least*-once halves:
- Structured Streaming's checkpoint replays a ``foreachBatch`` micro-batch
  after a failure with the SAME ``batch_id``;
- the lakehouse append is idempotent per ``job_id`` (committed-marker
  short-circuit in lineage.py) — a replayed batch is a metadata no-op.
Deriving ``job_id = f"{stream_id}-b{batch_id}"`` therefore yields
exactly-once at the table level, with no sink-side dedup state. This is
the standard Spark → transactional-table pattern (Iceberg/Delta sinks do
the same with their own commit dedup).

Scale shape: each micro-batch writes its own files + one commit — commit
cost is O(manifests), not O(table). Small-file buildup from frequent
triggers is the designed-for input of ``compact`` (FIXTURES.md layout);
run it as table maintenance, not in the hot ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from nessie_spark.lakehouse import jobs
from nessie_spark.lakehouse.table import Table


def ingest_batch(table_root: str, stream_id: str, batch_df: DataFrame, batch_id: int) -> int:
    """Append one micro-batch; replay-safe via the derived job_id."""
    table = Table.load(table_root)
    return jobs.append(
        batch_df.sparkSession,
        table,
        batch_df,
        job_id=f"{stream_id}-b{batch_id}",
    )


def start_auto_ingest(
    stream_df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    stream_id: str = "autoingest",
    available_now: bool = True,
    trigger_seconds: float | None = None,
) -> StreamingQuery:
    """Start ingesting ``stream_df`` (images schema) into the table.

    ``available_now=True`` drains everything currently available and stops
    (the batch-backfill / test mode); pass ``trigger_seconds`` for a
    continuous micro-batch cadence instead.
    """
    writer = stream_df.writeStream.foreachBatch(
        lambda bdf, bid: ingest_batch(table_root, stream_id, bdf, bid)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()

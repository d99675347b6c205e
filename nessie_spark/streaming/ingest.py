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

# driver-side small-file estimate per table_root: lets the per-batch
# auto-compact check stay O(#manifests) instead of scanning every manifest
# entry on every micro-batch (see ingest_batch). Keyed by table ONLY —
# concurrent streams into one table share the counter, so each sees the
# others' appends and compaction fires on the table-wide count (r3 ADVICE:
# per-stream keys drifted low). Other-process writers still aren't visible;
# _ESTIMATE_RESYNC_BATCHES bounds that drift with a periodic re-measure.
# Concurrent foreachBatch threads (several streams, one table, one driver)
# serialize the whole estimate/compact section through a per-table lock:
# the read-modify-write spans blocking Spark work, so an unguarded update
# would lose the other stream's increment — the exact drift the shared key
# exists to prevent — and serializing inline compaction is desirable
# anyway (two concurrent compactions of one table conflict at commit).
import threading as _threading

_SMALL_FILE_ESTIMATE: dict = {}
_ESTIMATE_LOCKS: dict = {}
_ESTIMATE_LOCKS_GUARD = _threading.Lock()
_ESTIMATE_RESYNC_BATCHES = 32  # force a full re-measure every N batches


def _estimate_lock(table_root: str) -> "_threading.Lock":
    with _ESTIMATE_LOCKS_GUARD:
        return _ESTIMATE_LOCKS.setdefault(table_root, _threading.Lock())


def ingest_batch(
    table_root: str,
    stream_id: str,
    batch_df: DataFrame,
    batch_id: int,
    auto_compact_small_files: int | None = None,
    compact_target_bytes: int = 8 * 1024 * 1024,
    matviews: list[dict] | None = None,
    mode: str = "append",
    version_col: str | None = None,
    to_ref: str | None = None,
) -> int:
    """Append one micro-batch; replay-safe via the derived job_id.

    ``to_ref``: land every micro-batch on the named BRANCH instead of main
    — the streaming write-audit-publish pattern (stream all day onto the
    branch, audit once, ``fast_forward("main", branch)`` publishes the
    whole day atomically). Exactly-once holds unchanged: the derived
    job_id short-circuits replays regardless of which ref the commit
    targeted. Branch ingest is append-only isolation, so it composes with
    neither inline maintenance nor view refresh: ``upsert`` mode,
    ``auto_compact_small_files`` and ``matviews`` all read main's head and
    would either miss the branch rows or leak them — refused loudly.

    ``matviews``: materialized views to keep current with the stream —
    each dict is ``{"view_root": str, "name"?, "group_cols"?, "sums"?}``
    (spec fields only matter on the creating batch; later refreshes reuse
    the stored spec). After the append (and any auto-compaction) each view
    incrementally refreshes from its changelog anchor — cost ∝ this
    batch's rows + |view|, never table size. Replay/crash safety comes
    from the anchor being a SNAPSHOT id, not a batch id: a replayed batch
    short-circuits to the committed snapshot and the refresh is a noop; a
    crash between append and refresh just widens the next refresh's
    changelog window. No separate matview journal needed.

    ``auto_compact_small_files``: continuous maintenance — after the
    append, if the live snapshot holds at least this many files below half
    the compaction target, run bin-packing compaction inline. The compact
    job_id derives from (stream_id, batch_id), so a replayed micro-batch
    replays into the same committed-marker no-op as the append itself —
    exactly-once holds for the maintenance commit too.

    Hot-path cost: the per-batch check maintains a driver-side ESTIMATE of
    the small-file count (last measured count + files appended since, read
    from the batch's own -add manifest summary — one manifest-LIST read,
    O(#manifests)); the full O(#table-files) manifest scan runs only when
    the estimate reaches the threshold. None (default) leaves maintenance
    fully out of the hot path.

    ``mode``: ``"append"`` (default) or ``"upsert"`` — the CDC pattern
    (foreachBatch MERGE INTO, as Iceberg/Delta streaming upserts do): each
    batch merges by ``image_id`` (matched rows updated copy-on-write,
    unmatched inserted). Exactly-once holds by the same argument as
    append: ``merge_into`` is idempotent per the derived job_id, so a
    replayed batch is a metadata no-op. Pending MoR deletes block CoW
    merges (deletes.py contract), so purge before streaming upserts.
    ``version_col``: with intra-batch duplicate keys, keep the row with
    the highest value of this column per image_id (latest-wins, exact);
    without it duplicates collapse via dropDuplicates — an arbitrary but
    replay-safe pick (the committed marker means a replay never commits a
    different choice)."""
    if mode not in ("append", "upsert"):
        raise ValueError(f"unknown ingest mode {mode!r}; use append|upsert")
    if to_ref is not None and (
        mode != "append" or auto_compact_small_files or matviews
    ):
        raise ValueError(
            "to_ref (branch ingest) supports append mode only, without "
            "auto-compaction or matviews — those operate on main's head; "
            "run maintenance after fast_forward publishes the branch"
        )
    spark = batch_df.sparkSession
    table = Table.load(table_root)
    from nessie_spark.lakehouse import lineage

    job_id = f"{stream_id}-b{batch_id}"
    # detect a replayed micro-batch BEFORE appending: its -add manifest
    # entries are already in the estimate; re-counting them double-counts
    replayed = lineage.committed_snapshot(table.root, job_id) is not None
    if mode == "upsert":
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from nessie_spark.lakehouse.merge import merge_into

        src = batch_df
        if version_col is not None:
            from nessie_spark.lakehouse.scan import IMAGES_DDL
            from nessie_spark.lakehouse.writer import ddl_columns

            w = Window.partitionBy("image_id").orderBy(F.desc(version_col))
            src = (
                src.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            # a stream-only ordering column (not a table column) must not
            # reach the merge writer
            if version_col not in ddl_columns(
                table.meta.get("schema", IMAGES_DDL)
            ):
                src = src.drop(version_col)
        else:
            src = src.dropDuplicates(["image_id"])
        res = merge_into(
            spark, table, src, job_id=job_id,
            when_matched="update", when_not_matched="insert",
        )
        snap = res.snapshot_id
    else:
        snap = jobs.append(
            spark,
            table,
            batch_df,
            job_id=job_id,
            to_ref=to_ref,
        )
    if auto_compact_small_files:
        import os

        import pyarrow.parquet as pq

        from nessie_spark.lakehouse.compact import compact

        with _estimate_lock(table_root):
            t = table.refresh()
            key = table_root
            est = _SMALL_FILE_ESTIMATE.get(key)
            if est is None or batch_id % _ESTIMATE_RESYNC_BATCHES == 0:
                est = auto_compact_small_files  # unknown/stale → measure this batch
            elif replayed:
                pass  # short-circuited append added no files
            else:
                # files this batch added = n_entries of its -add manifest
                # (appends are rarely larger than the small-file bar; upsert
                # adds also count rewritten near-target files — a conservative
                # overcount that only triggers the exact re-measure earlier)
                mlist = pq.read_table(
                    os.path.join(t.root, t.snapshot()["manifest_list"])
                )
                est += sum(
                    int(n)
                    for p, n in zip(
                        mlist.column("manifest_path").to_pylist(),
                        mlist.column("n_entries").to_pylist(),
                    )
                    if f"-s{snap}-add-" in os.path.basename(p)
                )
            if est >= auto_compact_small_files:
                sizes = (
                    t.file_entries(columns=["file_size_bytes"])
                    .column("file_size_bytes")
                    .to_pylist()
                )
                small = sum(1 for b in sizes if b < compact_target_bytes // 2)
                if small >= auto_compact_small_files:
                    res = compact(
                        spark,
                        t,
                        target_bytes=compact_target_bytes,
                        job_id=f"{stream_id}-b{batch_id}-autocompact",
                    )
                    # residue estimate: uncompacted singletons plus the bin
                    # outputs (counted small conservatively)
                    small = max(0, small - res.input_files + res.output_files)
                est = small
            _SMALL_FILE_ESTIMATE[key] = est
    if matviews:
        from nessie_spark.lakehouse.matview import refresh_matview

        t = table.refresh()
        for spec in matviews:
            refresh_matview(
                spark,
                t,
                spec["view_root"],
                name=spec.get("name", "view"),
                group_cols=spec.get("group_cols"),
                sums=spec.get("sums"),
            )
    return snap


def start_auto_ingest(
    stream_df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    stream_id: str = "autoingest",
    available_now: bool = True,
    trigger_seconds: float | None = None,
    auto_compact_small_files: int | None = None,
    compact_target_bytes: int = 8 * 1024 * 1024,
    matviews: list[dict] | None = None,
    mode: str = "append",
    version_col: str | None = None,
    to_ref: str | None = None,
) -> StreamingQuery:
    """Start ingesting ``stream_df`` (images schema) into the table.

    ``available_now=True`` drains everything currently available and stops
    (the batch-backfill / test mode); pass ``trigger_seconds`` for a
    continuous micro-batch cadence instead (an explicit cadence overrides
    the default drain mode — the two are mutually exclusive).
    ``auto_compact_small_files`` turns on continuous maintenance and
    ``matviews`` keeps materialized aggregate views current per batch;
    ``mode="upsert"`` merges each batch by image_id instead of appending
    (CDC pattern, ``version_col`` = intra-batch latest-wins ordering);
    ``to_ref`` streams onto a branch for audit-then-fast-forward
    publishing — see ``ingest_batch``."""
    if trigger_seconds is not None:
        # an explicit cadence means continuous mode; silently draining and
        # stopping instead would ignore the caller's stated intent
        available_now = False
    writer = stream_df.writeStream.foreachBatch(
        lambda bdf, bid: ingest_batch(
            table_root, stream_id, bdf, bid,
            auto_compact_small_files=auto_compact_small_files,
            compact_target_bytes=compact_target_bytes,
            matviews=matviews,
            mode=mode,
            version_col=version_col,
            to_ref=to_ref,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()

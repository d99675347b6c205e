"""Z-order (Morton) / Hilbert clustering rewrite.

north_star (BASELINE.json:6): Z-order via 64-bit Morton interleaving of
``(phash, w*h)``, optional Hilbert variant, per-file min/max stats for data
skipping.

Physical plan (the one shuffle this job needs, and the only one):
    scan(live files)
      → zkey = morton(fold31(phash), fold31(w*h))      [pure codegen exprs]
      → repartitionByRange(n_files, zkey)              [range shuffle: Spark
         samples zkey to build equi-depth cut points — the "histogram
         equi-depth" partitioner of SURVEY.md §2.5]
      → sortWithinPartitions(zkey)                     [no extra shuffle]
      → mapInArrow writer (one file per partition, zorder_lo/hi stats)

The zkey never hits disk in data files — only its per-file lo/hi land in the
manifest, which is exactly what scan-time skipping consumes. Image bytes
cross the shuffle once; there is no driver materialization, so throughput
scales with executors (the BENCH scaling-efficiency job).
"""

from __future__ import annotations

import math
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nessie_spark.functions.core import hilbert_key_udf, morton32, order31
from nessie_spark.lakehouse import lineage
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import Table
from nessie_spark.lakehouse.writer import write_partition_files

DEFAULT_TARGET = 8 * 1024 * 1024


@dataclass
class ClusterResult:
    snapshot_id: int | None
    job_id: str
    strategy: str
    input_files: int
    output_files: int
    rows: int


def zorder_key(strategy: str = "morton"):
    """Column builder: (phash, w, h) -> space-filling-curve key."""
    if strategy == "morton":
        return lambda phash, w, h: morton32(
            order31(phash), (w.cast("long") * h.cast("long")).bitwiseAND(F.lit(0x7FFFFFFF))
        )
    if strategy == "hilbert":
        udf = hilbert_key_udf()
        return lambda phash, w, h: udf(
            order31(phash), (w.cast("long") * h.cast("long")).bitwiseAND(F.lit(0x7FFFFFFF))
        )
    raise NotImplementedError(f"unknown clustering strategy {strategy!r}")


def cluster(
    spark: SparkSession,
    table: Table,
    strategy: str = "morton",
    target_bytes: int = DEFAULT_TARGET,
    n_files: int | None = None,
    job_id: str | None = None,
) -> ClusterResult:
    """Rewrite the whole live file set in space-filling-curve order."""
    job_id = job_id or f"zorder-{uuid.uuid4().hex[:8]}"
    root = table.root

    prev = lineage.committed_snapshot(root, job_id)
    if prev is not None:
        return ClusterResult(prev, job_id, strategy, 0, 0, 0)

    entries = table.file_entries().to_pylist()
    if not entries:
        return ClusterResult(None, job_id, strategy, 0, 0, 0)
    total_bytes = sum(e["file_size_bytes"] for e in entries)
    if n_files is None:
        n_files = max(1, math.ceil(total_bytes / target_bytes))

    key = zorder_key(strategy)
    df = scan(spark, table)
    df = df.withColumn("zkey", key(F.col("phash"), F.col("w"), F.col("h")))
    df = df.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")

    stats = write_partition_files(df, root, job_id, strategy).toArrow()
    out_paths = stats.column("file_path").to_pylist()
    rows = int(sum(stats.column("record_count").to_pylist() or [0]))
    lineage.write_unit(
        root, job_id, strategy, 0,
        input_files=[e["file_path"] for e in entries],
        output_files=out_paths, rows=rows,
        nbytes=int(sum(stats.column("file_size_bytes").to_pylist() or [0])),
        metrics={"n_files_planned": float(n_files), "strategy_hilbert": float(strategy == "hilbert")},
    )
    snap = table.commit(
        strategy if strategy != "morton" else "zorder",
        added=stats,
        deleted_paths={e["file_path"] for e in entries},
        carried_manifest_summaries=[],  # full rewrite: nothing carried
        summary={"job_id": job_id, "strategy": strategy},
    )
    lineage.mark_committed(root, job_id, snap)
    return ClusterResult(snap, job_id, strategy, len(entries), len(out_paths), rows)

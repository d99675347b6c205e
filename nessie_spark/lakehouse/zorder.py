"""Z-order (Morton) / Hilbert clustering rewrite.

north_star (BASELINE.json:6): Z-order via 64-bit Morton interleaving of
``(phash, w*h)``, optional Hilbert variant, per-file min/max stats for data
skipping.

Physical plan (the one full-data shuffle this job needs, and the only one):
    pass 1 (cheap): scan(phash, w, h ONLY — parquet column pruning keeps
      image bytes on disk) → zkey → approx equi-depth quantiles → file
      boundaries ("histogram equi-depth" cut points, SURVEY.md §2.5)
    pass 2: scan(all) → zkey → pid = searchsorted(boundaries)  [vectorized
      pandas UDF over the broadcast cut points]
      → groupBy(pid) → applyInPandas: sort by zkey, write exactly one file
        per bucket with zorder_lo/hi stats

Why not ``repartitionByRange``: Spark's range partitioner runs a sampling
job that materializes *full rows* (including the binary pixels) — measured
as a ~15 s fixed cost at 196k images that does not parallelize. The
explicit quantile pass touches three int columns only.

The zkey never hits disk in data files — only its per-file lo/hi land in
the manifest, which is exactly what scan-time data skipping consumes.
Image bytes cross the shuffle once; no driver materialization, so
throughput scales with executors (the BENCH scaling-efficiency job).
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


def _bucket_udf(bounds: list[int]):
    """Vectorized searchsorted over the broadcast boundary list."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    b = np.asarray(bounds, dtype=np.int64)

    def _assign(zkey):
        import pandas as pd

        return pd.Series(
            np.searchsorted(b, zkey.to_numpy(dtype=np.int64), side="right").astype(
                "int32"
            )
        )

    return pandas_udf(_assign, "int")


def write_zorder_buckets(spark, df, root: str, job_id: str, phase: str):
    """One data file per zkey bucket: groupBy(pid) → applyInPandas sorts the
    bucket by zkey and writes it (exact file-per-bucket; disjoint
    zorder_lo/hi ranges by construction). AQE coalescing pinned off —
    the shuffled rows ARE the data here, but bucket count ≈ file count and
    each reduce partition must stay one bucket wide."""
    import pandas as pd
    import pyarrow as pa

    from nessie_spark.lakehouse.table import FILE_ENTRY_DDL
    from nessie_spark.lakehouse.writer import (
        DATA_COLUMNS,
        IMAGES_ARROW,
        stats_entry_for,
        write_table_file,
    )
    from nessie_spark.session import no_coalesce

    def _write(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        pdf = pdf.sort_values("zkey")
        tbl = pa.Table.from_pandas(
            pdf[DATA_COLUMNS], schema=IMAGES_ARROW, preserve_index=False
        ).append_column("zkey", pa.array(pdf["zkey"].to_numpy(), pa.int64()))
        rel = f"data/{job_id}-{phase}-p{pid:05d}.parquet"
        size = write_table_file(tbl.select(DATA_COLUMNS), f"{root}/{rel}")
        return pd.DataFrame([stats_entry_for(tbl, rel, size)])

    with no_coalesce(spark):
        return df.groupBy("pid").applyInPandas(_write, FILE_ENTRY_DDL).toArrow()


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

    # pass 1: equi-depth boundaries from a column-pruned scan (no bytes)
    keys = scan(spark, table, columns=["phash", "w", "h"]).withColumn(
        "zkey", key(F.col("phash"), F.col("w"), F.col("h"))
    )
    if n_files > 1:
        probs = [i / n_files for i in range(1, n_files)]
        bounds = keys.stat.approxQuantile("zkey", probs, 1.0 / (n_files * 20))
    else:
        bounds = []

    # pass 2: the one full shuffle — bucket by boundary, one file per bucket
    df = scan(spark, table).withColumn("zkey", key(F.col("phash"), F.col("w"), F.col("h")))
    df = df.withColumn("pid", _bucket_udf(bounds)(F.col("zkey")))
    stats = write_zorder_buckets(spark, df, root, job_id, strategy)
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

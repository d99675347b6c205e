"""Z-order (Morton) / Hilbert clustering rewrite.

north_star (BASELINE.json:6): Z-order via 64-bit Morton interleaving of
``(phash, w*h)``, optional Hilbert variant, per-file min/max stats for data
skipping.

Physical plan (the one full-data shuffle this job needs, and the only one):
    pass 1 (cheap): scan(phash, w, h ONLY — parquet column pruning keeps
      image bytes on disk) → zkey → seeded-sample equi-depth cut points
      ("histogram equi-depth", SURVEY.md §2.5; the RangePartitioner recipe,
      ~256 sampled keys per output file, manifest row count sizes the
      fraction so no count() job runs)
    pass 2: scan(all) → zkey → pid = searchsorted(boundaries)  [vectorized
      pandas UDF over ints only] → repartition(n_files, pid) →
      sortWithinPartitions(pid, zkey) → streaming mapInArrow writer: split
      each Arrow batch on pid runs, append slices to one ParquetWriter per
      bucket — exactly one file per bucket with zorder_lo/hi stats.

Why not ``repartitionByRange``: Spark's range partitioner runs a sampling
job that materializes *full rows* (including the binary pixels) — measured
as a ~15 s fixed cost at 196k images that does not parallelize. The
explicit sample pass touches three int columns only.

Why not ``groupBy(pid).applyInPandas``: converting binary columns to pandas
boxes every image as a Python object and doubles peak memory; measured 3.4×
slower at local[32] than the streaming Arrow writer (43 s → 12 s at 196k
images). The bytes stay in Arrow buffers end-to-end here.

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
    """Vectorized searchsorted over the broadcast boundary list (ints only —
    the pixel bytes never enter this UDF's columns)."""
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


def equi_depth_bounds(
    keys_df, n_files: int, total_rows: int, samples_per_file: int = 256, seed: int = 42
) -> list[int]:
    """WEIGHTED equi-depth zkey cut points from a seeded sample — the
    RangePartitioner recipe (sample keys, sort on the driver, read off
    quantiles) with two engine twists:
    - column-pruned int scan (zkey + w·h), never full rows;
    - cut points split cumulative w·h, not row count: pixel area is
      proportional to both output bytes and decode/re-encode CPU, so the
      buckets are balanced in WORK and SIZE even when image dimensions are
      skewed (row-balanced cuts measured a 22% straggler tail at 8 cores).
    Sized from the manifest's row count so no count() job runs. Driver
    memory: n_files × samples_per_file (int, int) pairs."""
    if n_files <= 1 or total_rows == 0:
        return []
    frac = min(1.0, (n_files * samples_per_file) / total_rows)
    rows = (
        keys_df.sample(withReplacement=False, fraction=frac, seed=seed)
        .select("zkey", "wh")
        .collect()
    )
    if not rows:
        return []
    pairs = sorted((r.zkey, r.wh) for r in rows)
    total_w = sum(w for _, w in pairs)
    if total_w <= 0:
        return []
    bounds = []
    step = total_w / n_files
    acc = 0.0
    nxt = step
    for zkey, w in pairs[:-1]:
        acc += w
        if acc >= nxt and len(bounds) < n_files - 1:
            bounds.append(zkey)
            while acc >= nxt:
                nxt += step
    return bounds


def write_zorder_buckets(
    spark, df, root: str, job_id: str, phase: str, n_files: int,
    reencode: bool = False,
):
    """One data file per zkey bucket, bytes JVM-side until the final write:
    ``repartition(n_files, pid)`` co-locates each bucket in one task,
    ``sortWithinPartitions(pid, zkey)`` makes buckets contiguous and
    zkey-sorted, and a streaming ``mapInArrow`` writer splits batches on pid
    runs and appends slices to one ParquetWriter per bucket — no pandas
    materialization, no per-row boxing of the binary column, bounded memory
    (one Arrow batch in flight). Exact file-per-bucket with disjoint
    zorder_lo/hi ranges by construction, whatever the pid→task hashing.

    ``reencode``: the north-star pixel path (BASELINE.json:6 — "re-encode
    during rewrite"): decode each image, re-encode in its stored format,
    PSNR-verify (≥40 dB lossy, exact lossless), store the re-encoded bytes —
    all inside the Arrow batch, same kernel discipline as compact."""
    from collections.abc import Iterator

    import pyarrow as pa

    from nessie_spark.lakehouse.table import FILE_ENTRY_DDL, FILE_ENTRY_SCHEMA
    from nessie_spark.lakehouse.writer import DATA_COLUMNS

    def _write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import os as _os
        import uuid as _uuid

        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        state: dict = {"pid": None, "writer": None, "tmp": None, "st": None}
        entries: list[dict] = []

        def _close():
            if state["writer"] is None:
                return
            state["writer"].close()
            rel = f"data/{job_id}-{phase}-p{state['pid']:05d}.parquet"
            abs_path = _os.path.join(root, rel)
            _os.replace(state["tmp"], abs_path)
            st = state["st"]
            entries.append(
                {
                    "file_path": rel,
                    "file_format": "parquet",
                    "partition": "",
                    "record_count": st["rows"],
                    "file_size_bytes": _os.path.getsize(abs_path),
                    "min_phash": st["min_phash"],
                    "max_phash": st["max_phash"],
                    "min_wh": st["min_wh"],
                    "max_wh": st["max_wh"],
                    "zorder_lo": st["zlo"],
                    "zorder_hi": st["zhi"],
                    "min_key": st["min_key"],
                    "max_key": st["max_key"],
                    "added_snapshot_id": -1,
                }
            )
            state.update(pid=None, writer=None, tmp=None, st=None)

        def _open(pid: int, schema: pa.Schema):
            rel = f"data/{job_id}-{phase}-p{pid:05d}.parquet"
            abs_path = _os.path.join(root, rel)
            _os.makedirs(_os.path.dirname(abs_path), exist_ok=True)
            tmp = abs_path + f".tmp-{_uuid.uuid4().hex[:8]}"
            state.update(
                pid=pid,
                writer=pq.ParquetWriter(tmp, schema, compression="snappy"),
                tmp=tmp,
                st={
                    "rows": 0,
                    "min_phash": None, "max_phash": None,
                    "min_wh": None, "max_wh": None,
                    "zlo": None, "zhi": None,
                    "min_key": None, "max_key": None,
                },
            )

        def _fold(st: dict, sl: pa.RecordBatch):
            st["rows"] += sl.num_rows

            def mn(k, v):
                st[k] = v if st[k] is None else min(st[k], v)

            def mx(k, v):
                st[k] = v if st[k] is None else max(st[k], v)

            mn("min_phash", pc.min(sl.column("phash")).as_py())
            mx("max_phash", pc.max(sl.column("phash")).as_py())
            mn("min_wh", pc.min(sl.column("wh")).as_py())
            mx("max_wh", pc.max(sl.column("wh")).as_py())
            mn("zlo", pc.min(sl.column("zkey")).as_py())
            mx("zhi", pc.max(sl.column("zkey")).as_py())
            mn("min_key", pc.min(sl.column("image_id")).as_py())
            mx("max_key", pc.max(sl.column("image_id")).as_py())

        data_schema = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if data_schema is None:
                idxs = [batch.schema.get_field_index(c) for c in DATA_COLUMNS]
                data_schema = pa.schema([batch.schema.field(i) for i in idxs])
            pids = batch.column("pid").to_numpy()
            cuts = np.flatnonzero(np.diff(pids)) + 1
            starts = [0, *cuts.tolist()]
            ends = [*cuts.tolist(), len(pids)]
            for s0, e0 in zip(starts, ends):
                pid = int(pids[s0])
                sl = batch.slice(s0, e0 - s0)
                if pid != state["pid"]:
                    _close()
                    _open(pid, data_schema)
                cols = [sl.column(c) for c in DATA_COLUMNS]
                if reencode:
                    from nessie_spark.lakehouse import kernels as K

                    bi = DATA_COLUMNS.index("bytes")
                    fmts = sl.column("fmt").to_pylist()
                    new_bytes = []
                    for data, fmt in zip(sl.column("bytes").to_pylist(), fmts):
                        px = K.decode(bytes(data), fmt)
                        enc = K.encode(px, fmt)
                        p_db = K.psnr(px, K.decode(enc, fmt))
                        assert p_db >= (40.0 if fmt == "jpeg" else 99.0), "PSNR gate"
                        new_bytes.append(enc)
                    cols[bi] = pa.array(new_bytes, pa.binary())
                state["writer"].write_batch(
                    pa.record_batch(cols, schema=data_schema)
                )
                _fold(state["st"], sl)
        _close()
        if entries:
            yield pa.RecordBatch.from_pylist(entries, schema=FILE_ENTRY_SCHEMA)

    # Reduce-side parallelism: ~8 tasks per core (each task streams several
    # pid buckets sequentially), never more tasks than buckets. 423 buckets
    # at 8 MB through 423 one-bucket tasks measured 2× slower than 64 fat
    # tasks — per-task shuffle-fetch and Python-worker setup dominates tiny
    # tasks — while 2 tasks/core left a 22% last-wave straggler tail and
    # 4/core still left ~13%; 8/core amortizes the last wave to ~2%. Hash
    # on pid keeps each bucket whole inside one task.
    n_tasks = max(1, min(n_files, 8 * spark.sparkContext.defaultParallelism))
    if "wh" not in df.columns:
        df = df.withColumn("wh", F.col("w").cast("long") * F.col("h").cast("long"))
    shuffled = df.repartition(n_tasks, "pid").sortWithinPartitions("pid", "zkey")
    return shuffled.mapInArrow(_write, FILE_ENTRY_DDL).toArrow()


def cluster(
    spark: SparkSession,
    table: Table,
    strategy: str = "morton",
    target_bytes: int = DEFAULT_TARGET,
    n_files: int | None = None,
    job_id: str | None = None,
    reencode: bool = False,
) -> ClusterResult:
    """Rewrite the whole live file set in space-filling-curve order.

    ``reencode``: decode → re-encode → PSNR-verify every image during the
    rewrite (north_star pixel path; see write_zorder_buckets)."""
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

    # One file listing serves both passes (the DataFrame is reused; Catalyst
    # prunes the sample plan down to the three int columns on its own —
    # verified via PushedFilters/ReadSchema in tests/test_plan_shapes.py).
    base = (
        scan(spark, table)
        .withColumn("zkey", key(F.col("phash"), F.col("w"), F.col("h")))
        .withColumn("wh", F.col("w").cast("long") * F.col("h").cast("long"))
    )

    # pass 1: weighted equi-depth boundaries from a seeded sample of the
    # pruned scan (ints only, no bytes); row count comes from the manifest,
    # so this is one cheap job
    total_rows = sum(e["record_count"] for e in entries)
    bounds = equi_depth_bounds(base.select("zkey", "wh"), n_files, total_rows)

    # pass 2: the one full shuffle — bucket by boundary, one file per bucket
    df = base.withColumn("pid", _bucket_udf(bounds)(F.col("zkey")))
    stats = write_zorder_buckets(
        spark, df, root, job_id, strategy, n_files, reencode=reencode
    )
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

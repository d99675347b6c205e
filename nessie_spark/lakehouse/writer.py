"""Distributed data-file writer.

One parquet data file per Spark partition, written *inside* the task with
pyarrow (``mapInArrow`` — Arrow batches end-to-end, no row-at-a-time Python).
The task emits exactly one manifest-entry stats row per written file; the
driver only ever sees the (tiny) stats, never pixel bytes.

Determinism/resumability: file names are pure functions of
``(job_id, phase, partition_id)`` and writes go to a temp name + atomic
``os.replace`` — task retries and job re-runs land byte-stable on the same
paths (pairs with lineage.py skip logic).

Scale note: on a real cluster ``table_root`` is an object-store URI and the
``os``-level rename swaps for a conditional PUT; the Spark topology
(partition → file, stats → driver) is unchanged.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark import TaskContext
from pyspark.sql import DataFrame

from nessie_spark.lakehouse.bloom import bloom_from_keys
from nessie_spark.lakehouse import kernels as _kernels_preload  # noqa: F401
# Module-level so the per-worker writer preload (bench warm-up) also pulls
# in the image codec stack (kernels -> jpegvec LUTs) outside any timed task.
from nessie_spark.lakehouse.table import FILE_ENTRY_DDL, FILE_ENTRY_SCHEMA

DATA_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]

IMAGES_ARROW = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# Spark-DDL ↔ Arrow type map for the evolvable column types (schema
# evolution is add-column-only; see lakehouse/evolve.py)
_DDL_ARROW = {
    "string": pa.string(),
    "binary": pa.binary(),
    "int": pa.int32(),
    "long": pa.int64(),
    "bigint": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
}


def ddl_columns(ddl: str) -> list[str]:
    """Column names of a flat ``name type, ...`` DDL string, in order."""
    return [f.strip().split()[0] for f in ddl.split(",")]


def arrow_schema_from_ddl(ddl: str) -> pa.Schema:
    fields = []
    for f in ddl.split(","):
        name, typ = f.strip().split()[:2]
        if typ.lower() not in _DDL_ARROW:
            raise ValueError(f"unsupported column type {typ!r} in table DDL")
        fields.append((name, _DDL_ARROW[typ.lower()]))
    return pa.schema(fields)


def align_to_schema(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``tbl`` onto ``schema``: reorder, cast, and NULL-pad columns
    the file predates (Iceberg add-column semantics — old data files are
    immutable; readers backfill). Extra staging columns are dropped."""
    arrays = []
    for f in schema:
        if f.name in tbl.schema.names:
            arrays.append(tbl.column(f.name).cast(f.type))
        else:
            arrays.append(pa.chunked_array([pa.nulls(tbl.num_rows, f.type)]))
    return pa.Table.from_arrays(arrays, schema=schema)


def stats_entry_for(
    tbl: pa.Table, path: str, size_bytes: int, partition: str = ""
) -> dict:
    """Manifest-entry stats for one written file (FIXTURES.md §2 goldens:
    min/max must actually bound the file's rows — asserted in tests).
    ``partition``: the file's hidden-partition value (lakehouse/partition.py)
    — "" for unpartitioned tables and pre-spec files."""
    wh = pc.multiply(tbl.column("w").cast(pa.int64()), tbl.column("h").cast(pa.int64()))
    has_z = "zkey" in tbl.schema.names
    return {
        "file_path": path,
        "file_format": "parquet",
        "partition": partition,
        "record_count": tbl.num_rows,
        "file_size_bytes": size_bytes,
        "min_phash": pc.min(tbl.column("phash")).as_py(),
        "max_phash": pc.max(tbl.column("phash")).as_py(),
        "min_wh": pc.min(wh).as_py(),
        "max_wh": pc.max(wh).as_py(),
        "zorder_lo": pc.min(tbl.column("zkey")).as_py() if has_z else None,
        "zorder_hi": pc.max(tbl.column("zkey")).as_py() if has_z else None,
        "min_key": pc.min(tbl.column("image_id")).as_py(),
        "max_key": pc.max(tbl.column("image_id")).as_py(),
        "key_bloom": bloom_from_keys(tbl.column("image_id").to_pylist()),
        "added_snapshot_id": -1,
        # stamped by Table.commit (the schema version current at commit);
        # carried as an explicit NULL so every entry shape — dicts,
        # pd.DataFrame rows, RecordBatch — matches FILE_ENTRY_SCHEMA
        "schema_id": None,
    }


def write_table_file(tbl: pa.Table, abs_path: str) -> int:
    """Atomic parquet write; returns file size in bytes."""
    os.makedirs(os.path.dirname(abs_path), exist_ok=True)
    tmp = abs_path + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(tbl, tmp, compression="snappy")
    os.replace(tmp, abs_path)
    return os.path.getsize(abs_path)


def write_partition_files(
    df: DataFrame, table_root: str, job_id: str, phase: str,
    data_columns: list[str] | None = None,
    reencode: bool = False,
) -> DataFrame:
    """Write each partition of ``df`` as one data file; return stats DF.

    ``df`` must carry the images schema (optionally plus ``zkey``, which is
    recorded in stats but dropped from the data file). ``data_columns``
    overrides the written column set for evolved tables (columns absent
    from ``df`` are simply not written; readers NULL-backfill).
    ``reencode``: the north-star pixel path (decode → re-encode in the
    stored format → PSNR-verify) applied per written slice — used by the
    spec-alignment clustering rewrite, same kernel discipline as compact.
    """
    cols = data_columns or DATA_COLUMNS
    from nessie_spark.lakehouse.partition import PVAL_COL

    def _write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = TaskContext.get().partitionId()
        rows = list(batches)
        if not rows:
            return
        tbl = pa.Table.from_batches(rows)
        if tbl.num_rows == 0:
            return
        # hidden partitioning: a data file never spans partition values.
        # The append shuffle range-partitions on (pval, id), so nearly
        # every task holds ONE value and this split is a no-op; boundary
        # tasks split into one file per value (deterministic order).
        if PVAL_COL in tbl.schema.names:
            groups = sorted(set(tbl.column(PVAL_COL).to_pylist()))
            slices = [
                (g, tbl.filter(pc.equal(tbl.column(PVAL_COL), g)))
                for g in groups
            ]
        else:
            slices = [("", tbl)]
        for k, (pval, part_tbl) in enumerate(slices):
            suffix = f"-{k}" if len(slices) > 1 else ""
            rel = f"data/{job_id}-{phase}-p{pid:05d}{suffix}.parquet"
            abs_path = os.path.join(table_root, rel)
            if reencode:
                from nessie_spark.lakehouse import kernels as K

                new_bytes, _mn = K.reencode_verify(
                    part_tbl.column("bytes").to_pylist(),
                    part_tbl.column("fmt").to_pylist(),
                )
                part_tbl = part_tbl.set_column(
                    part_tbl.schema.get_field_index("bytes"), "bytes",
                    pa.array(new_bytes, pa.binary()),
                )
            data_tbl = part_tbl.select([c for c in cols if c in part_tbl.schema.names])
            size = write_table_file(data_tbl, abs_path)
            entry = stats_entry_for(part_tbl, rel, size, partition=pval)
            yield pa.RecordBatch.from_pylist([entry], schema=FILE_ENTRY_SCHEMA)

    return df.mapInArrow(_write, FILE_ENTRY_DDL)


def write_grouped_files(
    df: DataFrame, table_root: str, job_id: str, phase: str, group_col: str = "file_id"
) -> DataFrame:
    """Write exactly one data file per distinct ``group_col`` value.

    Used for controlled physical layouts (the deliberately-small-file
    fixture, FIXTURES.md §1.1) where file↔rows assignment must be exact —
    ``groupBy().applyInPandas`` guarantees one group per file regardless of
    hash collisions. Group size is bounded by the layout (≤ target file
    size), so the pandas materialization is safe.
    """
    import pandas as pd

    def _write(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        tbl = pa.Table.from_pandas(
            pdf[DATA_COLUMNS], schema=IMAGES_ARROW, preserve_index=False
        )
        rel = f"data/{job_id}-{phase}-g{gid:05d}.parquet"
        size = write_table_file(tbl, os.path.join(table_root, rel))
        return pd.DataFrame([stats_entry_for(tbl, rel, size)])

    return df.groupBy(group_col).applyInPandas(_write, FILE_ENTRY_DDL)


def collect_grouped_stats(spark, grouped_writer_df: DataFrame):
    """Run a grouped writer with AQE coalescing pinned off (tiny shuffle
    rows, heavy per-group work — see session.no_coalesce)."""
    from nessie_spark.session import no_coalesce

    with no_coalesce(spark):
        return grouped_writer_df.toArrow()

"""Table lifecycle jobs: create + append (the ingest path).

Appends are distributed writes (writer.py); only the per-file stats rows
(manifest entries) travel to the driver for the atomic commit — O(#files),
never O(#rows).
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from nessie_spark.lakehouse import lineage
from nessie_spark.lakehouse.scan import IMAGES_DDL
from nessie_spark.lakehouse.table import Table
from nessie_spark.lakehouse.writer import write_grouped_files, write_partition_files


def create_images_table(root: str, properties: dict | None = None) -> Table:
    return Table.create(root, IMAGES_DDL, properties)


def append(
    spark: SparkSession,
    table: Table,
    df: DataFrame,
    job_id: str | None = None,
    file_boundaries: list[int] | None = None,
    id_col: str = "image_id",
    sort_order: str | None = None,
    stage_only: bool = False,
    to_ref: str | None = None,
) -> int:
    """Append ``df`` (images schema) as a new snapshot.

    ``stage_only``: write-audit-publish staging — the appended files and
    snapshot are durable but the current pointer does not move until
    ``table.publish_snapshot(snap_id)`` (see Table.commit).

    ``file_boundaries``: optional cumulative row-index boundaries producing an
    exact many-small-files layout (compaction fixture). Row → file assignment
    is a vectorized searchsorted over the numeric suffix of ``image_id`` —
    deterministic, shuffle = one hash partitioning by file_id.

    ``sort_order`` (or the table property ``write.sort-order``, values
    ``zorder``/``morton``/``hilbert``): Iceberg's write-time sort order —
    appended rows are range-partitioned + sorted on the table's
    space-filling-curve key BEFORE writing, so fresh data lands with
    narrow per-file stats and prunes immediately, instead of waiting for
    the next clustering run. One extra shuffle per append; ignored under
    ``file_boundaries`` (that layout is the deliberately-unsorted
    compaction fixture).
    """
    job_id = job_id or f"append-{uuid.uuid4().hex[:8]}"
    # Idempotency guard (same contract as compact/merge): re-running a
    # committed job_id must be a no-op, not an overwrite of live data files
    # at the deterministic data/{job_id}-append-* paths (r1 ADVICE).
    prior = lineage.committed_snapshot(table.root, job_id)
    if prior is not None:
        return prior
    from nessie_spark.lakehouse.writer import ddl_columns

    table_cols = ddl_columns(table.meta.get("schema", IMAGES_DDL))
    extra = [c for c in df.columns if c not in table_cols and c != "zkey"]
    if extra:
        raise ValueError(
            f"append columns {extra} not in table schema; evolve first "
            "(lakehouse.evolve.add_column)"
        )
    if file_boundaries is not None:
        from nessie_spark.lakehouse.writer import DATA_COLUMNS

        evolved_in_df = [c for c in df.columns if c in table_cols and c not in DATA_COLUMNS]
        if evolved_in_df:
            # write_grouped_files is the fixed-layout fixture writer (base
            # Arrow schema); silently dropping evolved columns would be the
            # exact data loss the merge guard forbids
            raise ValueError(
                f"file_boundaries layout does not support evolved columns "
                f"{evolved_in_df}; append without boundaries"
            )
        import numpy as np

        bounds = np.asarray(file_boundaries, dtype=np.int64)

        @pandas_udf("int")
        def file_id_of(image_id: pd.Series) -> pd.Series:
            idx = image_id.str.slice(4).astype("int64").to_numpy()
            return pd.Series(np.searchsorted(bounds, idx, side="right").astype("int32"))

        dfg = df.withColumn("file_id", file_id_of(df[id_col]))
        stats = write_grouped_files(dfg, table.root, job_id, "append")
        from nessie_spark.lakehouse.writer import collect_grouped_stats

        entries = collect_grouped_stats(spark, stats)
    else:
        from nessie_spark.lakehouse.partition import PVAL_COL, stamp_pval, table_spec

        spec = table_spec(table)
        order = sort_order or (table.meta.get("properties") or {}).get("write.sort-order")
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if order:
            from nessie_spark.lakehouse.zorder import zorder_key

            strategy = "morton" if order in ("zorder", "morton") else order
            key = zorder_key(strategy)(F.col("phash"), F.col("w"), F.col("h"))
            # explicit partition count: the column-only form participates in
            # AQE partition coalescing, which at small batch sizes merges
            # every range into one file and destroys the per-file stats this
            # feature exists to narrow. shuffle.partitions is the session's
            # parallelism knob — the same sizing rule as any append shuffle.
            df = df.withColumn("zkey", key)
            range_cols = [F.col("zkey")]
        else:
            range_cols = []
        if spec:
            # hidden partitioning: range-partition on (pval, ...) — NOT a
            # hash on pval alone, which would funnel each partition value
            # into one task (a low-cardinality identity spec like fmt would
            # serialize the whole append). Ranges keep tasks ~single-value
            # while spreading big values over many tasks; the writer splits
            # the few boundary tasks per value.
            df = stamp_pval(df, spec)
            range_cols = [F.col(PVAL_COL)] + (range_cols or [F.col(id_col)])
        if range_cols:
            df = df.repartitionByRange(n_parts, *range_cols).sortWithinPartitions(
                *range_cols
            )
        stats = write_partition_files(
            df, table.root, job_id, "append", data_columns=table_cols
        )
        entries = stats.toArrow()
    rows = int(sum(entries.column("record_count").to_pylist() or [0]))
    snap_id = table.commit(
        "append", added=entries, summary={"job_id": job_id},
        stage_only=stage_only, to_ref=to_ref,
    )
    lineage.write_unit(
        table.root, job_id, "append", 0,
        input_files=[], output_files=entries.column("file_path").to_pylist(),
        rows=rows, nbytes=int(sum(entries.column("file_size_bytes").to_pylist() or [0])),
    )
    lineage.mark_committed(table.root, job_id, snap_id)
    return snap_id

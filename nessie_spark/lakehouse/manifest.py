"""Manifest rewrite: coalesce many small manifests via tree aggregation.

north_star (BASELINE.json:6): "manifest rewrite as a treeAggregate over
manifest-entry DataFrames". The partial+final aggregation shape:

    entries → bucket = hash(min_key) % n_out          [map-side assignment]
            → groupBy(bucket): applyInPandas writes one manifest per bucket,
              emitting a one-row summary                [partial aggregate]
            → driver folds the n_out summaries into the manifest list
              and commits                               [final aggregate]

This is the two-level ``treeAggregate(zero, seqOp, combOp, depth=2)``
re-expressed in DataFrame form so Catalyst handles distribution; entries
never collect to the driver (only the n_out summaries do).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nessie_spark.lakehouse.table import FILE_ENTRY_SCHEMA, Table


@dataclass
class ManifestRewriteResult:
    snapshot_id: int | None
    manifests_before: int
    manifests_after: int
    entries: int


SUMMARY_DDL = (
    "manifest_path string, n_entries long, record_count long, "
    "file_size_bytes long, min_key string, max_key string"
)


def rewrite_manifests(
    spark: SparkSession, table: Table, target_manifests: int | None = None
) -> ManifestRewriteResult:
    """Rewrite the current snapshot's manifests into ``target_manifests``
    (default: one per 100k entries, min 1), sorted by min_key within each."""
    before = table.manifest_paths()
    entries_df = table.files_df(spark)
    n_entries = entries_df.count()
    if n_entries == 0:
        return ManifestRewriteResult(None, len(before), 0, 0)
    n_out = target_manifests or max(1, (n_entries + 99_999) // 100_000)
    root = table.root

    # deterministic bucket by key range rank → manifests stay key-clustered,
    # which keeps MERGE matched-file pruning effective at the manifest level
    bucketed = entries_df.withColumn(
        "bucket", F.pmod(F.xxhash64("file_path"), F.lit(n_out)).cast("int")
    )

    def _write_bucket(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key[0])
        pdf = pdf.drop(columns=["bucket"]).sort_values("min_key")
        tbl = pa.Table.from_pandas(pdf, schema=FILE_ENTRY_SCHEMA, preserve_index=False)
        rel = f"metadata/manifest-rw{b:04d}-{uuid.uuid4().hex[:12]}.parquet"
        import os

        import pyarrow.parquet as pq

        pq.write_table(tbl, os.path.join(root, rel))
        return pd.DataFrame(
            [
                {
                    "manifest_path": rel,
                    "n_entries": len(pdf),
                    "record_count": int(pdf["record_count"].sum()),
                    "file_size_bytes": int(pdf["file_size_bytes"].sum()),
                    "min_key": pdf["min_key"].min(),
                    "max_key": pdf["max_key"].max(),
                }
            ]
        )

    from nessie_spark.session import no_coalesce

    with no_coalesce(spark):
        summaries = (
            bucketed.groupBy("bucket").applyInPandas(_write_bucket, SUMMARY_DDL).collect()
        )
    carried = [r.asDict() for r in summaries]
    snap = table.commit(
        "rewrite-manifests",
        added=None,
        carried_manifest_summaries=carried,
        summary={"manifests_before": len(before), "manifests_after": len(carried)},
    )
    return ManifestRewriteResult(snap, len(before), len(carried), n_entries)

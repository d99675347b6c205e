"""Bucketed co-located joins: the pre-shuffle that amortizes to zero.

Task brief ("Partitioning & shuffle"): *"use broadcast() for small dims,
repartition()/bucketing for co-located joins"*. Broadcast and salting are
covered by plans/skew.py and the MERGE path; this module evidences the
third leg — **bucketing**: pay the shuffle ONCE at write time (files are
hash-clustered by the join key, bucket count recorded in the catalog), and
every subsequent equi-join or aggregation on that key runs with **zero
Exchange** in the physical plan. At 100 TB a fact table joined daily
against per-key state saves a full-table shuffle per run — the single
biggest line item in a recurring-join pipeline.

Built on Spark's own bucketed-table support (``DataFrameWriter.bucketBy``
+ session catalog), which whole-stage codegen and AQE already understand —
no custom reader needed. Both sides must agree on (key, n_buckets); the
plan-shape tests assert the no-Exchange property rather than trusting it.

Scale notes:
- bucket count is a layout decision: pick ``n_buckets`` so one bucket of
  the BIG side fits an executor (128-512 MB); small mismatched sides can
  still broadcast.
- ``sortBy(key)`` inside buckets upgrades SortMergeJoin to skip its sort.
- bucket pruning: an equality predicate on the bucket key scans 1/n of
  the files (Spark's ``spark.sql.sources.bucketing.enabled`` path).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (callers' convenience)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
) -> str:
    """Persist ``df`` hash-bucketed (and intra-bucket sorted) by ``key``.

    One shuffle happens HERE — repartition on the key so each task writes
    exactly its buckets' rows instead of every task writing a sliver of
    every bucket (the small-file explosion of naive bucketBy: tasks ×
    buckets files). Returns the table name registered in the session
    catalog."""
    if path is None:
        path = os.path.join(
            tempfile.gettempdir(), f"nessie-bucketed-{uuid.uuid4().hex}", table_name
        )
    (
        df.repartition(n_buckets, key)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )
    return table_name


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on ``key``. With matching
    (key, n_buckets) Spark plans a SortMergeJoin directly over the bucketed
    scans — no Exchange on either side (asserted in
    tests/test_bucketed_join.py). Broadcast is suppressed for the join so
    the test proves the bucketed path, not the broadcast one."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, key, how)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes in the final physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "ReusedExchange" not in ln
    )

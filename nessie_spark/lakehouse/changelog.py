"""Changelog (CDC) scan: row-level inserts/deletes between two snapshots.

Iceberg's ``create_changelog_view`` analog, native to this table format.
Where ``scan.scan_incremental`` refuses row-changing snapshots (Iceberg's
append-only incremental-read rule), the changelog expresses EVERY snapshot
on the ancestry chain as a stream of ``insert`` / ``delete`` row changes:

- ``append``          → inserts (rows of the snapshot's added files);
- ``delete``  (MoR)   → deletes (full rows: the delete-file keys joined
                        back against the parent-visible rows — what Iceberg
                        does for equality deletes);
- ``merge`` (CoW, and any other row-changing rewrite) → the file diff
  added-vs-removed, with CARRIED rows cancelled by a (key, row-hash)
  anti-join in both directions: an updated row emits delete(old) +
  insert(new), an untouched row copied into a rewritten file emits nothing;
- pure rewrites (compact / zorder / hilbert / rewrite-manifests / expire /
  gc / set-schema / purge-deletes) → nothing (same logical rows).

Each change row carries ``_change_type`` ('insert'|'delete'),
``_change_snapshot_id``, ``_change_ordinal`` (position of the snapshot on
the walked chain, oldest = 0) and ``_commit_ts_millis`` — Iceberg's
changelog metadata columns.

``net_changes=True`` collapses the window to its net effect per row
(Iceberg's ``net_changes``): a row inserted then deleted inside the window
disappears; an updated-then-updated row emits only the final transition;
and duplicate-row multiplicities are preserved (the same row appended in
two snapshots nets to TWO inserts — |Σ±1| copies of the last-touch
representative, typed by the net's sign). One groupBy over the delta,
O(changed rows).

Scale shape: per contributing snapshot only that snapshot's added files /
delete files / removed-file set are read — work is proportional to the
CHANGED bytes in the window, never table size. The merge anti-joins
shuffle 2×(rewritten bytes) on (image_id, row-hash); AQE picks
broadcast when one side is small. Row identity uses ``xxhash64`` over all
data columns (binary included) — a hash collision (p ≈ n²/2⁶⁵) could
suppress one update's delete+insert pair, never fabricate a change.

Reference parity: the reference engine has no lakehouse layer; this module
extends the graft map (SURVEY.md §2.9) the same way deletes.py does.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nessie_spark.lakehouse.deletes import (
    BROADCAST_KEYS_MAX,
    delete_keys_df,
    pos_delete_pairs_df,
    split_delete_kinds,
)
from nessie_spark.lakehouse.scan import (
    _REWRITE_OPS,
    IMAGES_DDL,
    _snapshot_ddl,
    added_file_paths,
    ancestry_between,
    scan,
)
from nessie_spark.lakehouse.table import Table

CHANGE_TYPE_INSERT = "insert"
CHANGE_TYPE_DELETE = "delete"
CHANGE_META_COLS = [
    "_change_type",
    "_change_snapshot_id",
    "_change_ordinal",
    "_commit_ts_millis",
]


def _tag(df: DataFrame, change_type: str, snap: dict, ordinal: int) -> DataFrame:
    return (
        df.withColumn("_change_type", F.lit(change_type))
        .withColumn("_change_snapshot_id", F.lit(snap["snapshot_id"]).cast("long"))
        .withColumn("_change_ordinal", F.lit(ordinal).cast("int"))
        .withColumn("_commit_ts_millis", F.lit(snap["ts_millis"]).cast("long"))
    )


def scan_changelog(
    spark: SparkSession,
    table: Table,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
    net_changes: bool = False,
    columns: list[str] | None = None,
) -> DataFrame:
    """Row-level changes committed in ``(from_snapshot_id, to_snapshot_id]``.

    ``from_snapshot_id=None`` starts at the beginning of history;
    ``to_snapshot_id=None`` ends at the current snapshot. Endpoints must be
    retained (un-expired) snapshots on one ancestry chain — a reconstruct-
    able window — else this raises (mirroring ``scan_incremental``).

    Returns the ``to``-snapshot schema (add-column evolution: pre-evolution
    files read the new columns as NULL) plus the ``_change_*`` metadata
    columns. ``columns`` projects the DATA columns; metadata columns are
    always kept.
    """
    chain = ancestry_between(table, from_snapshot_id, to_snapshot_id)
    to_id = to_snapshot_id if to_snapshot_id is not None else table.current_snapshot_id
    ddl = (
        _snapshot_ddl(table, to_id)
        if to_id is not None
        else table.meta.get("schema", IMAGES_DDL)
    )
    empty = spark.createDataFrame([], ddl)
    data_cols = empty.columns
    out_empty = _tag(empty, CHANGE_TYPE_INSERT, {"snapshot_id": 0, "ts_millis": 0}, 0).limit(0)

    # field-id-aware reads: files in the window may predate a rename/drop;
    # _read_data_files projects each onto the target schema by field id
    # (identity fast path = one spark.read otherwise)
    from nessie_spark.lakehouse.scan import _read_data_files, _target_fields

    tfields = _target_fields(table, to_id, ddl)

    def _read(entries: list[dict]) -> DataFrame:
        return _read_data_files(spark, table, entries, ddl, tfields)

    parts: list[DataFrame] = []
    for ordinal, snap in enumerate(chain):
        op, sid = snap["operation"], snap["snapshot_id"]
        if op in _REWRITE_OPS:
            continue
        if op == "append":
            added = [
                {"file_path": p, "schema_id": snap.get("schema_id")}
                for p in added_file_paths(table, sid)
            ]
            if added:
                parts.append(_tag(_read(added), CHANGE_TYPE_INSERT, snap, ordinal))
            continue
        if op == "delete":
            dels_here = [d for d in table.delete_files(sid) if d["snapshot_id"] == sid]
            if not dels_here:
                continue
            eq_here, pos_here = split_delete_kinds(dels_here)
            if eq_here:
                keys = delete_keys_df(spark, table, eq_here)
                total = sum(d["n_keys"] for d in eq_here)
                key_lo = min(d["min_key"] for d in eq_here)
                key_hi = max(d["max_key"] for d in eq_here)
                # full deleted rows = parent-visible rows matching the keys;
                # key_range prunes the parent scan to candidate files via
                # manifest stats before the semi-join
                parent_rows = scan(
                    spark, table, snapshot_id=snap["parent_id"],
                    key_range=(key_lo, key_hi),
                )
                side = F.broadcast(keys) if total <= BROADCAST_KEYS_MAX else keys
                deleted = parent_rows.join(side, "image_id", "left_semi")
                parts.append(_tag(deleted, CHANGE_TYPE_DELETE, snap, ordinal))
            if pos_here:
                # positional: deleted rows = parent-visible rows at the
                # recorded (file, pos) addresses — a semi-join on the
                # provenance columns the parent scan exposes
                pairs = pos_delete_pairs_df(spark, table, pos_here).select(
                    F.col("file_path").alias("__fp"),
                    F.col("pos").alias("__pos"),
                )
                total = sum(d["n_keys"] for d in pos_here)
                # the pairs name exactly which data files hold deleted
                # rows — prune the parent read to those files (bounded by
                # touched files, ≤ total pairs) instead of the snapshot
                touched = {
                    r["__fp"] for r in pairs.select("__fp").distinct().collect()
                }
                parent_rows = scan(
                    spark, table, snapshot_id=snap["parent_id"],
                    with_pos=True, file_paths=touched,
                )
                side = F.broadcast(pairs) if total <= BROADCAST_KEYS_MAX else pairs
                deleted = parent_rows.join(
                    side, ["__fp", "__pos"], "left_semi"
                ).drop("__fp", "__pos")
                parts.append(_tag(deleted, CHANGE_TYPE_DELETE, snap, ordinal))
            continue
        # merge / any other row-changing rewrite: file diff vs parent,
        # carried rows cancelled by (key, row-hash) in both directions.
        # Diff the manifest LISTS first — commit() carries unchanged parent
        # manifests forward verbatim (same path), so only manifests unique
        # to one side can hold added/removed files; driver work is
        # O(changed manifests), not O(table files).
        import pyarrow.parquet as pq

        m_cur = set(table.manifest_paths(sid))
        m_par = (
            set(table.manifest_paths(snap["parent_id"]))
            if snap["parent_id"] is not None
            else set()
        )

        def _file_entries(mpaths: set) -> dict:
            # pass schema= so missing columns null-fill (same pattern as
            # Table.file_entries): a bare columns= select raises
            # ArrowInvalid on manifests written before the field-id model,
            # which fields.py promises to keep readable
            from nessie_spark.lakehouse.table import FILE_ENTRY_SCHEMA

            out: dict = {}
            for mp in sorted(mpaths):
                for e in pq.read_table(
                    mp,
                    schema=FILE_ENTRY_SCHEMA,
                    columns=["file_path", "added_snapshot_id", "schema_id"],
                ).to_pylist():
                    out[e["file_path"]] = e
            return out

        cur_only = _file_entries(m_cur - m_par)
        par_only = _file_entries(m_par - m_cur)
        added_rel = sorted(set(cur_only) - set(par_only))
        removed_rel = sorted(set(par_only) - set(cur_only))
        h = F.xxhash64(*data_cols)
        ins_raw = (
            _read([cur_only[p] for p in added_rel]).withColumn("_h", h)
            if added_rel
            else None
        )
        del_raw = (
            _read([par_only[p] for p in removed_rel]).withColumn("_h", h)
            if removed_rel
            else None
        )
        if ins_raw is not None and del_raw is not None:
            # cancel by MULTIPLICITY, not existence: a left_anti on
            # (key, hash) drops ALL copies when any match exists, so a
            # rewrite that removed one of two identical rows would emit
            # nothing (r3 ADVICE). Per side, keep count_this − count_other
            # copies: rank duplicates and drop the first count_other of
            # them (rows within a (key, hash) group are identical, so
            # which copies survive is immaterial).
            from pyspark.sql.window import Window

            wdup = Window.partitionBy("image_id", "_h").orderBy("_h")
            cd = del_raw.groupBy("image_id", "_h").agg(F.count(F.lit(1)).alias("_n_other"))
            ci = ins_raw.groupBy("image_id", "_h").agg(F.count(F.lit(1)).alias("_n_other"))

            def _cancel(side: DataFrame, other_counts: DataFrame) -> DataFrame:
                return (
                    side.join(other_counts, ["image_id", "_h"], "left")
                    .withColumn("_rn", F.row_number().over(wdup))
                    .where(F.col("_rn") > F.coalesce(F.col("_n_other"), F.lit(0)))
                    .drop("_n_other", "_rn")
                )

            ins = _cancel(ins_raw, cd)
            dele = _cancel(del_raw, ci)
        else:
            ins, dele = ins_raw, del_raw
        if ins is not None:
            parts.append(_tag(ins.drop("_h"), CHANGE_TYPE_INSERT, snap, ordinal))
        if dele is not None:
            parts.append(_tag(dele.drop("_h"), CHANGE_TYPE_DELETE, snap, ordinal))

    if not parts:
        df = out_empty
    else:
        # a delete part's parent scan may predate an add-column evolution
        # inside the window: its missing columns read as NULL (exactly what
        # the evolved schema says those rows held)
        df = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        ).select(*data_cols, *CHANGE_META_COLS)

    if net_changes and parts:
        # net per (key, row-hash) = sign(Σ±1); emit |net| copies of the
        # LAST-touch representative (duplicate-row multiplicities are
        # preserved — e.g. the same row appended in two snapshots nets to
        # TWO inserts, not one). The representative's metadata columns
        # record the last change that touched the row; its type is
        # overridden by the net's sign.
        w = df.withColumn("_h", F.xxhash64(*data_cols))
        rep_cols = [c for c in data_cols if c != "image_id"] + [
            "_change_snapshot_id",
            "_change_ordinal",
            "_commit_ts_millis",
        ]
        agg = (
            w.groupBy("image_id", "_h")
            .agg(
                F.sum(
                    F.when(F.col("_change_type") == CHANGE_TYPE_INSERT, 1).otherwise(-1)
                ).alias("_net"),
                F.max_by(F.struct(*rep_cols), F.col("_change_ordinal")).alias("_rep"),
            )
            .where(F.col("_net") != 0)
        )
        df = (
            agg.select("image_id", "_net", F.col("_rep.*"))
            .withColumn(
                "_change_type",
                F.when(F.col("_net") > 0, F.lit(CHANGE_TYPE_INSERT)).otherwise(
                    F.lit(CHANGE_TYPE_DELETE)
                ),
            )
            .withColumn("_dup", F.explode(F.sequence(F.lit(1), F.abs("_net"))))
            .drop("_net", "_dup")
            .select(*data_cols, *CHANGE_META_COLS)
        )

    if columns:
        df = df.select(*columns, *CHANGE_META_COLS)
    return df

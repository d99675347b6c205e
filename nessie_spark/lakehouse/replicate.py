"""CDC replication: keep a replica table in sync with a source table.

The disaster-recovery / dev-mirror pattern: the replica applies the
source's NET row changes since the last sync — cost per cycle ∝ changed
rows, never table size, and pure rewrites on the source (compact /
Z-order / purge) move zero bytes to the replica (the replica keeps its
own physical layout; replication is logical).

Apply order per cycle (net window semantics):

1. ``delete_keys`` on the replica for every net-deleted key AND every
   net-inserted key that already exists (replace semantics — an update's
   old version must go before its new version lands); ``delete_keys``
   intersects with the replica's visible rows, so brand-new keys cost
   nothing.
2. ``append`` the net-inserted rows.

Both sub-commits short-circuit on lineage committed markers derived from
the sync's job_id, so a crash between them resumes cleanly and a full
rerun is a metadata no-op. The anchor is stored in ``_replica.json``
under the replica root and the source snapshot is pinned with a
``replica:<name>`` tag so routine source expiry cannot strand the
window; if the window is unreconstructable anyway the sync falls back to
a FULL diff (source scan vs replica scan, both key-hash projected).

The replica carries MoR delete files between syncs (appends are never
shadowed by older deletes — applicability is by added_snapshot_id); run
``purge_deletes`` / the curation pipeline on the replica on its own
schedule, exactly like any table.

Key-uniqueness assumption: replication applies changes BY KEY (equality
deletes on ``image_id``), so like Iceberg equality deletes it requires
``image_id`` to be unique per table state — a duplicate-PK source (the
same id visible twice) cannot be partially deleted and will not
round-trip. The WAP duplicate audit (verify.audit_snapshot) is the
guard upstream.

Reference parity: no lakehouse analog in the reference; the shape grafts
its gold-vs-noisy parallel-column comparisons (dataloader.py:47-55) onto
two tables kept row-identical.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nessie_spark.lakehouse import jobs, lineage
from nessie_spark.lakehouse.changelog import scan_changelog
from nessie_spark.lakehouse.deletes import delete_keys
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import Table

_STATE = "_replica.json"


@dataclass
class ReplicateResult:
    job_id: str
    mode: str  # "initial" | "incremental" | "full-diff" | "noop"
    anchor_from: int | None
    anchor_to: int | None
    deleted: int
    inserted: int


def _load_state(dst_root: str) -> dict | None:
    try:
        with open(os.path.join(dst_root, _STATE)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _save_state(dst_root: str, state: dict) -> None:
    tmp = os.path.join(dst_root, _STATE) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, os.path.join(dst_root, _STATE))


def _retag(src: Table, name: str, sid: int | None) -> None:
    if sid is not None:  # an empty source has no snapshot to anchor
        src.refresh().replace_tag(f"replica:{name}", sid)


def sync_replica(
    spark: SparkSession,
    src: Table,
    dst: Table,
    name: str = "replica",
    job_id: str | None = None,
) -> ReplicateResult:
    """Bring ``dst`` up to date with ``src``'s current snapshot."""
    if src.meta.get("schema") != dst.meta.get("schema"):
        raise ValueError(
            "replica schema differs from source; evolve the replica first"
        )
    head = src.current_snapshot_id
    st = _load_state(dst.root)
    anchor = st["anchor_snapshot_id"] if st else None
    if st and anchor == head:
        return ReplicateResult(job_id or "noop", "noop", anchor, head, 0, 0)
    job_id = job_id or f"sync-{uuid.uuid4().hex[:8]}"

    mode = "incremental"
    if st is None:
        mode = "initial"
        changes = None
    else:
        try:
            # materialize the net window once — the delete-key projection,
            # the insert count, and the append write below would otherwise
            # each re-execute the changelog scan
            changes = scan_changelog(
                spark, src, from_snapshot_id=anchor, net_changes=True
            ).localCheckpoint(eager=True)
        except ValueError:
            mode = "full-diff"
            changes = None

    from nessie_spark.lakehouse.writer import ddl_columns

    data_cols = ddl_columns(src.meta["schema"])
    if changes is None:
        # full diff on (key, row-hash): rows only in dst → delete; rows
        # only in src (by content) → insert. Changed bytes move, not the
        # whole table, when most rows already match.
        h = F.xxhash64(*data_cols)
        s = scan(spark, src).withColumn("_h", h)
        d = scan(spark, dst).withColumn("_h", h)
        to_del = d.join(s.select("image_id", "_h"), ["image_id", "_h"], "left_anti")
        ins = s.join(d.select("image_id", "_h"), ["image_id", "_h"], "left_anti").drop("_h")
        del_keys_df = to_del.select("image_id")
    else:
        ins = changes.where(F.col("_change_type") == "insert").select(*data_cols)
        # an update's old version (delete change) AND any re-inserted key
        # already present on the replica must be removed before the new
        # version lands
        del_keys_df = (
            changes.select("image_id").distinct()
        )

    dres = delete_keys(spark, dst, del_keys_df, job_id=f"{job_id}-del")
    dst = dst.refresh()
    n_ins = ins.count()
    if n_ins:
        jobs.append(spark, dst, ins, job_id=f"{job_id}-ins")
        dst = dst.refresh()

    _save_state(dst.root, {"name": name, "src_root": src.root,
                           "anchor_snapshot_id": head})
    _retag(src, name, head)
    return ReplicateResult(job_id, mode, anchor, head, dres.n_keys, n_ins)


def create_replica(src: Table, dst_root: str) -> Table:
    """Create an empty replica table with the source's current schema."""
    t = Table.create(dst_root, src.meta["schema"],
                     properties=dict(src.meta.get("properties") or {}))
    return t


def verify_replica(spark: SparkSession, src: Table, dst: Table) -> int:
    """Number of differing (key, row-hash) rows between source and replica
    current snapshots — 0 means row-identical."""
    cols = scan(spark, src).columns
    h = F.xxhash64(*cols)
    s = scan(spark, src).select("image_id", h.alias("_h"))
    d = scan(spark, dst).select("image_id", h.alias("_h"))
    only_s = s.join(d, ["image_id", "_h"], "left_anti")
    only_d = d.join(s, ["image_id", "_h"], "left_anti")
    return only_s.count() + only_d.count()

"""Multi-table atomic transactions: stage-everywhere, one redo-log record.

Iceberg catalogs expose single-table atomic commits; committing a change
that spans TABLES (fact + dim, data + index, table + changelog) atomically
needs a catalog-level transaction. This module implements the standard
two-phase shape on top of the existing write-audit-publish primitives
(reference parity: the nessie reference has no multi-table story — this is
engine infrastructure its `State`/callback persistence, reference
nessie/helpers.py, never needed because it is single-process):

1. **Stage phase** — every participating write commits with
   ``stage_only=True``: its data files and snapshot are durable and crash-
   safe, but no reader sees them (the current pointer never moves).  The
   transaction records each ``(table_root, staged_snapshot_id)`` in an
   *intent file* (``txn-<id>.pending.json``), atomically rewritten after
   each stage so recovery always has the full participant list.
2. **Commit point** — ``commit()`` atomically renames the intent file to
   ``txn-<id>.commit.json``.  That single ``os.replace`` IS the
   transaction: before it, recovery rolls every participant back; after
   it, recovery rolls every participant forward.
3. **Roll-forward** — each staged snapshot is published (fast-forward when
   the table hasn't moved, ``cherrypick_snapshot`` replay when a
   concurrent commit landed in between — pure appends always replay).
   When the last table is published the record is renamed to
   ``txn-<id>.done.json``.

Crash anywhere and ``recover(log_dir)`` finishes the job:

* ``*.pending.json``  → the commit point was never reached: every staged
  snapshot still marked staged is dropped (``drop_staged``), the record
  becomes ``*.aborted.json``.  Data files of the abandoned branch are
  reclaimed by the next ``expire_snapshots``.
* ``*.commit.json``   → the transaction IS committed: every participant
  not yet published is published now (idempotent — participants already
  rolled forward before the crash are detected via ancestry and skipped),
  the record becomes ``*.done.json``.

Readers that need cross-table consistency mid-publish read the pinned
snapshot ids from the commit record (``consistent_snapshots``) and scan
each table at that snapshot — the same time-travel read path as
``scan(..., snapshot_id=...)``.  Readers of a single table only ever see
complete single-table snapshots (each per-table publish is itself atomic).

Scale notes: the log is one tiny JSON per transaction — no data-plane
cost.  All heavy lifting (the staged writes) is ordinary distributed
Spark; the commit point and publishes are driver-side metadata flips,
O(participants), exactly like an Iceberg REST-catalog multi-table commit.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from nessie_spark.lakehouse import jobs
from nessie_spark.lakehouse.table import CommitConflict, Table

__all__ = ["Transaction", "recover", "consistent_snapshots"]


def _atomic_write(path: str, payload: dict) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


class Transaction:
    """One multi-table transaction; see module docstring for the protocol."""

    def __init__(self, log_dir: str, txn_id: str | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.txn_id = txn_id or uuid.uuid4().hex[:16]
        self.participants: list[dict] = []
        self._state = "pending"
        self._flush()

    # -- paths ---------------------------------------------------------
    def _path(self, state: str) -> str:
        return os.path.join(self.log_dir, f"txn-{self.txn_id}.{state}.json")

    def _flush(self) -> None:
        _atomic_write(
            self._path(self._state),
            {"txn_id": self.txn_id, "participants": self.participants},
        )

    # -- stage phase -----------------------------------------------------
    def stage(self, table: Table, snapshot_id: int) -> None:
        """Record an externally staged snapshot (committed with
        ``stage_only=True`` by any job — compact, MERGE, zorder, append)
        as a participant. The intent file is atomically rewritten so a
        crash after this call still recovers the full participant list."""
        snap = table.refresh().snapshot(snapshot_id)
        if snap is None or not snap.get("staged"):
            raise ValueError(
                f"snapshot {snapshot_id} of {table.root} is not staged; "
                "transactions only adopt stage_only commits"
            )
        self.participants.append(
            {"table_root": table.root, "snapshot_id": snapshot_id}
        )
        self._flush()

    def stage_append(
        self, spark: SparkSession, table: Table, df: DataFrame, job_id: str
    ) -> int:
        """Convenience: stage an append on ``table`` inside this txn."""
        sid = jobs.append(spark, table, df, job_id=job_id, stage_only=True)
        self.stage(table.refresh(), sid)
        return sid

    # -- commit / abort --------------------------------------------------
    def commit(self) -> None:
        """Atomically commit the transaction, then roll every participant
        forward.  The rename to ``.commit.json`` is the commit point; a
        crash at any later instant is finished by ``recover``."""
        if self._state != "pending":
            raise ValueError(f"transaction already {self._state}")
        self._flush()  # persist the final participant list
        os.replace(self._path("pending"), self._path("commit"))
        self._state = "commit"
        self._roll_forward()

    def abort(self) -> None:
        """Drop every staged participant; readers never saw anything."""
        if self._state != "pending":
            raise ValueError(f"transaction already {self._state}")
        _abort_participants(self.participants)
        os.replace(self._path("pending"), self._path("aborted"))
        self._state = "aborted"

    # -- roll-forward ------------------------------------------------------
    def _roll_forward(self) -> None:
        _publish_participants(self.participants)
        os.replace(self._path("commit"), self._path("done"))
        self._state = "done"


def _publish_participants(participants: list[dict]) -> None:
    for p in participants:
        t = Table.load(p["table_root"])
        sid = p["snapshot_id"]
        snap = t.snapshot(sid)
        if snap is None:
            raise ValueError(
                f"committed transaction references unknown snapshot {sid} "
                f"of {t.root} — the table metadata was rewritten under it"
            )
        if not snap.get("staged"):
            # already rolled forward before a crash (published directly or
            # replayed as a cherry-pick, which clears the staged marker and
            # records source_snapshot_id) — idempotent skip
            continue
        try:
            t.publish_snapshot(sid)
        except CommitConflict:
            # a concurrent commit moved the head since staging: replay.
            # Pure appends always commute; a conflicting staged rewrite
            # propagates CommitConflict to the caller — the transaction's
            # writes are durable and recovery can re-run after the
            # conflicting rewrite is reconciled.
            t.cherrypick_snapshot(sid)


def _abort_participants(participants: list[dict]) -> None:
    for p in participants:
        t = Table.load(p["table_root"])
        snap = t.snapshot(p["snapshot_id"])
        if snap is not None and snap.get("staged"):
            t.drop_staged(p["snapshot_id"])


def recover(log_dir: str) -> dict:
    """Finish every interrupted transaction in ``log_dir``.

    Returns ``{"rolled_forward": [txn_id...], "rolled_back": [txn_id...],
    "failed": [{"txn_id", "error"}...]}``.  Idempotent: a second call is a
    no-op.  Run at engine startup, exactly like a WAL redo/undo pass.

    Transactions recover INDEPENDENTLY: one record whose replay raises
    (expired participant snapshot, conflicting staged rewrite) is reported
    in ``failed`` and left in the log for a retry after the operator
    reconciles it — it never blocks the redo/undo of later transactions.
    """
    rolled_forward, rolled_back, failed = [], [], []
    if not os.path.isdir(log_dir):
        return {
            "rolled_forward": rolled_forward,
            "rolled_back": rolled_back,
            "failed": failed,
        }
    for name in sorted(os.listdir(log_dir)):
        full = os.path.join(log_dir, name)
        # txn_id defaults to the log-file stem ("txn-<id>" → "<id>") and is
        # upgraded to the record's own txn_id once the JSON parses, so every
        # entry in all three result lists uses the same identifier space.
        txn_id = name.split(".")[0]
        if txn_id.startswith("txn-"):
            txn_id = txn_id[len("txn-"):]
        try:
            if name.endswith(".commit.json"):
                with open(full) as fh:
                    rec = json.load(fh)
                txn_id = rec.get("txn_id", txn_id)
                _publish_participants(rec["participants"])
                os.replace(full, full[: -len(".commit.json")] + ".done.json")
                rolled_forward.append(txn_id)
            elif name.endswith(".pending.json"):
                with open(full) as fh:
                    rec = json.load(fh)
                txn_id = rec.get("txn_id", txn_id)
                _abort_participants(rec["participants"])
                os.replace(full, full[: -len(".pending.json")] + ".aborted.json")
                rolled_back.append(txn_id)
        except Exception as exc:  # noqa: BLE001 — per-txn isolation
            failed.append({"txn_id": txn_id, "error": repr(exc)})
    return {
        "rolled_forward": rolled_forward,
        "rolled_back": rolled_back,
        "failed": failed,
    }


def consistent_snapshots(log_dir: str, txn_id: str) -> dict[str, int]:
    """The cross-table read pin for a committed transaction: map of
    ``table_root -> snapshot_id`` as of that transaction.  Scan each table
    with ``scan(spark, t, snapshot_id=...)`` for a torn-read-free view even
    while the publish phase of a LATER transaction is mid-flight."""
    for state in ("done", "commit"):
        path = os.path.join(log_dir, f"txn-{txn_id}.{state}.json")
        if os.path.exists(path):
            with open(path) as fh:
                rec = json.load(fh)
            return {
                p["table_root"]: p["snapshot_id"] for p in rec["participants"]
            }
    raise KeyError(f"transaction {txn_id} is not committed in {log_dir}")

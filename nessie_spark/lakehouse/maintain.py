"""Policy-driven table maintenance: inspect health, run ONLY what's needed.

The operational brain for a fleet of 10^12-image tables: a scheduler
cannot hand-pick jobs per table, so ``maintain(table)`` computes a
health report from MANIFEST STATS ALONE (driver-side metadata read — no
data bytes touched), plans the needed actions against a policy, and runs
them in dependency order:

    purge-deletes  (pending delete keys block every CoW rewrite)
    → compact      (small-file count ≥ threshold)
    → cluster / cluster-delta
                   (Z-order layout decayed under appends: the MINOR
                    incremental cluster — zorder.cluster_incremental, cost
                    ∝ unclustered delta — while the delta is a small
                    fraction of the table and sorted runs haven't piled
                    past max_sorted_runs; the MAJOR full rewrite — cost ∝
                    table — otherwise. Compact runs first, so the delta
                    the minor pass sorts is already bin-packed.)
    → rewrite-manifests (manifest count ≥ threshold)
    → expire + GC  (ancestor history beyond the retention policy)

Health signals and their costs:

- ``small_files`` / ``fill``: file_size_bytes vs the policy target —
  pure manifest arithmetic.
- ``zorder_overlap_pct``: fraction of adjacent file pairs (sorted by
  zorder_lo) whose key ranges overlap. 0.0 = perfectly clustered (what
  ``cluster`` leaves behind: disjoint ranges); freshly-appended unsorted
  files push it toward 1.0. Files with no zorder stats count as
  overlapping (never clustered).
- ``pending_delete_keys``: metadata of the MoR delete files.
- ``ancestor_snapshots`` / ``manifests``: metadata list lengths.

A healthy table is a metadata-only no-op — at fleet scale the scheduler
sweeps every table cheaply and pays rewrite IO only where decay actually
happened. Each executed action derives its job_id from the sweep's, so
a crashed sweep resumes idempotently (the underlying jobs short-circuit
on lineage markers).

Reference parity: no analog (the reference is a library, not a service);
this is the engine-side counterpart of its ``CallbackList`` orchestration
(helper.py:78-135) — lifecycle hooks promoted to a policy loop.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import SparkSession

from nessie_spark.lakehouse import compact as _compact
from nessie_spark.lakehouse import deletes as _deletes
from nessie_spark.lakehouse import expire as _expire
from nessie_spark.lakehouse import manifest as _manifest
from nessie_spark.lakehouse import zorder as _zorder
from nessie_spark.lakehouse.table import Table


@dataclass
class MaintenancePolicy:
    target_bytes: int = _compact.DEFAULT_TARGET
    small_file_ratio: float = 0.5  # "small" = size < ratio * target
    compact_min_small_files: int = 8
    recluster_overlap_pct: float = 0.25
    cluster_strategy: str = "morton"
    # minor/major split (LSM discipline): layout decay is fixed by the
    # CHEAP incremental cluster (cost ∝ unclustered delta) while the delta
    # stays small and the sorted-run count stays low; a full rewrite (cost
    # ∝ table) runs only when runs pile past max_sorted_runs or the decay
    # is so large a full rewrite is no dearer per byte.
    incremental_cluster_max_pct: float = 0.3  # delta bytes / table bytes
    max_sorted_runs: int = 4
    purge_min_delete_keys: int = 1
    rewrite_manifests_min: int = 8
    expire_retain_last: int | None = 20
    metadata_versions_max: int | None = 200  # v{N}.json cap before expiry


@dataclass
class HealthReport:
    live_files: int
    live_rows: int
    small_files: int
    fill: float  # mean file size / target (1.0 = perfectly packed)
    zorder_overlap_pct: float
    unclustered_files: int  # NULL zorder stats — never curve-ordered
    unclustered_bytes_pct: float
    sorted_runs: int  # max zkey-range overlap depth among clustered files
    pending_delete_files: int
    pending_delete_keys: int
    ancestor_snapshots: int
    manifests: int
    metadata_versions: int  # v{N}.json count — the commit log's disk tail


@dataclass
class MaintenanceReport:
    job_id: str
    health_before: HealthReport
    actions: list[str]
    snapshots: dict = field(default_factory=dict)
    health_after: HealthReport | None = None


def table_health(table: Table, policy: MaintenancePolicy | None = None) -> HealthReport:
    """Metadata-only health snapshot (manifest + snapshot-list reads)."""
    policy = policy or MaintenancePolicy()
    ents = table.file_entries(
        columns=["file_path", "record_count", "file_size_bytes",
                 "zorder_lo", "zorder_hi", "partition"]
    ).to_pylist()
    n = len(ents)
    small = sum(
        1 for e in ents
        if e["file_size_bytes"] < policy.small_file_ratio * policy.target_bytes
    )
    fill = (
        sum(e["file_size_bytes"] for e in ents) / (n * policy.target_bytes)
        if n else 0.0
    )
    with_z = [e for e in ents if e["zorder_lo"] is not None]
    missing_z = n - len(with_z)
    overlaps = missing_z  # unclustered files count as overlapping
    # hidden-partitioned tables cluster WITHIN each partition value, so
    # zkey ranges across values overlap by design — overlap and sorted-run
    # signals are computed per value and the worst value decides, else a
    # healthy freshly-clustered table with P partitions reads as P runs
    # and maintain escalates to a pointless major rewrite
    with_z.sort(
        key=lambda e: (e.get("partition") or "", e["zorder_lo"], e["zorder_hi"])
    )
    for a, b in zip(with_z, with_z[1:]):
        if (a.get("partition") or "") == (b.get("partition") or "") and b[
            "zorder_lo"
        ] < a["zorder_hi"]:
            overlaps += 1
    overlap_pct = overlaps / n if n else 0.0
    total_bytes = sum(e["file_size_bytes"] for e in ents)
    unclustered_bytes = sum(
        e["file_size_bytes"] for e in ents if e["zorder_lo"] is None
    )
    # sorted runs = max zkey-range overlap depth (interval sweep): 1 after
    # a full cluster (disjoint ranges), +1 per incremental run layered on
    # top — the signal that decides minor vs major clustering. Ranges are
    # CLOSED ([lo, hi], hi inclusive — a single-zkey file has lo == hi), so
    # open before close at equal key: a zero-width file must count depth 1
    # and a file touching another at one shared key value does stack —
    # buckets within one rewrite job are strictly disjoint (hi_i < lo_i+1),
    # so equal-boundary contact only ever happens ACROSS runs.
    OPEN, CLOSE = 0, 1  # open sorts before close at the same key
    runs = 0
    by_pval: dict = {}
    for e in with_z:
        by_pval.setdefault(e.get("partition") or "", []).append(e)
    for group in by_pval.values():
        events = sorted(
            [(e["zorder_lo"], OPEN) for e in group]
            + [(e["zorder_hi"], CLOSE) for e in group]
        )
        depth = 0
        for _, kind in events:
            depth += 1 if kind == OPEN else -1
            runs = max(runs, depth)
    dels = table.delete_files()
    # ancestor chain length from the current head
    by_id = {s["snapshot_id"]: s for s in table.meta["snapshots"]}
    depth, sid = 0, table.current_snapshot_id
    while sid is not None:
        depth += 1
        snap = by_id.get(sid)
        sid = snap["parent_id"] if snap else None
    return HealthReport(
        live_files=n,
        live_rows=sum(e["record_count"] for e in ents),
        small_files=small,
        fill=round(fill, 4),
        zorder_overlap_pct=round(overlap_pct, 4),
        unclustered_files=missing_z,
        unclustered_bytes_pct=round(
            unclustered_bytes / total_bytes if total_bytes else 0.0, 4
        ),
        sorted_runs=runs,
        pending_delete_files=len(dels),
        pending_delete_keys=sum(d["n_keys"] for d in dels),
        ancestor_snapshots=depth,
        manifests=len(table.manifest_paths()),
        metadata_versions=len([
            f
            for f in os.listdir(os.path.join(table.root, "metadata"))
            if f.startswith("v") and f.endswith(".json")
        ]),
    )


def plan_maintenance(
    health: HealthReport, policy: MaintenancePolicy | None = None
) -> list[str]:
    policy = policy or MaintenancePolicy()
    actions: list[str] = []
    if health.pending_delete_keys >= policy.purge_min_delete_keys and (
        health.pending_delete_files > 0
    ):
        actions.append("purge-deletes")
    if health.small_files >= policy.compact_min_small_files:
        actions.append("compact")
    if health.live_files > 1:
        if health.sorted_runs > policy.max_sorted_runs:
            # runs piled up (each a prior minor cluster / the base layout):
            # only a FULL rewrite merges them back to one disjoint layer
            actions.append("cluster")
        elif (
            health.zorder_overlap_pct >= policy.recluster_overlap_pct
            and health.unclustered_files > 0
        ):
            # layout decayed under appends — minor (delta-only) cluster
            # while the decay is a small fraction of the table, full
            # rewrite when it isn't (no cheaper per byte at that point,
            # and it resets the run count for free)
            actions.append(
                "cluster"
                if health.unclustered_bytes_pct > policy.incremental_cluster_max_pct
                else "cluster-delta"
            )
    if health.manifests >= policy.rewrite_manifests_min:
        actions.append("rewrite-manifests")
    if (
        policy.expire_retain_last is not None
        and health.ancestor_snapshots > policy.expire_retain_last
    ) or (
        policy.metadata_versions_max is not None
        and health.metadata_versions > policy.metadata_versions_max
    ):
        # expire also truncates the metadata version log when the table
        # property write.metadata.previous-versions-max is set; the sweep
        # applies the policy cap directly for tables without the property
        actions.append("expire")
    return actions


def maintain(
    spark: SparkSession,
    table: Table,
    policy: MaintenancePolicy | None = None,
    job_id: str | None = None,
    dry_run: bool = False,
) -> MaintenanceReport:
    """One maintenance sweep: health → plan → execute (unless dry_run)."""
    policy = policy or MaintenancePolicy()
    job_id = job_id or f"maintain-{uuid.uuid4().hex[:8]}"
    before = table_health(table, policy)
    actions = plan_maintenance(before, policy)
    rep = MaintenanceReport(job_id=job_id, health_before=before, actions=actions)
    if dry_run or not actions:
        return rep

    if "purge-deletes" in actions:
        r = _deletes.purge_deletes(spark, table, job_id=f"{job_id}-purge")
        table = table.refresh()
        rep.snapshots["purge-deletes"] = r.snapshot_id
    if "compact" in actions:
        r = _compact.compact(
            spark, table, target_bytes=policy.target_bytes,
            job_id=f"{job_id}-compact",
        )
        table = table.refresh()
        rep.snapshots["compact"] = r.snapshot_id
    if "cluster" in actions:
        r = _zorder.cluster(
            spark, table, strategy=policy.cluster_strategy,
            target_bytes=policy.target_bytes, job_id=f"{job_id}-cluster",
        )
        table = table.refresh()
        rep.snapshots["cluster"] = r.snapshot_id
    if "cluster-delta" in actions:
        r = _zorder.cluster_incremental(
            spark, table, strategy=policy.cluster_strategy,
            target_bytes=policy.target_bytes, job_id=f"{job_id}-zdelta",
        )
        table = table.refresh()
        rep.snapshots["cluster-delta"] = r.snapshot_id
    if "rewrite-manifests" in actions:
        r = _manifest.rewrite_manifests(spark, table)
        table = table.refresh()
        rep.snapshots["rewrite-manifests"] = r.snapshot_id
    if "expire" in actions:
        _expire.expire_snapshots(
            spark, table, retain_last=policy.expire_retain_last
        )
        if policy.metadata_versions_max is not None:
            table.refresh().expire_metadata_versions(
                keep_last=policy.metadata_versions_max
            )
        table = table.refresh()
        _expire.gc_orphans(spark, table, dry_run=False)
        rep.snapshots["expire"] = table.current_snapshot_id

    rep.health_after = table_health(table.refresh(), policy)
    return rep


def report_as_dict(rep: MaintenanceReport) -> dict:
    return asdict(rep)

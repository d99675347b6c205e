"""Incrementally-maintained materialized aggregate views over the table.

Classic incremental view maintenance (IVM), driven by the changelog: a
matview is a grouped aggregate (count + sums — the decomposable aggs;
means are derived downstream as sum/cnt) stored as Parquet next to a
small JSON state pointer. ``refresh``:

- first run — one full aggregate of the current snapshot;
- thereafter — ``scan_changelog(from=anchor)`` supplies exact row-level
  deltas; inserts contribute +1/+value and deletes −1/−value, one groupBy
  over the CHANGED rows folds them into per-group deltas, and a full-outer
  join against the stored view applies them (groups whose count reaches 0
  disappear). Refresh cost ∝ changed rows + |view|, never table size —
  pure rewrites (compact / Z-order / purge) contribute zero changed rows,
  so layout maintenance never triggers recomputation.

The anchor snapshot is pinned with a table tag (``matview:<name>``), so
routine snapshot expiry retains it (tags are retention anchors,
table.py). If the window is still unreconstructable — an operator
expired mid-window snapshots with an aggressive explicit policy — the
refresh falls back to a full rebuild instead of failing: correctness
never depends on history being intact, only cheapness does.

State swap is atomic (version-suffixed parquet dir + ``os.replace`` of
the JSON pointer), so a reader never sees a half-written view and a
refresh crash leaves the previous version intact; the immediately-
previous version is kept until the NEXT refresh so an in-flight reader
of the old pointer can finish its job. A rerun re-derives the same delta
from the same anchor (the changelog is deterministic given the snapshot
range).

Reference parity: no lakehouse analog in the reference; the shape grafts
its two-pass "aggregate then join back" detectors (SURVEY.md §2.3) onto
a persistent, incrementally-maintained aggregate.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nessie_spark.lakehouse.changelog import scan_changelog
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import Table

_STATE = "_matview.json"


@dataclass
class MatviewResult:
    name: str
    mode: str  # "initial" | "incremental" | "rebuild" | "noop"
    anchor_from: int | None
    anchor_to: int | None
    groups_changed: int
    view_rows: int


def _state_path(view_root: str) -> str:
    return os.path.join(view_root, _STATE)


def _load_state(view_root: str) -> dict | None:
    try:
        with open(_state_path(view_root)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def read_matview(spark: SparkSession, view_root: str) -> DataFrame:
    st = _load_state(view_root)
    if st is None:
        raise FileNotFoundError(f"no materialized view at {view_root}")
    return spark.read.parquet(os.path.join(view_root, st["data_dir"]))


def _aggregate(df: DataFrame, group_cols: list[str], sums: list[str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("cnt")] + [
        F.sum(F.col(c).cast("long")).alias(f"sum_{c}") for c in sums
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def refresh_matview(
    spark: SparkSession,
    table: Table,
    view_root: str,
    name: str = "view",
    group_cols: list[str] | None = None,
    sums: list[str] | None = None,
) -> MatviewResult:
    """Create or incrementally refresh the view to the table's CURRENT
    snapshot. ``group_cols``/``sums`` are fixed at creation (defaults:
    fmt / w,h); omitting them on a later refresh reuses the stored spec,
    passing DIFFERENT ones raises."""
    os.makedirs(view_root, exist_ok=True)
    st = _load_state(view_root)
    group_cols = list(
        group_cols if group_cols is not None
        else (st["group_cols"] if st else ["fmt"])
    )
    sums = list(
        sums if sums is not None else (st["sums"] if st else ["w", "h"])
    )
    head = table.current_snapshot_id
    tag = f"matview:{name}"

    def _retag(sid: int | None) -> None:
        if sid is not None:  # an empty table has no snapshot to anchor
            table.refresh().replace_tag(tag, sid)

    def _commit(df: DataFrame, mode: str, anchor_from: int | None, changed: int) -> MatviewResult:
        version = (st["version"] + 1) if st else 1
        data_dir = f"state-v{version:06d}"
        df.write.mode("overwrite").parquet(os.path.join(view_root, data_dir))
        tmp = _state_path(view_root) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "name": name,
                    "version": version,
                    "data_dir": data_dir,
                    "anchor_snapshot_id": head,
                    "group_cols": group_cols,
                    "sums": sums,
                    # durable audit: lets operators (and tests) verify the
                    # view is being maintained incrementally, not rebuilt
                    "last_mode": mode,
                },
                fh,
            )
        os.replace(tmp, _state_path(view_root))
        _retag(head)
        # keep the IMMEDIATELY-previous version so readers that loaded the
        # old pointer can finish their job (snapshot isolation for the
        # view); versions older than that are reclaimed here
        keep = {data_dir, st["data_dir"]} if st else {data_dir}
        for d in os.listdir(view_root):
            if d.startswith("state-v") and d not in keep:
                shutil.rmtree(os.path.join(view_root, d), ignore_errors=True)
        rows = read_matview(spark, view_root).count()
        return MatviewResult(name, mode, anchor_from, head, changed, rows)

    if st is not None and (
        st["group_cols"] != group_cols or st["sums"] != sums
    ):
        raise ValueError(
            f"matview {name!r} was created with group_cols={st['group_cols']}, "
            f"sums={st['sums']}; refresh cannot change them"
        )

    if st is None:
        full = _aggregate(scan(spark, table), group_cols, sums)
        return _commit(full, "initial", None, -1)

    anchor = st["anchor_snapshot_id"]
    if head == anchor:
        rows = read_matview(spark, view_root).count()
        return MatviewResult(name, "noop", anchor, head, 0, rows)

    try:
        delta = scan_changelog(spark, table, from_snapshot_id=anchor)
    except ValueError:
        # window unreconstructable (mid-window expiry / rollback past the
        # anchor): rebuild from the current snapshot
        full = _aggregate(scan(spark, table), group_cols, sums)
        return _commit(full, "rebuild", anchor, -1)

    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    daggs = [F.sum(sign).alias("d_cnt")] + [
        F.sum(sign * F.col(c).cast("long")).alias(f"d_sum_{c}") for c in sums
    ]
    # materialize the per-group delta once (tiny: one row per changed
    # group) — the count and the merge-write below otherwise re-execute
    # the full changelog scan twice
    dagg = delta.groupBy(*group_cols).agg(*daggs).localCheckpoint(eager=True)
    n_changed = dagg.count()
    if n_changed == 0:  # only pure rewrites in the window
        _retag(head)
        tmp = _state_path(view_root) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({**st, "anchor_snapshot_id": head, "last_mode": "noop"}, fh)
        os.replace(tmp, _state_path(view_root))
        rows = read_matview(spark, view_root).count()
        return MatviewResult(name, "noop", anchor, head, 0, rows)

    old = read_matview(spark, view_root)
    zero = F.lit(0).cast("long")
    # null-safe join on the group keys: a NULL group value is a real group
    # (e.g. pre-evolution rows of an added column) and must match, which a
    # USING-column join would reject
    cond = reduce(
        lambda a, b: a & b, [old[g].eqNullSafe(dagg[g]) for g in group_cols]
    )
    merged = (
        old.join(dagg, cond, "full_outer")
        .select(
            *[F.coalesce(old[g], dagg[g]).alias(g) for g in group_cols],
            (F.coalesce(old["cnt"], zero) + F.coalesce(dagg["d_cnt"], zero)).alias(
                "cnt"
            ),
            *[
                (
                    F.coalesce(old[f"sum_{c}"], zero)
                    + F.coalesce(dagg[f"d_sum_{c}"], zero)
                ).alias(f"sum_{c}")
                for c in sums
            ],
        )
        .where(F.col("cnt") > 0)
    )
    return _commit(merged, "incremental", anchor, n_changed)

"""First-class Spark integration via the Python Data Source API
(pyspark 4.1, SPARK-44076): ``spark.read.format("nessie")``,
``df.write.format("nessie").mode("append")``, and
``spark.readStream.format("nessie")`` over the engine's table format.

Why this exists beside ``lakehouse.scan``/``lakehouse.jobs``: the scan/jobs
API is the engine's native surface, but ecosystem code (SQL-only users,
notebooks, third-party pipelines) speaks ``format(...).load(...)``. This
binding makes the table format interoperable without giving up the
engine's guarantees:

- **Batch read** plans through the SAME three-tier pruning as ``scan``
  (manifest-list key ranges → per-file stats/blooms → predicate re-apply):
  ``pushFilters`` maps Catalyst's pushed predicates (``image_id`` point/
  range lookups, hidden-partition equality on spec source columns) onto
  ``plan_files`` arguments, then reports every filter back as unhandled so
  Spark re-applies them row-wise — pruning is an optimization, never a
  correctness dependency (the same contract as ``scan(key_eq=...)``).
  One :class:`InputPartition` per surviving data file → executor-parallel
  pyarrow reads that yield Arrow batches straight into Spark's columnar
  pipeline (no Row-object materialization). Merge-on-read deletes
  (equality AND positional, Iceberg v2 semantics — deletes.py) are
  subtracted per file inside the task with the same applicability rules
  as the native scan: an equality delete applies to files added BEFORE
  it; a positional delete self-scopes to its named file.
- **Batch write** is an append-only sink speaking the manifest commit
  protocol: executors write parquet data files + per-file stats entries
  (min/max/bloom — the same ``stats_entry_for`` every engine writer
  uses), the driver folds the :class:`WriterCommitMessage` stats into ONE
  atomic ``Table.commit`` — all-or-nothing snapshot visibility, and a
  crashed/aborted job leaves only unreferenced files for GC. An optional
  ``job_id`` gives the engine's idempotent-rerun contract (a committed
  job_id re-run is a metadata no-op). ``mode("overwrite")`` is refused:
  row-level change goes through MERGE / delete_where, not blind truncate.
- **Streaming write** (``writeStream.format("nessie")``) is the
  exactly-once table sink: executors write uniquely-named data files per
  attempt, ``commit(messages, batchId)`` derives the engine job_id from
  the batch id and short-circuits when already committed — a replayed
  micro-batch never doubles rows (stray files from replays are ordinary
  GC orphans). Composes with the streaming read into a nessie→nessie
  incremental pipeline with end-to-end exactly-once table state.
- **Streaming read** exposes the snapshot log as an exactly-once source:
  offsets ARE snapshot ids (monotone along the ancestry chain), each
  micro-batch reads the ``-add`` manifests of append snapshots in
  ``(start, end]`` — work ∝ new data, never table size. Pure layout
  rewrites (compact / zorder / rewrite-manifests / expire) move no rows
  and are skipped; row-CHANGING commits (delete/merge/update) raise by
  default — an append-log reader that silently crossed one would be
  wrong — or are skipped with ``skipChangeCommits=true`` (the same
  opt-out Delta's streaming source exposes publicly).

Scale: the driver ships per-file partitions (path + field-id projection +
applicable delete files) — O(planned files), the same driver footprint as
``plan_files`` itself; row bytes only ever move executor-side.

Reference parity note: the reference engine (UKPLab/nessie) reads corpora
via in-process loaders (see sources/loaders.py for those); this module is
engine-infrastructure beyond the reference, mirroring Iceberg/Delta's
public Spark connector surface.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import Iterator

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

FORMAT_NAME = "nessie"

# key_range pruning uses closed bounds; emulate open bounds on strings by
# nudging with the min/max printable sentinels (re-applied row-wise anyway)
_KEY_MIN = ""
_KEY_MAX = "\U0010ffff"




def _opt(options: dict, name: str, default=None):
    """Case-insensitive option lookup: Spark hands DataSource options as a
    lower-cased CaseInsensitiveDict, so ``startingSnapshot`` arrives as
    ``startingsnapshot``."""
    lowered = {str(k).lower(): v for k, v in options.items()}
    return lowered.get(name.lower(), default)


@dataclass
class FilePartition(InputPartition):
    """One data file: everything a task needs, self-contained."""

    root: str
    rel_path: str
    added_sid: int
    # field-id projection rows: (physical_name|None, stored_type|None,
    # current_name, target_type) — fields.projection()
    proj: list
    ddl: str
    eq_dels: list = field(default_factory=list)  # [(rel_path, min_key, max_key)]
    pos_dels: list = field(default_factory=list)  # [rel_path]


@dataclass
class _CommitMsg(WriterCommitMessage):
    entries: list  # stats_entry_for dicts


def _arrow_schema(ddl: str) -> pa.Schema:
    from nessie_spark.lakehouse.writer import arrow_schema_from_ddl

    return arrow_schema_from_ddl(ddl)


def _read_partition_table(p: FilePartition, mor: bool = True) -> pa.Table:
    """Read one data file projected onto the target schema by field id,
    with merge-on-read delete subtraction (the task-side twin of
    deletes._purge_unit's read path)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    aschema = _arrow_schema(p.ddl)
    phys_cols = [ph for ph, _s, _c, _t in p.proj if ph is not None]
    tbl = pq.read_table(os.path.join(p.root, p.rel_path), columns=phys_cols)
    n = tbl.num_rows
    arrays, names = [], []
    for phys, _styp, cur, _typ in p.proj:
        tgt = aschema.field(cur).type
        if phys is None:
            arrays.append(pa.chunked_array([pa.nulls(n, tgt)]))
        else:
            col = tbl.column(phys)
            arrays.append(col.cast(tgt) if col.type != tgt else col)
        names.append(cur)
    out = pa.Table.from_arrays(arrays, names=names)
    if not mor:
        return out
    # positional deletes FIRST: positions index the file's row order,
    # which the projection above preserves and the equality filter below
    # would destroy. Pos files are sorted by file_path → footer pruning.
    pos_list: list[int] = []
    for dp in p.pos_dels:
        ptb = pq.read_table(
            os.path.join(p.root, dp),
            filters=[("file_path", "==", p.rel_path)],
            columns=["pos"],
        )
        if ptb.num_rows:
            pos_list.extend(ptb.column("pos").to_pylist())
    if pos_list:
        keep = np.ones(out.num_rows, dtype=bool)
        keep[np.asarray(pos_list, dtype=np.int64)] = False
        out = out.filter(pa.array(keep))
    if p.eq_dels and out.num_rows:
        mn = pc.min(out.column("image_id")).as_py()
        mx = pc.max(out.column("image_id")).as_py()
        chunks = []
        for dp, dmn, dmx in p.eq_dels:
            if dmx < mn or dmn > mx:
                continue  # key ranges disjoint — skip the read entirely
            kt = pq.read_table(
                os.path.join(p.root, dp),
                filters=[("image_id", ">=", mn), ("image_id", "<=", mx)],
            )
            if kt.num_rows:
                chunks.append(kt.column("image_id").combine_chunks())
        if chunks:
            keys = pa.concat_arrays(
                [c.chunk(0) if isinstance(c, pa.ChunkedArray) else c for c in chunks]
            )
            out = out.filter(
                pc.invert(pc.is_in(out.column("image_id"), value_set=keys))
            )
    return out


def _partitions_for_entries(
    table, entries: list[dict], snapshot_id, ddl: str, mor: bool = True
) -> list[FilePartition]:
    """Driver-side partition planning: per-entry field-id projection +
    the delete files applicable to each entry."""
    from nessie_spark.lakehouse import fields as FM
    from nessie_spark.lakehouse.deletes import split_delete_kinds
    from nessie_spark.lakehouse.scan import _target_fields

    tfields = _target_fields(table, snapshot_id, ddl)
    snap_sids = FM.sid_by_snapshot(table.meta)
    projs: dict[int, list] = {}
    eq_dels, pos_dels = ([], [])
    if mor:
        eq, pos = split_delete_kinds(table.delete_files(snapshot_id))
        eq_dels = [(d["file_path"], d["min_key"], d["max_key"], d["snapshot_id"]) for d in eq]
        pos_dels = [d["file_path"] for d in pos]
    parts = []
    for e in entries:
        sid = FM.entry_schema_id(e, snap_sids)
        if sid not in projs:
            projs[sid] = FM.projection(table.meta, sid, tfields)
        added = int(e.get("added_snapshot_id") or 0)
        parts.append(
            FilePartition(
                root=table.root,
                rel_path=e["file_path"],
                added_sid=added,
                proj=projs[sid],
                ddl=ddl,
                # equality deletes apply to files added BEFORE the delete
                # (a key re-inserted afterwards stays visible — scan.py)
                eq_dels=[
                    (dp, mn, mx) for dp, mn, mx, dsid in eq_dels if added < dsid
                ],
                pos_dels=list(pos_dels),
            )
        )
    return parts


class NessieBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = _opt(options, "path")
        if not self.root:
            raise ValueError('format("nessie") requires .load(<table root>)')
        snap = _opt(options, "snapshotId")
        self.snapshot_id = int(snap) if snap else None
        self.ref = _opt(options, "ref")
        self._key_eq: str | None = None
        self._key_lo: str | None = None
        self._key_hi: str | None = None
        self._source_eq: dict = {}

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Map pushable predicates onto plan_files pruning args. EVERY
        filter is returned as unhandled so Spark re-applies it row-wise —
        bloom false positives / range over-approximation cost an extra
        file read, never a wrong row (the scan(key_eq=...) contract)."""
        from nessie_spark.lakehouse.partition import table_spec
        from nessie_spark.lakehouse.table import Table

        try:
            spec = table_spec(Table.load(self.root)) or []
            srcs = {f["source"] for f in spec}
        except Exception:
            srcs = set()
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if col == "image_id":
                if isinstance(f, EqualTo) and isinstance(f.value, str):
                    self._key_eq = f.value
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) and isinstance(
                    f.value, str
                ):
                    v = f.value
                    self._key_lo = v if self._key_lo is None else max(self._key_lo, v)
                elif isinstance(f, (LessThan, LessThanOrEqual)) and isinstance(
                    f.value, str
                ):
                    v = f.value
                    self._key_hi = v if self._key_hi is None else min(self._key_hi, v)
            elif (
                col in srcs
                and isinstance(f, EqualTo)
                and isinstance(f.value, (str, int))
            ):
                self._source_eq[col] = f.value
        return filters  # all re-applied by Spark

    def _plan(self):
        from nessie_spark.lakehouse.scan import _snapshot_ddl, plan_files
        from nessie_spark.lakehouse.table import Table

        t = Table.load(self.root)
        sid = self.snapshot_id
        if self.ref is not None:
            sid = t.resolve_ref(self.ref)
        key_range = None
        if self._key_lo is not None or self._key_hi is not None:
            key_range = (self._key_lo or _KEY_MIN, self._key_hi or _KEY_MAX)
        entries = plan_files(
            t,
            sid,
            key_range=key_range,
            key_eq=self._key_eq,
            source_eq=self._source_eq or None,
        )
        ddl = _snapshot_ddl(t, sid)
        return t, entries, sid, ddl

    def partitions(self) -> list[FilePartition]:
        t, entries, sid, ddl = self._plan()
        return _partitions_for_entries(t, entries, sid, ddl, mor=True)

    def read(self, partition: FilePartition) -> Iterator[pa.RecordBatch]:
        if partition is None:
            return  # empty plan: Spark probes one default partition
        yield from _read_partition_table(partition, mor=True).to_batches()


class NessieArrowWriter(DataSourceArrowWriter):
    """Append-only sink: executor file writes + one atomic driver commit."""

    def __init__(self, options: dict, ddl: str):
        self.root = _opt(options, "path")
        if not self.root:
            raise ValueError('format("nessie") requires .save(<table root>)')
        self.job_id = _opt(options, "job_id") or f"dsw-{uuid.uuid4().hex[:8]}"
        self.ddl = ddl

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _CommitMsg:
        from pyspark import TaskContext

        from nessie_spark.lakehouse.writer import (
            align_to_schema,
            stats_entry_for,
            write_table_file,
        )

        batches = [b for b in iterator]
        if not batches:
            return _CommitMsg(entries=[])
        tbl = pa.Table.from_batches(batches)
        if tbl.num_rows == 0:
            return _CommitMsg(entries=[])
        tbl = align_to_schema(tbl, _arrow_schema(self.ddl))
        pid = TaskContext.get().partitionId()
        rel = f"data/{self.job_id}-dsw-p{pid:05d}.parquet"
        size = write_table_file(tbl, os.path.join(self.root, rel))
        return _CommitMsg(entries=[stats_entry_for(tbl, rel, size)])

    def commit(self, messages) -> None:
        from nessie_spark.lakehouse import lineage
        from nessie_spark.lakehouse.table import FILE_ENTRY_SCHEMA, Table

        entries = [e for m in messages if m is not None for e in m.entries]
        t = Table.load(self.root)
        if lineage.committed_snapshot(t.root, self.job_id) is not None:
            return  # idempotent re-run of a committed job_id
        if not entries:
            return
        added = pa.Table.from_pylist(entries, schema=FILE_ENTRY_SCHEMA)
        snap_id = t.commit("append", added=added, summary={"job_id": self.job_id})
        lineage.write_unit(
            t.root, self.job_id, "append", 0,
            input_files=[], output_files=[e["file_path"] for e in entries],
            rows=int(sum(e["record_count"] for e in entries)),
            nbytes=int(sum(e["file_size_bytes"] for e in entries)),
        )
        lineage.mark_committed(t.root, self.job_id, snap_id)

    def abort(self, messages) -> None:
        # best-effort cleanup; anything left is unreferenced → orphan GC
        for m in messages or []:
            if m is None:
                continue
            for e in m.entries:
                try:
                    os.remove(os.path.join(self.root, e["file_path"]))
                except OSError:
                    pass


class NessieStreamArrowWriter(DataSourceStreamArrowWriter):
    """Exactly-once streaming sink: ``writeStream.format("nessie")``.

    Executors write data files with fresh unique names every attempt; the
    driver's ``commit(messages, batchId)`` derives the engine job_id from
    the batch id and SHORT-CIRCUITS when that job_id already committed —
    so a replayed micro-batch (restart from checkpoint, commit-phase
    crash) never doubles rows. Replays may leave unreferenced data files;
    those are ordinary orphans the GC sweep reclaims (the same guarantee
    foreachBatch ingest documents). Table state is exactly-once."""

    def __init__(self, options: dict, table_ddl: str):
        self.root = _opt(options, "path")
        if not self.root:
            raise ValueError('format("nessie") requires .start(<table root>)')
        self.prefix = _opt(options, "job_id") or _opt(options, "queryName") or "stream"
        self.ddl = table_ddl

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _CommitMsg:
        from pyspark import TaskContext

        from nessie_spark.lakehouse.writer import (
            align_to_schema,
            stats_entry_for,
            write_table_file,
        )

        batches = [b for b in iterator]
        if not batches:
            return _CommitMsg(entries=[])
        tbl = pa.Table.from_batches(batches)
        if tbl.num_rows == 0:
            return _CommitMsg(entries=[])
        tbl = align_to_schema(tbl, _arrow_schema(self.ddl))
        pid = TaskContext.get().partitionId()
        rel = f"data/{self.prefix}-sw-{uuid.uuid4().hex[:8]}-p{pid:05d}.parquet"
        size = write_table_file(tbl, os.path.join(self.root, rel))
        return _CommitMsg(entries=[stats_entry_for(tbl, rel, size)])

    def commit(self, messages, batchId: int) -> None:
        from nessie_spark.lakehouse import lineage
        from nessie_spark.lakehouse.table import FILE_ENTRY_SCHEMA, Table

        job_id = f"{self.prefix}-b{batchId}"
        t = Table.load(self.root)
        if lineage.committed_snapshot(t.root, job_id) is not None:
            return  # replayed micro-batch: table already holds it
        entries = [e for m in messages if m is not None for e in m.entries]
        if not entries:
            # commit the marker anyway: an empty batch replay must also
            # short-circuit instead of re-running executor writes
            lineage.mark_committed(t.root, job_id, t.current_snapshot_id or 0)
            return
        added = pa.Table.from_pylist(entries, schema=FILE_ENTRY_SCHEMA)
        snap_id = t.commit(
            "append", added=added, summary={"job_id": job_id, "batch_id": batchId}
        )
        lineage.write_unit(
            t.root, job_id, "append", 0,
            input_files=[], output_files=[e["file_path"] for e in entries],
            rows=int(sum(e["record_count"] for e in entries)),
            nbytes=int(sum(e["file_size_bytes"] for e in entries)),
        )
        lineage.mark_committed(t.root, job_id, snap_id)

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is None:
                continue
            for e in m.entries:
                try:
                    os.remove(os.path.join(self.root, e["file_path"]))
                except OSError:
                    pass


class NessieStreamReader(DataSourceStreamReader):
    """Snapshot-log streaming source; offsets are snapshot ids."""

    def __init__(self, options: dict):
        self.root = _opt(options, "path")
        if not self.root:
            raise ValueError('format("nessie") requires .load(<table root>)')
        self.skip_change = (
            str(_opt(options, "skipChangeCommits", "false")).lower() == "true"
        )
        self.starting = str(_opt(options, "startingSnapshot", "latest"))

    def _table(self):
        from nessie_spark.lakehouse.table import Table

        return Table.load(self.root)

    def initialOffset(self) -> dict:
        if self.starting == "earliest":
            return {"snapshot_id": 0}
        if self.starting == "latest":
            return {"snapshot_id": int(self._table().current_snapshot_id or 0)}
        return {"snapshot_id": int(self.starting)}

    def latestOffset(self) -> dict:
        return {"snapshot_id": int(self._table().current_snapshot_id or 0)}

    def partitions(self, start: dict, end: dict) -> list[FilePartition]:
        from nessie_spark.lakehouse.scan import (
            _REWRITE_OPS,
            _snapshot_ddl,
            added_file_paths,
            ancestry_between,
        )

        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
        if hi <= lo:
            return []
        t = self._table()
        ddl = _snapshot_ddl(t, hi)
        parts: list[FilePartition] = []
        for snap in ancestry_between(t, lo, hi):
            op, sid = snap["operation"], snap["snapshot_id"]
            if op in _REWRITE_OPS:
                continue  # layout-only: no row appears or disappears
            if op != "append":
                if self.skip_change:
                    continue
                raise ValueError(
                    f"snapshot {sid} is a row-changing '{op}' commit; this "
                    "is an append-log stream — read lakehouse.changelog for "
                    "CDC, or set skipChangeCommits=true to ignore it"
                )
            entries = [
                {"file_path": p, "added_snapshot_id": sid, "schema_id": snap.get("schema_id")}
                for p in added_file_paths(t, sid)
            ]
            # append-log semantics: rows AS APPENDED — later deletes are
            # not retro-applied (mor=False), matching Iceberg's streaming
            # read of append snapshots
            parts.extend(_partitions_for_entries(t, entries, sid, ddl, mor=False))
        return parts

    def read(self, partition: FilePartition) -> Iterator[pa.RecordBatch]:
        if partition is None:
            return  # empty window: Spark probes one default partition
        yield from _read_partition_table(partition, mor=False).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; nothing engine-side

    def stop(self) -> None:
        pass


class NessieDataSource(DataSource):
    """``spark.dataSource.register(NessieDataSource)`` → then
    ``spark.read.format("nessie").load(root)`` etc."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        from nessie_spark.lakehouse.scan import _snapshot_ddl
        from nessie_spark.lakehouse.table import Table

        t = Table.load(_opt(self.options, "path"))
        snap = _opt(self.options, "snapshotId")
        sid = int(snap) if snap else None
        if _opt(self.options, "ref"):
            sid = t.resolve_ref(_opt(self.options, "ref"))
        return _snapshot_ddl(t, sid)

    def reader(self, schema) -> NessieBatchReader:
        return NessieBatchReader(dict(self.options))

    def writer(self, schema, overwrite: bool) -> NessieArrowWriter:
        if overwrite:
            raise ValueError(
                'format("nessie") is an append-only sink; use MERGE INTO '
                "(lakehouse.merge) or delete_where for row-level change"
            )
        from nessie_spark.lakehouse.table import Table
        from nessie_spark.lakehouse.writer import ddl_columns

        t = Table.load(_opt(self.options, "path"))
        table_ddl = t.meta["schema"]
        extra = [
            f.name for f in schema.fields if f.name not in ddl_columns(table_ddl)
        ]
        if extra:
            raise ValueError(
                f"write columns {extra} not in table schema; evolve first "
                "(lakehouse.evolve.add_column)"
            )
        # align/commit against the TABLE's schema (jobs.append contract);
        # columns the frame lacks are NULL-backfilled by align_to_schema
        return NessieArrowWriter(dict(self.options), table_ddl)

    def streamReader(self, schema) -> NessieStreamReader:
        return NessieStreamReader(dict(self.options))

    def streamWriter(self, schema, overwrite: bool) -> NessieStreamArrowWriter:
        from nessie_spark.lakehouse.table import Table

        t = Table.load(_opt(self.options, "path"))
        return NessieStreamArrowWriter(dict(self.options), t.meta["schema"])


def register(spark) -> None:
    """Idempotent format registration for the session. Also flips on
    Python-datasource filter pushdown (off by default in 4.1): Spark
    refuses to plan a reader that implements pushFilters while the
    feature flag is off, and pruning is the point of this reader."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(NessieDataSource)

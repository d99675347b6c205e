"""Schema evolution: add / rename / drop column, Iceberg-style.

Every operation is a METADATA-ONLY commit — no data file is touched:

- **add**: existing files simply predate the column; every reader
  NULL-backfills via an explicit read schema.
- **rename / drop**: safe through the field-id model (fields.py — the
  Iceberg indirection): a rename changes only the display name of an
  immutable field id, a drop retires the id forever, and re-adding a
  dropped name allocates a FRESH id, so old data can never resurrect
  under the new column. Readers resolve each file's physical column
  names through the schema version it was written under (manifest-entry
  ``schema_id``); maintenance rewrites normalize files to the current
  names as a side effect, so evolution debt amortizes to zero.

Snapshots record the schema (and schema_id) current as of the commit, so
pinned / time-travel reads use the names their data was written under.

Type changes: WIDENING only (int→long, float→double — lossless reads;
the Iceberg promotion matrix). Narrowing and cross-family changes raise.
Reserved engine columns
(fields.RESERVED_FIELDS — stats/zorder/merge/codec dependencies) and
active partition-spec sources cannot be renamed or dropped.

Scale shape: O(1) — one metadata JSON write under the same optimistic
commit loop as data commits; no shuffle, no file I/O proportional to the
table.
"""

from __future__ import annotations

import copy

from nessie_spark.lakehouse.fields import (
    RESERVED_FIELDS,
    ddl_from_fields,
    materialized,
)
from nessie_spark.lakehouse.table import Table
from nessie_spark.lakehouse.writer import _DDL_ARROW, ddl_columns


def add_column(table: Table, name: str, sql_type: str, doc: str | None = None) -> int:
    """Append ``name sql_type`` to the table schema; returns the new
    snapshot id. The column is nullable everywhere by construction."""
    if not name.isidentifier():
        raise ValueError(f"invalid column name {name!r}")
    if sql_type.lower() not in _DDL_ARROW:
        raise ValueError(
            f"unsupported type {sql_type!r}; supported: {sorted(_DDL_ARROW)}"
        )
    def _dupe(ddl: str) -> bool:
        # case-INSENSITIVE: Spark analysis is case-insensitive by default,
        # so 'Caption' next to 'caption' makes every read of either column
        # AMBIGUOUS_REFERENCE — and drop/rename are unsupported, so the
        # table would be permanently broken
        return name.lower() in {c.lower() for c in ddl_columns(ddl)}

    if _dupe(table.meta["schema"]):
        raise ValueError(f"column {name!r} already exists")

    def _update(meta: dict) -> dict:
        # Computed against the REFRESHED metadata on every commit attempt:
        # a schema string precomputed from a stale base would silently drop
        # a concurrent writer's column on optimistic retry (lost update).
        ddl = meta["schema"]
        if _dupe(ddl):
            raise ValueError(f"column {name!r} already exists")
        model = materialized(meta)
        fields = copy.deepcopy(model["schemas"][str(model["current_schema_id"])])
        fid = model["last_field_id"] + 1  # fresh id: a re-added name NEVER
        # sees data stored under a previously dropped id
        fields.append({"id": fid, "name": name, "type": sql_type.lower()})
        new_sid = max(int(k) for k in model["schemas"]) + 1
        return {
            "schema": ddl_from_fields(fields),
            "schemas": dict(model["schemas"], **{str(new_sid): fields}),
            "current_schema_id": new_sid,
            "last_field_id": fid,
        }

    return table.commit(
        "set-schema",
        meta_updates=_update,
        summary={"added_column": f"{name} {sql_type.lower()}", "doc": doc or ""},
    )


def _spec_sources(meta: dict) -> set[str]:
    from nessie_spark.lakehouse.partition import PROPERTY_KEY

    spec = (meta.get("properties") or {}).get(PROPERTY_KEY) or []
    return {f["source"] for f in spec}


def _evolvable(meta: dict, name: str) -> None:
    if name in RESERVED_FIELDS:
        raise ValueError(
            f"column {name!r} is a reserved engine column (manifest stats / "
            "zorder keys / merge join key / codec inputs) — cannot rename or drop"
        )
    if name in _spec_sources(meta):
        raise ValueError(
            f"column {name!r} is an active partition-spec source — clear or "
            "evolve the spec first (set_partition_spec)"
        )


def rename_column(table: Table, old: str, new: str) -> int:
    """Rename ``old`` to ``new`` — metadata-only; the field id (and every
    data file) is untouched. Returns the new snapshot id."""
    if not new.isidentifier():
        raise ValueError(f"invalid column name {new!r}")

    def _update(meta: dict) -> dict:
        _evolvable(meta, old)
        model = materialized(meta)
        fields = copy.deepcopy(model["schemas"][str(model["current_schema_id"])])
        names = {f["name"].lower() for f in fields}
        if old.lower() not in names:
            raise ValueError(f"column {old!r} does not exist")
        if new.lower() in names - {old.lower()}:
            raise ValueError(f"column {new!r} already exists")
        for f in fields:
            if f["name"].lower() == old.lower():
                f["name"] = new
        new_sid = max(int(k) for k in model["schemas"]) + 1
        return {
            "schema": ddl_from_fields(fields),
            "schemas": dict(model["schemas"], **{str(new_sid): fields}),
            "current_schema_id": new_sid,
            "last_field_id": model["last_field_id"],
        }

    return table.commit(
        "set-schema",
        meta_updates=_update,
        summary={"renamed_column": f"{old} -> {new}"},
    )


def widen_column(table: Table, name: str, new_type: str) -> int:
    """Widen ``name`` to ``new_type`` — metadata-only, lossless by
    construction (fields.WIDENINGS: int→long, float→double). Old files
    keep their stored type; readers cast up per file group. Returns the
    new snapshot id."""
    from nessie_spark.lakehouse.fields import WIDENINGS

    new_type = new_type.lower()

    def _update(meta: dict) -> dict:
        _evolvable(meta, name)
        model = materialized(meta)
        fields = copy.deepcopy(model["schemas"][str(model["current_schema_id"])])
        hit = [f for f in fields if f["name"].lower() == name.lower()]
        if not hit:
            raise ValueError(f"column {name!r} does not exist")
        old_type = hit[0]["type"]
        if (old_type, new_type) not in WIDENINGS:
            raise ValueError(
                f"cannot change {name!r} from {old_type!r} to {new_type!r}; "
                f"legal widenings: {sorted(WIDENINGS)}"
            )
        hit[0]["type"] = new_type
        new_sid = max(int(k) for k in model["schemas"]) + 1
        return {
            "schema": ddl_from_fields(fields),
            "schemas": dict(model["schemas"], **{str(new_sid): fields}),
            "current_schema_id": new_sid,
            "last_field_id": model["last_field_id"],
        }

    return table.commit(
        "set-schema",
        meta_updates=_update,
        summary={"widened_column": f"{name} -> {new_type}"},
    )


def drop_column(table: Table, name: str) -> int:
    """Drop ``name`` — metadata-only; the field id is retired forever (a
    later add_column of the same name gets a fresh id, so this column's
    stored data can never resurrect). Returns the new snapshot id."""

    def _update(meta: dict) -> dict:
        _evolvable(meta, name)
        model = materialized(meta)
        fields = [
            f
            for f in copy.deepcopy(model["schemas"][str(model["current_schema_id"])])
            if f["name"].lower() != name.lower()
        ]
        if len(fields) == len(model["schemas"][str(model["current_schema_id"])]):
            raise ValueError(f"column {name!r} does not exist")
        if not fields:
            raise ValueError("cannot drop the last column")
        new_sid = max(int(k) for k in model["schemas"]) + 1
        return {
            "schema": ddl_from_fields(fields),
            "schemas": dict(model["schemas"], **{str(new_sid): fields}),
            "current_schema_id": new_sid,
            "last_field_id": model["last_field_id"],
        }

    return table.commit(
        "set-schema",
        meta_updates=_update,
        summary={"dropped_column": name},
    )


def set_partition_spec(table: Table, spec: list[dict] | None) -> int:
    """Set (or clear, with ``None``) the table's hidden-partition spec —
    Iceberg partition-spec evolution, metadata-only.

    Existing data files keep the partition values they were written under
    ("" for pre-spec files); the prune contract (partition.entry_matches)
    never drops a file whose segments don't cover a pinned source, so old
    layouts stay CORRECT and merely un-pruned until the next maintenance
    rewrite regroups them under the new spec. New appends/rewrites use the
    new spec immediately.

    Same optimistic-commit shape as add_column: the property update is
    computed against refreshed metadata each attempt, so concurrent
    property writers serialize instead of losing updates.
    """
    from nessie_spark.lakehouse.partition import (
        PROPERTY_KEY, check_source_types, validate_spec,
    )
    from nessie_spark.lakehouse.scan import IMAGES_DDL

    if spec is not None:
        validate_spec(spec)
        # existence + type rule (string/integer only — float/boolean render
        # differently in Spark vs Python and would silently prune wrong)
        check_source_types(spec, table.meta.get("schema", IMAGES_DDL))

    def _update(meta: dict) -> dict:
        props = dict(meta.get("properties") or {})
        if spec is None:
            props.pop(PROPERTY_KEY, None)
        else:
            props[PROPERTY_KEY] = spec
        return {"properties": props}

    return table.commit(
        "set-partition-spec",
        meta_updates=_update,
        summary={"partition_spec": spec or []},
    )

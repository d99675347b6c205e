"""Schema evolution: add-column, Iceberg-style.

Adding a column is a METADATA-ONLY commit — no data file is touched.
Existing files simply predate the column; every reader NULL-backfills via
``align_to_schema`` (pyarrow paths) or an explicit Spark read schema
(``spark.read.schema(ddl).parquet`` fills absent columns with null).
Snapshots record the schema current as of the commit, so pinned /
time-travel reads use the schema their data was written under, and
maintenance rewrites (compact / Z-order / MERGE) align every input file to
the table schema before concatenating — mixed pre-/post-evolution file
sets stay well-formed.

Supported: ADD COLUMN of a nullable scalar type (string / binary / int /
long / float / double / boolean). Not supported (raise): drop / rename /
type-change — those require column-id indirection (Iceberg field IDs) to
be safe against re-add, which this format does not carry.

Scale shape: O(1) — one metadata JSON write under the same optimistic
commit loop as data commits; no shuffle, no file I/O proportional to the
table.
"""

from __future__ import annotations

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
        return {"schema": f"{ddl}, {name} {sql_type.lower()}"}

    return table.commit(
        "set-schema",
        meta_updates=_update,
        summary={"added_column": f"{name} {sql_type.lower()}", "doc": doc or ""},
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

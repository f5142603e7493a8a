"""Iceberg-compatible parquet field ids on lake writes.

The reference carries a `PARQUET:field_id` per Arrow field, derived from
the registered schema (nisshi-schema/src/avro.rs:63 `ids` map built by
`field_ids` avro.rs:260-327; attached in json/arrow.rs:70-78
`new_field`), so its parquet files are directly adoptable by an Iceberg
catalog (which matches columns BY ID, not by name).

Spark equivalent: every StructField carries `{"parquet.field.id": n}`
metadata and `spark.sql.parquet.fieldId.write.enabled` (on in
session.py) makes the parquet writer emit it into the file footer.

Assignment mirrors the reference exactly — ids start at 1 and are
assigned LEVEL-ORDER per record (all direct fields first, then a
depth-first descent into each field, avro.rs:305-319); arrays reserve an
id for the list element ("item", ARROW_LIST_FIELD_NAME), maps for
entries/keys/values — reserving those keeps the numbering identical to
the reference even though Spark's API has no metadata slot on
element/entry types (only StructFields carry metadata; the reserved ids
are persisted so a native Iceberg activation can still bind them).

Stability across evolution: the assigned map persists per table
(`_field_ids.json`); existing paths keep their ids forever and new
columns take fresh ids — the Iceberg invariant that makes add-only
migration and compaction rewrites schema-compatible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, MapType, StructField, StructType

PARQUET_FIELD_ID = "parquet.field.id"

# Same segment names the reference pushes onto the path
# (ARROW_LIST_FIELD_NAME = "item"; map -> entries/keys/values).
_LIST_SEGMENT = "item"
_MAP_SEGMENT = "entries"


def assign_field_ids(
    schema: StructType, existing: dict[str, int] | None = None
) -> dict[str, int]:
    """dotted-path -> field id. Existing assignments are immutable; new
    paths continue from max(existing)+1 in reference traversal order."""
    ids: dict[str, int] = dict(existing or {})
    next_id = max(ids.values(), default=0) + 1

    def take(path: str) -> None:
        nonlocal next_id
        if path not in ids:
            ids[path] = next_id
            next_id += 1

    def walk_struct(prefix: str, st: StructType) -> None:
        for f in st.fields:  # level order: direct fields first
            take(prefix + f.name)
        for f in st.fields:
            walk_type(prefix + f.name + ".", f.dataType)

    def walk_type(prefix: str, dt) -> None:
        if isinstance(dt, StructType):
            walk_struct(prefix, dt)
        elif isinstance(dt, ArrayType):
            take(prefix + _LIST_SEGMENT)
            walk_type(prefix + _LIST_SEGMENT + ".", dt.elementType)
        elif isinstance(dt, MapType):
            take(prefix + _MAP_SEGMENT)
            take(prefix + _MAP_SEGMENT + ".keys")
            take(prefix + _MAP_SEGMENT + ".values")
            walk_type(prefix + _MAP_SEGMENT + ".values.", dt.valueType)

    walk_struct("", schema)
    return ids


def schema_with_field_ids(schema: StructType, ids: dict[str, int]) -> StructType:
    """Rebuild the schema with `parquet.field.id` metadata on every
    StructField whose path has an assignment (top-level and nested,
    including struct fields inside arrays/maps)."""

    def rebuild_type(prefix: str, dt):
        if isinstance(dt, StructType):
            fields = []
            for f in dt.fields:
                path = prefix + f.name
                meta = dict(f.metadata or {})
                if path in ids:
                    meta[PARQUET_FIELD_ID] = ids[path]
                fields.append(
                    StructField(
                        f.name, rebuild_type(path + ".", f.dataType), f.nullable, meta
                    )
                )
            return StructType(fields)
        if isinstance(dt, ArrayType):
            return ArrayType(
                rebuild_type(prefix + _LIST_SEGMENT + ".", dt.elementType),
                dt.containsNull,
            )
        if isinstance(dt, MapType):
            return MapType(
                dt.keyType,
                rebuild_type(prefix + _MAP_SEGMENT + ".values.", dt.valueType),
                dt.valueContainsNull,
            )
        return dt

    return rebuild_type("", schema)


def apply_field_ids(df: DataFrame, ids: dict[str, int]) -> DataFrame:
    """Attach the ids to a DataFrame's schema without touching data —
    `DataFrame.to` reconciles by name and carries field metadata; the
    plan stays a projection (no shuffle, no Python)."""
    return df.to(schema_with_field_ids(df.schema, ids))

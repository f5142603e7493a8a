"""JSON instance-value → Spark type inference with NoCommonType
unification — nisshi-schema/src/json/arrow.rs:87-148 parity (SURVEY §7(e)
correctness-parity item).

Reference semantics, replicated exactly:
- ``Null`` → Null, ``Bool`` → Boolean, ``String`` → Utf8
- ``Number`` → Int64 when the lexical value is an integer (serde's
  is_i64/is_u64), else Float64 — so ``1`` is Int64 but ``1.0`` is Float64
- ``Array`` → List of the elements' single common type; an empty array is
  List<Null>; elements with MORE THAN ONE distinct type (after dedup) are
  an error (``Error::NoCommonType(data_types)``) — [1, 2.5] does NOT
  widen to Float64, it errors, exactly like the reference
- ``Object`` → Struct, fields inferred recursively; keys are SORTED
  (serde_json::Map without preserve_order is a BTreeMap), every field
  nullable (arrow.rs NULLABLE)

``common_type`` is the sort_dedup unification (arrow.rs:128-148) and is
also used across instances: a batch of JSON values gets ONE schema or a
NoCommonType error, never a silent widen.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    NullType,
    StringType,
    StructField,
    StructType,
)


class NoCommonType(ValueError):
    """Raised when instance values admit more than one distinct type
    (Error::NoCommonType, json/arrow.rs:139)."""

    def __init__(self, types: list[DataType]):
        self.types = types
        super().__init__(
            "no common type: " + ", ".join(sorted(t.simpleString() for t in types))
        )


def infer_json_type(value: Any) -> DataType:
    """One instance value → Spark type (data_type, arrow.rs:87-126)."""
    if value is None:
        return NullType()
    if isinstance(value, bool):  # before int — bool is an int in Python
        return BooleanType()
    if isinstance(value, int):
        return LongType()
    if isinstance(value, float):
        # serde: a JSON number that parses as i64/u64 is Int64. Python's
        # json gives int for integral lexemes, float otherwise — so any
        # float here was written with a fraction/exponent → Float64.
        return DoubleType()
    if isinstance(value, str):
        return StringType()
    if isinstance(value, list):
        return ArrayType(common_type([infer_json_type(v) for v in value]))
    if isinstance(value, dict):
        return StructType(
            [
                StructField(k, infer_json_type(value[k]), True)
                for k in sorted(value)  # BTreeMap key order
            ]
        )
    raise ValueError(f"not a JSON value: {value!r}")


def common_type(types: list[DataType]) -> DataType:
    """sort_dedup unification (arrow.rs:128-148): zero distinct types →
    Null, one → it, more → NoCommonType. No widening, no coercion."""
    distinct: list[DataType] = []
    for t in types:
        if t not in distinct:
            distinct.append(t)
    if len(distinct) > 1:
        raise NoCommonType(distinct)
    return distinct[0] if distinct else NullType()


def infer_instances(values: list[Any]) -> DataType:
    """Common type across a batch of instance values — the schema the
    reference's AsArrow path derives before building record batches."""
    return common_type([infer_json_type(v) for v in values])


def infer_json_strings(raw: list[str | bytes | None]) -> DataType:
    """Parse raw JSON documents and infer their single common type.
    Absent payloads (None cells) and MALFORMED documents (empty string,
    truncated JSON) are skipped — absence of a record value is not a
    JSON ``null``, and a sample that doesn't parse carries no type
    evidence (the decode path already yields NULL for it, the from_json
    contract — hostile-gate find: one '' props sample crashed inference
    driver-side). An explicit ``null`` instance still infers Null and
    errors against any other type, per the strict reference semantics."""
    vals = []
    for r in raw:
        if r is None:
            continue
        try:
            vals.append(json.loads(r))
        except (ValueError, TypeError):
            continue
    return infer_instances(vals)

"""Schema-dialect → Spark StructType converters.

Implements the reference's type matrix (SURVEY.md §1.3):
- Avro (.avsc)      ← nisshi-schema/src/avro/arrow.rs:111-247
- JSON Schema (.json) ← nisshi-schema/src/json/arrow.rs:87-148
- Protobuf (.proto) ← nisshi-schema/src/proto/arrow.rs:152-262

Divergences from the Arrow mapping, forced by Spark's type system and
documented per SURVEY §7 hard parts:
- Avro time-millis/micros → LongType (Spark has no time-of-day type).
- Avro general unions → struct of nullable branches + `_tag` int
  (Spark has no dense union).
- Avro duration → struct<months,days,milliseconds>.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DecimalType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    NullType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

# --------------------------------------------------------------------- Avro

_AVRO_PRIMITIVES: dict[str, DataType] = {
    "null": NullType(),
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bytes": BinaryType(),
    "string": StringType(),
}

_AVRO_LOGICAL: dict[str, DataType] = {
    "uuid": StringType(),
    "date": DateType(),
    "time-millis": LongType(),
    "time-micros": LongType(),
    "timestamp-millis": TimestampType(),
    "timestamp-micros": TimestampType(),
    "timestamp-nanos": TimestampType(),
    "local-timestamp-millis": TimestampNTZType(),
    "local-timestamp-micros": TimestampNTZType(),
}


def avro_to_spark(schema: Any) -> DataType:
    """Avro schema (parsed JSON) → Spark type, per avro/arrow.rs:111-247."""
    if isinstance(schema, str):
        return _AVRO_PRIMITIVES[schema]
    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) == 1:
            return avro_to_spark(non_null[0])  # nullable [null, T]
        # dense union → struct-of-nullable-branches + tag (no Spark union)
        fields = [StructField("_tag", IntegerType(), False)] + [
            StructField(f"u{i}", avro_to_spark(s), True) for i, s in enumerate(non_null)
        ]
        return StructType(fields)
    if not isinstance(schema, dict):
        raise ValueError(f"bad avro schema node: {schema!r}")

    logical = schema.get("logicalType")
    if logical:
        if logical == "decimal":
            return DecimalType(schema.get("precision", 10), schema.get("scale", 0))
        if logical == "duration":
            return StructType(
                [
                    StructField("months", IntegerType(), False),
                    StructField("days", IntegerType(), False),
                    StructField("milliseconds", IntegerType(), False),
                ]
            )
        if logical in _AVRO_LOGICAL:
            return _AVRO_LOGICAL[logical]

    t = schema["type"]
    if t == "record":
        return StructType(
            [
                StructField(f["name"], avro_to_spark(f["type"]), _avro_nullable(f["type"]))
                for f in schema["fields"]
            ]
        )
    if t == "enum":
        return StringType()  # arrow.rs:122 enum → Utf8
    if t == "array":
        return ArrayType(avro_to_spark(schema["items"]))
    if t == "map":
        return MapType(StringType(), avro_to_spark(schema["values"]))
    if t == "fixed":
        return BinaryType()  # arrow.rs:205 FixedSizeBinary → no Spark fixed
    return avro_to_spark(t)


def _avro_nullable(schema: Any) -> bool:
    return isinstance(schema, list) and "null" in schema


# -------------------------------------------------------------- JSON Schema


def json_schema_to_spark(schema: dict[str, Any]) -> DataType:
    """JSON Schema → Spark type.

    The reference infers Arrow types from instance values (json/arrow.rs:
    87-148: integral Number → Int64 else Float64); we map the declared
    schema the same way: integer → Long, number → Double.
    """
    t = nullable_of(schema.get("type")) or schema.get("type")
    if isinstance(t, list):
        # multi-type union: no Spark analog — carry the raw JSON text
        # (such topics validate through the full-vocabulary fallback)
        return StringType()
    if t == "object" or (t is None and "properties" in schema):
        props = schema.get("properties", {})
        req = set(schema.get("required", []))
        return StructType(
            [
                StructField(name, json_schema_to_spark(sub), name not in req)
                for name, sub in props.items()
            ]
        )
    if t == "array":
        return ArrayType(json_schema_to_spark(schema.get("items", {"type": "string"})))
    return {
        "string": StringType(),
        "integer": LongType(),
        "number": DoubleType(),
        "boolean": BooleanType(),
        "null": NullType(),
    }.get(t, StringType())


def nullable_of(t: Any) -> str | None:
    """If ``t`` is the common nullable-union idiom — ``["null", T]`` (either
    order) or a single-element list ``[T]`` — return the plain type T;
    otherwise None. These are the union forms the JVM compiler expresses
    natively; anything else routes to the full-validator fallback."""
    if not isinstance(t, list) or not all(isinstance(x, str) for x in t):
        return None
    members = [x for x in t if x != "null"]
    if len(members) == 1:
        return members[0]
    return None


# ----------------------------------------------------------------- Protobuf

_PROTO_SCALARS: dict[str, DataType] = {
    # proto/arrow.rs:152-165
    "int32": IntegerType(),
    "sint32": IntegerType(),
    "sfixed32": IntegerType(),
    "uint32": IntegerType(),
    "fixed32": IntegerType(),
    "int64": LongType(),
    "sint64": LongType(),
    "sfixed64": LongType(),
    "uint64": LongType(),
    "fixed64": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bool": BooleanType(),
    "string": StringType(),
    "bytes": BinaryType(),
}

_MSG_RE = re.compile(r"message\s+(\w+)\s*\{")
_FIELD_RE = re.compile(
    r"^\s*(repeated\s+|optional\s+)?([\w.<>, ]+?)\s+(\w+)\s*=\s*(\d+)\s*(\[[^\]]*\])?\s*;"
)
_ENUM_RE = re.compile(r"enum\s+(\w+)\s*\{")
# several `SYM = n;` declarations may share a source line, so no anchor;
# non-numeric assignments (e.g. `option allow_alias = true;`) don't match.
# `-?` keeps legal negative proto enum values (e.g. `UNKNOWN = -1;`) in the
# symbol table so symbolic encode of them works.
_ENUM_VALUE_RE = re.compile(r"\b(\w+)\s*=\s*(-?\d+)\s*;")
_MAP_RE = re.compile(r"map\s*<\s*(\w+)\s*,\s*(\w+)\s*>")


def _block(text: str, open_idx: int) -> tuple[str, int]:
    """Return the {...} block body starting at the brace at open_idx."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[open_idx + 1 : i], i
    raise ValueError("unbalanced braces in .proto")


def parse_proto_meta(text: str) -> tuple[dict[str, list[dict]], dict[str, dict[str, int]]]:
    """Structural .proto parse → (messages, enums) where
    ``messages[name]`` is the ordered field list
    ``[{name, type, number, label}]`` (label: '', 'repeated', 'optional')
    and ``enums[name]`` maps each symbol to its number (so the codec can
    accept symbolic enum values on encode, like the reference's JSON
    front door — proto.rs encode_from_value). ``name in enums`` keeps
    working for the historical membership checks.
    This is the metadata the binary wire codec (proto_wire.py) walks —
    the StructType mapping in ``parse_proto`` is derived from it."""
    text = re.sub(r"//[^\n]*", "", text)
    messages: dict[str, str] = {}
    enums: dict[str, dict[str, int]] = {}

    def walk(body: str):
        pos = 0
        while True:
            m_msg = _MSG_RE.search(body, pos)
            m_enum = _ENUM_RE.search(body, pos)
            cands = [m for m in (m_msg, m_enum) if m]
            if not cands:
                break
            m = min(cands, key=lambda x: x.start())
            inner, end = _block(body, m.end() - 1)
            if m.re is _MSG_RE:
                messages[m.group(1)] = inner
                walk(inner)
            else:
                enums[m.group(1)] = {
                    em.group(1): int(em.group(2))
                    for em in _ENUM_VALUE_RE.finditer(inner)
                }
            pos = end + 1

    walk(text)

    out: dict[str, list[dict]] = {}
    for name, body in messages.items():
        # remove nested blocks so the field regex only sees this level
        flat = []
        depth = 0
        for line in body.splitlines():
            depth_delta = line.count("{") - line.count("}")
            if depth == 0 and "{" not in line:
                flat.append(line)
            depth += depth_delta
            if depth < 0:
                depth = 0
        fields = []
        # one statement per candidate line (several `a = 1; b = 2;` field
        # declarations may share a source line)
        stmts = [s + ";" for line in flat for s in line.split(";") if s.strip()]
        for line in stmts:
            fm = _FIELD_RE.match(line)
            if not fm:
                continue
            label, tname, fname, number = (
                (fm.group(1) or "").strip(),
                fm.group(2).strip(),
                fm.group(3),
                int(fm.group(4)),
            )
            fields.append(
                {"name": fname, "type": tname, "number": number, "label": label}
            )
        out[name] = fields
    return out, enums


def parse_proto(text: str) -> dict[str, StructType]:
    """Minimal .proto (proto3) parser: messages, scalar fields, repeated,
    maps, enums (→ Int32 per proto/arrow.rs:152), nested messages.

    Covers the reference's fixture surface (etc/schema/*.proto: employee,
    search, taxi, customer with nested Address + repeated). Binary wire
    decode is handled by proto_wire.py (pure-Python proto3 wire format —
    the spark-protobuf jar is absent in this container).
    """
    messages, enums = parse_proto_meta(text)

    def field_type(tname: str) -> DataType:
        tname = tname.strip()
        mm = _MAP_RE.match(tname)
        if mm:
            return MapType(_PROTO_SCALARS[mm.group(1)], field_type(mm.group(2)))
        if tname in _PROTO_SCALARS:
            return _PROTO_SCALARS[tname]
        if tname in enums:
            return IntegerType()  # proto enum → Int32
        if tname in ("google.protobuf.Timestamp",):
            return TimestampType()  # proto/arrow.rs:159-161
        if tname in messages:
            return build(tname)
        raise ValueError(f"unknown proto type {tname!r}")

    def build(msg: str) -> StructType:
        fields = []
        for f in messages[msg]:
            dt = field_type(f["type"])
            if f["label"] == "repeated":
                dt = ArrayType(dt)
            fields.append(StructField(f["name"], dt, True))
        return StructType(fields)

    return {name: build(name) for name in messages}


# --------------------------------------------------- constraint compilation

# Constraint keywords the JVM-side compiler below understands. A schema
# using anything outside this set must NOT validate as always-true — the
# reference validates with the full `jsonschema` crate and rejects the
# record (nisshi-schema/src/json.rs:59-81), so silent permissiveness here
# would accept data the reference refuses. The registry routes such
# schemas through the Python `jsonschema` fallback kernel (or refuses
# registration when the package is unavailable).
COMPILED_KEYWORDS = frozenset(
    {
        "type",
        "required",
        "properties",
        "pattern",
        "minimum",
        "maximum",
        "exclusiveMinimum",
        "exclusiveMaximum",
        "multipleOf",
        "enum",
        "const",
        "minLength",
        "maxLength",
        "items",
        "uniqueItems",
        "minItems",
        "maxItems",
        "additionalProperties",
    }
)

# Annotation-only keywords: carry no validation semantics in the default
# JSON Schema vocabularies (format is assertion-free by default, matching
# the jsonschema crate's default configuration).
_ANNOTATION_KEYWORDS = frozenset(
    {
        "title",
        "description",
        "default",
        "examples",
        "$schema",
        "$id",
        "$comment",
        "deprecated",
        "readOnly",
        "writeOnly",
        "format",
    }
)


def unsupported_keywords(schema: Any) -> set[str]:
    """Recursively collect constraint keywords outside the compiled
    subset (so the registry can fail loudly / fall back instead of
    silently accepting what the reference rejects — json.rs:59-81).

    ``additionalProperties: false`` compiles at any depth — including
    inside array elements — because the strictness conjunct validates
    structure recursively over the VARIANT (types.py::variant_ok), not
    through parsed-struct paths: the raw bytes keep unknown keys even
    though from_json drops them, so the reference's rejection must be
    replicated, not annotated away. The schema-valued form constrains
    values the compiler can't enumerate and routes to the full
    validator. Likewise the nullable-union ``type: ["null", T]``
    compiles; multi-type unions don't.
    """
    out: set[str] = set()
    if not isinstance(schema, dict):
        return out
    for k, v in schema.items():
        if k == "additionalProperties":
            if not isinstance(v, bool):
                out.add(k)
        elif k == "type" and not isinstance(v, str):
            # union form: only ["null", T] is expressible in the compiled
            # strictness conjunct (absent | VOID | T); a silently-ignored
            # wider union would validate as always-true
            if nullable_of(v) is None:
                out.add("type(union)")
        elif k == "items" and not isinstance(v, dict):
            # tuple form [s1, s2] / boolean form: not compiled
            out.add("items(non-object)")
        elif k not in COMPILED_KEYWORDS and k not in _ANNOTATION_KEYWORDS:
            out.add(k)
        if k == "properties" and isinstance(v, dict):
            for sub in v.values():
                out |= unsupported_keywords(sub)
        elif k == "items":
            out |= unsupported_keywords(v)
    return out


def compile_type_strictness(schema: dict[str, Any], raw, parsed):
    """Predicate TRUE iff every declared TYPED property present in the
    raw JSON actually HAS its declared JSON type. PERMISSIVE from_json
    nulls a mistyped field (making it indistinguishable from an absent
    one) and silently COERCES any value into a string-typed field — so
    without this check a mistyped optional field, an explicit JSON
    null, or a number-where-string validated where the reference's
    full validator rejects the record (json.rs:59-81).

    Mechanism: one `try_parse_json` variant of the raw text, then per
    declared field `schema_of_variant(try_variant_get(v, path))` — the
    exact per-row JSON type (STRING / BIGINT / DECIMAL / DOUBLE /
    BOOLEAN / OBJECT<…> / ARRAY<…> / VOID; null when absent) — checked
    against the declared `type` keyword. All JVM-side expressions, no
    Python, no extra scan.

    Numeric semantics follow JSON Schema's MATHEMATICAL model exactly
    (json.rs validates with the jsonschema crate BEFORE any Arrow
    conversion): `integer` accepts any numeric instance with zero
    fractional part — 1.0, 1e3, and integers beyond int64 all validate;
    a value the declared Spark type cannot represent decodes to a null
    field later (PERMISSIVE), which is a decode-surface limit, not a
    validation verdict.

    Also compiled here (both need the variant view of the raw bytes):
    - nullable unions ``["null", T]``: absent | VOID | T;
    - ``required`` for union-typed fields: KEY presence (an explicit
      null satisfies both required and the union — from_json can't
      tell those apart, the variant can);
    - ``additionalProperties: false``: the instance object's keys must
      all be declared (from_json silently drops unknown keys; the
      reference rejects the record) — at ANY depth, including inside
      array elements;
    - array element STRUCTURE: `variant_ok` recurses through ``items``
      with `forall` over `array<variant>`, so element types, element
      object properties, element required-ness, and nested arrays are
      all enforced (PERMISSIVE parsing nulls mistyped elements,
      disguising them from element constraints; parsed-struct columns
      have no per-element key-presence signal at all).

    ``parsed`` is accepted for call-site compatibility; the predicate is
    built entirely from the variant (a value of the declared JSON type
    always parses into its Spark type, except numerics — handled by the
    mathematical model above).
    """
    from pyspark.sql import functions as F

    del parsed  # variant-only since r6; see docstring

    def variant_ok(node, sub: dict):
        """Predicate: the VARIANT ``node`` (null = absent) satisfies the
        structural part of ``sub`` — recursive over properties and items,
        so the same code validates a top-level field and an array
        element five levels deep."""
        if not isinstance(sub, dict):
            return F.lit(True)
        vt = F.schema_of_variant(node)
        present = vt.isNotNull()
        preds = []

        t = sub.get("type")
        t_null = nullable_of(t)
        t_norm = t_null if t_null is not None else t
        if isinstance(t_norm, str):
            if t_norm == "string":
                ok = vt == "STRING"
            elif t_norm in ("integer", "number"):
                ok = vt.isin("BIGINT", "DOUBLE") | vt.startswith("DECIMAL")
                if t_norm == "integer":
                    dv = F.try_variant_get(node, "$", "double")
                    ok = ok & dv.isNotNull() & ((dv % F.lit(1.0)) == 0)
            elif t_norm == "boolean":
                ok = vt == "BOOLEAN"
            elif t_norm == "object":
                ok = vt.startswith("OBJECT")
            elif t_norm == "array":
                ok = vt.startswith("ARRAY")
            elif t_norm == "null":
                ok = vt == "VOID"
            else:
                ok = F.lit(True)
            if t_null is not None:
                ok = (vt == "VOID") | ok
            preds.append(ok)

        if nullable_of(t) is not None and (
            ("const" in sub and sub["const"] is not None)
            or ("enum" in sub and None not in sub["enum"])
        ):
            # const/enum constrain EVERY instance type including null
            # (unlike minimum/pattern/..., which only apply to their own
            # primitive type): an explicit null passes the ["null", T]
            # union but fails a non-null const/enum. Only the variant
            # can see the difference between that null and an absent key
            # (hypothesis differential, r8).
            preds.append(vt != "VOID")

        if t_norm == "array" and isinstance(sub.get("items"), dict):
            elems = F.try_variant_get(node, "$", "array<variant>")
            preds.append(
                F.coalesce(
                    F.forall(elems, lambda e: variant_ok(e, sub["items"])),
                    F.lit(True),
                )
            )

        if t_norm == "object" or t_norm is None:
            if sub.get("additionalProperties") is False:
                keys = F.json_object_keys(node.cast("string"))
                declared = sorted(sub.get("properties", {}))
                allowed = (
                    F.array(*[F.lit(d) for d in declared])
                    if declared
                    else F.array().cast("array<string>")
                )
                preds.append(
                    F.coalesce(F.size(F.array_except(keys, allowed)) == 0, F.lit(True))
                )
            if isinstance(sub.get("properties"), dict):
                req = set(sub.get("required", []))
                for name, child in sub["properties"].items():
                    cnode = F.try_variant_get(node, f"$.{name}", "variant")
                    cpred = variant_ok(cnode, child)
                    if name in req and nullable_of(child.get("type")) is not None:
                        # required + nullable union: the KEY must exist;
                        # the value may be an explicit null (from_json
                        # can't see the difference, the variant can)
                        cpred = cpred & F.schema_of_variant(cnode).isNotNull()
                    preds.append(cpred)

        if not preds:
            return F.lit(True)
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        # absent nodes pass: required-ness is the PARENT's concern
        return ~present | out

    root_t = schema.get("type")
    if root_t == "object" or (root_t is None and "properties" in schema):
        return variant_ok(F.try_parse_json(raw), schema)
    return F.lit(True)


def compile_constraints(schema: dict[str, Any], col):
    """Compile the JSON-Schema constraint subset into a Column predicate
    (JVM-side — validation without Python row loops): type presence,
    required, pattern, minimum/maximum (+exclusive), multipleOf, enum,
    const, minLength/maxLength, items, uniqueItems, minItems/maxItems.

    Returns a boolean Column that is True iff the value satisfies the
    schema. Mirrors Registry::validate semantics (lib.rs:571-599): any
    failing record fails the batch. Keywords outside COMPILED_KEYWORDS
    never reach this function — the registry screens for them at
    registration (unsupported_keywords) and uses the full-vocabulary
    Python fallback instead.
    """
    from pyspark.sql import functions as F

    preds = []
    t = schema.get("type")
    t = nullable_of(t) or t
    if t == "object":
        props = schema.get("properties", {})
        for name in schema.get("required", []):
            # a required nullable-union field is satisfied by an explicit
            # null — from_json can't distinguish that from an absent key,
            # so KEY presence is enforced variant-side in
            # compile_type_strictness instead
            if nullable_of(props.get(name, {}).get("type")) is None:
                preds.append(col[name].isNotNull())
        for name, sub in props.items():
            sub_pred = compile_constraints(sub, col[name])
            # absent optional fields pass; union-typed required fields may
            # be null, and their constraints only apply to non-null values
            if (
                name in schema.get("required", [])
                and nullable_of(sub.get("type")) is None
            ):
                preds.append(sub_pred)
            else:
                preds.append(col[name].isNull() | sub_pred)
    if "pattern" in schema:
        preds.append(col.rlike(schema["pattern"]))
    if "minimum" in schema:
        preds.append(col >= schema["minimum"])
    if "maximum" in schema:
        preds.append(col <= schema["maximum"])
    if "exclusiveMinimum" in schema:
        preds.append(col > schema["exclusiveMinimum"])
    if "exclusiveMaximum" in schema:
        preds.append(col < schema["exclusiveMaximum"])
    if "multipleOf" in schema:
        # JSON Schema: value / multipleOf is an integer. Spark % keeps
        # the dividend's sign but a zero remainder is zero either way.
        preds.append((col % F.lit(schema["multipleOf"])) == 0)
    if "enum" in schema:
        preds.append(col.isin(*schema["enum"]))
    if "const" in schema:
        preds.append(col == F.lit(schema["const"]))
    if "minLength" in schema:
        preds.append(F.length(col) >= schema["minLength"])
    if "maxLength" in schema:
        preds.append(F.length(col) <= schema["maxLength"])
    if isinstance(schema.get("items"), dict):
        items = schema["items"]
        preds.append(F.forall(col, lambda x: compile_constraints(items, x)))
    if schema.get("uniqueItems"):
        preds.append(F.size(F.array_distinct(col)) == F.size(col))
    if "minItems" in schema:
        preds.append(F.size(col) >= schema["minItems"])
    if "maxItems" in schema:
        preds.append(F.size(col) <= schema["maxItems"])

    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def shadow_numeric(dt: DataType) -> DataType:
    """The CONSTRAINT-evaluation twin of a decode schema: integer fields
    widened to double so that integer-VALUED floats (1.0 — valid JSON
    Schema `integer`s) still surface a value for minimum/multipleOf/enum
    checks instead of a PERMISSIVE-parse null. Decode keeps the true
    types; only the validation predicate parses through the shadow."""
    if isinstance(dt, LongType):
        return DoubleType()
    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(f.name, shadow_numeric(f.dataType), f.nullable)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(shadow_numeric(dt.elementType), dt.containsNull)
    if isinstance(dt, MapType):
        return MapType(dt.keyType, shadow_numeric(dt.valueType), dt.valueContainsNull)
    return dt


def compile_scalar(schema: dict[str, Any], raw):
    """Validation predicate for a SCALAR (non-object) part schema, using
    the uniform front-door convention shared with the Python fallback
    kernel: bytes that parse as JSON are the typed JSON instance; bytes
    that don't are a bare STRING instance (the reference's CLI always
    JSON-encodes — produce.rs:168-174 — so its validator only ever sees
    parseable bytes; raw utf-8 string keys are this repo's documented
    front-door ergonomic, accepted identically on both validation paths).

    Fixes the r5 divergences: `123` no longer validates against
    {"type":"string"} (it is a JSON number on both paths now), and a
    QUOTED key like "123-45-6789" pattern-checks against the unquoted
    string instance exactly as jsonschema does."""
    from pyspark.sql import functions as F

    t = schema.get("type")
    t_null = nullable_of(t)
    t_norm = t_null if t_null is not None else t
    v = F.try_parse_json(raw)
    vt = F.schema_of_variant(v)

    if t_norm == "string":
        inst = F.when(v.isNull(), raw).when(vt == "STRING", F.variant_get(v, "$", "string"))
        ok = inst.isNotNull() & compile_constraints(schema, inst)
    elif t_norm in ("integer", "number"):
        numeric = vt.isin("BIGINT", "DOUBLE") | vt.startswith("DECIMAL")
        dv = F.try_variant_get(v, "$", "double")
        ok = numeric & dv.isNotNull()
        if t_norm == "integer":
            ok = ok & ((dv % F.lit(1.0)) == 0)
        ok = ok & compile_constraints(schema, dv)
    elif t_norm == "boolean":
        ok = (vt == "BOOLEAN") & compile_constraints(
            schema, F.try_variant_get(v, "$", "boolean")
        )
    elif t_norm == "null":
        ok = vt == "VOID"
    elif t_norm == "array":
        st = shadow_numeric(json_schema_to_spark(schema))
        ok = vt.startswith("ARRAY") & compile_constraints(schema, F.from_json(raw, st))
        it = schema.get("items", {}).get("type") if isinstance(schema.get("items"), dict) else None
        it_norm = nullable_of(it) or it
        if isinstance(it_norm, str):
            elems = F.try_variant_get(v, "$", "array<variant>")

            def echeck(e):
                evt = F.schema_of_variant(e)
                if it_norm == "string":
                    base = evt == "STRING"
                elif it_norm in ("integer", "number"):
                    base = evt.isin("BIGINT", "DOUBLE") | evt.startswith("DECIMAL")
                    if it_norm == "integer":
                        ed = F.try_variant_get(e, "$", "double")
                        base = base & ed.isNotNull() & ((ed % F.lit(1.0)) == 0)
                elif it_norm == "boolean":
                    base = evt == "BOOLEAN"
                elif it_norm == "object":
                    base = evt.startswith("OBJECT")
                elif it_norm == "array":
                    base = evt.startswith("ARRAY")
                elif it_norm == "null":
                    base = evt == "VOID"
                else:
                    base = F.lit(True)
                if nullable_of(it) is not None:
                    base = (evt == "VOID") | base
                return base

            ok = ok & F.coalesce(F.forall(elems, echeck), F.lit(True))
    else:
        # untyped scalar: any instance shape; constraints see the raw text
        ok = compile_constraints(schema, raw)

    if t_null is not None:
        ok = (vt == "VOID") | ok
    return ok


def load_schema_file(path: str) -> tuple[str, Any]:
    """→ (dialect, parsed schema) for .avsc / .json / .proto files."""
    with open(path) as f:
        text = f.read()
    if path.endswith(".avsc"):
        return "avro", json.loads(text)
    if path.endswith(".json"):
        return "json", json.loads(text)
    if path.endswith(".proto"):
        structs = parse_proto(text)
        messages, enums = parse_proto_meta(text)
        return "proto", {"structs": structs, "messages": messages, "enums": enums}
    raise ValueError(f"unknown schema extension: {path}")

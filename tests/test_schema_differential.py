"""Differential validation: the JVM-compiled JSON Schema predicate must
agree with the full `jsonschema` package (the same library family the
reference validates with — json.rs:59-81) on every instance, for every
schema built from the compiled keyword subset.

Hypothesis generates (schema, instances) pairs; instances are validated
both ways in ONE Spark batch per case. Any disagreement is either a
compiler bug or a keyword that should not be in COMPILED_KEYWORDS —
both are exactly what this suite exists to catch.

Instances include MISTYPED values and explicit JSON nulls: the
compiled predicate carries a variant-based type-strictness conjunct
(types.py::compile_type_strictness) so a string-where-integer, a
number-where-string, or an explicit null for a typed field rejects
exactly as the reference's validator does. Round 6 extends the
generated surface to the newly-compiled semantics: integer-VALUED
floats (1.0, 1e3 — valid JSON Schema integers, mathematical numeric
model), nullable unions ["null", T] (including required-ness = key
presence), additionalProperties: false (instance keys audited against
declared properties), and array element types.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tansu_spark.registry import SchemaRegistry, ValidationError

# ---------------------------------------------------------- generators

# Field value pools chosen to straddle every constraint boundary below —
# including WRONG-typed values and explicit nulls, which the type-
# strictness conjunct must reject exactly like jsonschema's `type`.
_STRINGS = ["", "a", "ab", "abc", "abcd", "zzzzz", "order", "refund",
            5, True, None, [1], {"x": 1}]
_INTS = [-7, -1, 0, 1, 2, 5, 7, 10, 15, "5", "abc", True, None, [1],
         4.0, 10.0, 2.5, -3.0, 1e3]
_ARRAYS = [[], [1], [1, 2], [2, 1], [1, 1], [0, 5, 10], [-1, 3],
           [1, 2, 3, 4], ["x"], [1, "y"], [1, None], [2.0, 4], [1, 2.5],
           "not-an-array", 7, None]


def _string_schema(draw):
    s: dict = {"type": "string"}
    if draw(st.booleans()):
        s["minLength"] = draw(st.integers(0, 4))
    if draw(st.booleans()):
        s["maxLength"] = draw(st.integers(2, 6))
    if draw(st.booleans()):
        s["pattern"] = draw(st.sampled_from(["^a", "b", "^[a-z]*$"]))
    if draw(st.booleans()):
        s["enum"] = draw(
            st.lists(
                st.sampled_from([x for x in _STRINGS if isinstance(x, str)]),
                min_size=1, max_size=4, unique=True,
            )
        )
    return s


def _int_schema(draw):
    s: dict = {"type": "integer"}
    if draw(st.booleans()):
        s["minimum"] = draw(st.integers(-5, 5))
    if draw(st.booleans()):
        s["maximum"] = draw(st.integers(0, 12))
    if draw(st.booleans()):
        s["exclusiveMinimum"] = draw(st.integers(-5, 5))
    if draw(st.booleans()):
        s["exclusiveMaximum"] = draw(st.integers(0, 12))
    if draw(st.booleans()):
        s["multipleOf"] = draw(st.sampled_from([1, 2, 5]))
    if draw(st.booleans()):
        s["const"] = draw(st.sampled_from([x for x in _INTS if type(x) is int]))
    return s


def _array_schema(draw):
    s: dict = {"type": "array", "items": _int_schema(draw)}
    if draw(st.booleans()):
        s["uniqueItems"] = True
    if draw(st.booleans()):
        s["minItems"] = draw(st.integers(0, 3))
    if draw(st.booleans()):
        s["maxItems"] = draw(st.integers(1, 4))
    return s


# array-of-objects: element structure must validate per element through
# the variant recursion (types, required, additionalProperties:false)
_OBJ_ARRAYS = [
    [], [{"z": 1}], [{"z": 1, "n": "a"}], [{"z": 2.0}], [{"z": 2.5}],
    [{"z": "bad"}], [{"z": None}], [{"n": "a"}], [{}],
    [{"z": 1, "extra": 7}], [{"z": 1}, {"z": "bad"}], [7], ["x"], None,
    [{"z": 1, "n": None}],
]


def _obj_array_schema(draw):
    item: dict = {
        "type": "object",
        "properties": {"z": {"type": "integer"},
                       "n": {"type": ["null", "string"]}},
    }
    if draw(st.booleans()):
        item["required"] = draw(
            st.lists(st.sampled_from(["z", "n"]), max_size=2, unique=True)
        )
    if draw(st.booleans()):
        item["additionalProperties"] = False
    return {"type": "array", "items": item}


@st.composite
def schema_and_instances(draw):
    fields: dict = {}
    values_pool: dict = {}
    n_fields = draw(st.integers(1, 3))
    for i in range(n_fields):
        name = f"f{i}"
        kind = draw(st.sampled_from(["string", "integer", "array", "objarray"]))
        if kind == "string":
            fields[name] = _string_schema(draw)
            values_pool[name] = _STRINGS
        elif kind == "integer":
            fields[name] = _int_schema(draw)
            values_pool[name] = _INTS
        elif kind == "objarray":
            fields[name] = _obj_array_schema(draw)
            values_pool[name] = _OBJ_ARRAYS
        else:
            fields[name] = _array_schema(draw)
            values_pool[name] = _ARRAYS
        # nullable-union wrap: same constraints, null also admitted
        if draw(st.booleans()) and draw(st.booleans()):
            fields[name]["type"] = ["null", fields[name]["type"]]
    required = draw(
        st.lists(st.sampled_from(sorted(fields)), max_size=n_fields, unique=True)
    )
    part = {"type": "object", "required": required, "properties": fields}
    if draw(st.booleans()):
        part["additionalProperties"] = False

    instances = []
    for _ in range(draw(st.integers(3, 8))):
        inst = {}
        for name in fields:
            if draw(st.booleans()):
                inst[name] = draw(st.sampled_from(values_pool[name]))
        if draw(st.integers(0, 3)) == 0:
            inst["zzextra"] = draw(st.sampled_from([1, "x"]))
        instances.append(inst)
    return part, instances


# ------------------------------------------------------------- the test


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(case=schema_and_instances())
def test_compiled_predicate_agrees_with_jsonschema(spark, tmp_path_factory, case):
    import jsonschema

    part, instances = case
    root = tmp_path_factory.mktemp("schemas")
    (root / "t.json").write_text(
        json.dumps({"type": "object", "properties": {"value": part}})
    )
    reg = SchemaRegistry(str(root))
    ts = reg.schema_for("t")
    assert ts.full_validator_keywords == [], part  # fully compiled subset

    validator = jsonschema.Draft202012Validator(part)
    want_bad = sum(0 if validator.is_valid(i) else 1 for i in instances)

    df = spark.createDataFrame(
        [(None, json.dumps(i).encode()) for i in instances],
        "key binary, value binary",
    )
    got_bad = df.filter(~reg._valid_predicate(ts, df)).count()
    assert got_bad == want_bad, (part, instances)


def test_differential_runs_catch_deliberate_break(spark, tmp_path):
    """Sanity for the harness itself: a clearly invalid instance must be
    counted bad by both paths."""
    import jsonschema

    part = {
        "type": "object",
        "required": ["f0"],
        "properties": {"f0": {"type": "integer", "minimum": 0, "multipleOf": 2}},
    }
    (tmp_path / "t.json").write_text(
        json.dumps({"type": "object", "properties": {"value": part}})
    )
    reg = SchemaRegistry(str(tmp_path))
    assert not jsonschema.Draft202012Validator(part).is_valid({"f0": 3})
    with pytest.raises(ValidationError):
        reg.validate(
            "t",
            spark.createDataFrame(
                [(None, json.dumps({"f0": 3}).encode())], "key binary, value binary"
            ),
        )

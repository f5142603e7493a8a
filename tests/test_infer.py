"""Golden tests for JSON instance-value type inference — replicating
nisshi-schema/src/json/arrow.rs:87-148 semantics (data_type /
common_data_type with sort_dedup and Error::NoCommonType)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    NullType,
    StringType,
    StructField,
    StructType,
)

from tansu_spark.registry.infer import (
    NoCommonType,
    common_type,
    infer_instances,
    infer_json_strings,
    infer_json_type,
)


def test_scalars():
    """arrow.rs:88-103: Null/Bool/Number/String."""
    assert infer_json_type(None) == NullType()
    assert infer_json_type(True) == BooleanType()
    assert infer_json_type(12321) == LongType()  # is_i64 → Int64
    assert infer_json_type(-5) == LongType()
    assert infer_json_type(2.5) == DoubleType()
    assert infer_json_type("abc") == StringType()


def test_integral_lexeme_vs_fractional():
    """`1` → Int64 but `1.0` → Float64: serde's is_i64 test is lexical,
    and Python's json mirrors it (int vs float tokens)."""
    import json

    assert infer_json_type(json.loads("1")) == LongType()
    assert infer_json_type(json.loads("1.0")) == DoubleType()
    assert infer_json_type(json.loads("1e3")) == DoubleType()


def test_array_common_type():
    """arrow.rs:104-106 + 128-148."""
    assert infer_json_type([1, 2, 3]) == ArrayType(LongType())
    assert infer_json_type([]) == ArrayType(NullType())
    assert infer_json_type([[1], [2, 3]]) == ArrayType(ArrayType(LongType()))


def test_array_no_common_type_errors():
    """[1, 2.5] does NOT widen — Error::NoCommonType (arrow.rs:139)."""
    with pytest.raises(NoCommonType):
        infer_json_type([1, 2.5])
    with pytest.raises(NoCommonType):
        infer_json_type([1, "a"])
    with pytest.raises(NoCommonType):
        infer_json_type([None, 1])  # Null vs Int64: two distinct types
    with pytest.raises(NoCommonType):
        infer_json_type([[1], ["a"]])  # propagates through nesting


def test_object_struct_sorted_keys():
    """arrow.rs:108-125; serde_json::Map is a BTreeMap → sorted keys,
    every field NULLABLE."""
    t = infer_json_type({"b": 1, "a": "x", "c": {"z": True, "y": 2.5}})
    assert t == StructType(
        [
            StructField("a", StringType(), True),
            StructField("b", LongType(), True),
            StructField(
                "c",
                StructType(
                    [
                        StructField("y", DoubleType(), True),
                        StructField("z", BooleanType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


def test_key_order_invariance():
    """Two objects with the same fields in different order unify."""
    a = infer_json_type({"a": 1, "b": "x"})
    b = infer_json_type({"b": "y", "a": 2})
    assert a == b
    assert common_type([a, b]) == a


def test_instances_unification():
    assert infer_instances([{"k": 1}, {"k": 2}]) == StructType(
        [StructField("k", LongType(), True)]
    )
    with pytest.raises(NoCommonType):
        infer_instances([{"k": 1}, {"k": "s"}])
    with pytest.raises(NoCommonType):
        # differing key sets are differing structs — strict, no merge
        infer_instances([{"k": 1}, {"k": 1, "extra": 2}])
    assert infer_instances([]) == NullType()


def test_infer_json_strings():
    t = infer_json_strings([b'{"n": 1}', '{"n": 2}', None])  # None skipped
    assert t == StructType([StructField("n", LongType(), True)])
    with pytest.raises(NoCommonType):
        infer_json_strings(['{"n": 1}', '{"n": 1.5}'])


def test_registry_decode_inferred(spark):
    """Schema-less topic decode: sample → infer → JVM-side from_json."""
    from tansu_spark.registry import SchemaRegistry

    reg = SchemaRegistry("/nonexistent")
    df = spark.createDataFrame(
        [(b'{"n": 5, "s": "a"}',), (b'{"n": 7, "s": "b"}',)], "value binary"
    )
    out = reg.decode_inferred(df)
    assert out.schema["value"].dataType == StructType(
        [StructField("n", LongType(), True), StructField("s", StringType(), True)]
    )
    assert {(r["value"]["n"], r["value"]["s"]) for r in out.collect()} == {
        (5, "a"),
        (7, "b"),
    }

    with pytest.raises(NoCommonType):
        reg.decode_inferred(
            spark.createDataFrame([(b'{"n": 1}',), (b'{"n": 1.5}',)], "value binary")
        )


# --------------------------------------------------------------------------
# Golden parity with the reference's json/arrow.rs test suite (718-1250):
# each case mirrors one reference test's key/value instance shapes through
# the same instance-value inference the reference applies (integral Number
# -> Int64 else Float64, struct per sorted keys, strict unification).


_JSON_GOLDEN = [
    (
        "key_and_value_as_arrow@718",
        ['{"name":"alice","email":"alice@example.com"}',
         '{"name":"bob","email":"bob@example.com"}'],
        T.StructType([
            T.StructField("email", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
        ]),
    ),
    (
        "grade@803",
        ['{"first":"Aloysius","last":"Alfalfa","test1":40.0,"test2":90.0,'
         '"test3":100.0,"test4":83.0,"final":49.0,"grade":"D-"}',
         '{"first":"Jim","last":"Backus","test1":48.0,"test2":1.0,'
         '"test3":97.0,"test4":96.0,"final":97.0,"grade":"A+"}'],
        T.StructType([
            T.StructField("final", T.DoubleType(), True),
            T.StructField("first", T.StringType(), True),
            T.StructField("grade", T.StringType(), True),
            T.StructField("last", T.StringType(), True),
            T.StructField("test1", T.DoubleType(), True),
            T.StructField("test2", T.DoubleType(), True),
            T.StructField("test3", T.DoubleType(), True),
            T.StructField("test4", T.DoubleType(), True),
        ]),
    ),
    ("key_as_arrow@889", ['"123-45-6789"', '"567-89-0123"'], T.StringType()),
    ("primitive_key_and_value@953", ["12321", "32123"], T.LongType()),
    ("primitive_key_and_array_value@1023", ["[1,2,3]", "[4,5]"],
     T.ArrayType(T.LongType())),
    (
        "primitive_key_and_array_object_value@1097",
        ['[{"name":"a","len":3}]', '[{"name":"b","len":5}]'],
        T.ArrayType(T.StructType([
            T.StructField("len", T.LongType(), True),
            T.StructField("name", T.StringType(), True),
        ])),
    ),
    (
        "primitive_key_and_struct_with_array_field@1187",
        ['{"title":"x","tags":["a","b"]}', '{"title":"y","tags":["c"]}'],
        T.StructType([
            T.StructField("tags", T.ArrayType(T.StringType()), True),
            T.StructField("title", T.StringType(), True),
        ]),
    ),
]


@pytest.mark.parametrize("name,raw,expected", _JSON_GOLDEN,
                         ids=[c[0] for c in _JSON_GOLDEN])
def test_json_golden_inference_matrix(name, raw, expected):
    assert infer_json_strings(raw) == expected, name


def test_json_golden_empty_array_is_no_common_type():
    """Strict unification, no widening (arrow.rs common_data_type +
    sort_dedup): an empty array infers array<void>, which does NOT
    unify with array<string> — the NoCommonType error, not a silent
    widen, exactly like the reference."""
    with pytest.raises(NoCommonType):
        infer_json_strings(
            ['{"title":"x","tags":["a","b"]}', '{"title":"y","tags":[]}']
        )

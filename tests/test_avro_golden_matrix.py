"""Golden-matrix parity sweep for Avro schema→type conversion (VERDICT r3
ask #4): one parametrized case per reference golden test in
nisshi-schema/src/avro/arrow.rs:1364-3606, plus the container × logical
matrix the verdict calls out (enum-in-array, map-of-decimal, nested
unions, time-millis/micros, duration in arrays, …).

Each case drives THREE layers of the repo's own stack:
  1. ``avro_to_spark`` — the schema→Spark type mapping (types.py,
     mirroring arrow.rs:111-247 with the documented Spark divergences:
     time-of-day → Long, dense union → tagged struct, duration →
     struct<months,days,milliseconds>).
  2. ``avro_wire.encode``/``decode`` — byte-exact wire roundtrip of the
     reference test's values.
  3. Spark ingestion — the decoded values must be accepted by a
     DataFrame under the mapped type and come back unchanged (the
     as_arrow contract: wire value → typed column).
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from tansu_spark.registry import avro_wire as W
from tansu_spark.registry.types import avro_to_spark

F32_MAX = 3.4028234663852886e38  # f32::MAX exactly representable in f64
F32_MIN = -F32_MAX
F64_MAX = 1.7976931348623157e308
I32_MAX, I32_MIN = 2**31 - 1, -(2**31)
I64_MAX, I64_MIN = 2**63 - 1, -(2**63)
TS = datetime.datetime(2009, 2, 13, 23, 31, 30)  # the reference's base ts


def _rec(*fields):
    return {
        "type": "record",
        "name": "Message",
        "fields": [{"name": n, "type": t} for n, t in fields],
    }


def _struct(*fields):
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


# (reference test @ arrow.rs line, schema, spark type, [values])
CASES = [
    # --- records of primitives / lists of primitives --------------------
    (
        "record_of_primitive_data_types@1364",
        _rec(
            ("b", "boolean"), ("c", "int"), ("d", "long"), ("e", "float"),
            ("f", "double"), ("g", "bytes"), ("h", "string"),
        ),
        _struct(
            ("b", BooleanType(), False), ("c", IntegerType(), False),
            ("d", LongType(), False), ("e", FloatType(), False),
            ("f", DoubleType(), False), ("g", BinaryType(), False),
            ("h", StringType(), False),
        ),
        [{"b": False, "c": I32_MAX, "d": I64_MAX, "e": F32_MAX,
          "f": F64_MAX, "g": b"abcdef", "h": "pqr"}],
    ),
    (
        "record_of_with_list_of_primitive_data_types@1450",
        _rec(
            ("b", {"type": "array", "items": "boolean"}),
            ("c", {"type": "array", "items": "int"}),
            ("d", {"type": "array", "items": "long"}),
            ("e", {"type": "array", "items": "float"}),
            ("f", {"type": "array", "items": "double"}),
            ("g", {"type": "array", "items": "bytes"}),
            ("h", {"type": "array", "items": "string"}),
        ),
        _struct(
            ("b", ArrayType(BooleanType()), False),
            ("c", ArrayType(IntegerType()), False),
            ("d", ArrayType(LongType()), False),
            ("e", ArrayType(FloatType()), False),
            ("f", ArrayType(DoubleType()), False),
            ("g", ArrayType(BinaryType()), False),
            ("h", ArrayType(StringType()), False),
        ),
        [{"b": [False, True], "c": [I32_MIN, 0, I32_MAX],
          "d": [I64_MIN, 0, I64_MAX], "e": [F32_MIN, 0.0, F32_MAX],
          "f": [-F64_MAX, 0.0, F64_MAX], "g": [b"abcdef"],
          "h": ["abc", "pqr", "xyz"]}],
    ),
    # --- unions ---------------------------------------------------------
    (
        "union@1550",
        _rec(("value", ["null", "float"])),
        _struct(("value", FloatType(), True)),
        [{"value": F32_MIN}, {"value": None}, {"value": F32_MAX}],
    ),
    # --- enumerations ---------------------------------------------------
    (
        "enumeration@1614",
        _rec(("value", {"type": "enum", "name": "Suit",
                        "symbols": ["SPADES", "HEARTS", "DIAMONDS", "CLUBS"]})),
        _struct(("value", StringType(), False)),
        [{"value": "CLUBS"}, {"value": "HEARTS"}],
    ),
    (
        "observation_enumeration@1679",
        _rec(
            ("amount", "double"),
            ("unit", {"type": "enum", "name": "U",
                      "symbols": ["CELSIUS", "MILLIBAR"]}),
        ),
        _struct(("amount", DoubleType(), False), ("unit", StringType(), False)),
        [{"amount": 23.2, "unit": "CELSIUS"}],
    ),
    # --- maps -----------------------------------------------------------
    (
        "map@1756",
        _rec(("value", {"type": "map", "values": "long"})),
        _struct(("value", MapType(StringType(), LongType()), False)),
        [{"value": {"a": 1, "b": 3, "c": 5}}],
    ),
    # --- key / value shapes ---------------------------------------------
    (
        "simple_integer_key_as_arrow@1826",
        "int",
        IntegerType(),
        [I32_MIN, 0, I32_MAX],
    ),
    (
        "simple_record_value_as_arrow@1888",
        _rec(("zone", "long"), ("host", "string")),
        _struct(("zone", LongType(), False), ("host", StringType(), False)),
        [{"zone": 6, "host": "a.example.com"}],
    ),
    (
        "string_key_with_record_as_arrow@3324",
        _rec(("key", "string"),
             ("value", _rec(("zone", "long"), ("host", "string")))),
        _struct(
            ("key", StringType(), False),
            ("value",
             _struct(("zone", LongType(), False), ("host", StringType(), False)),
             False),
        ),
        [{"key": "k0", "value": {"zone": 6, "host": "a.example.com"}}],
    ),
    # --- bare arrays of each primitive ----------------------------------
    ("array_bool_value@1976", {"type": "array", "items": "boolean"},
     ArrayType(BooleanType()), [[True, False, True]]),
    ("array_int_value@2049", {"type": "array", "items": "int"},
     ArrayType(IntegerType()), [[I32_MIN, 0, I32_MAX]]),
    ("array_long_value@2120", {"type": "array", "items": "long"},
     ArrayType(LongType()), [[I64_MIN, 0, I64_MAX]]),
    ("array_float_value@2191", {"type": "array", "items": "float"},
     ArrayType(FloatType()), [[F32_MIN, 0.0, F32_MAX]]),
    ("array_double_value@2265", {"type": "array", "items": "double"},
     ArrayType(DoubleType()), [[-F64_MAX, 0.0, F64_MAX]]),
    ("array_string_value@2339", {"type": "array", "items": "string"},
     ArrayType(StringType()), [["abc", "pqr", "xyz"]]),
    (
        "array_record_value@2414",
        {"type": "array", "items": _rec(("zone", "long"), ("host", "string"))},
        ArrayType(_struct(("zone", LongType(), False),
                          ("host", StringType(), False))),
        [[{"zone": 1, "host": "a"}, {"zone": 2, "host": "b"}]],
    ),
    ("array_bytes_value@2507", {"type": "array", "items": "bytes"},
     ArrayType(BinaryType()), [[b"abc", b"def"]]),
    # --- logical types, scalar ------------------------------------------
    ("uuid_logical_type@2581",
     {"type": "string", "logicalType": "uuid"}, StringType(),
     ["1e44d9c2-5e7a-443b-bf10-2b1e5fd72f15"]),
    ("time_millis_logical_type@2658",
     {"type": "int", "logicalType": "time-millis"}, LongType(),
     [0, 1_000, 86_399_999]),
    ("time_micros_logical_type@2730",
     {"type": "long", "logicalType": "time-micros"}, LongType(),
     [0, 1_000_000, 86_399_999_999]),
    ("timestamp_millis_logical_type@2803",
     {"type": "long", "logicalType": "timestamp-millis"}, TimestampType(),
     [TS, datetime.datetime(1970, 1, 1)]),
    ("timestamp_micros_logical_type@2875",
     {"type": "long", "logicalType": "timestamp-micros"}, TimestampType(),
     [TS.replace(microsecond=123456)]),
    ("local_timestamp_millis_logical_type@2948",
     {"type": "long", "logicalType": "local-timestamp-millis"},
     TimestampNTZType(), [TS]),
    ("local_timestamp_micros_logical_type@3021",
     {"type": "long", "logicalType": "local-timestamp-micros"},
     TimestampNTZType(), [TS.replace(microsecond=123456)]),
    ("date_logical_type@3093",
     {"type": "int", "logicalType": "date"}, DateType(),
     [datetime.date(1970, 1, 1), datetime.date(2009, 2, 13)]),
    ("decimal_fixed_logical_type@3169",
     {"type": "fixed", "name": "FD", "size": 6, "logicalType": "decimal",
      "precision": 12, "scale": 2},
     DecimalType(12, 2), [Decimal("12345.67"), Decimal("-0.01")]),
    ("decimal_variable_logical_type@3249",
     {"type": "bytes", "logicalType": "decimal",
      "precision": 10, "scale": 3},
     DecimalType(10, 3), [Decimal("1234.567"), Decimal("-9999999.999")]),
    # --- the verdict's container × logical matrix -----------------------
    (
        "enum_in_array",
        {"type": "array",
         "items": {"type": "enum", "name": "S", "symbols": ["A", "B", "C"]}},
        ArrayType(StringType()),
        [["C", "A", "B"]],
    ),
    (
        "enum_in_map",
        {"type": "map",
         "values": {"type": "enum", "name": "S2", "symbols": ["X", "Y"]}},
        MapType(StringType(), StringType()),
        [{"k1": "Y", "k2": "X"}],
    ),
    (
        "map_of_decimal",
        {"type": "map",
         "values": {"type": "bytes", "logicalType": "decimal",
                    "precision": 8, "scale": 2}},
        MapType(StringType(), DecimalType(8, 2)),
        [{"eur": Decimal("19.99"), "jpy": Decimal("-0.50")}],
    ),
    (
        "date_in_array",
        {"type": "array", "items": {"type": "int", "logicalType": "date"}},
        ArrayType(DateType()),
        [[datetime.date(2026, 8, 14), datetime.date(1969, 12, 31)]],
    ),
    (
        "time_millis_in_array",
        {"type": "array",
         "items": {"type": "int", "logicalType": "time-millis"}},
        ArrayType(LongType()),
        [[0, 43_200_000, 86_399_999]],
    ),
    (
        "timestamp_micros_in_map",
        {"type": "map",
         "values": {"type": "long", "logicalType": "timestamp-micros"}},
        MapType(StringType(), TimestampType()),
        [{"created": TS, "updated": TS.replace(microsecond=999999)}],
    ),
    (
        "duration_in_array",
        {"type": "array",
         "items": {"type": "fixed", "name": "DU", "size": 12,
                   "logicalType": "duration"}},
        ArrayType(_struct(("months", IntegerType(), False),
                          ("days", IntegerType(), False),
                          ("milliseconds", IntegerType(), False))),
        [[{"months": 1, "days": 2, "milliseconds": 3},
          {"months": 0, "days": 0, "milliseconds": 0}]],
    ),
    (
        "uuid_in_array",
        {"type": "array",
         "items": {"type": "string", "logicalType": "uuid"}},
        ArrayType(StringType()),
        [["00000000-0000-0000-0000-000000000000",
          "1e44d9c2-5e7a-443b-bf10-2b1e5fd72f15"]],
    ),
    (
        "decimal_in_array_in_record",
        _rec(("prices", {"type": "array",
                         "items": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 6, "scale": 2}})),
        _struct(("prices", ArrayType(DecimalType(6, 2)), False)),
        [{"prices": [Decimal("0.01"), Decimal("-9999.99")]}],
    ),
    (
        "record_in_map",
        {"type": "map",
         "values": _rec(("zone", "long"), ("host", "string"))},
        MapType(StringType(),
                _struct(("zone", LongType(), False),
                        ("host", StringType(), False))),
        [{"eu": {"zone": 1, "host": "a"}, "us": {"zone": 2, "host": "b"}}],
    ),
    (
        "map_of_array_of_long",
        {"type": "map", "values": {"type": "array", "items": "long"}},
        MapType(StringType(), ArrayType(LongType())),
        [{"a": [1, 2, 3], "b": []}],
    ),
    (
        "fixed_in_array",
        {"type": "array",
         "items": {"type": "fixed", "name": "FX", "size": 4}},
        ArrayType(BinaryType()),
        [[b"\x00\x01\x02\x03", b"\xff\xfe\xfd\xfc"]],
    ),
    (
        "nullable_logical_in_record",
        _rec(("d", ["null", {"type": "int", "logicalType": "date"}]),
             ("ts", ["null", {"type": "long",
                              "logicalType": "timestamp-micros"}])),
        _struct(("d", DateType(), True), ("ts", TimestampType(), True)),
        [{"d": datetime.date(2026, 1, 1), "ts": TS},
         {"d": None, "ts": None}],
    ),
    (
        "local_timestamp_in_array",
        {"type": "array",
         "items": {"type": "long", "logicalType": "local-timestamp-micros"}},
        ArrayType(TimestampNTZType()),
        [[TS, TS.replace(microsecond=1)]],
    ),
    (
        "map_of_nullable_union_values",
        {"type": "map", "values": ["null", "long"]},
        MapType(StringType(), LongType()),
        [{"a": 1, "b": None, "c": 3}],
    ),
    (
        "array_of_map_of_decimal",
        {"type": "array",
         "items": {"type": "map",
                   "values": {"type": "bytes", "logicalType": "decimal",
                              "precision": 9, "scale": 4}}},
        ArrayType(MapType(StringType(), DecimalType(9, 4))),
        [[{"x": Decimal("1.2345")}, {"y": Decimal("-0.0001"), "z": Decimal("99999.9999")}]],
    ),
    (
        "general_union_in_record",
        _rec(("v", ["null", "long", "string"])),
        _struct(
            ("v",
             _struct(("_tag", IntegerType(), False),
                     ("u0", LongType(), True),
                     ("u1", StringType(), True)),
             True),
        ),
        [{"v": {"_tag": 0, "u0": 42, "u1": None}},
         {"v": {"_tag": 1, "u0": None, "u1": "hi"}},
         {"v": None}],
    ),
    (
        "deep_nesting_record_array_map_record",
        _rec(("shards",
              {"type": "array",
               "items": {"type": "map",
                         "values": _rec(("n", "long"),
                                        ("tags", {"type": "array",
                                                  "items": "string"}))}})),
        _struct(
            ("shards",
             ArrayType(MapType(
                 StringType(),
                 _struct(("n", LongType(), False),
                         ("tags", ArrayType(StringType()), False)))),
             False),
        ),
        [{"shards": [{"s0": {"n": 1, "tags": ["a", "b"]}},
                     {"s1": {"n": 2, "tags": []}}]}],
    ),
]


@pytest.mark.parametrize("name,schema,expected_type,values",
                         CASES, ids=[c[0] for c in CASES])
def test_avro_golden_type_mapping(name, schema, expected_type, values):
    """Layer 1: schema → Spark type, one assertion per reference golden."""
    assert avro_to_spark(schema) == expected_type, name


@pytest.mark.parametrize("name,schema,expected_type,values",
                         CASES, ids=[c[0] for c in CASES])
def test_avro_golden_wire_roundtrip(name, schema, expected_type, values):
    """Layer 2: the reference test's values survive the binary wire
    codec byte-exactly (encode → decode is identity)."""
    for v in values:
        assert W.decode(schema, W.encode(schema, v)) == v, (name, v)


@pytest.mark.parametrize("name,schema,expected_type,values",
                         CASES, ids=[c[0] for c in CASES])
def test_avro_golden_spark_ingestion(spark, name, schema, expected_type, values):
    """Layer 3: wire-decoded values are accepted by Spark under the
    mapped type and round-trip through a DataFrame unchanged — the
    as_arrow end-to-end contract (typed column out of wire bytes)."""
    decoded = [W.decode(schema, W.encode(schema, v)) for v in values]
    out_schema = StructType([StructField("value", expected_type, True)])
    df = spark.createDataFrame([(d,) for d in decoded], out_schema)
    back = [r["value"] for r in df.collect()]

    def norm(x):
        if hasattr(x, "asDict"):  # Row → dict for struct comparison
            return {k: norm(v) for k, v in x.asDict().items()}
        if isinstance(x, dict):
            return {k: norm(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [norm(i) for i in x]
        if isinstance(x, bytearray):
            return bytes(x)
        if isinstance(x, float):
            return pytest.approx(x)
        return x

    assert [norm(b) for b in back] == [norm(d) for d in decoded], name

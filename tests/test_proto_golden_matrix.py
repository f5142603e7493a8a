"""Golden-matrix parity sweep for Protobuf schema→type conversion: one
parametrized case per reference golden test in
nisshi-schema/src/proto/arrow.rs:1338-2160, driven through the repo's
own stack — ``parse_proto`` (types.py, the MessageDescriptor→Field
mapping of proto/arrow.rs:121-262), ``ProtoCodec`` binary wire
round-trip, and Spark ingestion under the mapped type.

Documented divergence (SURVEY §7 hard parts): enum VALUES travel as
their int numbers (the Arrow side is Int32, proto/arrow.rs:152); the
reference's JSON front-door also accepts symbol names — that mapping
lives at its serde layer, not the wire, so the wire parity here feeds
ints.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from tansu_spark.registry.proto_wire import ProtoCodec
from tansu_spark.registry.types import parse_proto, parse_proto_meta


def _struct(*fields):
    return StructType([StructField(n, t, True) for n, t in fields])


# (reference test @ proto/arrow.rs line, proto text, message, expected
#  Spark type, [values])
CASES = [
    (
        "message_descriptor_singular_to_field@1498",
        """
        syntax = 'proto3';
        message Value {
            double a = 1;  float b = 2;   int32 c = 3;    int64 d = 4;
            uint32 e = 5;  uint64 f = 6;  sint32 g = 7;   sint64 h = 8;
            fixed32 i = 9; fixed64 j = 10; sfixed32 k = 11; sfixed64 l = 12;
            bool m = 13;   string n = 14; bytes o = 15;
        }
        """,
        "Value",
        _struct(
            ("a", DoubleType()), ("b", FloatType()), ("c", IntegerType()),
            ("d", LongType()), ("e", IntegerType()), ("f", LongType()),
            ("g", IntegerType()), ("h", LongType()), ("i", IntegerType()),
            ("j", LongType()), ("k", IntegerType()), ("l", LongType()),
            ("m", BooleanType()), ("n", StringType()), ("o", BinaryType()),
        ),
        [{"a": 567.65, "b": 45.654, "c": -6, "d": -66, "e": 23432,
          "f": 34543, "g": 45654, "h": 67876, "i": 78987, "j": 89098,
          "k": 90109, "l": 12321, "m": True, "n": "Hello World!",
          "o": b"abc123!?$*&()'-=@~"}],
    ),
    (
        "enumeration@1338",
        """
        syntax = 'proto3';
        enum Corpus {
          CORPUS_UNSPECIFIED = 0; CORPUS_UNIVERSAL = 1; CORPUS_WEB = 2;
          CORPUS_IMAGES = 3; CORPUS_LOCAL = 4; CORPUS_NEWS = 5;
          CORPUS_PRODUCTS = 6; CORPUS_VIDEO = 7;
        }
        message Value {
          string query = 1;
          int32 page_number = 2;
          int32 results_per_page = 3;
          Corpus corpus = 4;
        }
        """,
        "Value",
        _struct(
            ("query", StringType()), ("page_number", IntegerType()),
            ("results_per_page", IntegerType()), ("corpus", IntegerType()),
        ),
        [
            {"query": "abc/def", "page_number": 6, "results_per_page": 13,
             "corpus": 2},
            {"query": "pqr/stu", "page_number": 42, "results_per_page": 5,
             "corpus": 6},
        ],
    ),
    (
        "key_and_value_as_arrow@1600",
        """
        syntax = 'proto3';
        message Key { int32 id = 1; }
        """,
        "Key",
        _struct(("id", IntegerType())),
        [{"id": 32123}, {"id": 45654}],
    ),
    (
        "simple_map@1744",
        """
        syntax = 'proto3';
        message Value { map<string, int32> kv = 1; }
        """,
        "Value",
        _struct(("kv", MapType(StringType(), IntegerType()))),
        [{"kv": {"a": 31234, "b": 56765, "c": 12321}}],
    ),
    (
        "map_other_type@1803",
        """
        syntax = 'proto3';
        message Project {
            string name = 1;
            float complete = 2;
        }
        message Value { map<string, Project> kv = 1; }
        """,
        "Value",
        _struct(
            ("kv", MapType(
                StringType(),
                _struct(("name", StringType()), ("complete", FloatType())))),
        ),
        [{"kv": {"alpha": {"name": "Alpha", "complete": 0.5},
                 "beta": {"name": "Beta", "complete": 1.0}}}],
    ),
    (
        "value_message_ref@1864",
        """
        syntax = 'proto3';
        message Project {
            string name = 1;
            float complete = 2;
        }
        message Value {
            Project project = 1;
            string title = 2;
        }
        """,
        "Value",
        _struct(
            ("project", _struct(("name", StringType()),
                                ("complete", FloatType()))),
            ("title", StringType()),
        ),
        [{"project": {"name": "apollo", "complete": 0.5},
          "title": "manager"}],
    ),
    (
        "simple_repeated@1931",
        """
        syntax = 'proto3';
        message Value {
          string url = 1;
          string title = 2;
          repeated string snippets = 3;
        }
        """,
        "Value",
        _struct(
            ("url", StringType()), ("title", StringType()),
            ("snippets", ArrayType(StringType())),
        ),
        [{"url": "https://example.com/", "title": "Example",
          "snippets": ["abc", "def", "pqr"]}],
    ),
    (
        "repeated@1992",
        """
        syntax = 'proto3';
        message Result {
          string url = 1;
          string title = 2;
          repeated string snippets = 3;
        }
        message Value {
          repeated Result results = 1;
        }
        """,
        "Value",
        _struct(
            ("results", ArrayType(_struct(
                ("url", StringType()), ("title", StringType()),
                ("snippets", ArrayType(StringType()))))),
        ),
        [{"results": [
            {"url": "a", "title": "A", "snippets": ["x", "y"]},
            {"url": "b", "title": "B", "snippets": []},
        ]}],
    ),
    (
        "packed_repeated_scalars",
        '''
        syntax = 'proto3';
        message Value {
          repeated int64 xs = 1;
          repeated float fs = 2;
          repeated sint32 zs = 3;
        }
        ''',
        "Value",
        _struct(
            ("xs", ArrayType(LongType())),
            ("fs", ArrayType(FloatType())),
            ("zs", ArrayType(IntegerType())),
        ),
        [{"xs": [1, 150, 86942, -1], "fs": [0.5, -2.25], "zs": [-3, 0, 7]}],
    ),
]

# the repo's own fixture files mirror the reference's etc/schema set —
# customer_001/customer_002 and taxi drive them end-to-end
_FIXTURE_CASES = [
    ("customer_001@2058", "customer.proto"),
    ("taxi@1687", "taxi.proto"),
]


@pytest.mark.parametrize("name,proto,msg,expected_type,values",
                         CASES, ids=[c[0] for c in CASES])
def test_proto_golden_type_mapping(name, proto, msg, expected_type, values):
    assert parse_proto(proto)[msg] == expected_type, name


@pytest.mark.parametrize("name,proto,msg,expected_type,values",
                         CASES, ids=[c[0] for c in CASES])
def test_proto_golden_wire_roundtrip(name, proto, msg, expected_type, values):
    messages, enums = parse_proto_meta(proto)
    codec = ProtoCodec(messages, enums)
    for v in values:
        back = codec.decode(msg, codec.encode(msg, v))
        # proto3 wire drops default-valued fields; decode restores
        # defaults, so compare with defaults filled in on the input side
        for f in messages[msg]:
            v.setdefault(f["name"], back.get(f["name"]))
        assert _approx(back) == _approx(v), (name, v)


def _approx(x):
    if isinstance(x, dict):
        return {k: _approx(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_approx(i) for i in x]
    if isinstance(x, float):
        return pytest.approx(x, rel=1e-6)
    return x


@pytest.mark.parametrize("name,proto,msg,expected_type,values",
                         CASES, ids=[c[0] for c in CASES])
def test_proto_golden_spark_ingestion(spark, name, proto, msg,
                                      expected_type, values):
    messages, enums = parse_proto_meta(proto)
    codec = ProtoCodec(messages, enums)
    decoded = [codec.decode(msg, codec.encode(msg, v)) for v in values]
    schema = StructType([StructField("value", expected_type, True)])
    df = spark.createDataFrame([(d,) for d in decoded], schema)
    assert df.count() == len(values), name
    back = [r["value"].asDict(recursive=True) for r in df.collect()]
    assert [_approx(_bytes_norm(b)) for b in back] == [
        _approx(_bytes_norm(d)) for d in decoded
    ], name


def _bytes_norm(x):
    if isinstance(x, dict):
        return {k: _bytes_norm(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_bytes_norm(i) for i in x]
    if isinstance(x, bytearray):
        return bytes(x)
    return x


@pytest.mark.parametrize("name,fixture", _FIXTURE_CASES,
                         ids=[c[0] for c in _FIXTURE_CASES])
def test_proto_golden_fixture_schemas(name, fixture):
    """The repo fixture .proto files (mirroring the reference's
    etc/schema set) must parse to struct types and round-trip a
    representative value through the wire codec."""
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "schemas",
                        fixture)
    text = open(path).read()
    types = parse_proto(text)
    messages, enums = parse_proto_meta(text)
    codec = ProtoCodec(messages, enums)
    assert types, name
    for msg_name, st in types.items():
        assert isinstance(st, StructType), (name, msg_name)
        # zero-value round-trip: proto3 defaults survive encode/decode
        zero = {}
        back = codec.decode(msg_name, codec.encode(msg_name, zero))
        assert set(back) == {f["name"] for f in messages[msg_name]}, msg_name


def test_proto_enum_symbolic_encode():
    """The reference's JSON front door accepts enum SYMBOLS
    (enumeration@1338 feeds "CORPUS_WEB" and reads back 2): the codec
    must encode a symbol via the enum's value table, byte-identical to
    encoding the number, and reject unknown symbols."""
    proto = CASES[1][1]  # the enumeration case's schema
    messages, enums = parse_proto_meta(proto)
    assert enums["Corpus"]["CORPUS_WEB"] == 2
    assert enums["Corpus"]["CORPUS_PRODUCTS"] == 6
    codec = ProtoCodec(messages, enums)
    sym = codec.encode("Value", {"query": "abc/def", "page_number": 6,
                                 "results_per_page": 13,
                                 "corpus": "CORPUS_WEB"})
    num = codec.encode("Value", {"query": "abc/def", "page_number": 6,
                                 "results_per_page": 13, "corpus": 2})
    assert sym == num
    assert codec.decode("Value", sym)["corpus"] == 2  # Arrow side is Int32
    with pytest.raises(ValueError, match="unknown Corpus enum symbol"):
        codec.encode("Value", {"corpus": "CORPUS_NOPE"})

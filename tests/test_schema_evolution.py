"""Avro reader/writer schema resolution (round-6 verdict ask #7).

The reference migrates schemas add-only (Delta::migrate_schema;
nisshi-schema/tests/migrate-001..003.proto, customer-001..003.proto grow a
record one field per version) — after a migration, segments produced under
the OLD schema must still decode under the NEW one. The codec-level
goldens below mirror the Avro spec's resolution rules (new field with
default, removed field skipped, numeric/lexical promotions, enum default,
union branch matching); the end-to-end test replays the migrate fixtures'
lifecycle on the broker: produce under v1, evolve the registry file to
v2, produce again, and read BOTH generations through typed_records.
"""

from __future__ import annotations

import json
import os

import pytest

from tansu_spark.registry import SchemaRegistry
from tansu_spark.registry import avro_wire as W

# ------------------------------------------------------------ codec goldens

V1 = {
    "type": "record",
    "name": "Customer",
    "fields": [
        {"name": "email_address", "type": "string"},
        {"name": "full_name", "type": "string"},
    ],
}
# customer-002 adds a nested record; customer-003 adds a repeated field —
# mirrored here as one add-only step with a defaulted field + a nullable
V2 = {
    "type": "record",
    "name": "Customer",
    "fields": [
        {"name": "email_address", "type": "string"},
        {"name": "full_name", "type": "string"},
        {"name": "age", "type": "long", "default": 0},
        {"name": "home_city", "type": ["null", "string"], "default": None},
    ],
}


def test_new_fields_fill_from_defaults():
    data = W.encode(V1, {"email_address": "a@b", "full_name": "Aloysius"})
    out = W.decode_resolved(V1, V2, data)
    assert out == {
        "email_address": "a@b",
        "full_name": "Aloysius",
        "age": 0,
        "home_city": None,
    }


def test_removed_fields_are_skipped():
    data = W.encode(V2, {"email_address": "a@b", "full_name": "x",
                         "age": 7, "home_city": "ulm"})
    out = W.decode_resolved(V2, V1, data)
    assert out == {"email_address": "a@b", "full_name": "x"}


def test_missing_field_without_default_rejects():
    v2_no_default = {
        "type": "record",
        "name": "Customer",
        "fields": V1["fields"] + [{"name": "age", "type": "long"}],
    }
    data = W.encode(V1, {"email_address": "a@b", "full_name": "x"})
    with pytest.raises(ValueError, match="no default"):
        W.decode_resolved(V1, v2_no_default, data)


def test_numeric_and_lexical_promotions():
    w = {"type": "record", "name": "R", "fields": [
        {"name": "n", "type": "int"},
        {"name": "s", "type": "string"},
    ]}
    r = {"type": "record", "name": "R", "fields": [
        {"name": "n", "type": "double"},
        {"name": "s", "type": "bytes"},
    ]}
    data = W.encode(w, {"n": 7, "s": "hi"})
    out = W.decode_resolved(w, r, data)
    assert out == {"n": 7.0, "s": b"hi"} and isinstance(out["n"], float)


def test_enum_symbol_resolution_with_default():
    w = {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}
    r = {"type": "enum", "name": "E", "symbols": ["A", "B"], "default": "A"}
    assert W.decode_resolved(w, r, W.encode(w, "B")) == "B"
    assert W.decode_resolved(w, r, W.encode(w, "C")) == "A"  # default fallback


def test_nullable_union_widening():
    """v1 plain string -> v2 ["null","string"]: old non-null bytes decode;
    and the reverse direction reads the null branch as an error."""
    w = {"type": "record", "name": "R", "fields": [{"name": "s", "type": "string"}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "s", "type": ["null", "string"]}]}
    assert W.decode_resolved(w, r, W.encode(w, {"s": "x"})) == {"s": "x"}
    assert W.decode_resolved(r, w, W.encode(r, {"s": "x"})) == {"s": "x"}
    with pytest.raises(ValueError, match="null branch"):
        W.decode_resolved(r, w, W.encode(r, {"s": None}))


def test_array_items_resolve_recursively():
    w = {"type": "record", "name": "R", "fields": [
        {"name": "xs", "type": {"type": "array", "items": V1}}]}
    r = {"type": "record", "name": "R", "fields": [
        {"name": "xs", "type": {"type": "array", "items": V2}}]}
    data = W.encode(w, {"xs": [{"email_address": "a", "full_name": "b"}] * 3})
    out = W.decode_resolved(w, r, data)
    assert len(out["xs"]) == 3 and all(x["age"] == 0 for x in out["xs"])


# ------------------------------------------------------- end-to-end broker


def _avsc(part: dict) -> str:
    return json.dumps({
        "type": "record",
        "name": "Envelope",
        "fields": [{"name": "value", "type": part}],
    })


def test_produce_v1_migrate_v2_typed_records_reads_both(spark, tmp_path):
    """The migrate-00N lifecycle: old segments carry v1 binary; after the
    registry file evolves to v2 the typed view resolves them under their
    writer schema (fingerprint header -> snapshot lookup) while new
    segments decode natively — one frame, both generations correct."""
    from tansu_spark.broker.broker import Broker

    schemas = tmp_path / "schemas"
    schemas.mkdir()
    (schemas / "customer.avsc").write_text(_avsc(V1))
    reg = SchemaRegistry(str(schemas), ttl_seconds=0.0)
    b = Broker(spark, str(tmp_path / "store"), registry=reg)
    b.create_topic("customer", partitions=1,
                   config={"tansu.schema.wire": "avro"})

    b.produce_rows("customer", [
        {"key": None,
         "value": W.encode(V1, {"email_address": "old@x", "full_name": "Old"})},
    ])

    # the migration: registry file replaced add-only (v2 = v1 + defaults)
    (schemas / "customer.avsc").write_text(_avsc(V2))
    b.produce_rows("customer", [
        {"key": None,
         "value": W.encode(V2, {"email_address": "new@x", "full_name": "New",
                                "age": 30, "home_city": "ulm"})},
    ])

    rows = {r.value.email_address: r.value for r in b.typed_records("customer").collect()}
    assert set(rows) == {"old@x", "new@x"}
    old, new = rows["old@x"], rows["new@x"]
    assert old.age == 0 and old.home_city is None      # defaults filled
    assert new.age == 30 and new.home_city == "ulm"    # native decode
    # both schema versions were snapshotted into topic state
    snaps = [p for p in os.listdir(b._state("customer", ""))
             if p.startswith("schema-")]
    assert len(snaps) == 2, snaps


PROTO_V1 = """
syntax = 'proto3';
message Value {
    string email_address = 1;
    string full_name = 2;
}
"""

# customer-002/003 lifecycle: later versions ADD a nested message and more
# fields; field numbers of existing fields never change (proto contract)
PROTO_V2 = """
syntax = 'proto3';
message Address {
    string city = 1;
    string post_code = 2;
}
message Value {
    string email_address = 1;
    string full_name = 2;
    Address home = 3;
    string mobile = 4;
}
"""


def test_proto_evolution_is_tag_native(spark, tmp_path):
    """The reference's migrate fixtures are PROTO (customer-001..003 grow
    the Value message add-only). Protobuf's wire format is tag-based, so
    no resolution machinery is needed: the evolved reader skips unknown
    tags (fields removed from the reader) and nulls absent ones (fields
    the writer didn't know) — this test pins that the repo's pure-Python
    codec + broker path actually deliver it end-to-end, both directions."""
    from tansu_spark.broker.broker import Broker
    from tansu_spark.registry.proto_wire import ProtoCodec
    from tansu_spark.registry.types import parse_proto_meta

    schemas = tmp_path / "schemas"
    schemas.mkdir()
    (schemas / "customer.proto").write_text(PROTO_V1)
    reg = SchemaRegistry(str(schemas), ttl_seconds=0.0)
    b = Broker(spark, str(tmp_path / "store"), registry=reg)
    b.create_topic("customer", partitions=1,
                   config={"tansu.schema.wire": "proto"})

    m1, e1 = parse_proto_meta(PROTO_V1)
    b.produce_rows("customer", [
        {"key": None,
         "value": ProtoCodec(m1, e1).encode(
             "Value", {"email_address": "old@x", "full_name": "Old"})},
    ])

    (schemas / "customer.proto").write_text(PROTO_V2)
    m2, e2 = parse_proto_meta(PROTO_V2)
    b.produce_rows("customer", [
        {"key": None,
         "value": ProtoCodec(m2, e2).encode(
             "Value", {"email_address": "new@x", "full_name": "New",
                       "home": {"city": "ulm", "post_code": "89073"},
                       "mobile": "555"})},
    ])

    rows = {r.value.email_address: r.value
            for r in b.typed_records("customer").collect()}
    assert set(rows) == {"old@x", "new@x"}
    # proto3 semantics: absent message field -> null; absent scalar ->
    # the type's default ('' for string) — exactly what prost gives the
    # reference for pre-migration bytes
    assert rows["old@x"].home is None and rows["old@x"].mobile == ""
    assert rows["new@x"].home.city == "ulm" and rows["new@x"].mobile == "555"

    # reverse direction: a v1 reader over v2 bytes skips the unknown tags
    old_codec = ProtoCodec(m1, e1)
    v2_bytes = ProtoCodec(m2, e2).encode(
        "Value", {"email_address": "a@b", "full_name": "x",
                  "home": {"city": "c", "post_code": "p"}, "mobile": "m"})
    assert old_codec.decode("Value", v2_bytes) == {
        "email_address": "a@b", "full_name": "x"}

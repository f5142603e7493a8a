"""Avro BINARY wire codec — pure Python, no fastavro/spark-avro needed.

The reference validates and decodes real Avro binary payloads on every
produce (nisshi-schema/src/avro.rs:365-540: schema-driven walk of the
binary stream into typed Arrow builders). This module replicates that
semantics against the Apache Avro 1.11 binary spec:

- int/long: zigzag varint            - float/double: little-endian IEEE
- bytes/string: varint length + body - fixed: raw N bytes
- enum: varint symbol index          - union: varint branch index + value
- array/map: blocks (negative count = abs(count) + byte-size prefix),
  zero-terminated
- record: fields in declaration order
- logical types on their physical carrier: decimal (big-endian two's
  complement unscaled on bytes/fixed), date (days on int), time-millis/
  micros (int/long), timestamp-millis/micros (long), uuid (string),
  duration (fixed(12), three little-endian uint32: months/days/millis)

Decoded Python values line up with ``types.avro_to_spark``'s Spark types:
Decimal, datetime.date, naive-UTC datetime, dict-for-map, bytes, and the
struct-of-branches + ``_tag`` encoding for general unions (Spark has no
dense union type).

Spark integration is Arrow-batched (mapInPandas) — the decode kernel runs
vectorized over record batches, never row-at-a-time in the plan; see
``SchemaRegistry.decode(..., wire="avro")``.
"""

from __future__ import annotations

import datetime
import io
import struct
from decimal import Decimal
from typing import Any

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH = datetime.datetime(1970, 1, 1)

# ------------------------------------------------------------------ primitives


def _write_long(out: io.BytesIO, n: int) -> None:
    # zigzag then varint (Avro spec "binary encoding / primitive types")
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated avro varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


# ------------------------------------------------------------------- resolve


def _resolve(schema: Any) -> tuple[str, Any]:
    """Normalize a schema node to (kind, node); kind is the avro type name
    or 'union'."""
    if isinstance(schema, str):
        return schema, schema
    if isinstance(schema, list):
        return "union", schema
    return schema["type"] if isinstance(schema.get("type"), str) else "nested", schema


def _union_branches(schema: list) -> list[Any]:
    return [s for s in schema if s != "null"]


def _is_nullable_single(schema: list) -> bool:
    return "null" in schema and len(_union_branches(schema)) == 1


# -------------------------------------------------------------------- encode


def encode(schema: Any, value: Any) -> bytes:
    out = io.BytesIO()
    _encode(schema, value, out)
    return out.getvalue()


def _encode(schema: Any, value: Any, out: io.BytesIO) -> None:
    kind, node = _resolve(schema)

    if kind == "union":
        branches = list(node)
        if value is None:
            if "null" not in branches:
                raise ValueError("None for non-nullable union")
            _write_long(out, branches.index("null"))
            return
        if _is_nullable_single(branches):
            branch = _union_branches(branches)[0]
            _write_long(out, branches.index(branch))
            _encode(branch, value, out)
            return
        # general union: value is the struct-of-branches dict with _tag
        non_null = _union_branches(branches)
        tag = int(value["_tag"])
        branch = non_null[tag]
        _write_long(out, branches.index(branch))
        _encode(branch, value[f"u{tag}"], out)
        return

    if isinstance(node, dict):
        logical = node.get("logicalType")
        if logical == "decimal":
            scale = node.get("scale", 0)
            if not isinstance(value, Decimal):
                # JSON-sourced input (the `cat produce` path): int, float
                # and str all mean the LOGICAL value ({"price": 5} is
                # 5.00 at scale 2, same as 5.0 or "5") — exact via the
                # decimal string constructor, never float arithmetic.
                value = Decimal(str(value))
            unscaled = int(value.scaleb(scale).to_integral_value())
            nbytes = max(1, ((unscaled.bit_length() if unscaled >= 0 else (~unscaled).bit_length()) + 8) // 8)
            raw = unscaled.to_bytes(nbytes, "big", signed=True)
            if node["type"] == "fixed":
                raw = raw.rjust(node["size"], b"\xff" if unscaled < 0 else b"\x00")
                out.write(raw)
            else:
                _write_long(out, len(raw))
                out.write(raw)
            return
        if logical == "duration":
            out.write(
                struct.pack(
                    "<III", value["months"], value["days"], value["milliseconds"]
                )
            )
            return
        if logical == "date":
            if isinstance(value, str):  # JSON-sourced ISO date
                value = datetime.date.fromisoformat(value)
            _write_long(out, (value - _EPOCH_DATE).days if isinstance(value, datetime.date) else int(value))
            return
        if logical in (
            "timestamp-millis",
            "timestamp-micros",
            "local-timestamp-millis",
            "local-timestamp-micros",
        ):
            # local-* carries the same epoch-units wire form; the naive
            # datetime is simply not a UTC instant (TimestampNTZ on the
            # Spark side, arrow.rs:176-186's Timestamp(..., None)).
            if isinstance(value, str):  # JSON-sourced ISO timestamp
                value = datetime.datetime.fromisoformat(value)
            if isinstance(value, datetime.datetime):
                us = round((value.replace(tzinfo=None) - _EPOCH).total_seconds() * 1e6)
                value = us // 1000 if logical.endswith("millis") else us
            _write_long(out, int(value))
            return

    if kind in ("int", "long", "time-millis", "time-micros"):
        _write_long(out, int(value))
    elif kind == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif kind == "float":
        out.write(struct.pack("<f", float(value)))
    elif kind == "double":
        out.write(struct.pack("<d", float(value)))
    elif kind == "string":
        raw = value.encode("utf-8")
        _write_long(out, len(raw))
        out.write(raw)
    elif kind == "bytes":
        raw = bytes(value)
        _write_long(out, len(raw))
        out.write(raw)
    elif kind == "null":
        pass
    elif kind == "fixed":
        raw = bytes(value)
        if len(raw) != node["size"]:
            raise ValueError(f"fixed size {node['size']} != {len(raw)}")
        out.write(raw)
    elif kind == "enum":
        _write_long(out, node["symbols"].index(value))
    elif kind == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(node["items"], it, out)
        _write_long(out, 0)
    elif kind == "map":
        pairs = dict(value)
        if pairs:
            _write_long(out, len(pairs))
            for k, v in pairs.items():
                _encode("string", k, out)
                _encode(node["values"], v, out)
        _write_long(out, 0)
    elif kind == "record":
        for f in node["fields"]:
            _encode(f["type"], value.get(f["name"]) if isinstance(value, dict) else getattr(value, f["name"]), out)
    else:
        raise ValueError(f"cannot encode avro kind {kind!r}")


# -------------------------------------------------------------------- decode


def decode(schema: Any, data: bytes) -> Any:
    buf = io.BytesIO(data)
    value = _decode(schema, buf)
    return value


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    raw = buf.read(n)
    if len(raw) != n:
        raise ValueError(f"truncated avro payload: wanted {n} bytes, got {len(raw)}")
    return raw


def _decode(schema: Any, buf: io.BytesIO) -> Any:
    kind, node = _resolve(schema)

    if kind == "union":
        branches = list(node)
        idx = _read_long(buf)
        branch = branches[idx]
        if branch == "null":
            return None
        if _is_nullable_single(branches):
            return _decode(branch, buf)
        # general union → struct-of-branches + _tag (types.avro_to_spark)
        non_null = _union_branches(branches)
        tag = non_null.index(branch)
        rec = {"_tag": tag}
        for i in range(len(non_null)):
            rec[f"u{i}"] = _decode(branch, buf) if i == tag else None
        return rec

    if isinstance(node, dict):
        logical = node.get("logicalType")
        if logical == "decimal":
            if node["type"] == "fixed":
                raw = _read_exact(buf, node["size"])
            else:
                raw = _read_exact(buf, _read_long(buf))
            unscaled = int.from_bytes(raw, "big", signed=True)
            return Decimal(unscaled).scaleb(-node.get("scale", 0))
        if logical == "duration":
            months, days, millis = struct.unpack("<III", _read_exact(buf, 12))
            return {"months": months, "days": days, "milliseconds": millis}
        if logical == "date":
            return _EPOCH_DATE + datetime.timedelta(days=_read_long(buf))
        if logical in ("timestamp-millis", "local-timestamp-millis"):
            return _EPOCH + datetime.timedelta(milliseconds=_read_long(buf))
        if logical in (
            "timestamp-micros",
            "timestamp-nanos",
            "local-timestamp-micros",
        ):
            n = _read_long(buf)
            if logical == "timestamp-nanos":
                n //= 1000
            return _EPOCH + datetime.timedelta(microseconds=n)
        if logical == "uuid":
            return _decode("string", buf)

    if kind in ("int", "long"):
        return _read_long(buf)
    if kind == "boolean":
        return _read_exact(buf, 1) == b"\x01"
    if kind == "float":
        return struct.unpack("<f", _read_exact(buf, 4))[0]
    if kind == "double":
        return struct.unpack("<d", _read_exact(buf, 8))[0]
    if kind == "string":
        return _read_exact(buf, _read_long(buf)).decode("utf-8")
    if kind == "bytes":
        return _read_exact(buf, _read_long(buf))
    if kind == "null":
        return None
    if kind == "fixed":
        return _read_exact(buf, node["size"])
    if kind == "enum":
        return node["symbols"][_read_long(buf)]
    if kind == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)  # block byte-size — skippable, unused here
                n = -n
            for _ in range(n):
                out.append(_decode(node["items"], buf))
    if kind == "map":
        pairs: dict[str, Any] = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return pairs
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _decode("string", buf)
                pairs[k] = _decode(node["values"], buf)
    if kind == "record":
        return {f["name"]: _decode(f["type"], buf) for f in node["fields"]}
    raise ValueError(f"cannot decode avro kind {kind!r}")


# -------------------------------------------- reader/writer schema resolution

# Numeric/lexical promotions the Avro spec allows a reader to apply
# (spec "Schema Resolution"; the reference migrates add-only —
# Delta::migrate_schema, nisshi-schema tests migrate-001..003 — but the
# codec implements the full primitive promotion table since it is free).
_PROMOTIONS = {
    ("int", "long"),
    ("int", "float"),
    ("int", "double"),
    ("long", "float"),
    ("long", "double"),
    ("float", "double"),
    ("string", "bytes"),
    ("bytes", "string"),
}


def decode_resolved(writer: Any, reader: Any, data: bytes) -> Any:
    """Decode ``data`` (written under ``writer``) into ``reader``'s shape —
    the operational path after a schema migration: old segments keep the
    writer's bytes; the evolved registry schema reads them with new
    fields filled from their defaults and removed fields skipped
    (mirrors the reference's add-only Delta::migrate_schema fixtures,
    nisshi-schema/tests/migrate-001..003)."""
    buf = io.BytesIO(data)
    return _decode_resolved(writer, reader, buf)


def _branch_key(schema: Any) -> tuple:
    kind, node = _resolve(schema)
    if kind in ("record", "enum", "fixed") and isinstance(node, dict):
        return (kind, node.get("name"))
    return (kind,)


def _match_branch(writer_branch: Any, reader_branches: list) -> int:
    want = _branch_key(writer_branch)
    for i, rb in enumerate(reader_branches):
        if _branch_key(rb) == want:
            return i
    raise ValueError(f"no reader union branch matches writer branch {want!r}")


def _default_value(schema: Any, default: Any) -> Any:
    """Avro JSON default → the decoded-Python representation this codec
    yields (so defaulted fields line up with types.avro_to_spark)."""
    kind, node = _resolve(schema)
    if kind == "union":
        branches = list(node)
        # spec: the default of a union applies to its FIRST branch
        if default is None:
            return None
        if _is_nullable_single(branches):
            return _default_value([b for b in branches if b != "null"][0], default)
        non_null = _union_branches(branches)
        rec = {"_tag": 0}
        for i in range(len(non_null)):
            rec[f"u{i}"] = _default_value(non_null[i], default) if i == 0 else None
        return rec
    if kind in ("bytes", "fixed") and isinstance(default, str):
        return default.encode("latin-1")  # spec: defaults for bytes are \u00XX
    if kind in ("int", "long"):
        return int(default)
    if kind in ("float", "double"):
        return float(default)
    if kind == "record":
        return {
            f["name"]: _default_value(f["type"], (default or {}).get(f["name"], f.get("default")))
            for f in node["fields"]
        }
    if kind == "array":
        return [_default_value(node["items"], d) for d in (default or [])]
    if kind == "map":
        return {k: _default_value(node["values"], v) for k, v in (default or {}).items()}
    return default


def _decode_resolved(writer: Any, reader: Any, buf: io.BytesIO) -> Any:
    if writer == reader:
        return _decode(writer, buf)
    wkind, wnode = _resolve(writer)
    rkind, rnode = _resolve(reader)

    if wkind == "union":
        branches = list(wnode)
        idx = _read_long(buf)
        branch = branches[idx]
        if rkind == "union":
            rbranches = list(rnode)
            if branch == "null":
                if "null" not in rbranches:
                    raise ValueError("writer null branch not readable: reader union has no null")
                return None
            if _is_nullable_single(rbranches):
                return _decode_resolved(
                    branch, [b for b in rbranches if b != "null"][0], buf
                )
            non_null_r = _union_branches(rbranches)
            ri = _match_branch(branch, non_null_r)
            rec = {"_tag": ri}
            for i in range(len(non_null_r)):
                rec[f"u{i}"] = (
                    _decode_resolved(branch, non_null_r[ri], buf) if i == ri else None
                )
            return rec
        if branch == "null":
            raise ValueError("writer null branch not readable by non-union reader")
        return _decode_resolved(branch, reader, buf)

    if rkind == "union":
        rbranches = list(rnode)
        if _is_nullable_single(rbranches):
            return _decode_resolved(writer, [b for b in rbranches if b != "null"][0], buf)
        non_null_r = _union_branches(rbranches)
        ri = _match_branch(writer, non_null_r)
        rec = {"_tag": ri}
        for i in range(len(non_null_r)):
            rec[f"u{i}"] = _decode_resolved(writer, non_null_r[ri], buf) if i == ri else None
        return rec

    if wkind == "record" and rkind == "record":
        rfields = {f["name"]: f for f in rnode["fields"]}
        out: dict[str, Any] = {}
        for f in wnode["fields"]:
            if f["name"] in rfields:
                out[f["name"]] = _decode_resolved(
                    f["type"], rfields[f["name"]]["type"], buf
                )
            else:
                _decode(f["type"], buf)  # field removed by migration: skip
        for f in rnode["fields"]:
            if f["name"] not in out:
                if "default" not in f:
                    raise ValueError(
                        f"reader field {f['name']!r} absent from writer schema "
                        "and has no default (non-add-only migration)"
                    )
                out[f["name"]] = _default_value(f["type"], f["default"])
        return out

    if wkind == "array" and rkind == "array":
        out_list: list[Any] = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out_list
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                out_list.append(_decode_resolved(wnode["items"], rnode["items"], buf))

    if wkind == "map" and rkind == "map":
        pairs: dict[str, Any] = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return pairs
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _decode("string", buf)
                pairs[k] = _decode_resolved(wnode["values"], rnode["values"], buf)

    if wkind == "enum" and rkind == "enum":
        sym = wnode["symbols"][_read_long(buf)]
        if sym in rnode["symbols"]:
            return sym
        if "default" in rnode:
            return rnode["default"]
        raise ValueError(f"enum symbol {sym!r} not in reader symbols, no default")

    if wkind == rkind:
        # same primitive/logical kind, differing annotations: the writer
        # node governs the wire layout
        return _decode(writer, buf)

    if (wkind, rkind) in _PROMOTIONS:
        value = _decode(writer, buf)
        if rkind in ("float", "double"):
            return float(value)
        if rkind == "long":
            return int(value)
        if rkind == "bytes":
            return value.encode("utf-8")
        if rkind == "string":
            return value.decode("utf-8")
    raise ValueError(f"cannot resolve writer {wkind!r} against reader {rkind!r}")

"""Protobuf BINARY wire codec — pure Python proto3, no protobuf package.

The reference decodes real protobuf payloads on every produce
(nisshi-schema/src/proto.rs:168-195: prost-reflect DynamicMessage decode
against the compiled descriptor). This module replicates the semantics
against the public proto3 wire format:

- tag = varint(field_number << 3 | wire_type)
- wire types: 0 varint (int32/64, uint32/64, sint32/64 zigzag, bool,
  enum), 1 64-bit LE (fixed64/sfixed64/double), 2 length-delimited
  (string/bytes/message/packed-repeated/map entry), 5 32-bit LE
  (fixed32/sfixed32/float)
- repeated scalars default to PACKED in proto3 (both packed and
  unpacked accepted on decode)
- map<k,v> = repeated message { 1: key, 2: value }
- google.protobuf.Timestamp { 1: seconds, 2: nanos } ↔ naive-UTC datetime
- proto3 presence: zero-valued scalar fields are omitted on encode;
  decode fills absent fields with proto3 defaults (0 / "" / b"" / false /
  [] / {}), exactly what a descriptor-driven decoder yields

Schema input is the ``parse_proto_meta`` structure from ``types.py``
({message: [{name, type, number, label}]}, enum-name set); decoded Python
values line up with ``parse_proto``'s Spark types (enums → int32).

Spark integration mirrors avro_wire: Arrow-batched mapInPandas kernels,
see ``SchemaRegistry.decode(..., wire="proto")``.
"""

from __future__ import annotations

import datetime
import io
import struct
from typing import Any

_EPOCH = datetime.datetime(1970, 1, 1)

_VARINT = {"int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool"}
_FIX64 = {"fixed64", "sfixed64", "double"}
_FIX32 = {"fixed32", "sfixed32", "float"}
_LEN = {"string", "bytes"}


# ------------------------------------------------------------------ varints


def _write_uvarint(out: io.BytesIO, n: int) -> None:
    if n < 0:  # negative int32/int64 → 10-byte two's complement varint
        n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_uvarint(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated protobuf varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc
        shift += 7
        if shift > 70:
            raise ValueError("protobuf varint too long")


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _to_signed(n: int, bits: int) -> int:
    return n - (1 << bits) if n >= (1 << (bits - 1)) else n


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    raw = buf.read(n)
    if len(raw) != n:
        raise ValueError(f"truncated protobuf payload: wanted {n}, got {len(raw)}")
    return raw


# -------------------------------------------------------------------- codec


class ProtoCodec:
    """Descriptor-equivalent codec over parse_proto_meta structures."""

    def __init__(self, messages: dict[str, list[dict]], enums: set[str] | None = None):
        self.messages = messages
        self.enums = enums or set()

    # ------------------------------------------------------------- helpers
    def _kind(self, tname: str) -> str:
        from tansu_spark.registry.types import _MAP_RE

        if _MAP_RE.match(tname):
            return "map"
        if tname in _VARINT or tname in self.enums:
            return "varint"
        if tname in _FIX64:
            return "fix64"
        if tname in _FIX32:
            return "fix32"
        if tname in _LEN:
            return "len"
        if tname == "google.protobuf.Timestamp" or tname in self.messages:
            return "message"
        raise ValueError(f"unknown proto type {tname!r}")

    def _wire_type(self, tname: str) -> int:
        return {"varint": 0, "fix64": 1, "len": 2, "message": 2, "map": 2}.get(
            self._kind(tname), 5
        )

    def _default(self, f: dict) -> Any:
        if f["label"] == "repeated":
            return []
        k = self._kind(f["type"])
        if k == "map":
            return {}
        if k == "message":
            return None
        if f["type"] == "string":
            return ""
        if f["type"] == "bytes":
            return b""
        if f["type"] == "bool":
            return False
        if f["type"] in ("float", "double"):
            return 0.0
        return 0

    # ------------------------------------------------------------- encode
    def encode(self, msg: str, value: dict[str, Any]) -> bytes:
        out = io.BytesIO()
        self._encode_msg(msg, value, out)
        return out.getvalue()

    def _encode_msg(self, msg: str, value: dict[str, Any], out: io.BytesIO) -> None:
        if msg == "google.protobuf.Timestamp":
            self._encode_timestamp(value, out)
            return
        for f in self.messages[msg]:
            v = value.get(f["name"]) if isinstance(value, dict) else getattr(value, f["name"])
            self._encode_field(f, v, out)

    def _encode_timestamp(self, value: Any, out: io.BytesIO) -> None:
        if isinstance(value, str):  # JSON-sourced ISO timestamp
            value = datetime.datetime.fromisoformat(value)
        if isinstance(value, datetime.datetime):
            delta = value.replace(tzinfo=None) - _EPOCH
            seconds = int(delta.total_seconds() // 1)
            # recompute to avoid float drift on microseconds
            seconds = delta.days * 86400 + delta.seconds
            nanos = delta.microseconds * 1000
        else:
            seconds, nanos = value
        if seconds:
            _write_uvarint(out, (1 << 3) | 0)
            _write_uvarint(out, seconds)
        if nanos:
            _write_uvarint(out, (2 << 3) | 0)
            _write_uvarint(out, nanos)

    def _encode_scalar(self, tname: str, v: Any, out: io.BytesIO) -> None:
        if tname in self.enums and isinstance(v, str):
            # symbolic enum value (the reference's JSON front door,
            # proto.rs encode_from_value): look the number up in the
            # enum's symbol table; decode stays numeric (Arrow Int32).
            table = self.enums[tname] if isinstance(self.enums, dict) else {}
            if v not in table:
                raise ValueError(f"unknown {tname} enum symbol {v!r}")
            _write_uvarint(out, table[v])
        elif tname in ("int32", "int64", "uint32", "uint64") or tname in self.enums:
            _write_uvarint(out, int(v))
        elif tname in ("sint32", "sint64"):
            _write_uvarint(out, _zigzag(int(v)))
        elif tname == "bool":
            _write_uvarint(out, 1 if v else 0)
        elif tname == "double":
            out.write(struct.pack("<d", float(v)))
        elif tname == "float":
            out.write(struct.pack("<f", float(v)))
        elif tname == "fixed64":
            out.write(struct.pack("<Q", int(v)))
        elif tname == "sfixed64":
            out.write(struct.pack("<q", int(v)))
        elif tname == "fixed32":
            out.write(struct.pack("<I", int(v)))
        elif tname == "sfixed32":
            out.write(struct.pack("<i", int(v)))
        else:
            raise ValueError(f"not a scalar: {tname!r}")

    def _encode_field(self, f: dict, v: Any, out: io.BytesIO) -> None:
        from tansu_spark.registry.types import _MAP_RE

        tname, num = f["type"], f["number"]
        kind = self._kind(tname)

        if kind == "map":
            if not v:
                return
            mm = _MAP_RE.match(tname)
            ktype, vtype = mm.group(1), mm.group(2)
            for mk, mv in v.items():
                entry = io.BytesIO()
                self._encode_field({"type": ktype, "number": 1, "label": ""}, mk, entry)
                self._encode_field({"type": vtype, "number": 2, "label": ""}, mv, entry)
                raw = entry.getvalue()
                _write_uvarint(out, (num << 3) | 2)
                _write_uvarint(out, len(raw))
                out.write(raw)
            return

        if f["label"] == "repeated":
            items = list(v or [])
            if not items:
                return
            if kind in ("varint", "fix64", "fix32"):
                packed = io.BytesIO()  # proto3 default: packed scalars
                for it in items:
                    self._encode_scalar(tname, it, packed)
                raw = packed.getvalue()
                _write_uvarint(out, (num << 3) | 2)
                _write_uvarint(out, len(raw))
                out.write(raw)
            else:
                for it in items:
                    self._encode_field(dict(f, label=""), it, out)
            return

        if v is None:
            return
        if kind in ("varint", "fix64", "fix32"):
            # proto3 presence: default-valued scalars are omitted (unless
            # the field is marked `optional`, which tracks presence)
            if not v and f["label"] != "optional":
                return
            _write_uvarint(out, (num << 3) | self._wire_type(tname))
            self._encode_scalar(tname, v, out)
        elif kind == "len":
            raw = v.encode("utf-8") if tname == "string" else bytes(v)
            if not raw and f["label"] != "optional":
                return
            _write_uvarint(out, (num << 3) | 2)
            _write_uvarint(out, len(raw))
            out.write(raw)
        else:  # message
            sub = io.BytesIO()
            self._encode_msg(tname, v, sub)
            raw = sub.getvalue()
            _write_uvarint(out, (num << 3) | 2)
            _write_uvarint(out, len(raw))
            out.write(raw)

    # ------------------------------------------------------------- decode
    def decode(self, msg: str, data: bytes) -> Any:
        return self._decode_msg(msg, io.BytesIO(data), len(data))

    def _decode_msg(self, msg: str, buf: io.BytesIO, limit: int) -> Any:
        from tansu_spark.registry.types import _MAP_RE

        if msg == "google.protobuf.Timestamp":
            seconds = nanos = 0
            end = buf.tell() + limit
            while buf.tell() < end:
                tag = _read_uvarint(buf)
                num, wt = tag >> 3, tag & 7
                val = _read_uvarint(buf)
                if num == 1:
                    seconds = _to_signed(val, 64)
                elif num == 2:
                    nanos = _to_signed(val, 64)
            return _EPOCH + datetime.timedelta(seconds=seconds, microseconds=nanos // 1000)

        fields = {f["number"]: f for f in self.messages[msg]}
        out: dict[str, Any] = {}
        end = buf.tell() + limit
        while buf.tell() < end:
            tag = _read_uvarint(buf)
            num, wt = tag >> 3, tag & 7
            f = fields.get(num)
            if f is None:  # unknown field: skip per wire type
                self._skip(buf, wt)
                continue
            tname = f["type"]
            kind = self._kind(tname)

            if kind == "map":
                mm = _MAP_RE.match(tname)
                ln = _read_uvarint(buf)
                entry = self._decode_entry(mm.group(1), mm.group(2), buf, ln)
                out.setdefault(f["name"], {}).update([entry])
                continue

            if f["label"] == "repeated":
                bucket = out.setdefault(f["name"], [])
                if kind in ("varint", "fix64", "fix32") and wt == 2:
                    ln = _read_uvarint(buf)  # packed
                    stop = buf.tell() + ln
                    while buf.tell() < stop:
                        bucket.append(self._decode_scalar(tname, buf, wt=None))
                elif kind == "message":
                    ln = _read_uvarint(buf)
                    bucket.append(self._decode_msg(tname, buf, ln))
                elif kind == "len":
                    bucket.append(self._decode_len(tname, buf))
                else:
                    bucket.append(self._decode_scalar(tname, buf, wt))
                continue

            if kind == "message":
                ln = _read_uvarint(buf)
                out[f["name"]] = self._decode_msg(tname, buf, ln)
            elif kind == "len":
                out[f["name"]] = self._decode_len(tname, buf)
            else:
                out[f["name"]] = self._decode_scalar(tname, buf, wt)

        for f in self.messages[msg]:  # proto3 defaults for absent fields
            out.setdefault(f["name"], self._default(f))
        return out

    def _decode_entry(self, ktype: str, vtype: str, buf: io.BytesIO, ln: int):
        end = buf.tell() + ln
        k, v = None, None
        while buf.tell() < end:
            tag = _read_uvarint(buf)
            num, wt = tag >> 3, tag & 7
            tname = ktype if num == 1 else vtype
            kind = self._kind(tname)
            if kind == "message":
                sub_ln = _read_uvarint(buf)
                val = self._decode_msg(tname, buf, sub_ln)
            elif kind == "len":
                val = self._decode_len(tname, buf)
            else:
                val = self._decode_scalar(tname, buf, wt)
            if num == 1:
                k = val
            else:
                v = val
        if k is None:
            k = {"string": "", "bytes": b""}.get(ktype, 0)
        if v is None:
            v = self._default({"type": vtype, "label": "", "number": 2})
        return k, v

    def _decode_len(self, tname: str, buf: io.BytesIO):
        raw = _read_exact(buf, _read_uvarint(buf))
        return raw.decode("utf-8") if tname == "string" else raw

    def _decode_scalar(self, tname: str, buf: io.BytesIO, wt: int | None):
        if tname in ("int32", "int64") or tname in self.enums:
            # negative int32/int64/enum values travel as 64-bit two's
            # complement varints
            return _to_signed(_read_uvarint(buf), 64)
        if tname in ("uint32", "uint64"):
            return _read_uvarint(buf)
        if tname in ("sint32", "sint64"):
            return _unzigzag(_read_uvarint(buf))
        if tname == "bool":
            return _read_uvarint(buf) != 0
        if tname == "double":
            return struct.unpack("<d", _read_exact(buf, 8))[0]
        if tname == "float":
            return struct.unpack("<f", _read_exact(buf, 4))[0]
        if tname == "fixed64":
            return struct.unpack("<Q", _read_exact(buf, 8))[0]
        if tname == "sfixed64":
            return struct.unpack("<q", _read_exact(buf, 8))[0]
        if tname == "fixed32":
            return struct.unpack("<I", _read_exact(buf, 4))[0]
        if tname == "sfixed32":
            return struct.unpack("<i", _read_exact(buf, 4))[0]
        raise ValueError(f"not a scalar: {tname!r}")

    def _skip(self, buf: io.BytesIO, wt: int) -> None:
        if wt == 0:
            _read_uvarint(buf)
        elif wt == 1:
            _read_exact(buf, 8)
        elif wt == 2:
            _read_exact(buf, _read_uvarint(buf))
        elif wt == 5:
            _read_exact(buf, 4)
        else:
            raise ValueError(f"unsupported wire type {wt}")

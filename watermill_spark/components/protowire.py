"""Pure-Python protobuf wire-format codec (proto3 scalar subset).

Backs `ProtobufMarshaler` (`cqrs.py`) with real protobuf bytes — wire-
compatible with any standard protobuf runtime for the supported field types —
without needing `google.protobuf` or the spark-protobuf JVM artifact (absent
in this container). The wire format is the public spec
(https://protobuf.dev/programming-guides/encoding/): tag = (field<<3)|wire,
varint / 64-bit / length-delimited / 32-bit wire types.

Reference parity: `components/cqrs/marshaler_protobuf.go:15-85` marshals
events as protobuf payloads with metadata["name"] = fully-qualified message
name; this module supplies the byte-level codec, `cqrs.ProtobufMarshaler`
the message-shape plumbing.

Also included: `build_descriptor_set` hand-encodes a `FileDescriptorSet`
(itself just a protobuf message) for a schema, producing the descriptor file
Spark's native `from_protobuf`/`to_protobuf` need — so the same schema
drives the JVM-native path on clusters that ship spark-protobuf.

Supported field types and their proto wire encoding:

    string, bytes          -> length-delimited (wire 2)
    int32, int64, bool     -> varint (wire 0)
    double                 -> fixed 64-bit LE (wire 1)
    float                  -> fixed 32-bit LE (wire 5)

proto3 semantics: fields equal to the default (0 / "" / b"" / False) are
omitted on encode and materialize as defaults on decode; unknown fields are
skipped per wire type.
"""

from __future__ import annotations

import struct as _struct
from dataclasses import dataclass

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5

_WIRE_OF = {
    "string": _WIRE_LEN,
    "bytes": _WIRE_LEN,
    "int32": _WIRE_VARINT,
    "int64": _WIRE_VARINT,
    "bool": _WIRE_VARINT,
    "double": _WIRE_I64,
    "float": _WIRE_I32,
}

# FieldDescriptorProto.Type enum values (descriptor.proto, public spec)
_DESC_TYPE = {
    "double": 1,
    "float": 2,
    "int64": 3,
    "int32": 5,
    "bool": 8,
    "string": 9,
    "bytes": 12,
}


@dataclass(frozen=True)
class Field:
    number: int
    name: str
    type: str  # one of _WIRE_OF keys

    def __post_init__(self):
        if self.type not in _WIRE_OF:
            raise ValueError(f"unsupported field type {self.type!r}")
        if not 1 <= self.number < 1 << 29:
            raise ValueError(f"field number out of range: {self.number}")


def encode_varint(n: int) -> bytes:
    if n < 0:
        # int32/int64 negatives are 10-byte two's-complement varints
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    if result >= 1 << 63:  # re-interpret as signed 64-bit
        result -= 1 << 64
    return result, pos


def _tag(number: int, wire: int) -> bytes:
    return encode_varint((number << 3) | wire)


def encode_message(values: dict, fields: list[Field]) -> bytes:
    """Encode a dict of python values as protobuf wire bytes.

    Fields are emitted in field-number order (deterministic output — the
    property the dedup/exactly-once layers rely on for payload hashing).
    """
    out = bytearray()
    for f in sorted(fields, key=lambda f: f.number):
        v = values.get(f.name)
        if v is None:
            continue
        t = f.type
        if t in ("string", "bytes"):
            data = v.encode("utf-8") if t == "string" else bytes(v)
            if not data:
                continue  # proto3 default
            out += _tag(f.number, _WIRE_LEN) + encode_varint(len(data)) + data
        elif t in ("int32", "int64", "bool"):
            iv = int(v)
            if iv == 0:
                continue
            out += _tag(f.number, _WIRE_VARINT) + encode_varint(iv)
        elif t == "double":
            if v == 0.0:
                continue
            out += _tag(f.number, _WIRE_I64) + _struct.pack("<d", float(v))
        elif t == "float":
            if v == 0.0:
                continue
            out += _tag(f.number, _WIRE_I32) + _struct.pack("<f", float(v))
    return bytes(out)


def decode_message(buf: bytes, fields: list[Field]) -> dict:
    """Decode wire bytes to a dict; absent fields get proto3 defaults,
    unknown fields are skipped per their wire type."""
    by_num = {f.number: f for f in fields}
    out: dict = {}
    for f in fields:
        out[f.name] = (
            "" if f.type == "string"
            else b"" if f.type == "bytes"
            else False if f.type == "bool"
            else 0.0 if f.type in ("double", "float")
            else 0
        )
    pos = 0
    buf = bytes(buf)
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        number, wire = key >> 3, key & 7
        f = by_num.get(number)
        if wire == _WIRE_VARINT:
            v, pos = decode_varint(buf, pos)
            if f is not None:
                out[f.name] = bool(v) if f.type == "bool" else v
        elif wire == _WIRE_I64:
            v = _struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
            if f is not None:
                out[f.name] = v
        elif wire == _WIRE_LEN:
            ln, pos = decode_varint(buf, pos)
            data = buf[pos : pos + ln]
            pos += ln
            if f is not None:
                out[f.name] = data.decode("utf-8") if f.type == "string" else data
        elif wire == _WIRE_I32:
            v = _struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
            if f is not None:
                out[f.name] = v
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return out


# -- descriptor-set generation (for Spark's native protobuf path) -----------
def _len_delimited(number: int, payload: bytes) -> bytes:
    return _tag(number, _WIRE_LEN) + encode_varint(len(payload)) + payload


def build_descriptor_set(package: str, message_name: str, fields: list[Field]) -> bytes:
    """Hand-encode a `FileDescriptorSet` for one message.

    descriptor.proto field numbers (public spec):
      FileDescriptorSet.file = 1
      FileDescriptorProto: name=1, package=2, message_type=4, syntax=12
      DescriptorProto: name=1, field=2
      FieldDescriptorProto: name=1, number=3, label=4, type=5, json_name=10

    The output is a valid descriptor file consumable by
    `from_protobuf(col, messageName, descFilePath=...)` on clusters shipping
    the spark-protobuf artifact.
    """
    field_protos = b""
    for f in sorted(fields, key=lambda f: f.number):
        fp = (
            _len_delimited(1, f.name.encode())
            + _tag(3, _WIRE_VARINT)
            + encode_varint(f.number)
            + _tag(4, _WIRE_VARINT)
            + encode_varint(1)  # LABEL_OPTIONAL
            + _tag(5, _WIRE_VARINT)
            + encode_varint(_DESC_TYPE[f.type])
            + _len_delimited(10, f.name.encode())  # json_name
        )
        field_protos += _len_delimited(2, fp)
    message_proto = _len_delimited(1, message_name.encode()) + field_protos
    file_proto = (
        _len_delimited(1, f"{package or 'watermill'}.proto".encode())
        + (_len_delimited(2, package.encode()) if package else b"")
        + _len_delimited(4, message_proto)
        + _len_delimited(12, b"proto3")
    )
    return _len_delimited(1, file_proto)

"""Pure-Python protobuf wire-format codec (proto3: scalars + nested
messages + repeated fields + maps).

Backs `ProtobufMarshaler` (`cqrs.py`) with real protobuf bytes — wire-
compatible with any standard protobuf runtime for the supported field types —
without needing `google.protobuf` or the spark-protobuf JVM artifact (absent
in this container). The wire format is the public spec
(https://protobuf.dev/programming-guides/encoding/): tag = (field<<3)|wire,
varint / 64-bit / length-delimited / 32-bit wire types.

Reference parity: `components/cqrs/marshaler_protobuf.go:15-85` marshals
arbitrary `proto.Message` values — including nested messages, repeated
fields, and maps; this module supplies the byte-level codec,
`cqrs.ProtobufMarshaler` the message-shape plumbing.

Also included: `build_descriptor_set` hand-encodes a `FileDescriptorSet`
(itself just a protobuf message) for a schema, producing the descriptor file
Spark's native `from_protobuf`/`to_protobuf` need — so the same schema
drives the JVM-native path on clusters that ship spark-protobuf.

Supported field types and their proto wire encoding:

    string, bytes          -> length-delimited (wire 2)
    int32, int64, bool     -> varint (wire 0)
    double                 -> fixed 64-bit LE (wire 1)
    float                  -> fixed 32-bit LE (wire 5)
    message                -> length-delimited (wire 2), recursive
    repeated scalar        -> packed (wire 2) for numerics/bool,
                              one record per element for string/bytes
    repeated message       -> one length-delimited record per element
    map<k, v>              -> repeated MapEntry{1: key, 2: value} messages
                              (the spec's map encoding)

proto3 semantics, including null handling (explicit contract):

- Scalar fields equal to the proto3 default (0 / "" / b"" / False) are
  omitted on encode and materialize as defaults on decode. **A Python
  `None` scalar is likewise encoded as field-absent and therefore decodes
  to the proto3 default, NOT back to `None`** — protobuf scalars have no
  null. `JSONMarshaler` preserves nulls, so null-bearing rows change value
  (null -> 0 / "" / False) when switching codecs; pick the JSON codec when
  null-vs-default matters. (The codec-parity test pins this coercion.)
- Message-typed fields ARE nullable: `None` means unset (absent on the
  wire, decodes to `None`); an empty dict is an explicitly-set empty
  message (zero-length field on the wire, decodes to `{}`).
- Repeated fields decode to `[]` when absent, maps to `{}` — never None.
- Unknown fields are PRESERVED across a round-trip, matching Go's proto
  runtime: decode keeps each unrecognized (tag, wire, payload) field's raw
  bytes, in arrival order, under the reserved key ``"_unknown_fields"``
  (a `bytes` value, present only when nonempty); encode re-emits them
  verbatim after all known fields — exactly where Go's serializer puts
  unknown fields. A forwarder-style pass-through (decode with a narrower
  schema, re-encode) therefore never drops data.
- `oneof` groups: give member fields the same ``Field(..., oneof="group")``
  name. Members are presence-tracked — an unset member decodes to `None`
  (never a proto3 default), a set member is always emitted on encode even
  when it holds the default value (the explicit-presence rule for oneofs),
  and setting two members of one group raises. Decode applies the spec's
  last-one-wins rule across the group.
"""

from __future__ import annotations

import struct as _struct
from dataclasses import dataclass

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5

_SCALARS = {"string", "bytes", "int32", "int64", "bool", "double", "float"}

_WIRE_OF = {
    "string": _WIRE_LEN,
    "bytes": _WIRE_LEN,
    "int32": _WIRE_VARINT,
    "int64": _WIRE_VARINT,
    "bool": _WIRE_VARINT,
    "double": _WIRE_I64,
    "float": _WIRE_I32,
    "message": _WIRE_LEN,
    "map": _WIRE_LEN,
}

# numeric/bool scalars use packed encoding when repeated (proto3 default)
_PACKABLE = {"int32", "int64", "bool", "double", "float"}

# reserved dict key carrying raw unknown-field bytes across a round-trip
_UNKNOWN = "_unknown_fields"

# FieldDescriptorProto.Type enum values (descriptor.proto, public spec)
_DESC_TYPE = {
    "double": 1,
    "float": 2,
    "int64": 3,
    "int32": 5,
    "bool": 8,
    "string": 9,
    "message": 11,
    "bytes": 12,
}


@dataclass(frozen=True)
class Field:
    """One protobuf field.

    - scalar: ``Field(1, "x", "int64")``
    - repeated scalar: ``Field(2, "xs", "int64", repeated=True)``
    - nested message: ``Field(3, "sub", "message", message=(Field(1,...),))``
    - repeated message: same, plus ``repeated=True``
    - map: ``Field(4, "m", "map", key_type="string", value_type="int64")``;
      a message-valued map sets ``value_type="message"`` + ``message=...``.
    """

    number: int
    name: str
    type: str  # one of _WIRE_OF keys
    repeated: bool = False
    message: tuple = ()  # sub-fields for "message" (or map message values)
    key_type: str = "string"  # map key scalar type
    value_type: str = ""  # map value type (scalar name or "message")
    oneof: str = ""  # oneof group name; members are presence-tracked

    def __post_init__(self):
        if self.type not in _WIRE_OF:
            raise ValueError(f"unsupported field type {self.type!r}")
        if not 1 <= self.number < 1 << 29:
            raise ValueError(f"field number out of range: {self.number}")
        if self.oneof and (self.repeated or self.type == "map"):
            raise ValueError(
                f"oneof member {self.name!r} cannot be repeated or a map"
            )
        if self.name == _UNKNOWN:
            raise ValueError(f"{_UNKNOWN!r} is a reserved field name")
        if self.type == "message" and not self.message:
            raise ValueError(f"message field {self.name!r} needs sub-fields")
        if self.type == "map":
            if self.key_type not in ("string", "int32", "int64", "bool"):
                raise ValueError(f"invalid map key type {self.key_type!r}")
            if self.value_type == "message":
                if not self.message:
                    raise ValueError(
                        f"map field {self.name!r} with message values needs "
                        "sub-fields"
                    )
            elif self.value_type not in _SCALARS:
                raise ValueError(f"invalid map value type {self.value_type!r}")
        if self.type == "map" and self.repeated:
            raise ValueError("map fields are implicitly repeated")
        # tuple-ify so Field stays hashable even if a list was passed
        if self.message and not isinstance(self.message, tuple):
            object.__setattr__(self, "message", tuple(self.message))


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


def _enc_scalar_bare(t: str, v) -> bytes:
    """Encode one scalar VALUE without its tag (packed/map-entry helper)."""
    if t == "string":
        data = v.encode("utf-8")
        return encode_varint(len(data)) + data
    if t == "bytes":
        data = bytes(v)
        return encode_varint(len(data)) + data
    if t in ("int32", "int64", "bool"):
        return encode_varint(int(v))
    if t == "double":
        return _struct.pack("<d", float(v))
    if t == "float":
        return _struct.pack("<f", float(v))
    raise ValueError(f"not a scalar: {t}")


def _is_default(t: str, v) -> bool:
    if t in ("string", "bytes"):
        return len(v) == 0
    return not v  # 0 / 0.0 / False


def _map_entry_bytes(f: Field, k, v) -> bytes:
    """Encode one map entry as its MapEntry submessage payload."""
    entry = bytearray()
    # key (field 1): proto3 serializers omit default-valued entry fields
    if not _is_default(f.key_type, k):
        entry += _tag(1, _WIRE_OF[f.key_type]) + _enc_scalar_bare(f.key_type, k)
    if f.value_type == "message":
        if v is not None:
            payload = encode_message(v, list(f.message))
            entry += _tag(2, _WIRE_LEN) + encode_varint(len(payload)) + payload
    elif v is not None and not _is_default(f.value_type, v):
        entry += _tag(2, _WIRE_OF[f.value_type]) + _enc_scalar_bare(
            f.value_type, v
        )
    return bytes(entry)


def encode_message(values: dict, fields: list[Field]) -> bytes:
    """Encode a dict of python values as protobuf wire bytes.

    Fields are emitted in field-number order, map entries in sorted-key
    order, repeated elements in list order (deterministic output — the
    property the dedup/exactly-once layers rely on for payload hashing).

    Null contract (see module docstring): ``None`` scalars encode as
    field-absent (decode to proto3 defaults, not None); ``None`` messages
    encode as unset (decode to None); ``None``/empty lists and maps encode
    as absent (decode to []/{}).

    Oneof members are always emitted when set (even default-valued — the
    explicit-presence rule); two set members of one group raise. Raw bytes
    under the reserved ``"_unknown_fields"`` key (captured by
    ``decode_message``) are re-emitted verbatim after all known fields,
    matching Go proto round-trip semantics.
    """
    set_oneofs: dict[str, str] = {}
    for f in fields:
        if f.oneof and values.get(f.name) is not None:
            prev = set_oneofs.get(f.oneof)
            if prev is not None:
                raise ValueError(
                    f"oneof group {f.oneof!r}: both {prev!r} and "
                    f"{f.name!r} are set"
                )
            set_oneofs[f.oneof] = f.name
    out = bytearray()
    for f in sorted(fields, key=lambda f: f.number):
        v = values.get(f.name)
        if v is None:
            continue
        keep_default = bool(f.oneof)  # presence-tracked: emit even defaults
        t = f.type
        if t == "map":
            items = sorted(v.items()) if isinstance(v, dict) else sorted(v)
            for k, mv in items:
                entry = _map_entry_bytes(f, k, mv)
                out += _tag(f.number, _WIRE_LEN) + encode_varint(len(entry))
                out += entry
        elif f.repeated:
            if len(v) == 0:
                continue
            if t == "message":
                for el in v:
                    payload = encode_message(el, list(f.message))
                    out += _tag(f.number, _WIRE_LEN)
                    out += encode_varint(len(payload)) + payload
            elif t in _PACKABLE:
                packed = b"".join(_enc_scalar_bare(t, el) for el in v)
                out += _tag(f.number, _WIRE_LEN)
                out += encode_varint(len(packed)) + packed
            else:  # repeated string/bytes: one record per element
                for el in v:
                    out += _tag(f.number, _WIRE_LEN) + _enc_scalar_bare(t, el)
        elif t == "message":
            payload = encode_message(v, list(f.message))
            out += _tag(f.number, _WIRE_LEN) + encode_varint(len(payload))
            out += payload
        elif t in ("string", "bytes"):
            data = v.encode("utf-8") if t == "string" else bytes(v)
            if not data and not keep_default:
                continue  # proto3 default
            out += _tag(f.number, _WIRE_LEN) + encode_varint(len(data)) + data
        elif t in ("int32", "int64", "bool"):
            iv = int(v)
            if iv == 0 and not keep_default:
                continue
            out += _tag(f.number, _WIRE_VARINT) + encode_varint(iv)
        elif t == "double":
            if v == 0.0 and not keep_default:
                continue
            out += _tag(f.number, _WIRE_I64) + _struct.pack("<d", float(v))
        elif t == "float":
            if v == 0.0 and not keep_default:
                continue
            out += _tag(f.number, _WIRE_I32) + _struct.pack("<f", float(v))
    out += bytes(values.get(_UNKNOWN) or b"")
    return bytes(out)


def _default_of(f: Field):
    if f.type == "map":
        return {}
    if f.repeated:
        return []
    if f.type == "message" or f.oneof:
        return None  # presence-tracked: unset means None, not a zero value
    return (
        "" if f.type == "string"
        else b"" if f.type == "bytes"
        else False if f.type == "bool"
        else 0.0 if f.type in ("double", "float")
        else 0
    )


def _dec_scalar_bare(t: str, buf: bytes, pos: int):
    """Decode one scalar VALUE without its tag; returns (value, new_pos)."""
    if t in ("string", "bytes"):
        ln, pos = decode_varint(buf, pos)
        data = buf[pos : pos + ln]
        pos += ln
        return (data.decode("utf-8") if t == "string" else data), pos
    if t in ("int32", "int64", "bool"):
        v, pos = decode_varint(buf, pos)
        return (bool(v) if t == "bool" else v), pos
    if t == "double":
        return _struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if t == "float":
        return _struct.unpack("<f", buf[pos : pos + 4])[0], pos + 4
    raise ValueError(f"not a scalar: {t}")


def _decode_map_entry(f: Field, data: bytes):
    """Decode one MapEntry payload to (key, value) with proto3 defaults."""
    key = _default_of(Field(1, "key", f.key_type))
    if f.value_type == "message":
        value: object = {}  # absent entry value = empty message, per spec
    else:
        value = _default_of(Field(2, "value", f.value_type))
    pos = 0
    while pos < len(data):
        k, pos = decode_varint(data, pos)
        number, wire = k >> 3, k & 7
        if number == 1:
            key, pos = _dec_scalar_bare(f.key_type, data, pos)
        elif number == 2:
            if f.value_type == "message":
                ln, pos = decode_varint(data, pos)
                value = decode_message(data[pos : pos + ln], list(f.message))
                pos += ln
            else:
                value, pos = _dec_scalar_bare(f.value_type, data, pos)
        else:
            pos = _skip(wire, data, pos)
    return key, value


def _skip(wire: int, buf: bytes, pos: int) -> int:
    if wire == _WIRE_VARINT:
        _, pos = decode_varint(buf, pos)
    elif wire == _WIRE_I64:
        pos += 8
    elif wire == _WIRE_LEN:
        ln, pos = decode_varint(buf, pos)
        pos += ln
    elif wire == _WIRE_I32:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return pos


def decode_message(buf: bytes, fields: list[Field]) -> dict:
    """Decode wire bytes to a dict; absent scalars get proto3 defaults,
    absent messages and oneof members get None, absent repeated/map fields
    get []/{}. Unknown fields are preserved: their raw wire bytes (tag
    included, arrival order) land under the reserved ``"_unknown_fields"``
    key, which ``encode_message`` re-emits verbatim — the Go proto
    runtime's round-trip contract. Oneof groups follow last-one-wins:
    reading a member clears its siblings. Repeated numerics accept both
    packed and unpacked encodings (the spec requires parsers to accept
    either)."""
    by_num = {f.number: f for f in fields}
    oneof_siblings: dict[str, list[str]] = {}
    for f in fields:
        if f.oneof:
            oneof_siblings.setdefault(f.oneof, []).append(f.name)
    out: dict = {f.name: _default_of(f) for f in fields}
    # fresh containers per call (not the shared default objects)
    for f in fields:
        if f.type == "map":
            out[f.name] = {}
        elif f.repeated:
            out[f.name] = []
    unknown = bytearray()
    pos = 0
    buf = bytes(buf)
    while pos < len(buf):
        tag_start = pos
        key, pos = decode_varint(buf, pos)
        number, wire = key >> 3, key & 7
        f = by_num.get(number)
        if f is not None:
            # spec conformance: a known field number carrying a DIFFERENT
            # wire type than its declared type is treated as an unknown
            # field (preserved, not misparsed) — matching the Go runtime.
            # Repeated packable scalars legitimately arrive as either the
            # packed LEN form or unpacked scalar records.
            ok_wires = {_WIRE_OF[f.type]}
            if f.repeated and f.type in _PACKABLE:
                ok_wires.add(_WIRE_LEN)
            if wire not in ok_wires:
                f = None
        if f is None:
            pos = _skip(wire, buf, pos)
            unknown += buf[tag_start:pos]
            continue
        if f.oneof:  # last-one-wins: a later member unsets its siblings
            for sib in oneof_siblings[f.oneof]:
                out[sib] = None
        if f.type == "map":
            ln, pos = decode_varint(buf, pos)
            k, v = _decode_map_entry(f, buf[pos : pos + ln])
            pos += ln
            out[f.name][k] = v
        elif f.type == "message":
            ln, pos = decode_varint(buf, pos)
            sub = decode_message(buf[pos : pos + ln], list(f.message))
            pos += ln
            if f.repeated:
                out[f.name].append(sub)
            else:
                out[f.name] = sub
        elif f.repeated:
            if f.type in _PACKABLE and wire == _WIRE_LEN:
                ln, pos = decode_varint(buf, pos)
                end = pos + ln
                while pos < end:
                    v, pos = _dec_scalar_bare(f.type, buf, pos)
                    out[f.name].append(v)
            else:  # unpacked element (always the case for string/bytes)
                v, pos = _dec_scalar_bare(f.type, buf, pos)
                out[f.name].append(v)
        else:
            v, pos = _dec_scalar_bare(f.type, buf, pos)
            out[f.name] = v
    if unknown:
        out[_UNKNOWN] = bytes(unknown)
    return out


# -- descriptor-set generation (for Spark's native protobuf path) -----------
def _len_delimited(number: int, payload: bytes) -> bytes:
    return _tag(number, _WIRE_LEN) + encode_varint(len(payload)) + payload


def _pascal(name: str) -> str:
    return "".join(p.title() for p in name.split("_"))


def _field_desc(
    f: Field, number: int | None = None, name: str | None = None,
    type_name: str | None = None, repeated: bool = False,
    ftype: str | None = None, oneof_index: int | None = None,
) -> bytes:
    """FieldDescriptorProto: name=1, number=3, label=4, type=5,
    type_name=6, oneof_index=9, json_name=10."""
    nm = name if name is not None else f.name
    fp = (
        _len_delimited(1, nm.encode())
        + _tag(3, _WIRE_VARINT)
        + encode_varint(number if number is not None else f.number)
        + _tag(4, _WIRE_VARINT)
        + encode_varint(3 if repeated else 1)  # LABEL_REPEATED / OPTIONAL
        + _tag(5, _WIRE_VARINT)
        + encode_varint(_DESC_TYPE[ftype if ftype is not None else f.type])
    )
    if type_name:
        fp += _len_delimited(6, type_name.encode())
    if oneof_index is not None:
        fp += _tag(9, _WIRE_VARINT) + encode_varint(oneof_index)
    fp += _len_delimited(10, nm.encode())  # json_name
    return fp


def _message_desc(name: str, fields: list[Field], scope: str) -> bytes:
    """DescriptorProto: name=1, field=2, nested_type=3, options=7,
    oneof_decl=8.

    Nested message types and map-entry types are emitted as nested_type
    entries; `scope` is the fully-qualified prefix (".pkg.Outer") used in
    field type_name references. Oneof groups become oneof_decl entries
    (OneofDescriptorProto: name=1) referenced by each member field's
    oneof_index, in first-appearance order over the number-sorted fields.
    """
    me = _len_delimited(1, name.encode())
    fqn = f"{scope}.{name}"
    oneof_names: list[str] = []
    for f in sorted(fields, key=lambda f: f.number):
        if f.oneof and f.oneof not in oneof_names:
            oneof_names.append(f.oneof)
    field_protos = b""
    nested = b""
    for f in sorted(fields, key=lambda f: f.number):
        oidx = oneof_names.index(f.oneof) if f.oneof else None
        if f.type == "message":
            sub_name = _pascal(f.name)
            nested += _len_delimited(
                3, _message_desc(sub_name, list(f.message), fqn)
            )
            field_protos += _len_delimited(
                2,
                _field_desc(
                    f, type_name=f"{fqn}.{sub_name}", repeated=f.repeated,
                    oneof_index=oidx,
                ),
            )
        elif f.type == "map":
            # map fields compile to a nested XxxEntry message with
            # MessageOptions.map_entry=true (DescriptorProto.options=7,
            # MessageOptions.map_entry=7)
            entry_name = _pascal(f.name) + "Entry"
            key_f = Field(1, "key", f.key_type)
            if f.value_type == "message":
                val_sub = "Value"
                entry_nested = _len_delimited(
                    3,
                    _message_desc(val_sub, list(f.message), f"{fqn}.{entry_name}"),
                )
                val_fp = _field_desc(
                    Field(2, "value", "message", message=f.message),
                    type_name=f"{fqn}.{entry_name}.{val_sub}",
                )
            else:
                entry_nested = b""
                val_fp = _field_desc(Field(2, "value", f.value_type))
            entry = (
                _len_delimited(1, entry_name.encode())
                + _len_delimited(2, _field_desc(key_f))
                + _len_delimited(2, val_fp)
                + entry_nested
                + _len_delimited(7, _tag(7, _WIRE_VARINT) + encode_varint(1))
            )
            nested += _len_delimited(3, entry)
            field_protos += _len_delimited(
                2,
                _field_desc(
                    f,
                    type_name=f"{fqn}.{entry_name}",
                    repeated=True,
                    ftype="message",
                ),
            )
        else:
            field_protos += _len_delimited(
                2, _field_desc(f, repeated=f.repeated, oneof_index=oidx)
            )
    oneof_decls = b"".join(
        _len_delimited(8, _len_delimited(1, n.encode())) for n in oneof_names
    )
    return me + field_protos + nested + oneof_decls


def build_descriptor_set(package: str, message_name: str, fields: list[Field]) -> bytes:
    """Hand-encode a `FileDescriptorSet` for one message (with any nested
    message / map-entry types as nested_type entries).

    descriptor.proto field numbers (public spec):
      FileDescriptorSet.file = 1
      FileDescriptorProto: name=1, package=2, message_type=4, syntax=12
      DescriptorProto: name=1, field=2, nested_type=3, options=7,
      oneof_decl=8 (OneofDescriptorProto: name=1)
      FieldDescriptorProto: name=1, number=3, label=4, type=5, type_name=6,
      oneof_index=9, json_name=10; MessageOptions.map_entry=7

    The output is a valid descriptor file consumable by
    `from_protobuf(col, messageName, descFilePath=...)` on clusters shipping
    the spark-protobuf artifact.
    """
    scope = f".{package}" if package else ""
    message_proto = _message_desc(message_name, fields, scope)
    file_proto = (
        _len_delimited(1, f"{package or 'watermill'}.proto".encode())
        + (_len_delimited(2, package.encode()) if package else b"")
        + _len_delimited(4, message_proto)
        + _len_delimited(12, b"proto3")
    )
    return _len_delimited(1, file_proto)

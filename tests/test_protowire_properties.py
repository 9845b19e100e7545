"""Property-based protowire tests (hypothesis): the wire codec round-trips
arbitrary values under the documented null/default contract, preserves
unknown fields byte-exactly, and enforces oneof single-set.

Complements the golden-vector tests in test_cqrs.py: those pin known-good
encodings against fixed bytes; these sweep the value space (reference
behavior: Go's proto runtime round-trips any message, including fields the
schema doesn't know — `components/cqrs/marshaler_protobuf.go:15-85`).
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from watermill_spark.components.protowire import (
    Field,
    decode_message,
    decode_varint,
    encode_message,
    encode_varint,
)

SUB = (Field(1, "s", "string"), Field(2, "n", "int64"))

SCHEMA = [
    Field(1, "name", "string"),
    Field(2, "count", "int64"),
    Field(3, "ratio", "double"),
    Field(4, "flag", "bool"),
    Field(5, "blob", "bytes"),
    Field(6, "tags", "string", repeated=True),
    Field(7, "nums", "int32", repeated=True),  # packed
    Field(8, "sub", "message", message=SUB),
    Field(9, "subs", "message", message=SUB, repeated=True),
    Field(10, "attrs", "map", key_type="string", value_type="int64"),
    Field(11, "fval", "float"),
    Field(12, "alt_a", "int64", oneof="alt"),
    Field(13, "alt_b", "string", oneof="alt"),
    Field(14, "lookup", "map", key_type="int64", value_type="string"),
]

# -0.0 == 0.0 makes the encoder treat it as proto3-default (absent), so the
# decoded value is +0.0; normalize the inputs the same way
_f64 = st.floats(allow_nan=False).map(lambda x: x + 0.0)
_f32 = st.floats(allow_nan=False, width=32).map(lambda x: x + 0.0)
# signed domains: the codec speaks proto3 int32/int64 (negatives ride as
# 10-byte two's-complement varints, decode re-interprets as signed 64-bit)
_i64 = st.integers(-(2**63), 2**63 - 1)
_i32 = st.integers(-(2**31), 2**31 - 1)
_txt = st.text(max_size=16)
_bin = st.binary(max_size=16)


def _opt(s):
    return st.one_of(st.none(), s)


_sub_values = st.fixed_dictionaries({"s": _txt, "n": _i64})

_values = st.fixed_dictionaries(
    {
        "name": _opt(_txt),
        "count": _opt(_i64),
        "ratio": _opt(_f64),
        "flag": _opt(st.booleans()),
        "blob": _opt(_bin),
        "tags": _opt(st.lists(_txt, max_size=4)),
        "nums": _opt(st.lists(_i32, max_size=6)),
        "sub": _opt(_sub_values),
        "subs": _opt(st.lists(_sub_values, max_size=3)),
        "attrs": _opt(st.dictionaries(_txt, _i64, max_size=4)),
        "fval": _opt(_f32),
        "lookup": _opt(st.dictionaries(_i64, _txt, max_size=3)),
    }
).flatmap(
    # at most one member of the oneof group may be set
    lambda d: st.one_of(
        st.just(d),
        _i64.map(lambda v: {**d, "alt_a": v}),
        _txt.map(lambda v: {**d, "alt_b": v}),
    )
)


def _f32_norm(v: float) -> float:
    return struct.unpack("<f", struct.pack("<f", v))[0]


def _norm_scalar(t: str, v):
    if t == "bool":
        return bool(v)
    if t in ("int32", "int64"):
        return int(v)
    if t == "double":
        return v + 0.0
    if t == "float":
        return _f32_norm(v) + 0.0
    return v


def _expected(values: dict, fields) -> dict:
    """What decode(encode(values)) must return under the module's null /
    proto3-default contract."""
    out = {}
    for f in fields:
        v = values.get(f.name)
        if v is None:
            out[f.name] = (
                {} if f.type == "map"
                else [] if f.repeated
                else None if (f.type == "message" or f.oneof)
                else _norm_scalar(f.type, "" if f.type == "string" else b"" if f.type == "bytes" else 0)
            )
        elif f.type == "map":
            out[f.name] = {k: _norm_scalar(f.value_type, mv) for k, mv in v.items()}
        elif f.repeated:
            if f.type == "message":
                out[f.name] = [_expected(el, f.message) for el in v]
            else:
                out[f.name] = [_norm_scalar(f.type, el) for el in v]
        elif f.type == "message":
            out[f.name] = _expected(v, f.message)
        else:
            out[f.name] = _norm_scalar(f.type, v)
    return out


@settings(max_examples=300, deadline=None)
@given(values=_values)
def test_roundtrip_matches_contract(values):
    decoded = decode_message(encode_message(values, SCHEMA), SCHEMA)
    assert decoded == _expected(values, SCHEMA)


@settings(max_examples=300, deadline=None)
@given(n=st.integers(-(2**63), 2**63 - 1))
def test_varint_roundtrip(n):
    v, pos = decode_varint(encode_varint(n), 0)
    assert v == n and pos == len(encode_varint(n))


@settings(max_examples=200, deadline=None)
@given(values=_values)
def test_unknown_fields_survive_narrow_schema_roundtrip(values):
    """Forwarder semantics: decode with a NARROWER schema, re-encode, and a
    full-schema reader still sees every original field — the unknown bytes
    rode along verbatim (Go proto unknown-field round-trip)."""
    narrow = [Field(1, "name", "string")]
    wire = encode_message(values, SCHEMA)
    seen_by_narrow = decode_message(wire, narrow)
    rewire = encode_message(seen_by_narrow, narrow)
    assert decode_message(rewire, SCHEMA) == decode_message(wire, SCHEMA)


@settings(max_examples=100, deadline=None)
@given(a=_i64, b=_txt)
def test_oneof_double_set_raises(a, b):
    with pytest.raises(ValueError, match="oneof group"):
        encode_message({"alt_a": a, "alt_b": b}, SCHEMA)


@settings(max_examples=100, deadline=None)
@given(v=_i64)
def test_oneof_presence_even_for_default(v):
    """A set oneof member survives the round-trip even when it carries the
    proto3 default value (explicit presence), and its siblings stay None."""
    decoded = decode_message(encode_message({"alt_a": 0}, SCHEMA), SCHEMA)
    assert decoded["alt_a"] == 0 and decoded["alt_b"] is None
    decoded = decode_message(encode_message({"alt_a": v}, SCHEMA), SCHEMA)
    assert decoded["alt_a"] == v and decoded["alt_b"] is None

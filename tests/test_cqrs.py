"""CQRS layer semantics (`components/cqrs/*`)."""

from __future__ import annotations

import json
import uuid as _uuid

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from watermill_spark.components.cqrs import (
    CommandProcessor,
    EventBus,
    EventGroupProcessor,
    EventProcessor,
    JSONMarshaler,
)
from watermill_spark.sources import MemoryPubSub

USER_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("name", StringType())]
)


@pytest.fixture
def ps(spark):
    return MemoryPubSub(spark)


def _events_df(spark, n):
    return spark.createDataFrame(
        [(i, f"user-{i}") for i in range(n)], ["user_id", "name"]
    )


def _t(p):
    return f"{p}-{_uuid.uuid4().hex[:6]}"


def test_event_bus_marshals_and_stamps_name(ps, spark):
    """`event_bus.go:117-146` + `marshaler_json.go:15-53`: payload is JSON,
    metadata['name'] is the type name, topic from topic_fn."""
    name = _t("UserSignedUp")
    EventBus(ps).publish(_events_df(spark, 3), name, ["user_id", "name"])
    rows = ps.subscribe(name).collect()
    assert len(rows) == 3
    assert all(r["metadata"]["name"] == name for r in rows)
    payload = json.loads(bytes(rows[0]["payload"]).decode())
    assert set(payload) == {"user_id", "name"}


def test_event_processor_unmarshals_and_filters_name(ps, spark):
    """`event_processor.go:314-371`: mismatched names are acked-and-ignored
    (filtered), matching ones unmarshal into typed rows."""
    name = _t("UserSignedUp")
    bus = EventBus(ps)
    bus.publish(_events_df(spark, 4), name, ["user_id", "name"])
    # impostor message on the same topic with a different type name
    impostor = _t("Other")
    bus.topic_fn = lambda _n: name  # force same topic
    bus.publish(_events_df(spark, 1), impostor, ["user_id", "name"])

    got = {}
    ep = EventProcessor(ps)
    ep.add_handler(name, USER_SCHEMA, lambda df: got.update(n=df.count(), cols=df.columns))
    ep.process_once()
    assert got["n"] == 4  # impostor ignored
    assert set(got["cols"]) == {"_msg", "user_id", "name"}


def test_command_processor_single_handler_per_type(ps):
    """`command_processor.go:269-308`: one handler per command type."""
    cp = CommandProcessor(ps)
    cp.add_handler("DoThing", USER_SCHEMA, lambda df: df)
    with pytest.raises(ValueError):
        cp.add_handler("DoThing", USER_SCHEMA, lambda df: df)
    # EventProcessor allows multiple handlers per event type
    ep = EventProcessor(ps)
    ep.add_handler("Evt", USER_SCHEMA, lambda df: df)
    ep.add_handler("Evt", USER_SCHEMA, lambda df: df)


def test_event_group_processor_dispatches_by_name(ps, spark):
    """`event_processor_group.go:143-272`: one subscription, per-name
    dispatch; unknown events ack-and-ignore by default, nack when
    ack_on_unknown_event=False."""
    group_topic = _t("group")
    bus = EventBus(ps, topic_fn=lambda _n: group_topic)
    bus.publish(_events_df(spark, 2), "A", ["user_id", "name"])
    bus.publish(_events_df(spark, 3), "B", ["user_id", "name"])

    counts = {}
    gp = EventGroupProcessor(ps, group_topic)
    gp.add_handlers_group(
        ("A", USER_SCHEMA, lambda df: counts.__setitem__("A", df.count())),
        ("B", USER_SCHEMA, lambda df: counts.__setitem__("B", df.count())),
    )
    gp.process_once()
    assert counts == {"A": 2, "B": 3}

    bus.publish(_events_df(spark, 1), "Unknown", ["user_id", "name"])
    gp.process_once()  # default: ack-and-ignore, no raise

    strict = EventGroupProcessor(ps, group_topic, ack_on_unknown_event=False)
    strict.add_handlers_group(("A", USER_SCHEMA, lambda df: None))
    with pytest.raises(RuntimeError, match="no handler for event"):
        strict.process_once()


def test_marshaler_roundtrip(ps, spark):
    m = JSONMarshaler()
    msgs = m.marshal(_events_df(spark, 2), "T", ["user_id", "name"])
    typed = m.unmarshal(msgs, USER_SCHEMA)
    rows = {r["user_id"]: r["name"] for r in typed.collect()}
    assert rows == {0: "user-0", 1: "user-1"}


# -- protobuf marshaler (`marshaler_protobuf.go:15-85` analog) --------------
def test_protowire_golden_bytes():
    """Wire bytes match hand-computed protobuf encoding (public spec):
    field 1 string 'hi' -> 0x0A 0x02 'hi'; field 2 varint 150 -> 0x10 0x96 0x01."""
    from watermill_spark.components.protowire import (
        Field,
        decode_message,
        encode_message,
    )

    fields = [Field(1, "id", "string"), Field(2, "amount", "int64")]
    buf = encode_message({"id": "hi", "amount": 150}, fields)
    assert buf == b"\x0a\x02hi\x10\x96\x01"
    assert decode_message(buf, fields) == {"id": "hi", "amount": 150}
    # proto3 defaults: omitted on wire, materialized on decode
    assert encode_message({"id": "", "amount": 0}, fields) == b""
    assert decode_message(b"", fields) == {"id": "", "amount": 0}
    # negative int64: 10-byte two's-complement varint
    neg = encode_message({"amount": -1}, [Field(2, "amount", "int64")])
    assert neg == b"\x10" + b"\xff" * 9 + b"\x01"
    assert decode_message(neg, [Field(2, "amount", "int64")])["amount"] == -1
    # unknown fields preserved as raw wire bytes (Go proto round-trip
    # contract), not silently dropped
    assert decode_message(buf, [Field(2, "amount", "int64")]) == {
        "amount": 150,
        "_unknown_fields": b"\x0a\x02hi",
    }


def test_protobuf_marshaler_roundtrip(ps, spark):
    """Typed rows → protobuf payload → typed rows, through the bus/processor
    path with metadata-name dispatch intact."""
    from watermill_spark.components.cqrs import ProtobufMarshaler

    m = ProtobufMarshaler()
    msgs = m.marshal(_events_df(spark, 3), "UserCreated", ["user_id", "name"])
    rows = msgs.collect()
    assert all(dict(r["metadata"])["name"] == "UserCreated" for r in rows)
    # payloads are real protobuf wire bytes, decodable standalone
    from watermill_spark.components.protowire import Field, decode_message

    flds = [Field(1, "user_id", "int64"), Field(2, "name", "string")]
    decoded = {decode_message(bytes(r["payload"]), flds)["user_id"] for r in rows}
    assert decoded == {0, 1, 2}
    typed = m.unmarshal(msgs, USER_SCHEMA)
    got = {r["user_id"]: r["name"] for r in typed.collect()}
    assert got == {0: "user-0", 1: "user-1", 2: "user-2"}


def test_protobuf_json_codec_parity(ps, spark):
    """Same typed rows through both codecs → identical typed results
    (codec-agnostic processor contract)."""
    from watermill_spark.components.cqrs import ProtobufMarshaler

    jm, pm = JSONMarshaler(), ProtobufMarshaler()
    src = _events_df(spark, 4)
    via_json = jm.unmarshal(jm.marshal(src, "T", ["user_id", "name"]), USER_SCHEMA)
    via_pb = pm.unmarshal(pm.marshal(src, "T", ["user_id", "name"]), USER_SCHEMA)
    assert {tuple(r) for r in via_json.select("user_id", "name").collect()} == {
        tuple(r) for r in via_pb.select("user_id", "name").collect()
    }


def test_protobuf_event_bus_end_to_end(ps, spark):
    """EventBus publish + EventProcessor handle with the protobuf codec."""
    from watermill_spark.components.cqrs import ProtobufMarshaler

    m = ProtobufMarshaler()
    topic_fn = lambda name: f"pb-{name}"
    bus = EventBus(ps, topic_fn=topic_fn, marshaler=m)
    bus.publish(_events_df(spark, 5), "UserCreated", ["user_id", "name"])
    seen = {}
    proc = EventProcessor(ps, topic_fn=topic_fn, marshaler=m)
    proc.add_handler(
        "UserCreated", USER_SCHEMA, lambda df: seen.update({"n": df.count()})
    )
    proc.process_once()
    assert seen["n"] == 5


def test_descriptor_set_wellformed():
    """The hand-encoded FileDescriptorSet parses with our own wire decoder
    against descriptor.proto's public field numbers."""
    from pyspark.sql.types import DoubleType

    from watermill_spark.components.cqrs import ProtobufMarshaler
    from watermill_spark.components.protowire import Field, decode_message

    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("amount", LongType()),
            StructField("score", DoubleType()),
        ]
    )
    blob = ProtobufMarshaler(package="watermill").descriptor_set("Evt", schema)
    # FileDescriptorSet.file(1) -> FileDescriptorProto
    fds = decode_message(blob, [Field(1, "file", "bytes")])
    fdp = decode_message(
        fds["file"],
        [
            Field(1, "name", "string"),
            Field(2, "package", "string"),
            Field(4, "message_type", "bytes"),
            Field(12, "syntax", "string"),
        ],
    )
    assert fdp["package"] == "watermill" and fdp["syntax"] == "proto3"
    msg = decode_message(
        fdp["message_type"], [Field(1, "name", "string"), Field(2, "field", "bytes")]
    )
    assert msg["name"] == "Evt"
    # last field wins in our single-value decode -> the 'score' field
    last = decode_message(
        msg["field"],
        [
            Field(1, "name", "string"),
            Field(3, "number", "int64"),
            Field(5, "type", "int64"),
        ],
    )
    # (partial schema: other descriptor fields land in _unknown_fields)
    assert {k: last[k] for k in ("name", "number", "type")} == {
        "name": "score",
        "number": 3,
        "type": 1,
    }  # TYPE_DOUBLE=1


# -- protobuf nested / repeated / map (marshaler_protobuf.go marshals ANY
# proto.Message; round 3 closes the scalar-subset gap) ----------------------
def test_protowire_repeated_packed_golden():
    """Repeated int64 uses packed encoding (proto3 default): field 1
    [3,270] -> 0x0A 0x03 0x03 0x8E 0x02; parser also accepts unpacked."""
    from watermill_spark.components.protowire import (
        Field,
        decode_message,
        encode_message,
    )

    f = [Field(1, "xs", "int64", repeated=True)]
    buf = encode_message({"xs": [3, 270]}, f)
    assert buf == b"\x0a\x03\x03\x8e\x02"
    assert decode_message(buf, f) == {"xs": [3, 270]}
    # unpacked form of the same data decodes identically (spec requirement)
    unpacked = b"\x08\x03\x08\x8e\x02"
    assert decode_message(unpacked, f) == {"xs": [3, 270]}
    # repeated string: one length-delimited record per element, never packed
    fs = [Field(1, "ss", "string", repeated=True)]
    buf = encode_message({"ss": ["a", "bc"]}, fs)
    assert buf == b"\x0a\x01a\x0a\x02bc"
    assert decode_message(buf, fs) == {"ss": ["a", "bc"]}
    # absent repeated decodes to [] (never None)
    assert decode_message(b"", fs) == {"ss": []}


def test_protowire_nested_message_golden():
    """Nested message: field 1 Msg{field 1 varint 5} -> 0x0A 0x02 0x08 0x05.
    None = unset (absent, decodes to None); {} = set-empty (zero-length)."""
    from watermill_spark.components.protowire import (
        Field,
        decode_message,
        encode_message,
    )

    sub = (Field(1, "n", "int64"),)
    f = [Field(1, "inner", "message", message=sub)]
    buf = encode_message({"inner": {"n": 5}}, f)
    assert buf == b"\x0a\x02\x08\x05"
    assert decode_message(buf, f) == {"inner": {"n": 5}}
    assert encode_message({"inner": None}, f) == b""
    assert decode_message(b"", f) == {"inner": None}
    assert encode_message({"inner": {}}, f) == b"\x0a\x00"
    assert decode_message(b"\x0a\x00", f) == {"inner": {"n": 0}}
    # repeated message
    fr = [Field(1, "rs", "message", repeated=True, message=sub)]
    buf = encode_message({"rs": [{"n": 1}, {"n": 2}]}, fr)
    assert buf == b"\x0a\x02\x08\x01\x0a\x02\x08\x02"
    assert decode_message(buf, fr) == {"rs": [{"n": 1}, {"n": 2}]}


def test_protowire_map_golden():
    """map<string,int64> {'a': 1} -> entry submessage
    0x0A 0x05 (0x0A 0x01 'a') (0x10 0x01); sorted-key determinism."""
    from watermill_spark.components.protowire import (
        Field,
        decode_message,
        encode_message,
    )

    f = [Field(1, "m", "map", key_type="string", value_type="int64")]
    buf = encode_message({"m": {"a": 1}}, f)
    assert buf == b"\x0a\x05\x0a\x01a\x10\x01"
    assert decode_message(buf, f) == {"m": {"a": 1}}
    # deterministic regardless of dict insertion order
    b1 = encode_message({"m": {"b": 2, "a": 1}}, f)
    b2 = encode_message({"m": {"a": 1, "b": 2}}, f)
    assert b1 == b2
    assert decode_message(b1, f) == {"m": {"a": 1, "b": 2}}
    # default-valued entry: zero-length entry payload, decodes to defaults
    buf = encode_message({"m": {"": 0}}, f)
    assert buf == b"\x0a\x00"
    assert decode_message(buf, f) == {"m": {"": 0}}
    # absent map decodes to {}
    assert decode_message(b"", f) == {"m": {}}
    # message-valued map
    sub = (Field(1, "n", "int64"),)
    fm = [
        Field(
            1, "m", "map", key_type="string", value_type="message", message=sub
        )
    ]
    buf = encode_message({"m": {"k": {"n": 7}}}, fm)
    assert decode_message(buf, fm) == {"m": {"k": {"n": 7}}}


def test_protowire_unknown_fields_roundtrip():
    """Forwarder pass-through contract (marshaler_protobuf.go semantics via
    Go's proto runtime): decoding with a schema missing some fields, then
    re-encoding, reproduces the original bytes — unknown fields are carried
    as raw wire bytes, never dropped."""
    from watermill_spark.components.protowire import (
        Field,
        decode_message,
        encode_message,
    )

    full = [
        Field(1, "id", "string"),
        Field(2, "amount", "int64"),
        Field(3, "score", "double"),
        Field(4, "tags", "string", repeated=True),
    ]
    original = encode_message(
        {"id": "x", "amount": 7, "score": 1.5, "tags": ["a", "b"]}, full
    )
    # narrow schema knows only fields 1 and 2; 3 (I64) and 4 (LEN x2) are
    # unknown — every wire type exercises the skip-and-keep path
    narrow = [Field(1, "id", "string"), Field(2, "amount", "int64")]
    decoded = decode_message(original, narrow)
    assert decoded["id"] == "x" and decoded["amount"] == 7
    assert "_unknown_fields" in decoded
    # byte-identical re-encode: known fields are in number order (as the
    # original encoder emitted them) and unknowns re-emit at the end, which
    # is also where they sat (3,4 > 1,2)
    assert encode_message(decoded, narrow) == original
    # a mid-number unknown survives semantically: decode the re-encoded
    # bytes with the FULL schema and recover every field value
    narrow2 = [Field(1, "id", "string"), Field(3, "score", "double")]
    rt = encode_message(decode_message(original, narrow2), narrow2)
    assert decode_message(rt, full) == {
        "id": "x",
        "amount": 7,
        "score": 1.5,
        "tags": ["a", "b"],
    }
    # nested: the submessage's own unknown fields round-trip too
    sub_full = (Field(1, "n", "int64"), Field(2, "s", "string"))
    sub_narrow = (Field(1, "n", "int64"),)
    outer_full = [Field(1, "inner", "message", message=sub_full)]
    outer_narrow = [Field(1, "inner", "message", message=sub_narrow)]
    orig = encode_message({"inner": {"n": 5, "s": "keep"}}, outer_full)
    rt = encode_message(decode_message(orig, outer_narrow), outer_narrow)
    assert rt == orig
    # no unknown content -> no reserved key, and encode of a dict without
    # the key is unchanged behavior
    assert "_unknown_fields" not in decode_message(orig, outer_full)


def test_protowire_oneof_golden():
    """proto3 oneof: presence-tracked members (set-to-default still emits),
    last-one-wins on decode, two set members rejected on encode."""
    import pytest as _pytest

    from watermill_spark.components.protowire import (
        Field,
        decode_message,
        encode_message,
    )

    f = [
        Field(1, "name", "string"),
        Field(2, "as_text", "string", oneof="body"),
        Field(3, "as_num", "int64", oneof="body"),
    ]
    # unset oneof members decode to None (not proto3 defaults)
    assert decode_message(b"", f) == {
        "name": "",
        "as_text": None,
        "as_num": None,
    }
    # a set member holding the DEFAULT value is still emitted (explicit
    # presence): field 3 varint 0 -> 0x18 0x00
    buf = encode_message({"as_num": 0}, f)
    assert buf == b"\x18\x00"
    assert decode_message(buf, f) == {
        "name": "",
        "as_text": None,
        "as_num": 0,
    }
    # empty-string member likewise: field 2 zero-length -> 0x12 0x00
    buf = encode_message({"as_text": ""}, f)
    assert buf == b"\x12\x00"
    assert decode_message(buf, f)["as_text"] == ""
    # round-trip a normal value; the non-oneof sibling keeps proto3 defaults
    buf = encode_message({"name": "m", "as_text": "hello"}, f)
    assert decode_message(buf, f) == {
        "name": "m",
        "as_text": "hello",
        "as_num": None,
    }
    # two set members of one group is a programming error
    with _pytest.raises(ValueError, match="oneof group"):
        encode_message({"as_text": "x", "as_num": 1}, f)
    # last-one-wins: wire carrying field 2 then field 3 keeps only field 3
    wire = b"\x12\x01a" + b"\x18\x05"
    assert decode_message(wire, f) == {
        "name": "",
        "as_text": None,
        "as_num": 5,
    }
    # message-typed oneof member: None=unset, {}=set-empty still emits
    fm = [
        Field(1, "as_msg", "message", message=(Field(1, "n", "int64"),),
              oneof="body"),
        Field(2, "as_text", "string", oneof="body"),
    ]
    buf = encode_message({"as_msg": {}}, fm)
    assert buf == b"\x0a\x00"
    assert decode_message(buf, fm) == {"as_msg": {"n": 0}, "as_text": None}


def test_descriptor_set_oneof_wellformed():
    """oneof_decl (DescriptorProto.8) and oneof_index
    (FieldDescriptorProto.9) land in the hand-encoded descriptor."""
    from watermill_spark.components.protowire import (
        Field,
        build_descriptor_set,
        decode_message,
    )

    fields = [
        Field(1, "name", "string"),
        Field(2, "as_text", "string", oneof="body"),
        Field(3, "as_num", "int64", oneof="body"),
    ]
    blob = build_descriptor_set("watermill", "Evt", fields)
    fds = decode_message(blob, [Field(1, "file", "bytes")])
    fdp = decode_message(fds["file"], [Field(4, "message_type", "bytes")])
    msg = decode_message(
        fdp["message_type"],
        [
            Field(1, "name", "string"),
            Field(2, "field", "bytes", repeated=True),
            Field(8, "oneof_decl", "bytes", repeated=True),
        ],
    )
    assert len(msg["oneof_decl"]) == 1
    decl = decode_message(msg["oneof_decl"][0], [Field(1, "name", "string")])
    assert decl == {"name": "body"}
    fdesc = [
        decode_message(
            fp,
            [
                Field(1, "name", "string"),
                # oneof_index=0 is a real value; int64 default would hide
                # it, so probe presence via a oneof-style nullable field
                Field(9, "oneof_index", "int64", oneof="probe"),
            ],
        )
        for fp in msg["field"]
    ]
    by_name = {d["name"]: d["oneof_index"] for d in fdesc}
    assert by_name["name"] is None
    assert by_name["as_text"] == 0 and by_name["as_num"] == 0


def test_protobuf_marshaler_nested_roundtrip(ps, spark):
    """Typed rows with struct / array / map columns survive the protobuf
    codec through Spark (Arrow-batched pandas UDF both directions)."""
    from pyspark.sql.types import ArrayType, MapType

    from watermill_spark.components.cqrs import ProtobufMarshaler

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("tags", ArrayType(StringType())),
            StructField("attrs", MapType(StringType(), LongType())),
            StructField(
                "addr",
                StructType(
                    [
                        StructField("city", StringType()),
                        StructField("zip", LongType()),
                    ]
                ),
            ),
        ]
    )
    src = spark.createDataFrame(
        [
            (1, ["a", "b"], {"x": 1}, ("metropolis", 12345)),
            (2, [], {}, ("gotham", 0)),
            (3, None, None, None),
        ],
        schema,
    )
    m = ProtobufMarshaler()
    typed = m.unmarshal(
        m.marshal(src, "Evt", ["user_id", "tags", "attrs", "addr"]), schema
    )
    got = {r["user_id"]: r for r in typed.collect()}
    assert list(got[1]["tags"]) == ["a", "b"]
    assert dict(got[1]["attrs"]) == {"x": 1}
    assert got[1]["addr"]["city"] == "metropolis"
    assert got[1]["addr"]["zip"] == 12345
    # empty list/map round-trip as empty (proto3: absent == empty)
    assert list(got[2]["tags"]) == [] and dict(got[2]["attrs"]) == {}
    assert got[2]["addr"]["city"] == "gotham"
    # None list/map coerce to empty; None message stays None (unset)
    assert list(got[3]["tags"]) == [] and dict(got[3]["attrs"]) == {}
    assert got[3]["addr"] is None


def test_protobuf_null_scalar_coerces_to_default(ps, spark):
    """Pinned null contract (protowire.py module docstring): protobuf has
    no null scalars — None encodes as absent and decodes to the proto3
    default, unlike JSONMarshaler which preserves null."""
    src = spark.createDataFrame(
        [(1, "alice"), (2, None)], ["user_id", "name"]
    )
    from watermill_spark.components.cqrs import ProtobufMarshaler

    jm, pm = JSONMarshaler(), ProtobufMarshaler()
    via_pb = {
        r["user_id"]: r["name"]
        for r in pm.unmarshal(
            pm.marshal(src, "T", ["user_id", "name"]), USER_SCHEMA
        ).collect()
    }
    via_json = {
        r["user_id"]: r["name"]
        for r in jm.unmarshal(
            jm.marshal(src, "T", ["user_id", "name"]), USER_SCHEMA
        ).collect()
    }
    assert via_pb == {1: "alice", 2: ""}  # null -> proto3 default
    assert via_json == {1: "alice", 2: None}  # JSON keeps null


def test_descriptor_set_nested_map_wellformed():
    """Descriptor set for a nested+map schema: nested_type entries exist and
    the map entry carries MessageOptions.map_entry=true."""
    from pyspark.sql.types import ArrayType, MapType

    from watermill_spark.components.cqrs import ProtobufMarshaler
    from watermill_spark.components.protowire import Field, decode_message

    schema = StructType(
        [
            StructField("tags", ArrayType(StringType())),
            StructField("attrs", MapType(StringType(), LongType())),
            StructField(
                "addr", StructType([StructField("city", StringType())])
            ),
        ]
    )
    blob = ProtobufMarshaler(package="watermill").descriptor_set("Evt", schema)
    fds = decode_message(blob, [Field(1, "file", "bytes")])
    fdp = decode_message(
        fds["file"],
        [Field(2, "package", "string"), Field(4, "message_type", "bytes")],
    )
    msg = decode_message(
        fdp["message_type"],
        [
            Field(1, "name", "string"),
            Field(2, "field", "bytes", repeated=True),
            Field(3, "nested_type", "bytes", repeated=True),
        ],
    )
    assert msg["name"] == "Evt"
    assert len(msg["field"]) == 3
    nested_names = []
    map_entry_flags = []
    for nt in msg["nested_type"]:
        d = decode_message(
            nt,
            [Field(1, "name", "string"), Field(7, "options", "bytes")],
        )
        nested_names.append(d["name"])
        if d["options"]:
            opts = decode_message(d["options"], [Field(7, "map_entry", "bool")])
            map_entry_flags.append((d["name"], opts["map_entry"]))
    assert "AttrsEntry" in nested_names and "Addr" in nested_names
    assert ("AttrsEntry", True) in map_entry_flags
    # the repeated-scalar field is LABEL_REPEATED(3), type TYPE_STRING(9)
    first = decode_message(
        msg["field"][0],
        [
            Field(1, "name", "string"),
            Field(4, "label", "int64"),
            Field(5, "type", "int64"),
        ],
    )
    # (partial schema: other descriptor fields land in _unknown_fields)
    assert {k: first[k] for k in ("name", "label", "type")} == {
        "name": "tags",
        "label": 3,
        "type": 9,
    }

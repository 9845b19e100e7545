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
    # unknown fields skipped
    assert decode_message(buf, [Field(2, "amount", "int64")]) == {"amount": 150}


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
    assert last == {"name": "score", "number": 3, "type": 1}  # TYPE_DOUBLE=1

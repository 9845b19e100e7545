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

"""Example 17 — CQRS ordered events: one subscription per read model, many
event types, applied in order.

Reference analog: `_examples/basic/6-cqrs-ordered-events` — a subscriber
-management app: commands (Subscribe / Unsubscribe / UpdateEmail) produce
events (SubscriberSubscribed / SubscriberUnsubscribed / SubscriberEmail
Updated) on ONE `events` topic, and each read model registers an
`AddHandlersGroup` (`main.go:159-180`): one subscription, Watermill
dispatches each message to the matching handler of the group IN ORDER —
so "subscribe → update email → unsubscribe" can never apply backwards.

Spark translation of "in-order dispatch": the EventGroupProcessor gives
every group one subscription over the topic and dispatches by event name;
ORDER is restored by the read model as an ordered fold — events carry a
monotone `seq`, and the projection reduces per subscriber by max-seq
(last-writer-wins per key) / sorts the timeline by seq. Same final state
as the reference's serial dispatch, but partition-parallel per subscriber
key instead of one-at-a-time.

Run:  python examples/17_cqrs_ordered_events.py
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql.types import LongType, StringType, StructField, StructType

from watermill_spark.components.cqrs import (
    CommandBus,
    CommandProcessor,
    EventBus,
    EventGroupProcessor,
    JSONMarshaler,
)
from watermill_spark.sources import MemoryPubSub

CMD = StructType(
    [
        StructField("seq", LongType()),
        StructField("subscriber_id", StringType()),
        StructField("email", StringType()),
    ]
)
EVT = CMD  # events carry the same fields (+ the name in the envelope)


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-cqrs-ordered")
    ps = MemoryPubSub(spark, persistent=True)
    marshaler = JSONMarshaler()
    command_bus = CommandBus(ps, marshaler=marshaler)
    # every event type rides ONE topic, like the reference's
    # GenerateSubscribeTopic → "events" (`main.go:125-127`)
    event_bus = EventBus(
        ps, topic_fn=lambda _name: "subscriber-events", marshaler=marshaler
    )

    # 1. the command stream: alice subscribes and fixes her email twice;
    #    bob subscribes then leaves. seq = command order.
    history = [
        (0, "alice", "alice@old.example"),
        (1, "bob", "bob@example.com"),
        (2, "alice", "alice@new.example"),
        (3, "bob", None),
        (4, "alice", "alice@final.example"),
    ]
    cmds = {
        "Subscribe": [h for h in history if h[0] in (0, 1)],
        "UpdateEmail": [h for h in history if h[0] in (2, 4)],
        "Unsubscribe": [h for h in history if h[0] == 3],
    }
    for name, rows in cmds.items():
        command_bus.send(spark.createDataFrame(rows, CMD), name,
                         ["seq", "subscriber_id", "email"])

    # 2. command handlers emit the corresponding events (one topic)
    cp = CommandProcessor(ps, marshaler=marshaler)
    for cmd_name, evt_name in [
        ("Subscribe", "SubscriberSubscribed"),
        ("UpdateEmail", "SubscriberEmailUpdated"),
        ("Unsubscribe", "SubscriberUnsubscribed"),
    ]:
        cp.add_handler(
            cmd_name, CMD,
            lambda typed, evt_name=evt_name: event_bus.publish(
                typed, evt_name, ["seq", "subscriber_id", "email"]
            ),
        )
    cp.process_once()

    # 3. read model A: current subscribers — ordered fold, last event per
    #    subscriber wins (the order guarantee the reference group gives)
    raw_events: list[tuple] = []

    def collect(kind):
        def h(typed):
            raw_events.extend(
                (r["seq"], kind, r["subscriber_id"], r["email"])
                for r in typed.collect()
            )
        return h

    # the read models share ONE group subscription over the events topic
    # (AddHandlersGroup semantics)
    subscribers: dict[str, str] = {}
    timeline: list[str] = []

    egp = EventGroupProcessor(ps, "subscriber-events", marshaler=marshaler)
    egp.add_handlers_group(
        ("SubscriberSubscribed", EVT, collect("subscribed")),
        ("SubscriberEmailUpdated", EVT, collect("email_updated")),
        ("SubscriberUnsubscribed", EVT, collect("unsubscribed")),
    )
    egp.process_once()

    for seq, kind, sid, email in sorted(raw_events):  # the ordered fold
        timeline.append(f"{seq}:{kind}:{sid}")
        if kind == "subscribed":
            subscribers[sid] = email
        elif kind == "email_updated" and sid in subscribers:
            subscribers[sid] = email
        elif kind == "unsubscribed":
            subscribers.pop(sid, None)

    out = {
        "subscribers": subscribers,
        "timeline": timeline,
        "events_total": len(raw_events),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()

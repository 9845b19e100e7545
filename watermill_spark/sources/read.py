"""Subscriber-side helpers: bulk read and parallel-subscription multiplier.

Reference: `message/subscriber/read.go:10-53` (BulkRead /
BulkReadWithDeduplication) and `internal/subscriber/multiplier.go:23-71`
(NewMultiplier).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Row

from .base import PubSub


def bulk_read(
    pubsub: PubSub, topic: str, limit: int, timeout_sec: float, poll_sec: float = 0.05
) -> list[Row]:
    """Poll a topic until ≥ `limit` messages are available or the timeout
    elapses; return up to `limit` rows (`message/subscriber/read.go:10-27`).

    The channel-receive loop becomes a poll over the bounded subscribe view —
    acking is implicit (subscribe is a committed read). Returns what arrived
    on timeout, like the reference (ok=false but messages delivered so far).
    """
    deadline = time.monotonic() + timeout_sec
    rows: list[Row] = []
    while True:
        rows = pubsub.subscribe(topic).limit(limit).collect()
        if len(rows) >= limit or time.monotonic() >= deadline:
            return rows[:limit]
        time.sleep(poll_sec)


def bulk_read_with_deduplication(
    pubsub: PubSub, topic: str, limit: int, timeout_sec: float, poll_sec: float = 0.05
) -> list[Row]:
    """`bulk_read` counting unique message UUIDs
    (`message/subscriber/read.go:31-53`) — for at-least-once transports whose
    redeliveries would otherwise inflate the count."""
    deadline = time.monotonic() + timeout_sec
    while True:
        rows = pubsub.subscribe(topic).dropDuplicates(["uuid"]).limit(limit).collect()
        if len(rows) >= limit or time.monotonic() >= deadline:
            return rows[:limit]
        time.sleep(poll_sec)


def multiplier(
    subscribe: Callable[[str], DataFrame], topic: str, count: int
) -> DataFrame:
    """K parallel subscriptions merged into one stream
    (`internal/subscriber/multiplier.go:23-71`).

    In Spark, source parallelism is native (partitions ARE the multiplier:
    `minPartitions` / `maxFilesPerTrigger` / `spark.sql.shuffle.partitions`),
    so this exists for API parity: union of `count` independent
    subscriptions, exactly the reference's fan-in of K channels. With a
    shared-log transport (Kafka consumer group) each subscription sees a
    partition slice and the union is the full topic; with broadcast-style
    transports the union multiplies deliveries, as the reference's does.
    """
    if count < 1:
        raise ValueError("count must be >= 1")
    out = subscribe(topic)
    for _ in range(count - 1):
        out = out.unionAll(subscribe(topic))
    return out

"""Requeuer: move messages topic→topic with retry bookkeeping.

Reference: `components/requeuer/requeuer.go:89-158` — subscribe to a
(poison) topic, increment `_watermill_requeuer_retries`, optionally stamp a
delay, publish to the origin topic (taken from the poisoned-topic metadata or
a fixed GeneratePublishTopic).

Spark shape: a bounded pass (or a processing-time-triggered streaming query)
reading the requeue topic, metadata arithmetic in columns, publish to origin.
The delay is metadata-only (`_watermill_delayed_until`) — never a sleep —
so requeue throughput is unaffected by the backoff duration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from watermill_spark.message import MESSAGE_COLUMNS
from watermill_spark.sources.base import PubSub
from watermill_spark.streaming.middleware import (
    POISONED_TOPIC,
    REQUEUER_RETRIES,
)
from .delay import delay_for


class Requeuer:
    def __init__(
        self,
        subscriber: PubSub,
        publisher: PubSub,
        requeue_topic: str,
        destination_topic: str | None = None,
        delay_sec: int = 0,
    ):
        """destination_topic=None routes each message back to the topic it
        was poisoned on (metadata `_watermill_poisoned_on_topic`)."""
        self.subscriber = subscriber
        self.publisher = publisher
        self.requeue_topic = requeue_topic
        self.destination_topic = destination_topic
        self.delay_sec = delay_sec

    def run_once(self) -> None:
        df = self.subscriber.subscribe(self.requeue_topic)
        meta = F.coalesce(F.col("metadata"), F.create_map())
        retries = F.coalesce(F.element_at(meta, REQUEUER_RETRIES).cast("int"), F.lit(0)) + 1
        df = df.withColumn(
            "metadata",
            F.map_concat(
                meta,
                F.create_map(F.lit(REQUEUER_RETRIES), retries.cast("string")),
            ),
        )
        if self.delay_sec:
            df = delay_for(df, self.delay_sec)
        # snapshot: the per-destination publish loop re-reads df; blocks are
        # GC-released after the pass (no CacheManager entry left behind)
        df = df.localCheckpoint(eager=True)
        if self.destination_topic is not None:
            self.publisher.publish(self.destination_topic, df.select(*MESSAGE_COLUMNS))
            return
        dest = F.element_at(F.col("metadata"), POISONED_TOPIC)
        routed = df.withColumn("topic", dest)
        topics = [r["topic"] for r in routed.select("topic").distinct().collect()]
        for t in topics:
            if t is None:
                continue
            self.publisher.publish(
                t, routed.filter(F.col("topic") == t).select(*MESSAGE_COLUMNS)
            )

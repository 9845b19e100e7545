"""FanIn / FanOut components.

FanIn  (`components/fanin/fanin.go:61-110`): N source topics → 1 target.
FanOut (`pubsub/gochannel/fanout.go:36-91`): 1 subscription → N in-process
subscribers.

Spark shapes: FanIn is a zero-shuffle union (or a native multi-topic Kafka
subscribe); FanOut is N independent reads of the same (persistent) topic —
DataFrame immutability makes the reference's copy-per-subscriber free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from watermill_spark.message import MESSAGE_COLUMNS
from watermill_spark.sources.base import PubSub


class FanIn:
    def __init__(self, subscriber: PubSub, publisher: PubSub, source_topics: list[str], target_topic: str):
        if not source_topics:
            raise ValueError("sourceTopics must not be empty")  # fanin.go:40-46
        if not target_topic:
            raise ValueError("targetTopic must not be empty")
        if target_topic in source_topics:
            raise ValueError("targetTopic must not be among sourceTopics")  # fanin.go:49-53
        self.subscriber = subscriber
        self.publisher = publisher
        self.source_topics = source_topics
        self.target_topic = target_topic

    def merged(self) -> DataFrame:
        dfs = [
            self.subscriber.subscribe(t).select(*MESSAGE_COLUMNS)
            for t in self.source_topics
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out.withColumn("topic", F.lit(self.target_topic))

    def run_once(self) -> None:
        self.publisher.publish(self.target_topic, self.merged())


class FanOut:
    def __init__(self, subscriber: PubSub, source_topic: str):
        self.subscriber = subscriber
        self.source_topic = source_topic
        # (publisher, topic) pairs — each subscription keeps its own
        # transport (fanout.go:60-77), so two subscriptions on different
        # Pub/Subs each receive the source independently.
        self._subscriptions: list[tuple[PubSub, str]] = []

    def add_subscription(self, publisher: PubSub, topic: str) -> None:
        """fanout.go:60-77 AddSubscription analog (publisher+topic pair)."""
        self._subscriptions.append((publisher, topic))

    def run_once(self) -> None:
        src = self.subscriber.subscribe(self.source_topic)
        for pub, t in self._subscriptions:
            pub.publish(t, src.withColumn("topic", F.lit(t)))

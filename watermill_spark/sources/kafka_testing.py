"""Broker-free Kafka conformance rig.

The reference gates "production ready" on its universal acceptance suite
running against live transports (`pubsub/tests/test_pubsub.go:30-91`). No
broker exists in this container, so this module emulates the *wire contract*
instead: an in-memory broker that speaks Spark's Kafka source/sink schema

    key binary | value binary | headers array<struct<key:string,value:binary>>
    | topic string | partition int | offset long | timestamp | timestampType

and a ``FakeKafkaPubSub`` that routes `KafkaPubSub`'s REAL shape-mapping code
(`kafka.py:_to_kafka_shape` / `_from_kafka_shape` — the logic that would run
against a live cluster) through it. What stays untested end-to-end is only
the Kafka client I/O itself (Spark's own code); every line of ours runs.

Driver-side storage is deliberate: this is a test double, not a transport.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .kafka import KafkaPubSub

KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType()),
                    ]
                )
            ),
        ),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


@dataclass
class _PartitionLog:
    records: list = field(default_factory=list)  # append-only


class InMemoryKafkaBroker:
    """Topic → fixed partition set → append-only offset-stamped logs.

    Partition assignment follows the Kafka default partitioner's contract:
    records with a key hash to a stable partition (per-key order preserved);
    keyless records round-robin.
    """

    def __init__(self, n_partitions: int = 3):
        self.n_partitions = n_partitions
        self._topics: dict[str, list[_PartitionLog]] = {}
        self._rr = 0
        self._lock = threading.Lock()

    def create_topic(self, topic: str) -> None:
        with self._lock:
            self._topics.setdefault(
                topic, [_PartitionLog() for _ in range(self.n_partitions)]
            )

    def append(self, topic: str, key, value, headers) -> None:
        import datetime as _dt

        with self._lock:
            logs = self._topics.setdefault(
                topic, [_PartitionLog() for _ in range(self.n_partitions)]
            )
            if key is not None:
                import zlib

                # deterministic keyed partitioner (Python hash() is
                # per-process randomized; crc32 is stable like murmur2)
                part = zlib.crc32(bytes(key)) % self.n_partitions
            else:
                part = self._rr % self.n_partitions
                self._rr += 1
            log = logs[part]
            log.records.append(
                {
                    "key": bytes(key) if key is not None else None,
                    "value": bytes(value) if value is not None else None,
                    "headers": [
                        (h[0], bytes(h[1]) if h[1] is not None else None)
                        for h in (headers or [])
                    ]
                    or None,
                    "topic": topic,
                    "partition": part,
                    "offset": len(log.records),
                    "timestamp": _dt.datetime.utcfromtimestamp(time.time()),
                    "timestampType": 0,  # CreateTime
                }
            )

    def fetch(self, topics: list[str]) -> list[dict]:
        with self._lock:
            out = []
            for t in topics:
                for log in self._topics.get(t, []):
                    out.extend(log.records)
            return out


class FakeKafkaPubSub(KafkaPubSub):
    """`KafkaPubSub` with the client I/O swapped for `InMemoryKafkaBroker`.

    publish → real `_to_kafka_shape` plan → collect → broker append;
    subscribe → broker fetch → DataFrame in Spark's Kafka source schema →
    real `_from_kafka_shape` plan. Comma-separated multi-topic subscribe
    (FanIn) is honored like the real source's `subscribe` option.
    """

    def __init__(self, spark, broker: InMemoryKafkaBroker | None = None):
        super().__init__(spark, bootstrap_servers="fake:9092")
        self.broker = broker or InMemoryKafkaBroker()

    # -- sink path ---------------------------------------------------------
    def _send(self, shaped: DataFrame, topic: str | None) -> None:
        for r in shaped.collect():
            self.broker.append(
                r["topic"] if topic is None else topic,
                r["key"],
                r["value"],
                [(h["key"], h["value"]) for h in (r["headers"] or [])],
            )

    def publish(self, topic: str, df) -> None:
        self._check_open()
        import pyspark.sql.functions as F

        self._send(self._to_kafka_shape(df.withColumn("topic", F.lit(topic))), topic)

    def publish_routed(self, df) -> None:
        self._check_open()
        self._send(self._to_kafka_shape(df), None)

    # -- source path -------------------------------------------------------
    def _wire_df(self, topic: str) -> DataFrame:
        topics = [t.strip() for t in topic.split(",") if t.strip()]
        rows = self.broker.fetch(topics)
        return self.spark.createDataFrame(rows, schema=KAFKA_WIRE_SCHEMA)

    def subscribe(self, topic: str) -> DataFrame:
        return self._from_kafka_shape(self._wire_df(topic))

    def subscribe_initialize(self, topic: str) -> None:
        self.broker.create_topic(topic)

    def subscribe_stream(self, topic: str) -> DataFrame:  # pragma: no cover
        raise NotImplementedError(
            "FakeKafkaPubSub is a batch conformance double; streaming reads "
            "need a live broker"
        )

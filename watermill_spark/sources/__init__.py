"""Topic transports: Publisher/Subscriber implementations.

Reference interfaces: `message/pubsub.go:8-51` (Publish, Subscribe,
SubscribeInitialize). Each transport here implements the same contract on a
Spark-native storage/stream layer:

- MemoryPubSub   — GoChannel analog (tests; driver-side list per topic)
- ParquetPubSub  — persistent topics as parquet dirs (batch + streaming read)
- KafkaPubSub    — thin config holder emitting real readStream/writeStream
                   plans against Kafka (cluster path; not runnable in this
                   container, covered by plan-shape tests only)
- SQLitePubSub   — watermill-sql/-sqlite analog: per-topic tables +
                   consumer-group offsets, transactional outbox,
                   exactly-once consumer, delayed-message hold-back on read
- HTTPPubSub     — watermill-http analog: embedded HTTP server subscriber
                   (POST /{topic} → message), per-message HTTP publisher
- FilePubSub     — watermill-io analog over files: NDJSON line protocol,
                   one append-only file per topic, distributed Spark read;
                   IOPublisher/IOSubscriber wrap arbitrary file-like
                   streams (pipes, stdout/stdin) with the same framing
"""

from .memory import MemoryPubSub
from .parquet import ParquetPubSub
from .kafka import KafkaPubSub
from .sqldb import GroupSubscriber, SQLitePubSub
from .http import HTTPPubSub
from .iofile import FilePubSub, IOPublisher, IOSubscriber
from .decorator import (
    ForwardingPubSubDecorator,
    RetryPublisher,
    message_transform_publisher_decorator,
    message_transform_subscriber_decorator,
)
from .read import bulk_read, bulk_read_with_deduplication, multiplier

__all__ = [
    "MemoryPubSub",
    "ParquetPubSub",
    "KafkaPubSub",
    "SQLitePubSub",
    "GroupSubscriber",
    "HTTPPubSub",
    "FilePubSub",
    "IOPublisher",
    "IOSubscriber",
    "ForwardingPubSubDecorator",
    "RetryPublisher",
    "message_transform_publisher_decorator",
    "message_transform_subscriber_decorator",
    "bulk_read",
    "bulk_read_with_deduplication",
    "multiplier",
]

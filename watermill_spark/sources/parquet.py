"""Persistent Pub/Sub: one parquet directory per topic.

The durable transport for local/cluster use without Kafka: publish appends
parquet files; batch subscribe scans the dir; streaming subscribe is a file
source (`readStream.schema(...).parquet(dir)`) which Structured Streaming
checkpoints by file — giving exactly the replayable-log semantics of the
reference's persistent GoChannel (`pubsub/gochannel/pubsub.go:115-122,
243-261`): new subscribers replay the backlog; nack ⇒ checkpoint replay.

Scale: append-only parquet with per-batch files is the standard streaming
file-sink layout; compaction is a maintenance concern outside the transport.
A real deployment would use Delta/Iceberg or Kafka; the contract is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from watermill_spark.message import MESSAGE_SCHEMA, ensure_message_df

from .base import PubSub


class ParquetPubSub(PubSub):
    def __init__(self, spark, base_dir: str):
        super().__init__(spark)
        self.base_dir = base_dir

    def _dir(self, topic: str) -> str:
        return os.path.join(self.base_dir, topic)

    def publish(self, topic: str, df: DataFrame) -> None:
        ensure_message_df(df).write.mode("append").parquet(self._dir(topic))

    def subscribe(self, topic: str) -> DataFrame:
        d = self._dir(topic)
        if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)
        ):
            return self.spark.createDataFrame([], MESSAGE_SCHEMA)
        return self.spark.read.schema(MESSAGE_SCHEMA).parquet(d)

    def subscribe_stream(self, topic: str) -> DataFrame:
        self.subscribe_initialize(topic)
        return self.spark.readStream.schema(MESSAGE_SCHEMA).parquet(self._dir(topic))

    def subscribe_initialize(self, topic: str) -> None:
        os.makedirs(self._dir(topic), exist_ok=True)

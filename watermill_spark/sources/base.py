"""Transport contract (Publisher + Subscriber, `message/pubsub.go:8-51`)."""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame, SparkSession


class PubSub(abc.ABC):
    """Publisher + Subscriber pair over named topics.

    Delivery contract mirrors the reference: Publish is non-atomic across
    messages (`message/pubsub.go:13-14`); Subscribe yields all messages of a
    topic; at-least-once overall. Batch (`subscribe`) returns everything
    currently in the topic; streaming (`subscribe_stream`) returns an
    unbounded DataFrame for Structured Streaming.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @abc.abstractmethod
    def publish(self, topic: str, df: DataFrame) -> None:
        """Append message rows to a topic (thread-safety per Spark's writer)."""

    @abc.abstractmethod
    def subscribe(self, topic: str) -> DataFrame:
        """Bounded read of a topic's current contents."""

    def subscribe_stream(self, topic: str) -> DataFrame:
        """Unbounded read (Structured Streaming); optional per transport."""
        raise NotImplementedError(f"{type(self).__name__} has no streaming source")

    def subscribe_initialize(self, topic: str) -> None:
        """Pre-create a topic (`message/pubsub.go:42-51`); default no-op."""

    def close(self) -> None:  # graceful close analog
        pass

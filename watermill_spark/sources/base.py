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
        self._closed = False

    def _check_open(self) -> None:
        """Publishing on a closed Pub/Sub is an error, as in the reference
        (`pubsub/gochannel/pubsub.go:92-94` returns ErrPubSubClosed)."""
        if self._closed:
            raise RuntimeError("pubsub closed")

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

    def close(self) -> None:
        """Graceful close: all prior publishes are durable (parquet writes
        and memory appends complete synchronously in `publish`, so close
        never drops a flushed batch — TestPublisherClose's contract);
        subsequent publishes raise."""
        self._closed = True


# RetryPublisher moved to sources/decorator.py (it is a publisher decorator;
# the forwarding base there keeps cursor capabilities visible through the
# wrap). Import from watermill_spark.sources.

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


class RetryPublisher(PubSub):
    """Publisher decorator retrying failed publishes with doubling backoff
    (`internal/publisher/retry.go:55-108`).

    Sink-side safety net for transient transport errors; with checkpointed
    streaming the replayed batch makes retries idempotent-by-uuid when the
    underlying sink dedups (exactly-once recipe, SURVEY.md §7d).
    """

    def __init__(self, inner: PubSub, max_retries: int = 5, initial_interval_sec: float = 0.1):
        super().__init__(inner.spark)
        self.inner = inner
        self.max_retries = max_retries
        self.initial_interval_sec = initial_interval_sec

    def publish(self, topic, df):
        import time as _time

        interval = self.initial_interval_sec
        for attempt in range(self.max_retries + 1):
            try:
                return self.inner.publish(topic, df)
            except Exception:
                if attempt == self.max_retries:
                    raise
                _time.sleep(interval)
                interval *= 2

    def subscribe(self, topic):
        return self.inner.subscribe(topic)

    def subscribe_stream(self, topic):
        return self.inner.subscribe_stream(topic)

    def subscribe_initialize(self, topic):
        return self.inner.subscribe_initialize(topic)

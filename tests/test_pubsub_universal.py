"""Port of the universal Pub/Sub acceptance suite
(`/root/reference/pubsub/tests/test_pubsub.go:30-137`), parameterized over
transports, keeping the observable contracts that survive the
channel→micro-batch model change (SURVEY.md §5/§7):

- TestPublishSubscribe (:236-281): payload + metadata fidelity, no loss.
- TestTopic (:873): topic isolation.
- TestNewSubscriberReceivesOldMessages (:1126): persistent backlog replay.
- TestPublishSubscribeInOrder (:405-481): per-key order preservation.
- BulkRead helpers (`message/subscriber/read.go:10-53`): incl. dedup variant.
"""

from __future__ import annotations

import uuid as _uuid

import pytest

from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import MemoryPubSub, ParquetPubSub


@pytest.fixture(params=["memory", "parquet", "kafka", "sqlite", "http", "iofile"])
def pubsub(request, spark, tmp_path):
    if request.param == "memory":
        return MemoryPubSub(spark)
    if request.param == "kafka":
        # broker-free conformance double: real _to/_from_kafka_shape mapping
        # over an in-memory broker speaking the Kafka wire schema
        from watermill_spark.sources.kafka_testing import FakeKafkaPubSub

        return FakeKafkaPubSub(spark)
    if request.param == "sqlite":
        from watermill_spark.sources import SQLitePubSub

        return SQLitePubSub(spark, str(tmp_path / "pubsub.sqlite3"))
    if request.param == "http":
        # real loopback HTTP: publish POSTs over a socket into the embedded
        # server (watermill-http analog)
        from watermill_spark.sources import HTTPPubSub

        return HTTPPubSub(spark)
    if request.param == "iofile":
        # watermill-io analog: NDJSON file per topic, distributed read
        from watermill_spark.sources import FilePubSub

        return FilePubSub(spark, str(tmp_path / "ndjson_topics"))
    return ParquetPubSub(spark, str(tmp_path / "topics"))


def _mk_messages(n: int, key_mod: int | None = None):
    msgs = []
    for i in range(n):
        meta = {"n": str(i)}
        if key_mod is not None:
            meta["key"] = str(i % key_mod)
        msgs.append(new_message(payload=f"payload-{i}", metadata=meta))
    return msgs


def test_publish_subscribe(pubsub, spark):
    """100 messages arrive exactly, payload+metadata intact (UUID set
    equality ignoring order, as `test_asserts.go:39-59`)."""
    topic = f"t-{_uuid.uuid4().hex[:8]}"
    msgs = _mk_messages(100)
    pubsub.publish(topic, messages_df(spark, msgs))

    got = {r["uuid"]: r for r in pubsub.subscribe(topic).collect()}
    assert set(got) == {m["uuid"] for m in msgs}
    for m in msgs:
        r = got[m["uuid"]]
        assert bytes(r["payload"]) == m["payload"]
        assert dict(r["metadata"]) == m["metadata"]


def test_topic_isolation(pubsub, spark):
    t1, t2 = (f"iso-{_uuid.uuid4().hex[:8]}" for _ in range(2))
    pubsub.publish(t1, messages_df(spark, _mk_messages(5)))
    pubsub.publish(t2, messages_df(spark, _mk_messages(3)))
    assert pubsub.subscribe(t1).count() == 5
    assert pubsub.subscribe(t2).count() == 3


def test_new_subscriber_receives_old_messages(pubsub, spark):
    topic = f"old-{_uuid.uuid4().hex[:8]}"
    pubsub.publish(topic, messages_df(spark, _mk_messages(10)))
    # "new subscriber" = fresh subscribe call after publish completed
    assert pubsub.subscribe(topic).count() == 10
    pubsub.publish(topic, messages_df(spark, _mk_messages(5)))
    assert pubsub.subscribe(topic).count() == 15


def test_publish_subscribe_in_order_per_key(pubsub, spark):
    """Per-key order (`test_pubsub.go:405-481` uses payload=i%16 keys).

    Micro-batch ordering contract: within a topic, messages carry a
    monotone sequence (publish order); consumers observe per-key order by
    sorting on it — the same guarantee a partition-keyed Kafka topic gives.
    """
    topic = f"ord-{_uuid.uuid4().hex[:8]}"
    msgs = _mk_messages(64, key_mod=8)
    pubsub.publish(topic, messages_df(spark, msgs))
    rows = pubsub.subscribe(topic).collect()
    by_key: dict[str, list[int]] = {}
    for r in sorted(rows, key=lambda r: int(r["metadata"]["n"])):
        by_key.setdefault(r["metadata"]["key"], []).append(int(r["metadata"]["n"]))
    for seq in by_key.values():
        assert seq == sorted(seq)


def test_bulk_read_with_dedup(pubsub, spark):
    """BulkReadWithDeduplication analog (`message/subscriber/read.go:31-53`)."""
    topic = f"bulk-{_uuid.uuid4().hex[:8]}"
    msgs = _mk_messages(10)
    pubsub.publish(topic, messages_df(spark, msgs))
    pubsub.publish(topic, messages_df(spark, msgs))  # duplicate delivery
    df = pubsub.subscribe(topic)
    assert df.count() == 20
    assert df.dropDuplicates(["uuid"]).count() == 10


def test_subscribe_initialize(pubsub, spark):
    topic = f"init-{_uuid.uuid4().hex[:8]}"
    pubsub.subscribe_initialize(topic)
    assert pubsub.subscribe(topic).count() == 0


def test_nonpersistent_memory_drains(spark):
    """GoChannel without persistence: subscribe drains
    (`pubsub/gochannel/pubsub.go:20-24`)."""
    ps = MemoryPubSub(spark, persistent=False)
    ps.publish("d", messages_df(spark, _mk_messages(4)))
    assert ps.subscribe("d").count() == 4
    assert ps.subscribe("d").count() == 0


def test_parquet_topic_compaction(spark, tmp_path):
    """Small-files maintenance: N micro-batch publishes -> N files; compact()
    consolidates without changing topic contents (uuid set + payloads)."""
    from watermill_spark.sources import ParquetPubSub

    ps = ParquetPubSub(spark, str(tmp_path / "topics"))
    t = "compactme"
    for b in range(6):
        ps.publish(t, messages_df(spark, [new_message(f"p{b}-{i}") for i in range(5)]))
    before = ps.topic_file_stats(t)
    assert before["n_files"] >= 6
    uuids_before = {r["uuid"] for r in ps.subscribe(t).collect()}

    stats = ps.compact(t, target_files=1)
    assert stats["after"] <= 2  # 1 data file (+ possible empty-partition file)
    after = ps.topic_file_stats(t)
    assert after["n_files"] == stats["after"]
    rows = ps.subscribe(t).collect()
    assert {r["uuid"] for r in rows} == uuids_before
    assert len(rows) == 30
    # idempotent when already compact
    assert ps.compact(t, target_files=stats["after"])["after"] == stats["after"]


def test_publisher_close_backlog_no_loss(pubsub, spark):
    """TestPublisherClose (`test_pubsub.go:845-870`): publish a 10k-message
    backlog in several batches, close the publisher, and a subscriber still
    reads every message exactly once (close flushes, never drops)."""
    topic = f"close-{_uuid.uuid4().hex[:8]}"
    total = 10_000
    for lo in range(0, total, 2_500):
        batch = [
            new_message(payload=f"p-{i}", metadata={"n": str(i)})
            for i in range(lo, lo + 2_500)
        ]
        pubsub.publish(topic, messages_df(spark, batch))
    pubsub.close()
    df = pubsub.subscribe(topic)
    assert df.count() == total
    assert df.dropDuplicates(["uuid"]).count() == total
    # and the publisher really is closed
    with pytest.raises(Exception):
        pubsub.publish(topic, messages_df(spark, _mk_messages(1)))


def test_concurrent_publish_thread_safe(pubsub, spark):
    """Publisher must be thread-safe (`message/pubsub.go:13-18`): 8 threads
    publishing concurrently to one topic; all messages land, none mangled."""
    import threading

    topic = f"conc-{_uuid.uuid4().hex[:8]}"
    n_threads, per_thread = 8, 50
    errors: list[Exception] = []

    def worker(t: int) -> None:
        try:
            batch = [
                new_message(payload=f"t{t}-m{i}", metadata={"t": str(t)})
                for i in range(per_thread)
            ]
            pubsub.publish(topic, messages_df(spark, batch))
        except Exception as exc:  # pragma: no cover - failure path
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    rows = pubsub.subscribe(topic).collect()
    assert len(rows) == n_threads * per_thread
    payloads = {bytes(r["payload"]).decode() for r in rows}
    assert payloads == {
        f"t{t}-m{i}" for t in range(n_threads) for i in range(per_thread)
    }


def test_continue_after_errors(pubsub, spark):
    """TestContinueAfterErrors (`test_pubsub.go:755`): a consumer that fails
    mid-processing and re-subscribes still sees the full backlog — the
    micro-batch analog of nack-then-redeliver (persistent source + replay)."""
    topic = f"err-{_uuid.uuid4().hex[:8]}"
    msgs = _mk_messages(100)
    pubsub.publish(topic, messages_df(spark, msgs))

    for _attempt in range(3):  # three failed consumers, each aborts mid-read
        df = pubsub.subscribe(topic)
        seen = 0
        try:
            for r in df.collect():
                seen += 1
                if seen >= 10:
                    raise RuntimeError("consumer crashed")
        except RuntimeError:
            pass

    got = {r["uuid"] for r in pubsub.subscribe(topic).collect()}
    assert got == {m["uuid"] for m in msgs}


def test_kafka_routed_publish_and_wire_fidelity(spark):
    """Per-row topic routing through the real `_to_kafka_shape` plan
    (`kafka.py:publish_routed`) and uuid/metadata round-trip through the
    Kafka wire shape (headers array<struct> ↔ metadata map, key ↔ uuid)."""
    from pyspark.sql import functions as F

    from watermill_spark.sources.kafka_testing import FakeKafkaPubSub

    ks = FakeKafkaPubSub(spark)
    msgs = [
        new_message(payload=f"p{i}", metadata={"n": str(i), "route": f"t{i % 2}"})
        for i in range(6)
    ]
    df = messages_df(spark, msgs).withColumn(
        "topic", F.concat(F.lit("routed-"), F.col("metadata")["route"])
    )
    ks.publish_routed(df)
    a, b = ks.subscribe("routed-t0"), ks.subscribe("routed-t1")
    assert a.count() == 3 and b.count() == 3
    got = {r["uuid"]: r for r in a.unionByName(b).collect()}
    assert set(got) == {m["uuid"] for m in msgs}
    for m in msgs:
        r = got[m["uuid"]]
        assert bytes(r["payload"]).decode() == f"p{m['metadata']['n']}"
        assert dict(r["metadata"]) == m["metadata"]
    # multi-topic subscribe (FanIn-native comma list)
    assert ks.subscribe("routed-t0,routed-t1").count() == 6


def test_kafka_keyed_partition_order(spark):
    """Records with the same key land on one partition in append order —
    the per-key ordering guarantee a keyed Kafka topic provides."""
    from watermill_spark.sources.kafka_testing import InMemoryKafkaBroker

    br = InMemoryKafkaBroker(n_partitions=4)
    for i in range(20):
        br.append("t", f"k{i % 3}".encode(), str(i).encode(), None)
    by_part = {}
    for rec in br.fetch(["t"]):
        by_part.setdefault(rec["partition"], []).append(int(rec["value"]))
    # same key -> same partition, offsets preserve publish order
    key_parts = {}
    for rec in br.fetch(["t"]):
        k = bytes(rec["key"]).decode()
        key_parts.setdefault(k, set()).add(rec["partition"])
    assert all(len(ps) == 1 for ps in key_parts.values())
    for vals in by_part.values():
        assert vals == sorted(vals)

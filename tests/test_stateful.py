"""applyInPandasWithState delayed-delivery operator."""

from __future__ import annotations

import time
import uuid as _uuid

import pytest
from pyspark.sql import functions as F

from watermill_spark.components import delay_for
from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming.stateful import delayed_release


@pytest.fixture
def ps(spark, tmp_path):
    return ParquetPubSub(spark, str(tmp_path / "topics"))


def test_delayed_release_parks_then_delivers(ps, spark, tmp_path):
    tin = f"in-{_uuid.uuid4().hex[:6]}"
    # 2 immediate + 2 delayed by 6 seconds
    ps.publish(tin, messages_df(spark, [new_message(f"now-{i}") for i in range(2)]))
    ps.publish(tin, delay_for(messages_df(spark, [new_message(f"later-{i}") for i in range(2)]), 6))

    released = []
    q = (
        delayed_release(ps.subscribe_stream(tin))
        .writeStream.foreachBatch(lambda bdf, _i: released.extend(
            bytes(r["payload"]).decode() for r in bdf.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 15
        while time.time() < deadline and sum(p.startswith("now") for p in released) < 2:
            time.sleep(0.5)
        immediate = sorted(p for p in released if p.startswith("now"))
        assert immediate == ["now-0", "now-1"]
        held_early = [p for p in released if p.startswith("later")]
        assert len(held_early) <= 2  # delayed ones may not be out yet...

        # ...but they must arrive once the delay expires, with NO new input
        deadline = time.time() + 30
        while time.time() < deadline and sum(p.startswith("later") for p in released) < 2:
            time.sleep(0.5)
        assert sorted(p for p in released if p.startswith("later")) == [
            "later-0",
            "later-1",
        ]
    finally:
        q.stop()


def test_running_counter_accumulates_across_batches(ps, spark, tmp_path):
    """Per-key running counter (applyInPandasWithState, NoTimeout): state
    carries totals across micro-batches; maxFilesPerTrigger=1 forces multiple
    batches so accumulation is actually exercised."""
    from watermill_spark.message import messages_df, new_message
    from watermill_spark.streaming.stateful import running_counter

    t = f"cnt-{_uuid.uuid4().hex[:6]}"
    # three publishes -> three parquet files -> three micro-batches
    for batch in range(3):
        ps.publish(
            t,
            messages_df(
                spark,
                [new_message(f"p{batch}-{i}", metadata={"k": str(i % 2)}) for i in range(4)],
            ),
        )
    stream = (
        spark.readStream.schema(ps.subscribe(t).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(ps._dir(t))
    )
    counted = running_counter(
        stream.withColumn("key", F.element_at("metadata", "k")), "key"
    )
    out = str(tmp_path / "counts")
    q = (
        counted.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    per_key_max = {}
    for r in rows:
        per_key_max[r["key"]] = max(per_key_max.get(r["key"], 0), r["running_count"])
    # 3 batches x 4 msgs, k alternates 0/1 -> 6 per key
    assert per_key_max == {"0": 6, "1": 6}
    assert sum(r["batch_count"] for r in rows) == 12

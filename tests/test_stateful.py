"""applyInPandasWithState delayed-delivery operator."""

from __future__ import annotations

import time
import uuid as _uuid

import pytest

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

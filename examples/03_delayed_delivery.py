"""Example 3 — delayed message delivery, batch and streaming.

The port's answer to `_examples/real-world-examples/delayed-messages` /
`delayed-requeue` (reference `components/delay`): a publisher stamps
`_watermill_delayed_until` metadata (never sleeps), and delivery honors it
two ways:

1. batch: `deliverable_now` filters to expired-delay messages only;
2. streaming: `delayed_release` parks not-yet-due messages in the state
   store (applyInPandasWithState + processing-time timers) and re-emits
   them when due, with NO new input required.

Run:  python examples/03_delayed_delivery.py
"""

from __future__ import annotations

import tempfile
import time

from watermill_spark.components.delay import (
    DelayPublisher,
    deliverable_now,
)
from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming.stateful import delayed_release


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-delayed")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example3-")
    ps = ParquetPubSub(spark, base_dir)

    # 1. two immediate messages, two delayed by 5s (metadata-only delay)
    ps.publish("notifications", messages_df(
        spark, [new_message(f"now-{i}") for i in range(2)]))
    delayed_pub = DelayPublisher(ps, default_delay_sec=5)
    delayed_pub.publish("notifications", messages_df(
        spark, [new_message(f"later-{i}") for i in range(2)]))

    # 2. batch consumer: only expired-delay messages are deliverable
    ready = deliverable_now(ps.subscribe("notifications"))
    n_ready = ready.count()

    # 3. streaming consumer: the delayed pair is parked, then released by
    # the state-store timer once its delay passes — no new input needed
    released: list[str] = []
    ckpt = tempfile.mkdtemp(prefix="wm-example3-ckpt-")
    q = (
        delayed_release(ps.subscribe_stream("notifications"))
        .writeStream.foreachBatch(
            lambda bdf, _i: released.extend(
                bytes(r["payload"]).decode() for r in bdf.collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 45
        while time.time() < deadline and len(released) < 4:
            time.sleep(0.5)
    finally:
        q.stop()

    result = {
        "deliverable_immediately": n_ready,
        "released_total": len(released),
        "released_late": sorted(p for p in released if p.startswith("later")),
    }
    print(f"delayed delivery example: {result}")
    assert result["deliverable_immediately"] == 2, result
    assert result["released_total"] == 4, result
    assert result["released_late"] == ["later-0", "later-1"], result
    return result


if __name__ == "__main__":
    main()

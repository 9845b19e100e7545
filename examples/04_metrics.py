"""Example 4 — Router metrics with a Prometheus-style exposition.

The port's answer to `_examples/basic/4-metrics` (reference: a router
whose middleware exports Prometheus counters scraped over HTTP): a
RouterMetricsListener rides Spark's StreamingQueryListener bus while a
router processes a topic, then the collected counters render through
`prometheus_text` — the exposition-format bridge a scraper would read
from `serve_metrics_http`.

Run:  python examples/04_metrics.py
"""

from __future__ import annotations

import tempfile
import time
import uuid as _uuid

from watermill_spark.message import messages_df, new_message
from watermill_spark.observability import (
    RouterMetricsListener,
    prometheus_text,
)
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming import Router
from watermill_spark.streaming.router import passthrough_handler


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-metrics")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example4-")
    ps = ParquetPubSub(spark, base_dir + "/topics")

    tin = f"in-{_uuid.uuid4().hex[:6]}"
    tout = f"out-{_uuid.uuid4().hex[:6]}"
    ps.publish(
        tin, messages_df(spark, [new_message(f"m{i}") for i in range(40)])
    )

    listener = RouterMetricsListener()
    spark.streams.addListener(listener)
    try:
        r = Router()
        r.add_handler("meter_me", tin, ps, tout, ps, passthrough_handler)
        r.run_stream(base_dir + "/ckpt", available_now=True)
        r.await_termination()
        # listener delivery is async and the availableNow run may split into
        # several micro-batches — wait until the counter reaches the expected
        # total, or stabilizes across consecutive polls (not merely non-empty)
        expected = 40
        deadline = time.time() + 30
        prev, stable = -1, 0
        while time.time() < deadline:
            total = listener.snapshot()["messages_total"]
            if total >= expected:
                break
            stable = stable + 1 if total == prev and total > 0 else 0
            if stable >= 5:  # ~1s with no new progress events: drained
                break
            prev = total
            time.sleep(0.2)
        snap = listener.snapshot()
        text = prometheus_text(listener)
    finally:
        spark.streams.removeListener(listener)

    print(text)
    return {
        "messages_total": snap["messages_total"],
        "exposition_has_counter": "watermill_messages_received_total" in text,
    }


if __name__ == "__main__":
    out = main()
    print(out)

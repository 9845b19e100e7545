"""Example 1 — Router + middleware onion + dead-letter queue, end to end.

The port's answer to `_examples/basic/3-router` (reference: a Router wiring
handlers with middleware over the GoChannel Pub/Sub) plus the poison-queue
pattern: messages flow source topic -> handler (which rejects some) ->
output topic, with rejects routed to a DLQ topic and then drained back via
the Requeuer (`tools/pq` flow).

Run:  python examples/01_router_dlq.py
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from watermill_spark.components.requeuer import Requeuer
from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming import Router
from watermill_spark.streaming.middleware import (
    correlation_id,
    fail_rows,
    poison_queue,
    retry,
)


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-router-dlq")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example1-")
    ps = ParquetPubSub(spark, base_dir)

    # 1. publish 10 orders; 3 of them are malformed (negative quantity)
    orders = [new_message(f"qty={q}", uuid=f"order-{i}")
              for i, q in enumerate([5, 3, -1, 8, -2, 7, 1, -9, 4, 6])]
    ps.publish("orders", messages_df(spark, orders))

    # 2. handler: uppercase the payload; malformed rows error out
    def handler(df):
        return df.withColumn("payload", F.upper(F.col("payload").cast("string")).cast("binary"))

    router = Router()
    router.add_handler(
        "process-orders",
        "orders", ps,           # subscribe
        "orders-processed", ps,  # publish
        handler,
        middleware=[
            correlation_id,                       # ensure correlation ids
            retry(max_retries=2),                 # transient retry (no-op here)
            poison_queue(ps, "orders-poison"),    # reject -> DLQ, rest flow on
            fail_rows(
                F.col("payload").cast("string").contains("-"),
                "negative quantity",
            ),
        ],
    )
    router.run_once()

    processed = ps.subscribe("orders-processed")
    poisoned = ps.subscribe("orders-poison")
    n_ok, n_dlq = processed.count(), poisoned.count()

    # 3. operator drains the DLQ back to the source topic (pq requeue analog)
    Requeuer(ps, ps, "orders-poison").run_once()
    n_requeued = (
        ps.subscribe("orders")
        .filter(F.element_at(F.col("metadata"), "_watermill_requeuer_retries").isNotNull())
        .count()
    )

    result = {"processed": n_ok, "poisoned": n_dlq, "requeued": n_requeued}
    print(f"router+DLQ example: {result}")
    assert result == {"processed": 7, "poisoned": 3, "requeued": 3}, result
    return result


if __name__ == "__main__":
    main()

"""Example 7 — Forwarder + envelope: the transactional-outbox pattern.

The port's answer to `components/forwarder` (reference:
`components/forwarder/envelope.go:43-75` wraps a message plus its
destination topic into a JSON envelope; `forwarder.go:67-140` subscribes to
the single forwarder topic, unwraps, and publishes each message to its
embedded destination). A service thus commits business data and its
outgoing messages to ONE store (the outbox), and the forwarder moves them
to the real broker afterwards — no dual-write inconsistency.

Spark shape: wrap = `to_json(struct(destination, uuid, payload_b64,
metadata))`; the forwarder unwraps with `from_json` and routes per row —
natively on Kafka (`publish_routed`), per-distinct-destination on dir
transports (the destination *list* is small even when data is huge).

Run:  python examples/07_forwarder_outbox.py
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from watermill_spark.components.forwarder import Forwarder, envelope_wrap
from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-forwarder")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example7-")
    ps = ParquetPubSub(spark, base_dir)

    # 1. the service emits order events for three regions; inside its local
    #    transaction it writes them ALL to one outbox topic, each wrapped in
    #    an envelope whose destination is derived per row
    orders = [
        new_message(f"order-{i}", metadata={"region": region})
        for i, region in enumerate(
            ["eu", "us", "eu", "apac", "us", "eu", "apac", "us"]
        )
    ]
    df = messages_df(spark, orders)
    wrapped = envelope_wrap(
        df, F.concat(F.lit("orders-"), F.element_at("metadata", "region"))
    )
    ps.publish("outbox", wrapped)

    # 2. the forwarder (a separate process in production) drains the outbox
    #    and publishes every message to its embedded destination topic
    Forwarder(ps, ps, "outbox").run_once()

    # 3. each regional topic received exactly its own messages, with uuid,
    #    payload, and metadata intact through the envelope round-trip
    out = {}
    for region in ("eu", "us", "apac"):
        rows = ps.subscribe(f"orders-{region}").collect()
        assert all(dict(r["metadata"])["region"] == region for r in rows)
        out[f"orders_{region}"] = len(rows)
    out["outbox_total"] = ps.subscribe("outbox").count()
    return out  # {'orders_eu': 3, 'orders_us': 3, 'orders_apac': 2, 'outbox_total': 8}


if __name__ == "__main__":
    print(main())

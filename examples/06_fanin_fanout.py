"""Example 6 — FanIn (N topics → 1) and FanOut (1 topic → N subscribers).

The port's answer to `components/fanin` (reference:
`components/fanin/fanin.go:61-110`, merge several source topics into one
target) and `pubsub/gochannel/fanout.go:36-91` (one external subscription
multiplied to N in-process subscribers).

Spark shapes: FanIn is a zero-shuffle `unionByName` over the source topics;
FanOut is N independent reads of the same persistent topic — DataFrame
immutability makes the reference's copy-per-subscriber free, and each
subscription may live on a *different* transport.

Run:  python examples/06_fanin_fanout.py
"""

from __future__ import annotations

import tempfile

from watermill_spark.components.fan import FanIn, FanOut
from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import MemoryPubSub, ParquetPubSub


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-fanin-fanout")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example6-")
    ps = ParquetPubSub(spark, base_dir)

    # 1. three per-source topics, as an ingest tier would produce them
    sources = {"clicks": 5, "purchases": 3, "refunds": 2}
    for topic, n in sources.items():
        ps.publish(
            topic,
            messages_df(
                spark,
                [new_message(f"{topic}-{i}", metadata={"src": topic}) for i in range(n)],
            ),
        )

    # 2. FanIn: merge them onto one stream topic (fanin.go's SourceTopics ->
    #    TargetTopic contract, validation included)
    fanin = FanIn(ps, ps, list(sources), "all-events")
    fanin.run_once()
    merged = ps.subscribe("all-events")

    # 3. FanOut: the merged topic feeds two independent subscribers on two
    #    different transports — a parquet audit trail and an in-memory
    #    analytics feed (fanout.go AddSubscription analog)
    mem = MemoryPubSub(spark)
    fanout = FanOut(ps, "all-events")
    fanout.add_subscription(ps, "audit-trail")
    fanout.add_subscription(mem, "analytics-feed")
    fanout.run_once()

    audit = ps.subscribe("audit-trail")
    feed = mem.subscribe("analytics-feed")
    per_source = {
        r["src"]: r["n"]
        for r in merged.selectExpr("element_at(metadata, 'src') AS src")
        .groupBy("src")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    return {
        "merged_total": merged.count(),  # 10
        "per_source": per_source,  # {'clicks': 5, 'purchases': 3, 'refunds': 2}
        "audit_total": audit.count(),  # 10 — full copy, parquet transport
        "feed_total": feed.count(),  # 10 — full copy, memory transport
    }


if __name__ == "__main__":
    print(main())

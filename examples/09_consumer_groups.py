"""Example 9 — Consumer groups: independent services, shared cursors,
crash-replay.

Reference analog: `_examples/real-world-examples/consumer-groups/` — a
`user_signed_up` stream consumed by two services (crm-service,
newsletter-service), each its own consumer group: every GROUP sees every
event once, while REPLICAS inside a group share one cursor. The reference
runs it on Redis streams; here the group/offset machinery is the
SQLitePubSub offsets table (the watermill-sql offsets-adapter shape), and
Spark processes each polled batch as a DataFrame.

Also shown: redelivery — a replica that crashes before acking its batch
leaves the cursor untouched, so the next poll (any replica) gets the same
messages again (at-least-once within a group).

Run:  python examples/09_consumer_groups.py
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import SQLitePubSub

TOPIC = "user_signed_up"


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-consumer-groups")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example9-")
    ps = SQLitePubSub(spark, f"{base_dir}/broker.sqlite3")

    # 1. the signup service publishes 12 events (UserSignedUp with consents,
    #    `consumer-groups/common/events.go:3-11`)
    events = [
        new_message(
            json.dumps({"id": f"user-{i}", "consents": {"news": i % 3 != 0}}),
            metadata={"seq": str(i)},
        )
        for i in range(12)
    ]
    ps.publish(TOPIC, messages_df(spark, events))

    # 2. crm-service (group "crm") consumes everything in one poll
    crm_df, crm_off = ps.subscribe_group(TOPIC, "crm")
    crm_seen = crm_df.count()
    ps.ack(TOPIC, "crm", crm_off)

    # 3. newsletter-service (group "newsletter") — replica 1 polls a page of
    #    6 but CRASHES before acking: the cursor stays put
    page1, off1 = ps.subscribe_group(TOPIC, "newsletter", limit=6)
    replica1_saw = page1.count()  # ...then the process dies: no ack

    # 4. replica 2 of the SAME group polls: it re-receives the exact same
    #    unacked page (redelivery), processes it — only users with news
    #    consent get the newsletter — and acks
    page1_again, off1b = ps.subscribe_group(TOPIC, "newsletter", limit=6)
    assert off1b == off1
    subscribed_1 = (
        page1_again.withColumn(
            "consent",
            F.get_json_object(F.col("payload").cast("string"), "$.consents.news"),
        )
        .filter(F.col("consent") == "true")
        .count()
    )
    ps.ack(TOPIC, "newsletter", off1b)

    # 5. replica 2 keeps polling: the shared cursor hands it the REST, not a
    #    duplicate of what the group already acked
    page2, off2 = ps.subscribe_group(TOPIC, "newsletter")
    subscribed_2 = (
        page2.withColumn(
            "consent",
            F.get_json_object(F.col("payload").cast("string"), "$.consents.news"),
        )
        .filter(F.col("consent") == "true")
        .count()
    )
    newsletter_seen = page1_again.count() + page2.count()
    ps.ack(TOPIC, "newsletter", off2)

    # both groups saw every event exactly once (post-ack); group cursors are
    # independent; i%3!=0 consent ⇒ 8 of 12 subscribed
    out = {
        "crm_seen": crm_seen,
        "newsletter_seen": newsletter_seen,
        "redelivered_page": replica1_saw,
        "newsletter_subscribed": subscribed_1 + subscribed_2,
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()

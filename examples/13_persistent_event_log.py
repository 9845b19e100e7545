"""Example 13 — Persistent event log: proxy a volatile Pub/Sub into SQL.

Reference analog: `_examples/real-world-examples/persistent-event-log/` —
a Router bridges a broker with no storage (Google Cloud Pub/Sub there;
the in-memory GoChannel analog here) into the SQL publisher, so every
event lands in a durable `watermill_events` table (offset, uuid,
created_at, payload, metadata) that can be audited and replayed later
(`main.go:46-66`, README: "When an SQL database makes a great Pub/Sub").

Port shape: MemoryPubSub → Router handler (validates the JSON payload,
stamps `logged_at`) → SQLitePubSub publisher. Durability is then proven the
way an operator would: reopen the database file in a NEW transport instance
("process restart") and (a) audit the log with a Spark aggregation, (b)
replay it from offset 0 into a projection. The log table is the
reference's exact schema shape, so `SELECT * FROM watermill_events` gives
the same audit view as the reference README's MySQL query.

Run:  python examples/13_persistent_event_log.py
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from watermill_spark.message import messages_df, new_message, with_metadata
from watermill_spark.sources import MemoryPubSub, SQLitePubSub
from watermill_spark.streaming.middleware import recoverer
from watermill_spark.streaming.router import Router

VOLATILE_TOPIC = "events"
LOG_TOPIC = "events"  # becomes table watermill_events


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-persistent-event-log")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example13-")
    db_path = f"{base_dir}/eventlog.sqlite3"

    volatile = MemoryPubSub(spark)  # no durable storage, like GCP Pub/Sub
    eventlog = SQLitePubSub(spark, db_path)

    # 1. upstream services emit 10 domain events onto the volatile broker
    events = [
        new_message(
            json.dumps({"name": "UserSignedUp" if i % 2 else "OrderPlaced",
                        "occurred_at": f"2026-08-15T10:00:{i:02d}Z"}),
            metadata={"seq": str(i)},
        )
        for i in range(10)
    ]
    volatile.publish(VOLATILE_TOPIC, messages_df(spark, events))

    # 2. the proxy router: volatile in, SQL out (persistent-event-log
    #    main.go:46-66) — the handler validates and stamps ingestion metadata
    router = Router()
    router.add_middleware(recoverer())
    router.add_handler(
        "volatile-to-sql",
        VOLATILE_TOPIC, volatile,
        LOG_TOPIC, eventlog,
        lambda df: with_metadata(df, logged_by="volatile-to-sql"),
    )
    router.run_once()
    eventlog.dispose()  # "process exits"

    # 3. a different process later reopens the LOG file: full audit view
    reopened = SQLitePubSub(spark, db_path)
    log_df = reopened.subscribe(LOG_TOPIC)
    audit = (
        log_df.withColumn(
            "name",
            F.get_json_object(F.col("payload").cast("string"), "$.name"),
        )
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_name = {r["name"]: r["n"] for r in audit}

    # 4. replay: a brand-new consumer group walks the log from offset 0 and
    #    rebuilds a projection — the "reply selected messages again in the
    #    future" use case from the reference README
    replayed = 0
    projection: dict[str, int] = {}
    while True:
        batch, off = reopened.subscribe_group(LOG_TOPIC, "projection-rebuild", limit=4)
        rows = batch.collect()
        if not rows:
            break
        for r in rows:
            name = json.loads(bytes(r["payload"]))["name"]
            projection[name] = projection.get(name, 0) + 1
        replayed += len(rows)
        reopened.ack(LOG_TOPIC, "projection-rebuild", off)

    out = {
        "logged": log_df.count(),
        "audit_by_name": dict(sorted(by_name.items())),
        "replayed": replayed,
        "projection_matches_audit": projection == by_name,
        "all_stamped": log_df.filter(
            F.element_at("metadata", "logged_by") == "volatile-to-sql"
        ).count(),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()

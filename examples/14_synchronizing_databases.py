"""Example 14 — Synchronizing databases: continuous schema-mapped
replication between two SQL stores through the Router.

Reference analog: `_examples/real-world-examples/synchronizing-databases/` —
a Router subscribes to a MySQL-backed topic (every inserted row = one
message), a handler re-shapes `mysqlUser{ID, User, FirstName, LastName}`
into `postgresUser{ID, Username, FullName}` (`main.go:46-80`), and the SQL
publisher inserts into Postgres — one-directional sync with the broker
machinery doing delivery, ordering, and resume.

Port shape: two independent SQLitePubSub stores (origin, replica). A
GroupSubscriber gives the sync handler a durable cursor on the origin, so
each `run_once` pass replicates only NEW rows (and a crash before commit
replays — at-least-once; the uuid column makes the replica dedupable). The
schema mapping runs as DataFrame JSON transforms, not per-row decode: at
scale this same handler replicates partition-parallel.

Run:  python examples/14_synchronizing_databases.py
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import GroupSubscriber, SQLitePubSub
from watermill_spark.streaming.middleware import recoverer
from watermill_spark.streaming.router import Router

TOPIC = "users"


def _insert_users(origin: SQLitePubSub, spark, lo: int, hi: int) -> None:
    """Upstream writes: each new user row doubles as a message on the
    origin's `users` topic (the SQL-subscriber view of a table)."""
    origin.publish(
        TOPIC,
        messages_df(
            spark,
            [
                new_message(
                    json.dumps(
                        {"id": i, "user": f"u{i}",
                         "first_name": f"First{i}", "last_name": f"Last{i}"}
                    )
                )
                for i in range(lo, hi)
            ],
        ),
    )


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-sync-databases")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example14-")
    origin = SQLitePubSub(spark, f"{base_dir}/origin.sqlite3")
    replica = SQLitePubSub(spark, f"{base_dir}/replica.sqlite3")

    def remap(df):
        """mysqlUser → postgresUser, vectorized (main.go:52-69)."""
        src = F.col("payload").cast("string")
        return df.withColumn(
            "payload",
            F.to_binary(
                F.to_json(
                    F.struct(
                        F.get_json_object(src, "$.id").cast("bigint").alias("id"),
                        F.get_json_object(src, "$.user").alias("username"),
                        F.concat_ws(
                            " ",
                            F.get_json_object(src, "$.first_name"),
                            F.get_json_object(src, "$.last_name"),
                        ).alias("full_name"),
                    )
                ),
                F.lit("utf-8"),
            ),
        )

    router = Router()
    router.add_middleware(recoverer())
    router.add_handler(
        "origin-to-replica",
        TOPIC, GroupSubscriber(origin, "db-sync"),
        TOPIC, replica,
        remap,
    )

    # pass 1: initial backlog
    _insert_users(origin, spark, 0, 6)
    router.run_once()
    after_first = replica.subscribe(TOPIC).count()

    # pass 2: only the delta crosses (cursor-resumed)
    _insert_users(origin, spark, 6, 10)
    router.run_once()
    # pass 3: nothing new -> nothing replicated twice
    router.run_once()

    rows = replica.subscribe(TOPIC).collect()
    users = sorted(
        (json.loads(bytes(r["payload"])) for r in rows if r["payload"]),
        key=lambda u: u["id"],
    )
    out = {
        "replicated_first_pass": after_first,
        "replicated_total": len(rows),
        "distinct_ids": len({u["id"] for u in users}),
        "sample": users[0],
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()

"""Example 10 — Transactional events: business write + event publish in ONE
database transaction, drained to the broker exactly once.

Reference analog: `_examples/real-world-examples/transactional-events/` and
`transactional-events-forwarder/` — the service never dual-writes: it
commits the business row AND the outgoing event to the same SQL database
atomically (`_examples/pubsubs/sqlite/transaction.go:13-40` publishes inside
a caller-owned tx); a separate forwarder process moves outbox events to the
real broker. If the business tx rolls back, the event was never published.

Port shape: SQLitePubSub.transaction() is the outbox write;
the forwarder pass = subscribe_group("outbox", "forwarder") → envelope_unwrap
→ publish to the destination ParquetPubSub topic → ack, so a forwarder crash
before ack replays (at-least-once into the broker) and an acked batch is
never forwarded again — pair it with an idempotent/uuid-dedup sink for
end-to-end exactly-once (example 05).

Run:  python examples/10_transactional_events.py
"""

from __future__ import annotations

import json
import tempfile

from watermill_spark.components.forwarder import envelope_unwrap, envelope_wrap
from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub, SQLitePubSub

OUTBOX = "outbox"


def _signup(ps: SQLitePubSub, spark, user_id: str, fail: bool = False) -> bool:
    """One business operation: INSERT the user + publish UserSignedUp,
    atomically. `fail=True` simulates a business-rule abort AFTER the
    publish statement ran — the rollback must take the event with it."""
    try:
        with ps.transaction() as tx:
            tx.execute("CREATE TABLE IF NOT EXISTS users (id TEXT PRIMARY KEY)")
            tx.execute("INSERT INTO users (id) VALUES (?)", (user_id,))
            event = new_message(
                json.dumps({"event": "UserSignedUp", "user_id": user_id}),
                metadata={"user": user_id},
            )
            tx.publish(
                OUTBOX,
                envelope_wrap(messages_df(ps.spark, [event]), "user-events"),
            )
            if fail:
                raise RuntimeError("business validation failed")
        return True
    except RuntimeError:
        return False


def _forward_once(ps: SQLitePubSub, broker: ParquetPubSub) -> int:
    """One forwarder pass: outbox → broker, cursor-acked."""
    batch, max_off = ps.subscribe_group(OUTBOX, "forwarder")
    n = batch.count()
    if n:
        unwrapped = envelope_unwrap(batch).localCheckpoint(eager=True)
        for row in unwrapped.select("topic").distinct().collect():
            broker.publish(
                row["topic"], unwrapped.filter(unwrapped.topic == row["topic"])
            )
        ps.ack(OUTBOX, "forwarder", max_off)
    return n


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-transactional-events")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example10-")
    ps = SQLitePubSub(spark, f"{base_dir}/service.sqlite3")
    broker = ParquetPubSub(spark, f"{base_dir}/topics")

    committed = sum(_signup(ps, spark, f"user-{i}") for i in range(3))
    aborted = _signup(ps, spark, "user-bad", fail=True)  # rolls back

    forwarded = _forward_once(ps, broker)
    forwarded_again = _forward_once(ps, broker)  # cursor advanced: nothing

    with ps.transaction() as tx:
        users = tx.execute("SELECT COUNT(*) FROM users").fetchone()[0]

    out = {
        "committed_signups": committed,
        "aborted_signup_published": aborted,  # False: rollback ate the event
        "users_rows": users,
        "forwarded": forwarded,
        "forwarded_on_second_pass": forwarded_again,
        "broker_events": broker.subscribe("user-events").count(),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()

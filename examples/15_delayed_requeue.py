"""Example 15 — Delayed requeue: failed messages retry later with backoff,
not immediately.

Reference analog: `_examples/real-world-examples/delayed-requeue/` — the
SQL DelayedRequeuer (`main.go:40-52`) pairs `middleware.DelayOnError`
(exponential backoff stamped as delay metadata) with a SQL-backed requeue
topic; because the SQL Pub/Subs honor `_watermill_delayed_until` on READ,
a failed message becomes invisible until its backoff expires, then the
requeuer moves it back to the origin topic for another attempt.

Port shape, same three pieces:
- `fail_rows` marks the transient failures (a card decline on first
  attempt), `delay_on_error(base_sec=10)` stamps the backoff,
  `poison_queue` routes them to the `requeue` topic — all on one Router
  handler consuming via a GroupSubscriber cursor;
- the SQL transport's hold-back makes the requeue topic EMPTY to readers
  until the delay passes (the early requeuer pass moves nothing);
- after expiry the Requeuer routes each message back to the topic it was
  poisoned on (metadata), retries+1; the second router pass succeeds.

The delay is metadata-only — no sleeping consumer, no blocked partition:
at any scale the backoff costs one filtered scan, which is why this layout
survives a million queued retries where a sleep-per-message worker cannot.

Run:  python examples/15_delayed_requeue.py   (~12 s: one real backoff wait)
"""

from __future__ import annotations

import json
import tempfile
import time

from pyspark.sql import functions as F

from watermill_spark.components.requeuer import Requeuer
from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import GroupSubscriber, SQLitePubSub
from watermill_spark.streaming.middleware import (
    REQUEUER_RETRIES,
    delay_on_error,
    fail_rows,
    poison_queue,
    recoverer,
)
from watermill_spark.streaming.router import Router, RouterConfig

PAYMENTS = "payments"
REQUEUE = "requeue"
BACKOFF_SEC = 10


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-delayed-requeue")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example15-")
    ps = SQLitePubSub(spark, f"{base_dir}/broker.sqlite3")

    payments = [
        new_message(json.dumps({"amount": 10 * (i + 1),
                                "card": "declined" if i in (1, 4) else "ok"}))
        for i in range(6)
    ]
    ps.publish(PAYMENTS, messages_df(spark, payments))

    # transient failure: declines fail on the FIRST attempt only
    first_attempt_decline = (
        F.get_json_object(F.col("payload").cast("string"), "$.card") == "declined"
    ) & F.element_at(F.col("metadata"), REQUEUER_RETRIES).isNull()

    router = Router(RouterConfig(fail_on_unhandled_errors=False))
    router.add_middleware(recoverer())
    router.add_handler(
        "charge",
        PAYMENTS, GroupSubscriber(ps, "charger"),
        "payments_processed", ps,
        lambda df: df,
        middleware=[
            poison_queue(ps, REQUEUE),                    # outermost: route fails
            delay_on_error(base_sec=BACKOFF_SEC),         # stamp the backoff
            fail_rows(first_attempt_decline, "card declined (transient)"),
        ],
    )

    router.run_once()
    processed_first = ps.topic_count("payments_processed")

    # requeuer with its own cursor on the requeue topic
    requeue_sub = GroupSubscriber(ps, "requeuer")
    requeuer = Requeuer(requeue_sub, ps, REQUEUE)

    # too early: the backoff hasn't expired, the SQL read holds the rows back
    requeuer.run_once()
    requeue_sub.commit(REQUEUE)
    early_backlog = ps.subscribe_group(PAYMENTS, "charger")[0].count()

    time.sleep(BACKOFF_SEC + 1.5)  # the backoff expires

    requeuer.run_once()                      # now they move back to PAYMENTS
    requeue_sub.commit(REQUEUE)
    router.run_once()                        # second attempt: retries=1 -> ok

    out = {
        "processed_first_pass": processed_first,
        "requeued_early": early_backlog,     # 0: hold-back worked
        "processed_total": ps.topic_count("payments_processed"),
        "retried": ps.subscribe("payments_processed")
        .filter(F.element_at("metadata", REQUEUER_RETRIES) == "1")
        .count(),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()

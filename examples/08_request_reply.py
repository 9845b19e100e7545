"""Example 8 — Request/Reply: a command with a correlated, awaited reply.

The port's answer to `components/requestreply` (reference:
`requestreply.go:36-56` + `backend_pubsub.go:126-291`): the requester
stamps a command with an operation id, a handler processes it and publishes
a notification to a reply topic carrying the same id (and error state);
the requester awaits notifications filtered on its id.

Spark shape: `send_with_reply` stamps `_watermill_requestreply_op_id`;
`replying(...)` wraps the Router handler so each processed command emits a
reply notification; `await_reply` polls the bounded reply view — RPC is
inherently a driver concern (the streaming alternative is a stream-stream
join on operation_id with a watermark, see tests/test_streaming.py).

Run:  python examples/08_request_reply.py
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from watermill_spark.components.requestreply import (
    REPLY_HAS_ERROR,
    await_reply,
    new_operation_id,
    send_with_reply,
)
from watermill_spark.components.requestreply import replying
from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming import Router


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-request-reply")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example8-")
    ps = ParquetPubSub(spark, base_dir)

    # 1. the responder: a router handler that "charges" each command and is
    #    wrapped so every processed command notifies the reply topic with
    #    the command's operation id + error state
    def charge(df):
        return df.withColumn(
            "payload",
            F.concat(F.lit("charged:"), F.col("payload").cast("string")).cast(
                "binary"
            ),
        )

    router = Router()
    router.add_handler(
        "charge-handler",
        "commands", ps,
        "commands-done", ps,
        replying(charge, ps, "replies"),
    )

    # 2. the requester sends two separately-correlated commands
    op_a = send_with_reply(
        ps, "commands", messages_df(spark, [new_message("cmd-A")]),
        operation_id=new_operation_id(),
    )
    op_b = send_with_reply(
        ps, "commands", messages_df(spark, [new_message("cmd-B")]),
        operation_id=new_operation_id(),
    )

    # 3. the responder processes the backlog (one bounded pass)
    router.run_once()

    # 4. each requester awaits ONLY its own reply, by operation id
    reply_a = await_reply(ps, "replies", op_a, timeout_sec=10).collect()
    reply_b = await_reply(ps, "replies", op_b, timeout_sec=10).collect()
    pay_a = bytes(reply_a[0]["payload"]).decode()
    pay_b = bytes(reply_b[0]["payload"]).decode()
    ok = all(
        dict(r["metadata"])[REPLY_HAS_ERROR] == "0"
        for r in reply_a + reply_b
    )
    return {
        "reply_a": pay_a,  # 'charged:cmd-A'
        "reply_b": pay_b,  # 'charged:cmd-B'
        "replies_each": (len(reply_a), len(reply_b)),  # (1, 1)
        "no_errors": ok,
    }


if __name__ == "__main__":
    print(main())

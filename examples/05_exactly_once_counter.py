"""Example 5 — Exactly-once delivery counter.

The port's answer to
`_examples/real-world-examples/exactly-once-delivery-counter`
(reference: consume + counter update inside one MySQL transaction so a
redelivered message can't double-count): the Spark form pairs an
at-least-once replayable source with an `IdempotentBatchSink` whose
commit log skips already-applied batch ids — the counter lands exactly
once even when the WHOLE stream replays from a fresh checkpoint.

Run:  python examples/05_exactly_once_counter.py
"""

from __future__ import annotations

import tempfile
import uuid as _uuid

from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming.exactly_once import IdempotentBatchSink


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-exactly-once")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example5-")
    ps = ParquetPubSub(spark, base_dir + "/topics")

    topic = f"clicks-{_uuid.uuid4().hex[:6]}"
    ps.publish(
        topic, messages_df(spark, [new_message(f"c{i}") for i in range(12)])
    )

    counter_dir = base_dir + "/counter"
    applied_batches = []

    def write_fn(df, batch_id):
        applied_batches.append(batch_id)
        df.write.mode("append").parquet(counter_dir)

    sink = IdempotentBatchSink(base_dir + "/commits", write_fn)

    def run(ckpt: str) -> None:
        q = (
            ps.subscribe_stream(topic)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", base_dir + "/" + ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ckpt-first")
    first_writes = len(applied_batches)

    # Simulate an operator replaying the stream after losing the
    # checkpoint: the source redelivers every batch (at-least-once), the
    # commit log refuses the duplicates (exactly-once end to end).
    run("ckpt-replay")

    count = spark.read.parquet(counter_dir).count()
    return {
        "counter_value": count,  # 12, not 24
        "first_run_batches": first_writes,
        "replay_batches_applied": len(applied_batches) - first_writes,  # 0
    }


if __name__ == "__main__":
    print(main())

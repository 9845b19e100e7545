"""Exactly-once sink: idempotent foreachBatch via a batch-id commit log.

Reference behavior: the exactly-once delivery counter example
(`_examples/real-world-examples/exactly-once-delivery-counter/README.md:35`)
consumes and updates state in one transaction. Structured Streaming's
contract is at-least-once per micro-batch with a DETERMINISTIC (batch_id,
data) replay — so a sink that commits each batch_id atomically exactly once
turns replay into a no-op, which is the standard Spark exactly-once recipe
(used by every transactional sink: Delta, Kafka txn producer, JDBC upsert).

This is the transport-agnostic version: a commit-marker directory next to
the output. Works on any filesystem with atomic rename (local, HDFS;
object stores need the usual marker-object caveat).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


class IdempotentBatchSink:
    """`foreachBatch` callable that invokes `write_fn(df, batch_id)` at most
    once per batch_id across restarts and replays.

    Protocol: run write_fn, then atomically create `commits/<batch_id>`.
    A replayed batch (failure between write and commit) re-runs write_fn —
    so write_fn itself must be idempotent per batch (e.g. overwrite a
    batch-keyed partition / upsert by uuid), which it naturally is when it
    writes `.../batch_id=<id>` deterministically. A committed batch is
    skipped entirely.
    """

    def __init__(self, commit_dir: str, write_fn: Callable[[DataFrame, int], None]):
        self.commit_dir = commit_dir
        self.write_fn = write_fn
        os.makedirs(commit_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commit_dir, str(batch_id))

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        if self.committed(batch_id):
            return  # replayed after commit: exactly-once skip
        self.write_fn(df, batch_id)
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write("committed")
        os.rename(tmp, self._marker(batch_id))  # atomic commit point

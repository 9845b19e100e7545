"""Custom stateful streaming operators via applyInPandasWithState.

The delayed-delivery hold-back (SURVEY.md §7 hard part b): a message whose
`_watermill_delayed_until` lies in the future must be *re-emitted later*,
but a stream filter evaluates once — nothing re-triggers a filtered-out row.
Solution: per-key arbitrary state + processing-time timeout. Messages not
yet deliverable are parked in the state store; the state times out on the
processing-time trigger after their delay expires and the operator releases
them downstream.

Reference semantics: `components/delay/delay.go` + the SQL subscriber
hold-back (`docs/content/advanced/delayed-messages.md:37-40`) — here honored
uniformly for any transport, with state bounded by (undelivered messages)
per key, evicted on release.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from watermill_spark.streaming.middleware import DELAYED_UNTIL

_RELEASE_SCHEMA = StructType(
    [
        StructField("uuid", StringType()),
        StructField("metadata", MapType(StringType(), StringType())),
        StructField("payload", BinaryType()),
        StructField("topic", StringType()),
        StructField("event_time", TimestampType()),
    ]
)

# state: parked messages for the key, as parallel arrays (Spark state rows
# must be a flat struct of supported types)
_STATE_SCHEMA = StructType(
    [
        StructField("uuids", ArrayType(StringType())),
        StructField("payloads", ArrayType(BinaryType())),
        StructField("untils", ArrayType(StringType())),  # ISO strings
        StructField("metas", ArrayType(StringType())),  # JSON-encoded metadata
    ]
)


def _make_release_fn(delayed_until_key: str):
    """Build the stateful kernel as a self-contained closure (shipped BY
    VALUE by cloudpickle — executors never need this package importable;
    see operators/multimodal.py for the rationale)."""

    def release_fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        """Emit deliverable messages now; park the rest with a timeout at
        the earliest pending delivery time."""
        import datetime as _dt
        import json as _json

        import pandas as _pd

        def parse_until(meta):
            v = (meta or {}).get(delayed_until_key)
            if not v:
                return None
            try:
                return _dt.datetime.fromisoformat(v.replace("Z", "+00:00")).replace(
                    tzinfo=None
                )
            except ValueError:
                return None

        now = _dt.datetime.utcnow()
        held_u, held_p, held_t, held_m = [], [], [], []
        if state.exists:
            su, sp, st_, sm = state.get
            for u, p, t, m in zip(su, sp, st_, sm):
                held_u.append(u); held_p.append(p); held_t.append(t); held_m.append(m)

        out_rows = []
        for pdf in pdf_iter:
            for _, row in pdf.iterrows():
                meta = dict(row["metadata"]) if row["metadata"] is not None else {}
                until = parse_until(meta)
                if until is None or until <= now:
                    out_rows.append(
                        (row["uuid"], meta, row["payload"], row["topic"], row["event_time"])
                    )
                else:
                    held_u.append(row["uuid"])
                    held_p.append(row["payload"])
                    held_t.append(until.isoformat())
                    held_m.append(_json.dumps(meta))

        # timed out or new pass: release everything whose time has come
        still_u, still_p, still_t, still_m = [], [], [], []
        for u, p, t, m in zip(held_u, held_p, held_t, held_m):
            if _dt.datetime.fromisoformat(t) <= now:
                out_rows.append((u, _json.loads(m), p, None, None))
            else:
                still_u.append(u); still_p.append(p); still_t.append(t); still_m.append(m)

        if still_u:
            state.update((still_u, still_p, still_t, still_m))
            earliest = min(_dt.datetime.fromisoformat(t) for t in still_t)
            ms = max(1, int((earliest - now).total_seconds() * 1000))
            state.setTimeoutDuration(ms)
        elif state.exists:
            state.remove()

        if out_rows:
            yield _pd.DataFrame(
                out_rows, columns=["uuid", "metadata", "payload", "topic", "event_time"]
            )

    return release_fn


def delayed_release(stream: DataFrame, key_col: str = "topic") -> DataFrame:
    """Streaming delayed-delivery operator.

    Groups by `key_col` (bounded state per key), parks not-yet-deliverable
    messages in the state store, re-emits them when their
    `_watermill_delayed_until` passes — driven by processing-time timeouts,
    so a `Trigger(processingTime=...)` query delivers them without any new
    input arriving.
    """
    keyed = stream.withColumn("_k", F.coalesce(F.col(key_col), F.lit("")))
    return keyed.groupBy("_k").applyInPandasWithState(
        _make_release_fn(DELAYED_UNTIL),
        outputStructType=_RELEASE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


_COUNTER_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("batch_count", LongType()),
        StructField("running_count", LongType()),
    ]
)

_COUNTER_STATE_SCHEMA = StructType([StructField("count", LongType())])


def _counter_fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    """Per-key running counter (the reference's real-time counter /
    exactly-once delivery counter shape, consume→update-state per message,
    here per Arrow batch)."""
    n = 0
    for pdf in pdf_iter:
        n += len(pdf)
    (prev,) = state.get if state.exists else (0,)
    total = prev + n
    state.update((total,))
    yield pd.DataFrame({"key": [key[0]], "batch_count": [n], "running_count": [total]})


def running_counter(stream: DataFrame, key_col: str) -> DataFrame:
    """Streaming per-key running counter with arbitrary state.

    Counts survive across micro-batches in the state store (checkpointed, so
    also across restarts) — the Structured Streaming translation of the
    reference's consume-and-increment handler. Emits one row per key per
    batch with that batch's count and the running total.

    Scale: state is one long per key; the shuffle is on `key_col` exactly
    once per micro-batch; Arrow-batched Python touches only (key, count)
    pairs, not payloads, because the upstream select prunes columns.
    """
    keyed = stream.select(F.coalesce(F.col(key_col), F.lit("")).alias("_k"))
    return keyed.groupBy("_k").applyInPandasWithState(
        _counter_fn,
        outputStructType=_COUNTER_OUT_SCHEMA,
        stateStructType=_COUNTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

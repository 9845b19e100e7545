"""SQL-backed Pub/Sub over SQLite — the watermill-sql / watermill-sqlite
transport analog.

Reference (behavioral parity target, not a code port): the SQL Pub/Sub
family stores each topic in a ``watermill_{topic}`` table (auto-increment
``offset`` PK, uuid, created_at, payload, metadata) with a companion
per-topic offsets table tracking each consumer group's acked offset;
subscribers poll rows past their group's acked offset and ack by advancing
it transactionally; publishers can join a caller-owned transaction (the
transactional-outbox pattern). See `_examples/pubsubs/sql/main.go:22-52`,
`_examples/pubsubs/sqlite/main.go:21-67` + `transaction.go:13-40`, and
`docs/content/advanced/delayed-messages.md:37-40` (the SQL Pub/Subs are the
transports that honor delayed-message metadata on read). SURVEY.md §1
pins the related contract: "exactly-once only with transactional SQL
backends".

Spark-first shape and 100-TB stance: a single-writer SQL database is the
COORDINATION plane, not the data plane. What belongs here: outbox tables,
consumer-group offsets, command/reply topics, small control-event streams —
bounded, transactional, driver-adjacent state. Payload-heavy topics ride
ParquetPubSub / KafkaPubSub, exactly like reference deployments put bulk
traffic on Kafka and keep SQL for the outbox + exactly-once consumers.
Accordingly:

- rows enter Spark via Arrow-backed ``createDataFrame`` in bounded polls
  (``poll_limit`` caps a batch; the offsets table makes polling resumable),
  never an unbounded scan of a growing table;
- every mutation is one short transaction, safe under concurrent handlers
  (WAL + busy-timeout; a process-wide lock serializes the shared
  connection, mirroring the sqlite example's MaxOpenConns(1)
  `_examples/pubsubs/sqlite/main.go:58-60`);
- ``consume_exactly_once`` advances the group offset in the SAME
  transaction as the handler's side-effect writes, so a crash between
  processing and ack replays the batch and a committed batch can never be
  double-applied — the reference's forwarder/outbox guarantee.
"""

from __future__ import annotations

import json
import os
import re
import sqlite3
import threading
from contextlib import contextmanager
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from watermill_spark.message import DELAYED_UNTIL, MESSAGE_SCHEMA, ensure_message_df

from .base import PubSub

_TOPIC_RE = re.compile(r"[^A-Za-z0-9_]")

# One definition of "due": sqlite's datetime() parses RFC3339 WITH the UTC
# offset ('Z', '+00:00', or whatever zone a non-UTC Spark session stamped),
# normalizing before the compare — a raw string compare would misorder
# offset-suffixed stamps (pinned by test_delay_holdback_parses_utc_offsets).
_DELIVERABLE_SQL = (
    "(delayed_until IS NULL OR datetime(delayed_until) <= datetime('now'))"
)


def _table(topic: str) -> str:
    """watermill_{topic}, topic sanitized to identifier charset (the
    reference's DefaultMySQLSchema does the same namespacing)."""
    return f"watermill_{_TOPIC_RE.sub('_', topic)}"


def _offsets_table(topic: str) -> str:
    return f"watermill_offsets_{_TOPIC_RE.sub('_', topic)}"


class SQLitePubSub(PubSub):
    """Publisher + Subscriber over one SQLite database file (or :memory:).

    Public API beyond the PubSub contract:

    - ``subscribe_group(topic, group, limit)`` → bounded DataFrame of
      not-yet-acked messages for a consumer group (offset-ordered);
    - ``ack(topic, group, up_to_offset)`` → advance the group cursor;
    - ``consume_exactly_once(topic, group, fn)`` → fn(rows, cursor) runs
      inside the offset-advancing transaction;
    - ``transaction()`` → caller-owned transaction exposing a bound
      publisher + cursor (transactional outbox).
    """

    def __init__(self, spark: SparkSession, db_path: str = ":memory:",
                 honor_delays: bool = True, poll_limit: int = 10_000):
        super().__init__(spark)
        self.db_path = db_path
        self.honor_delays = honor_delays
        self.poll_limit = poll_limit
        # RLock: user code inside transaction()/consume_exactly_once may call
        # back into publish/subscribe on the same pubsub
        self._lock = threading.RLock()
        # True while a caller-owned transaction (transaction() /
        # consume_exactly_once) is open: re-entrant publish/ack/subscribe
        # calls then JOIN that transaction instead of committing it from
        # under the caller (commit-inside-tx would break rollback-on-raise)
        self._in_tx = False
        if db_path != ":memory:":
            os.makedirs(os.path.dirname(os.path.abspath(db_path)), exist_ok=True)
        self._conn = sqlite3.connect(db_path, check_same_thread=False)
        cur = self._conn.cursor()
        if db_path != ":memory:":
            cur.execute("PRAGMA journal_mode=WAL")
        # generous: an exactly-once consumer may hold the write lock for a
        # whole handler invocation; competing pollers wait rather than error
        cur.execute("PRAGMA busy_timeout=30000")
        self._conn.commit()

    def _maybe_commit(self) -> None:
        """Commit unless inside a caller-owned transaction (then the caller's
        commit/rollback decides the fate of everything, including re-entrant
        publishes — the outbox contract)."""
        if not self._in_tx:
            self._conn.commit()

    def _begin_immediate(self, cur: sqlite3.Cursor) -> None:
        """Take sqlite's write lock up front so transactions from OTHER
        processes sharing the db file serialize against this one (WAL allows
        concurrent readers; without this, two exactly-once consumers could
        both read the same un-acked batch before either writes)."""
        if not self._conn.in_transaction:
            cur.execute("BEGIN IMMEDIATE")

    # -- schema ----------------------------------------------------------

    def _init_topic(self, cur: sqlite3.Cursor, topic: str) -> None:
        cur.execute(
            f"""CREATE TABLE IF NOT EXISTS {_table(topic)} (
                "offset" INTEGER PRIMARY KEY AUTOINCREMENT,
                uuid TEXT NOT NULL,
                created_at TEXT NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
                payload BLOB,
                metadata TEXT NOT NULL DEFAULT '{{}}',
                delayed_until TEXT
            )"""
        )
        cur.execute(
            f"""CREATE TABLE IF NOT EXISTS {_offsets_table(topic)} (
                consumer_group TEXT PRIMARY KEY,
                offset_acked INTEGER NOT NULL DEFAULT 0
            )"""
        )

    def subscribe_initialize(self, topic: str) -> None:
        with self._lock:
            cur = self._conn.cursor()
            self._init_topic(cur, topic)
            self._maybe_commit()

    # -- publish ---------------------------------------------------------

    @staticmethod
    def _rows_for_insert(df: DataFrame) -> list[tuple]:
        rows = ensure_message_df(df).collect()
        out = []
        for r in rows:
            meta = dict(r["metadata"] or {})
            out.append(
                (
                    r["uuid"],
                    bytes(r["payload"]) if r["payload"] is not None else None,
                    json.dumps(meta, sort_keys=True),
                    meta.get(DELAYED_UNTIL),
                )
            )
        return out

    def publish(self, topic: str, df: DataFrame) -> None:
        """Insert the batch in one short transaction.

        The driver-side collect is deliberate and bounded: SQL topics are
        control-plane streams (see module docstring); bulk data rides the
        parquet/kafka transports.
        """
        self._check_open()
        params = self._rows_for_insert(df)
        with self._lock:
            cur = self._conn.cursor()
            self._init_topic(cur, topic)
            cur.executemany(
                f"INSERT INTO {_table(topic)} (uuid, payload, metadata, delayed_until)"
                " VALUES (?, ?, ?, ?)",
                params,
            )
            self._maybe_commit()

    # -- read ------------------------------------------------------------

    def _select(self, cur: sqlite3.Cursor, topic: str, after_offset: int,
                limit: int | None) -> list[tuple]:
        self._init_topic(cur, topic)
        q = (
            f'SELECT "offset", uuid, payload, metadata, created_at '
            f'FROM {_table(topic)} WHERE "offset" > ?'
        )
        if self.honor_delays:
            # consumer-side hold-back — the SQL Pub/Subs are the reference
            # transports honoring _watermill_delayed_until on read
            q += f" AND {_DELIVERABLE_SQL}"
        q += ' ORDER BY "offset"'
        if limit is not None:
            q += f" LIMIT {int(limit)}"
        cur.execute(q, (after_offset,))
        return cur.fetchall()

    def _select_group_prefix(self, cur: sqlite3.Cursor, topic: str,
                             after_offset: int, limit: int | None) -> list[tuple]:
        """Group-poll read: the DELIVERABLE PREFIX of the offset order.

        Unlike the cursorless ``_select`` (which may skip a held-back row),
        a group batch must stop AT the first not-yet-due delayed message —
        the batch-granular ack advances a single offset cursor, so skipping
        a held row and acking past it would permanently lose it once due.
        Kafka-offset semantics: a delayed message PARKS the group until its
        time comes (ordered redelivery); later messages wait behind it.
        Consequence worth designing for: keep long-backoff traffic on its
        own requeue topic (the delayed-requeue pattern, examples/15) so an
        hour-long backoff at the head never blocks live messages — exactly
        why the reference's DelayedRequeuer uses a separate table.

        Callers must have run ``_init_topic`` already.
        """
        q = (
            f'SELECT "offset", uuid, payload, metadata, created_at,'
            f" {_DELIVERABLE_SQL}"
            f' FROM {_table(topic)} WHERE "offset" > ? ORDER BY "offset"'
        )
        if limit is not None:
            q += f" LIMIT {int(limit)}"
        cur.execute(q, (after_offset,))
        batch: list[tuple] = []
        for row in cur.fetchall():
            if self.honor_delays and not row[5]:
                break
            batch.append(row[:5])
        return batch

    def _to_df(self, raw: Iterable[tuple]) -> DataFrame:
        rows = [
            (uuid, json.loads(meta), payload, None, None)
            for (_off, uuid, payload, meta, _created) in raw
        ]
        return self.spark.createDataFrame(rows, MESSAGE_SCHEMA)

    def subscribe(self, topic: str) -> DataFrame:
        """Bounded read of the whole topic (fresh subscriber, no group —
        `NewSubscriberReceivesOldMessages` semantics)."""
        with self._lock:
            cur = self._conn.cursor()
            raw = self._select(cur, topic, 0, None)
            self._maybe_commit()
        return self._to_df(raw)

    # -- consumer groups -------------------------------------------------

    def _acked(self, cur: sqlite3.Cursor, topic: str, group: str) -> int:
        cur.execute(
            f"SELECT offset_acked FROM {_offsets_table(topic)} WHERE consumer_group = ?",
            (group,),
        )
        row = cur.fetchone()
        return row[0] if row else 0

    def subscribe_group(self, topic: str, group: str,
                        limit: int | None = None) -> tuple[DataFrame, int]:
        """Poll the next batch for a consumer group.

        Returns (messages_df, max_offset_in_batch); max_offset is 0 when the
        batch is empty. Caller processes then ``ack(topic, group,
        max_offset)`` — batch-granular ack, the micro-batch analog of the
        reference's per-message Ack (message.py module doc). Delayed
        messages park the cursor (see ``_select_group_prefix``): the batch
        never reaches past a held-back row, so acking it can't lose one.
        """
        limit = self.poll_limit if limit is None else limit
        with self._lock:
            cur = self._conn.cursor()
            raw = self._select_group_prefix(
                cur, topic, self._acked_init(cur, topic, group), limit
            )
            self._maybe_commit()
        max_off = max((r[0] for r in raw), default=0)
        return self._to_df(raw), max_off

    def _acked_init(self, cur: sqlite3.Cursor, topic: str, group: str) -> int:
        self._init_topic(cur, topic)
        return self._acked(cur, topic, group)

    def ack(self, topic: str, group: str, up_to_offset: int) -> None:
        """Advance the group cursor (monotone: never moves backwards)."""
        with self._lock:
            cur = self._conn.cursor()
            self._init_topic(cur, topic)
            cur.execute(
                f"""INSERT INTO {_offsets_table(topic)} (consumer_group, offset_acked)
                    VALUES (?, ?)
                    ON CONFLICT(consumer_group) DO UPDATE
                    SET offset_acked = MAX(offset_acked, excluded.offset_acked)""",
                (group, up_to_offset),
            )
            self._maybe_commit()

    # -- exactly-once consumer -------------------------------------------

    def consume_exactly_once(
        self,
        topic: str,
        group: str,
        fn: Callable[[list[sqlite3.Row], sqlite3.Cursor], None],
        limit: int | None = None,
    ) -> int:
        """Process the next batch with exactly-once effects *within this DB*.

        ``fn(rows, cursor)`` receives the raw message rows
        (offset, uuid, payload blob, metadata-JSON str, created_at) and a
        cursor INSIDE the transaction that also advances the group offset.
        fn's writes and the ack commit or roll back together: a crash before
        commit replays the batch; after commit, the batch can never be seen
        again. This is the reference's "exactly-once only with transactional
        SQL backends" recipe. Returns the number of messages processed.
        """
        limit = self.poll_limit if limit is None else limit
        with self._lock:
            if self._in_tx:
                raise RuntimeError(
                    "consume_exactly_once cannot run inside transaction()"
                )
            cur = self._conn.cursor()
            self._in_tx = True
            try:
                # BEGIN IMMEDIATE before the offset read: a second process on
                # the same db file blocks here until we commit/rollback, so
                # it can never read (and double-apply) the same un-acked batch
                try:
                    self._begin_immediate(cur)
                except sqlite3.OperationalError:
                    # another connection holds the write lock past
                    # busy_timeout: treat as a contended poll — roll back
                    # and report an empty batch; the caller's next poll
                    # retries (it would have seen an already-acked batch
                    # anyway once the winner commits)
                    self._conn.rollback()
                    return 0
                acked = self._acked_init(cur, topic, group)
                raw = self._select_group_prefix(cur, topic, acked, limit)
                if not raw:
                    self._conn.rollback()
                    return 0
                fn(raw, cur)
                max_off = max(r[0] for r in raw)
                cur.execute(
                    f"""INSERT INTO {_offsets_table(topic)} (consumer_group, offset_acked)
                        VALUES (?, ?)
                        ON CONFLICT(consumer_group) DO UPDATE
                        SET offset_acked = MAX(offset_acked, excluded.offset_acked)""",
                    (group, max_off),
                )
                self._conn.commit()
                return len(raw)
            except Exception:
                self._conn.rollback()
                raise
            finally:
                self._in_tx = False

    # -- transactional outbox --------------------------------------------

    @contextmanager
    def transaction(self):
        """Caller-owned transaction: business writes + publishes commit
        atomically (`_examples/pubsubs/sqlite/transaction.go:13-40`).

        Yields a ``TxPublisher`` with ``.publish(topic, df)`` and
        ``.cursor`` for arbitrary same-DB statements. Raising inside the
        block rolls everything back — including the publishes, and any
        re-entrant ``publish()``/``ack()`` calls on this pubsub made inside
        the block (they join the transaction instead of committing it).
        """
        self._check_open()
        with self._lock:
            if self._in_tx:
                raise RuntimeError("transaction() cannot be nested")
            cur = self._conn.cursor()
            self._in_tx = True
            try:
                self._begin_immediate(cur)  # cross-process write serialization
                yield _TxPublisher(self, cur)
                self._conn.commit()
            except Exception:
                self._conn.rollback()
                raise
            finally:
                self._in_tx = False

    def topic_count(self, topic: str) -> int:
        with self._lock:
            cur = self._conn.cursor()
            self._init_topic(cur, topic)
            cur.execute(f"SELECT COUNT(*) FROM {_table(topic)}")
            n = cur.fetchone()[0]
            self._maybe_commit()
        return n

    def close(self) -> None:
        """Publisher close: subsequent publishes raise; prior publishes are
        committed (durable). Reads stay usable — publisher and subscriber are
        distinct roles sharing the store, and TestPublisherClose subscribes
        after closing the publisher. ``dispose()`` tears down the
        connection."""
        super().close()

    def dispose(self) -> None:
        self.close()
        with self._lock:
            self._conn.close()


class GroupSubscriber(PubSub):
    """A consumer-group view of a SQLitePubSub as a plain PubSub.

    ``subscribe(topic)`` polls the group's next unacked batch and remembers
    its high-water offset; ``commit(topic)`` acks it. The Router's
    ``run_once`` calls ``commit`` only after the handler pass succeeded, so
    a crashing handler leaves the cursor untouched and the next pass
    redelivers — per-handler consumer groups with batch-granular Ack, the
    reference's subscriber+group wiring (`_examples/real-world-examples/
    consumer-groups/newsletter-service/main.go:49-57`) without re-reading
    the whole topic every pass.

    Publishes pass through to the underlying store.
    """

    def __init__(self, inner: SQLitePubSub, group: str,
                 limit: int | None = None):
        super().__init__(inner.spark)
        self.inner = inner
        self.group = group
        self.limit = limit
        self._pending: dict[str, int] = {}

    def subscribe(self, topic: str) -> DataFrame:
        df, max_off = self.inner.subscribe_group(topic, self.group, self.limit)
        self._pending[topic] = max_off
        return df

    def commit(self, topic: str) -> None:
        off = self._pending.pop(topic, 0)
        if off:
            self.inner.ack(topic, self.group, off)

    def rollback(self, topic: str) -> None:
        self._pending.pop(topic, None)

    def publish(self, topic: str, df: DataFrame) -> None:
        self.inner.publish(topic, df)

    def subscribe_initialize(self, topic: str) -> None:
        self.inner.subscribe_initialize(topic)


class _TxPublisher:
    """Publisher bound to a caller-owned transaction (outbox)."""

    def __init__(self, pubsub: SQLitePubSub, cur: sqlite3.Cursor):
        self._ps = pubsub
        self.cursor = cur

    def publish(self, topic: str, df: DataFrame) -> None:
        self._ps._init_topic(self.cursor, topic)
        self.cursor.executemany(
            f"INSERT INTO {_table(topic)} (uuid, payload, metadata, delayed_until)"
            " VALUES (?, ?, ?, ?)",
            SQLitePubSub._rows_for_insert(df),
        )

    def execute(self, sql: str, params: tuple = ()) -> sqlite3.Cursor:
        return self.cursor.execute(sql, params)

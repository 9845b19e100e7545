"""SQLitePubSub-specific contracts beyond the universal suite
(test_pubsub_universal.py runs the acceptance tests over it already):

- consumer groups: independent cursors, redelivery until ack, resumable polls
  (reference offsets-adapter semantics, `_examples/pubsubs/sql/main.go:22-36`);
- exactly-once consumer: handler side-effects + offset advance in ONE
  transaction (SURVEY.md §1 "exactly-once only with transactional SQL
  backends");
- transactional outbox: business write + publish commit/rollback atomically
  (`_examples/pubsubs/sqlite/transaction.go:13-40`);
- delayed-message hold-back on read
  (`docs/content/advanced/delayed-messages.md:37-40`);
- durability across reopen (file-backed DB).
"""

from __future__ import annotations

import datetime as _dt
import os
import uuid as _uuid

import pytest

from watermill_spark.components.delay import delay_until
from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import SQLitePubSub


@pytest.fixture
def ps(spark, tmp_path):
    return SQLitePubSub(spark, str(tmp_path / "ps.sqlite3"))


def _msgs(n, prefix="p"):
    return [new_message(payload=f"{prefix}-{i}", metadata={"n": str(i)}) for i in range(n)]


def _topic(stem):
    return f"{stem}-{_uuid.uuid4().hex[:8]}"


def test_consumer_groups_independent_cursors(ps, spark):
    t = _topic("grp")
    ps.publish(t, messages_df(spark, _msgs(20)))

    df_a, off_a = ps.subscribe_group(t, "group-a")
    assert df_a.count() == 20
    ps.ack(t, "group-a", off_a)

    # group-a is drained; group-b still sees everything
    df_a2, _ = ps.subscribe_group(t, "group-a")
    assert df_a2.count() == 0
    df_b, _ = ps.subscribe_group(t, "group-b")
    assert df_b.count() == 20


def test_unacked_poll_redelivers(ps, spark):
    t = _topic("redeliver")
    ps.publish(t, messages_df(spark, _msgs(5)))
    df1, off1 = ps.subscribe_group(t, "g")
    df2, off2 = ps.subscribe_group(t, "g")  # no ack between polls
    assert df1.count() == df2.count() == 5
    assert off1 == off2
    ps.ack(t, "g", off1)
    df3, _ = ps.subscribe_group(t, "g")
    assert df3.count() == 0


def test_poll_limit_pages_through_backlog(ps, spark):
    t = _topic("page")
    ps.publish(t, messages_df(spark, _msgs(25)))
    seen = 0
    for _ in range(10):
        df, off = ps.subscribe_group(t, "g", limit=10)
        n = df.count()
        if n == 0:
            break
        seen += n
        ps.ack(t, "g", off)
    assert seen == 25


def test_ack_is_monotone(ps, spark):
    t = _topic("mono")
    ps.publish(t, messages_df(spark, _msgs(10)))
    _, off = ps.subscribe_group(t, "g")
    ps.ack(t, "g", off)
    ps.ack(t, "g", 1)  # stale/out-of-order ack must not rewind the cursor
    df, _ = ps.subscribe_group(t, "g")
    assert df.count() == 0


def test_exactly_once_crash_replays_then_commits_once(ps, spark):
    """Crash between processing and ack ⇒ replay; committed batch is never
    re-applied: the side-effect table ends with exactly one row per message."""
    t = _topic("eo")
    ps.publish(t, messages_df(spark, _msgs(8)))

    attempts = {"n": 0}

    def handler(rows, cur):
        cur.execute("CREATE TABLE IF NOT EXISTS effects (uuid TEXT PRIMARY KEY)")
        for r in rows:
            cur.execute("INSERT INTO effects (uuid) VALUES (?)", (r[1],))
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise RuntimeError("crash after side-effect write, before ack")

    with pytest.raises(RuntimeError):
        ps.consume_exactly_once(t, "g", handler)
    # rollback undid the partial side effects AND the ack ⇒ full replay
    assert ps.consume_exactly_once(t, "g", handler) == 8
    # third call: nothing left
    assert ps.consume_exactly_once(t, "g", handler) == 0

    with ps.transaction() as tx:
        n = tx.execute("SELECT COUNT(*) FROM effects").fetchone()[0]
    assert n == 8  # exactly once, despite the crash


def test_transactional_outbox_commit_and_rollback(ps, spark):
    t = _topic("outbox")
    ps.subscribe_initialize(t)

    with ps.transaction() as tx:
        tx.execute("CREATE TABLE IF NOT EXISTS orders (id INTEGER PRIMARY KEY)")
        tx.execute("INSERT INTO orders (id) VALUES (1)")
        tx.publish(t, messages_df(spark, _msgs(3, "ok")))

    assert ps.subscribe(t).count() == 3

    with pytest.raises(RuntimeError):
        with ps.transaction() as tx:
            tx.execute("INSERT INTO orders (id) VALUES (2)")
            tx.publish(t, messages_df(spark, _msgs(4, "doomed")))
            raise RuntimeError("business logic failed")

    # neither the business row nor the doomed publishes survived
    assert ps.subscribe(t).count() == 3
    with ps.transaction() as tx:
        ids = [r[0] for r in tx.execute("SELECT id FROM orders ORDER BY id").fetchall()]
    assert ids == [1]


def test_delayed_message_holdback_on_read(ps, spark):
    t = _topic("delay")
    now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    future = now + _dt.timedelta(hours=1)
    past = now - _dt.timedelta(hours=1)

    ps.publish(t, delay_until(messages_df(spark, _msgs(2, "future")), future))
    ps.publish(t, delay_until(messages_df(spark, _msgs(3, "past")), past))
    ps.publish(t, messages_df(spark, _msgs(4, "plain")))

    visible = ps.subscribe(t).collect()
    payloads = {bytes(r["payload"]).decode().split("-")[0] for r in visible}
    assert len(visible) == 7 and payloads == {"past", "plain"}

    # group polls PARK at the first held-back message instead of skipping it:
    # the future-delayed batch sits at the topic head, so the cursor waits
    # there (acking past a skipped row would lose it forever — see
    # _select_group_prefix)
    df, off = ps.subscribe_group(t, "g")
    assert df.count() == 0 and off == 0

    # honor_delays=False exposes everything (the non-SQL-transport stance)
    raw = SQLitePubSub(spark, ps.db_path, honor_delays=False)
    assert raw.subscribe(t).count() == 9


def test_durable_across_reopen(spark, tmp_path):
    path = str(tmp_path / "durable.sqlite3")
    t = _topic("dur")
    ps1 = SQLitePubSub(spark, path)
    ps1.publish(t, messages_df(spark, _msgs(6)))
    _, off = ps1.subscribe_group(t, "g", limit=4)
    ps1.ack(t, "g", off)
    ps1.dispose()

    ps2 = SQLitePubSub(spark, path)
    assert ps2.subscribe(t).count() == 6        # backlog persisted
    df, _ = ps2.subscribe_group(t, "g")         # cursor persisted
    assert df.count() == 2


def test_metadata_and_payload_fidelity(ps, spark):
    t = _topic("fid")
    msgs = [new_message(payload=b"\x00\xffbin", metadata={"a": "1", "b": "x y"})]
    ps.publish(t, messages_df(spark, msgs))
    r = ps.subscribe(t).collect()[0]
    assert bytes(r["payload"]) == b"\x00\xffbin"
    assert dict(r["metadata"]) == {"a": "1", "b": "x y"}


def test_router_group_subscriber_incremental_and_replay(ps, spark):
    """Router.run_once over a GroupSubscriber: each pass consumes only the
    NEW messages (cursor advances on success); a failing handler leaves the
    cursor untouched so the next pass redelivers the same batch."""
    from watermill_spark.sources import GroupSubscriber
    from watermill_spark.streaming.router import Router, RouterConfig

    t = _topic("router-grp")
    ps.publish(t, messages_df(spark, _msgs(5, "a")))

    seen_batches: list[int] = []
    boom = {"on": False}

    def handler(df):
        n = df.count()
        if n:
            seen_batches.append(n)
        if boom["on"] and n:
            raise RuntimeError("handler crashed mid-batch")
        return df

    sub = GroupSubscriber(ps, "router-group")
    router = Router(RouterConfig(fail_on_unhandled_errors=False))
    router.add_consumer_handler("h", t, sub, handler)

    router.run_once()                      # consumes the 5
    router.run_once()                      # nothing new -> empty batch
    assert seen_batches == [5]

    ps.publish(t, messages_df(spark, _msgs(3, "b")))
    boom["on"] = True
    with pytest.raises(RuntimeError):
        router.run_once()                  # crash: cursor NOT advanced
    boom["on"] = False
    router.run_once()                      # redelivery of the same 3
    assert seen_batches == [5, 3, 3]

    router.run_once()
    assert seen_batches == [5, 3, 3]       # acked: nothing left


def test_delay_holdback_parses_utc_offsets(ps, spark):
    """A non-UTC Spark session stamps _watermill_delayed_until with its own
    zone offset (date_format ... XXX); the hold-back must normalize to UTC
    instead of comparing strings (a -07:00 future instant sorts 'before' a
    UTC now lexicographically)."""
    import datetime as dt

    from watermill_spark.message import DELAYED_UNTIL

    now = dt.datetime.now(dt.timezone.utc)
    zone = dt.timezone(dt.timedelta(hours=-7))
    future_offset = (now + dt.timedelta(hours=1)).astimezone(zone)
    past_offset = (now - dt.timedelta(hours=1)).astimezone(zone)

    t = _topic("offsets")
    ps.publish(t, messages_df(spark, [
        new_message("future", metadata={DELAYED_UNTIL: future_offset.isoformat(timespec="seconds")}),
        new_message("past", metadata={DELAYED_UNTIL: past_offset.isoformat(timespec="seconds")}),
        new_message("future-z", metadata={DELAYED_UNTIL: (now + dt.timedelta(hours=1)).strftime("%Y-%m-%dT%H:%M:%SZ")}),
    ]))
    visible = {bytes(r["payload"]).decode() for r in ps.subscribe(t).collect()}
    assert visible == {"past"}


def test_router_run_polling_consumes_live_publishes(ps, spark):
    """run_polling = the SQL subscriber's long-poll loop: a producer thread
    publishes while the router polls; every message is processed exactly
    once per group, and the loop stops after the idle threshold."""
    import threading

    from watermill_spark.sources import GroupSubscriber
    from watermill_spark.streaming.router import Router

    t = _topic("poll")
    ps.publish(t, messages_df(spark, _msgs(3, "pre")))  # backlog

    seen: list[str] = []

    def handler(df):
        seen.extend(bytes(r["payload"]).decode() for r in df.collect())
        return df

    router = Router()
    router.add_consumer_handler("h", t, GroupSubscriber(ps, "poller"), handler)

    def producer():
        for b in range(2):
            ps.publish(t, messages_df(spark, _msgs(2, f"live{b}")))

    th = threading.Thread(target=producer)
    th.start()
    consumed = router.run_polling(interval_sec=0.3, idle_passes_to_stop=4)
    th.join()

    assert consumed == 7
    assert sorted(seen) == sorted(
        [f"pre-{i}" for i in range(3)]
        + [f"live0-{i}" for i in range(2)]
        + [f"live1-{i}" for i in range(2)]
    )
    # nothing left for the group
    assert router.run_once() == 0


def test_group_ack_never_loses_parked_delayed_message(ps, spark):
    """Regression (r4 review): a held-back delayed message must never be
    skipped-and-acked-past by a group poll. The cursor parks at it; once the
    delay expires the SAME group receives it."""
    import time as _time

    t = _topic("park")
    # 8s window: the two publishes + first poll are Spark actions whose
    # combined latency must stay inside it on a loaded host (2s flaked)
    soon = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None) + _dt.timedelta(seconds=8)
    ps.publish(t, delay_until(messages_df(spark, _msgs(1, "delayed")), soon))
    ps.publish(t, messages_df(spark, _msgs(2, "plain")))

    df, off = ps.subscribe_group(t, "g")
    assert df.count() == 0 and off == 0   # parked at the delayed head
    ps.ack(t, "g", off)                   # ack of an empty batch is a no-op

    _time.sleep(8.5)
    df, off = ps.subscribe_group(t, "g")
    got = sorted(bytes(r["payload"]).decode() for r in df.collect())
    assert got == ["delayed-0", "plain-0", "plain-1"]  # nothing lost, in order
    ps.ack(t, "g", off)
    assert ps.subscribe_group(t, "g")[0].count() == 0


def test_reentrant_publish_joins_open_transaction(ps, spark):
    """Regression (r4 review): publish()/ack() called INSIDE transaction()
    must join it, not commit the caller's half-finished work."""
    t = _topic("reentrant")
    with pytest.raises(RuntimeError, match="boom"):
        with ps.transaction() as tx:
            tx.execute("CREATE TABLE business (x INTEGER)")
            tx.execute("INSERT INTO business VALUES (42)")
            ps.publish(t, messages_df(spark, _msgs(3)))  # re-entrant
            raise RuntimeError("boom")

    assert ps.subscribe(t).count() == 0  # the re-entrant publish rolled back
    with ps.transaction() as tx:
        n = tx.execute(
            "SELECT COUNT(*) FROM sqlite_master WHERE name = 'business'"
        ).fetchone()[0]
    assert n == 0  # and so did the business DDL+insert

    # nesting is rejected explicitly rather than corrupting state
    with pytest.raises(RuntimeError, match="nested"):
        with ps.transaction():
            with ps.transaction():
                pass
    with pytest.raises(RuntimeError, match="inside transaction"):
        with ps.transaction():
            ps.consume_exactly_once(t, "g", lambda rows, cur: None)


def test_exactly_once_across_two_connections_same_file(spark, tmp_path):
    """Regression (r4 review): two transports on the SAME db file (the
    cross-process shape) racing consume_exactly_once must not double-apply —
    BEGIN IMMEDIATE serializes the offset read with the ack write."""
    import threading

    path = str(tmp_path / "race.sqlite3")
    p1 = SQLitePubSub(spark, path)
    p2 = SQLitePubSub(spark, path)
    t = _topic("race")
    p1.publish(t, messages_df(spark, _msgs(10)))

    applied: list[str] = []
    lock = threading.Lock()

    def handler(rows, cur):
        cur.execute("CREATE TABLE IF NOT EXISTS effects (uuid TEXT PRIMARY KEY)")
        for r in rows:
            cur.execute("INSERT INTO effects (uuid) VALUES (?)", (r[1],))
        with lock:
            applied.extend(r[1] for r in rows)

    counts = []

    def worker(ps_):
        counts.append(ps_.consume_exactly_once(t, "g", handler, limit=None))

    th1 = threading.Thread(target=worker, args=(p1,))
    th2 = threading.Thread(target=worker, args=(p2,))
    th1.start(); th2.start(); th1.join(); th2.join()

    assert sorted(counts) == [0, 10]      # one winner, one empty follow-up
    assert len(applied) == len(set(applied)) == 10
    with p1.transaction() as tx:
        assert tx.execute("SELECT COUNT(*) FROM effects").fetchone()[0] == 10


def test_soak_concurrent_group_consumers_at_least_once(spark, tmp_path):
    """Transport soak: 2 consumer loops on SEPARATE connections sharing one
    consumer group race 3 producer bursts. subscribe_group+ack is
    batch-granular ⇒ AT-LEAST-ONCE across connections (both may poll the
    same un-acked batch); the uuid-keyed idempotent sink — the documented
    exactly-once recipe (SURVEY §7d) — must end with exactly one effect per
    message and no message lost."""
    import threading
    import time as _time

    path = str(tmp_path / "soak.sqlite3")
    t = _topic("soak")
    producer_ps = SQLitePubSub(spark, path)

    total = 60
    sink: dict[str, int] = {}
    sink_lock = threading.Lock()
    stop = threading.Event()

    def producer():
        for lo in range(0, total, 20):
            producer_ps.publish(
                t, messages_df(spark, _msgs(20, f"burst{lo}"))
            )
            _time.sleep(0.2)

    def consumer():
        ps_ = SQLitePubSub(spark, path)  # own connection, shared group
        while not stop.is_set():
            df, off = ps_.subscribe_group(t, "workers", limit=25)
            rows = df.collect()
            with sink_lock:
                for r in rows:  # idempotent sink: keyed by uuid
                    sink[r["uuid"]] = sink.get(r["uuid"], 0) + 1
            if rows:
                ps_.ack(t, "workers", off)
            else:
                _time.sleep(0.1)

    prod = threading.Thread(target=producer)
    cons = [threading.Thread(target=consumer, daemon=True) for _ in range(2)]
    prod.start()
    for c in cons:
        c.start()
    prod.join()
    deadline = _time.time() + 30
    while _time.time() < deadline and len(sink) < total:
        _time.sleep(0.2)
    stop.set()
    for c in cons:
        c.join(timeout=10)

    assert len(sink) == total                 # nothing lost
    assert max(sink.values()) <= 3            # bounded redelivery, not a loop
    # cursor fully advanced: a fresh poll of the group is empty
    assert producer_ps.subscribe_group(t, "workers")[0].count() == 0


def test_cross_process_group_rebalance_kill_one(spark, tmp_path):
    """Consumer-group rebalance across OS PROCESSES (r4 verdict item 6,
    extending the in-process soak above): two `Router.run_polling` workers
    in separate Python/JVM processes share one SQLite consumer group; one
    is SIGKILLed mid-poll. Because group acks are batch-granular and
    committed only after the handler pass, the killed worker's un-acked
    batch is redelivered to the survivor (at-least-once), and the
    uuid-keyed idempotent effects table must end with exactly one row per
    message — no loss, no duplicate effects, cursor fully drained."""
    import signal
    import sqlite3
    import subprocess
    import sys as _sys
    import time as _time

    db = str(tmp_path / "group.sqlite3")
    effects = str(tmp_path / "effects.sqlite3")
    topic = _topic("rebal")
    total = 1500
    producer = SQLitePubSub(spark, db)
    producer.publish(topic, messages_df(spark, _msgs(total, "r")))

    worker = os.path.join(os.path.dirname(__file__), "rebalance_worker.py")

    def start():
        return subprocess.Popen(
            [_sys.executable, worker, db, topic, "workers", effects],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def n_effects():
        if not os.path.exists(effects):
            return 0
        con = sqlite3.connect(effects, timeout=30)
        try:
            return con.execute("SELECT COUNT(*) FROM effects").fetchone()[0]
        except sqlite3.OperationalError:
            return 0
        finally:
            con.close()

    w1, w2 = start(), start()
    try:
        # kill w1 mid-poll: after progress started, well before the drain
        deadline = _time.time() + 180
        while _time.time() < deadline and n_effects() < total // 10:
            _time.sleep(0.5)
        assert n_effects() >= total // 10, "workers made no progress"
        os.kill(w1.pid, signal.SIGKILL)
        w1.wait(timeout=30)

        # the survivor drains the group alone
        deadline = _time.time() + 240
        while _time.time() < deadline and n_effects() < total:
            assert w2.poll() is None, "surviving worker died"
            _time.sleep(0.5)
        # effects land BEFORE the batch ack commits (at-least-once order),
        # so give the survivor time to commit its final ack before we
        # terminate it — otherwise the last in-flight batch stays unacked
        # and the cursor check below races (seen flaky: exactly one
        # poll-limit batch, 50 rows, left unacked).
        deadline = _time.time() + 60
        while (
            _time.time() < deadline
            and producer.subscribe_group(topic, "workers")[0].count() > 0
        ):
            assert w2.poll() is None, "surviving worker died"
            _time.sleep(0.5)
    finally:
        for w in (w1, w2):
            if w.poll() is None:
                w.terminate()
        w2.wait(timeout=30)

    con = sqlite3.connect(effects)
    rows, dupes = con.execute(
        "SELECT COUNT(*), COALESCE(SUM(CASE WHEN n > 1 THEN 1 END), 0) "
        "FROM effects"
    ).fetchone()
    con.close()
    assert rows == total  # nothing lost, each uuid exactly one effect row
    # raw deliveries may exceed 1 (at-least-once past a kill) but must be
    # bounded — a runaway loop would show hundreds of redeliveries
    con = sqlite3.connect(effects)
    max_n = con.execute("SELECT MAX(n) FROM effects").fetchone()[0]
    con.close()
    assert max_n <= 3, f"unbounded redelivery: max {max_n}"
    # cursor fully advanced: a fresh poll of the group is empty
    assert producer.subscribe_group(topic, "workers")[0].count() == 0

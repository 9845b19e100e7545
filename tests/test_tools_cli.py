"""CLI smoke tests: `python -m watermill_spark.tools` produce/consume/pq —
the `mill` + `pq` tool analogs (`/root/reference/tools/mill/README.md:1-12`,
`tools/pq/README.md:1-5`, `tools/pq/cli/backend.go:28-32`).

The CLI spins its own SparkSession via get_spark (same JVM in-process here),
so we call main() directly rather than forking a subprocess per test.
"""

from __future__ import annotations

import io
import json
import uuid as _uuid

import pytest

from watermill_spark.message import messages_df, new_message, with_metadata
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming.middleware import (
    DELAYED_UNTIL,
    POISONED_TOPIC,
    REASON_POISONED,
    REQUEUER_RETRIES,
)
from watermill_spark.tools import main


def _t(p):
    return f"{p}-{_uuid.uuid4().hex[:6]}"


def test_produce_then_consume_roundtrip(spark, tmp_path, monkeypatch, capsys):
    d = str(tmp_path / "topics")
    topic = _t("logs")
    monkeypatch.setattr("sys.stdin", io.StringIO("line one\nline two\n\n"))
    assert main(["produce", "-d", d, "-t", topic, "--skip-empty"]) == 0
    assert main(["consume", "-d", d, "-t", topic]) == 0
    out = capsys.readouterr().out.splitlines()
    assert sorted(out) == ["line one", "line two"]
    # json output carries uuid + metadata
    assert main(["consume", "-d", d, "-t", topic, "--output", "json"]) == 0
    recs = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert {r["payload"] for r in recs} == {"line one", "line two"}
    assert all(r["uuid"] for r in recs)


def _seed_poison(spark, d, topic, origin):
    ps = ParquetPubSub(spark, d)
    msgs = messages_df(
        spark, [new_message(f"poisoned-{i}", uuid=f"u{i}") for i in range(3)]
    )
    msgs = with_metadata(
        msgs,
        **{
            POISONED_TOPIC: origin,
            REASON_POISONED: "boom",
            DELAYED_UNTIL: "2099-01-01T00:00:00+00:00",
        },
    )
    ps.publish(topic, msgs)
    return ps


def test_pq_ls_lists_queue(spark, tmp_path, capsys):
    d = str(tmp_path / "topics")
    topic, origin = _t("poison"), _t("orders")
    _seed_poison(spark, d, topic, origin)
    assert main(["pq", "ls", "-d", d, "-t", topic, "--output", "json"]) == 0
    cap = capsys.readouterr()
    rows = [json.loads(l) for l in cap.out.splitlines()]
    assert len(rows) == 3
    assert all(r["origin"] == origin and r["reason"] == "boom" for r in rows)
    assert "3 message(s)" in cap.err
    # table output: header + 3 rows
    assert main(["pq", "ls", "-d", d, "-t", topic]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert len(lines) == 4 and lines[0].startswith("uuid")


def test_pq_requeue_moves_to_origin_and_strips_delay(spark, tmp_path, capsys):
    d = str(tmp_path / "topics")
    topic, origin = _t("poison"), _t("orders")
    ps = _seed_poison(spark, d, topic, origin)
    assert main(["pq", "requeue", "-d", d, "-t", topic, "--uuid", "u1"]) == 0
    # u1 moved to origin with retries incremented and delay stripped
    back = {r["uuid"]: dict(r["metadata"]) for r in ps.subscribe(origin).collect()}
    assert set(back) == {"u1"}
    assert back["u1"][REQUEUER_RETRIES] == "1"
    assert DELAYED_UNTIL not in back["u1"]
    # queue keeps the other two
    left = {r["uuid"] for r in ps.subscribe(topic).collect()}
    assert left == {"u0", "u2"}
    # requeue the rest (no --uuid = all)
    assert main(["pq", "requeue", "-d", d, "-t", topic]) == 0
    assert ps.subscribe(topic).count() == 0
    assert ps.subscribe(origin).count() == 3


def test_pq_ack_removes_forever(spark, tmp_path, capsys):
    d = str(tmp_path / "topics")
    topic, origin = _t("poison"), _t("orders")
    ps = _seed_poison(spark, d, topic, origin)
    # refuses without a selection
    assert main(["pq", "ack", "-d", d, "-t", topic]) == 2
    assert main(["pq", "ack", "-d", d, "-t", topic, "--uuid", "u0"]) == 0
    assert {r["uuid"] for r in ps.subscribe(topic).collect()} == {"u1", "u2"}
    assert main(["pq", "ack", "-d", d, "-t", topic, "--all"]) == 0
    assert ps.subscribe(topic).count() == 0
    # nothing ever reached the origin topic
    assert ps.subscribe(origin).count() == 0


def test_produce_consume_iofile_transport(spark, tmp_path, monkeypatch, capsys):
    """--transport iofile: messages land as NDJSON lines any shell tool can
    read, and consume round-trips them."""
    d = str(tmp_path / "ndjson")
    topic = _t("logs")
    monkeypatch.setattr("sys.stdin", io.StringIO("alpha\nbeta\n"))
    assert main(["produce", "-d", d, "-t", topic, "--transport", "iofile"]) == 0
    import os

    files = os.listdir(d)
    assert len(files) == 1 and files[0].endswith(".ndjson")
    assert main(["consume", "-d", d, "-t", topic, "--transport", "iofile"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert sorted(out) == ["alpha", "beta"]


def test_produce_consume_sqlite_transport(spark, tmp_path, monkeypatch, capsys):
    db = str(tmp_path / "bus.sqlite3")
    topic = _t("cmds")
    monkeypatch.setattr("sys.stdin", io.StringIO("one\n"))
    assert main(["produce", "-d", db, "-t", topic, "--transport", "sqlite"]) == 0
    assert main(["consume", "-d", db, "-t", topic, "--transport", "sqlite",
                 "--output", "json"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert [r["payload"] for r in rows] == ["one"]

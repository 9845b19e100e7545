"""watermill-io analog transport: NDJSON framing over streams and files.

Covers what the universal suite (which runs FilePubSub as a full transport)
does not: the pipe-shaped IOPublisher/IOSubscriber pair, topic multiplexing
on one byte stream, junk-line tolerance, shell interop, and the distributed
(JVM-parsed) read path of FilePubSub.
"""

from __future__ import annotations

import io
import json
import subprocess

import pytest

from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import FilePubSub, IOPublisher, IOSubscriber
from watermill_spark.sources.iofile import (
    marshal_message_line,
    unmarshal_message_line,
)


def _msgs(n, prefix="p"):
    return [
        new_message(payload=f"{prefix}-{i}", metadata={"n": str(i)})
        for i in range(n)
    ]


def test_io_roundtrip_stringio(spark):
    """Publisher → one in-memory stream → Subscriber: payload + metadata
    fidelity, exactly the io.Writer/io.Reader shape."""
    buf = io.StringIO()
    pub = IOPublisher(spark, buf, close_writer=False)
    msgs = _msgs(20)
    pub.publish("t1", messages_df(spark, msgs))

    buf.seek(0)
    sub = IOSubscriber(spark, buf, close_reader=False)
    got = {r["uuid"]: r for r in sub.subscribe("t1").collect()}
    assert set(got) == {m["uuid"] for m in msgs}
    for m in msgs:
        assert bytes(got[m["uuid"]]["payload"]) == m["payload"]
        assert dict(got[m["uuid"]]["metadata"]) == m["metadata"]


def test_io_stream_multiplexes_topics(spark):
    """Two topics share one stream; the embedded topic field demultiplexes,
    and subscribe('*') returns the whole stream with topics labeled."""
    buf = io.StringIO()
    pub = IOPublisher(spark, buf, close_writer=False)
    pub.publish("a", messages_df(spark, _msgs(3, "a")))
    pub.publish("b", messages_df(spark, _msgs(5, "b")))

    buf.seek(0)
    sub = IOSubscriber(spark, buf, close_reader=False)
    everything = sub.subscribe("*").collect()
    assert len(everything) == 8
    assert {r["topic"] for r in everything} == {"a", "b"}

    buf.seek(0)
    assert IOSubscriber(spark, buf, close_reader=False).subscribe("b").count() == 5


def test_io_subscriber_drains_incrementally(spark):
    """Repeated subscribe continues from the stream position (pipe-draining
    in rounds), and junk lines between messages are skipped, not fatal."""
    msgs = _msgs(4)
    lines = [marshal_message_line(m, "t") for m in msgs]
    buf = io.StringIO(
        lines[0] + "\n" + "not json at all\n" + lines[1] + "\n"
    )
    sub = IOSubscriber(spark, buf, close_reader=False)
    assert sub.subscribe("t").count() == 2
    # stream grows (a writer on the other end of the pipe)
    pos = buf.tell()
    buf.write(lines[2] + "\n" + "{\"no_uuid\": true}\n" + lines[3] + "\n")
    buf.seek(pos)
    assert sub.subscribe("t").count() == 2


def test_io_publisher_close_contract(spark):
    """close() flushes + closes the writer; publish-after-close raises
    (ErrPubSubClosed analog)."""
    buf = io.StringIO()
    pub = IOPublisher(spark, buf, close_writer=False)
    pub.publish("t", messages_df(spark, _msgs(1)))
    pub.close()
    with pytest.raises(RuntimeError):
        pub.publish("t", messages_df(spark, _msgs(1)))


def test_marshal_line_roundtrip_unit():
    """Line codec round-trip incl. None payload and empty metadata."""
    m = new_message(payload=b"\x00\xffbinary", metadata={"k": "v"})
    back = unmarshal_message_line(marshal_message_line(m, "top"))
    assert back["uuid"] == m["uuid"]
    assert back["payload"] == m["payload"]
    assert back["metadata"] == {"k": "v"}
    assert back["topic"] == "top"

    m2 = new_message(payload=b"", metadata={})
    m2["payload"] = None
    back2 = unmarshal_message_line(marshal_message_line(m2, "t"))
    assert back2["payload"] is None and back2["metadata"] == {}

    assert unmarshal_message_line("") is None
    assert unmarshal_message_line("garbage") is None
    assert unmarshal_message_line('{"no_uuid": 1}') is None


def test_file_pubsub_shell_interop(spark, tmp_path):
    """The whole point of the io transport: plain tools speak it.

    wc -l counts messages; a line appended by ANOTHER PROCESS (python -c,
    standing in for any shell producer) is a published message the Spark
    read path picks up."""
    ps = FilePubSub(spark, str(tmp_path))
    ps.publish("logs", messages_df(spark, _msgs(7)))
    path = tmp_path / "logs.ndjson"
    assert int(subprocess.check_output(["wc", "-l", str(path)]).split()[0]) == 7

    foreign = json.dumps(
        {
            "uuid": "ext-1",
            "topic": "logs",
            "metadata": {"src": "shell"},
            "payload_b64": "aGVsbG8=",  # "hello"
        }
    )
    subprocess.run(
        ["tee", "-a", str(path)],
        input=foreign + "\n",
        text=True,
        check=True,
        stdout=subprocess.DEVNULL,
    )
    rows = {r["uuid"]: r for r in ps.subscribe("logs").collect()}
    assert len(rows) == 8
    assert bytes(rows["ext-1"]["payload"]) == b"hello"
    assert dict(rows["ext-1"]["metadata"]) == {"src": "shell"}


def test_file_pubsub_read_is_jvm_side(spark, tmp_path):
    """The distributed read path stays whole-stage-codegen'd JVM work:
    no BatchEvalPython / ArrowEvalPython in the parse plan, and the junk
    filter is part of the scan stage."""
    ps = FilePubSub(spark, str(tmp_path))
    ps.publish("t", messages_df(spark, _msgs(10)))
    plan = ps.subscribe("t")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_file_pubsub_junk_lines_skipped(spark, tmp_path):
    ps = FilePubSub(spark, str(tmp_path))
    ps.publish("t", messages_df(spark, _msgs(3)))
    with open(tmp_path / "t.ndjson", "a", encoding="utf-8") as f:
        f.write("\n# comment\n{\"broken\n")
    assert ps.subscribe("t").count() == 3


def test_io_subscriber_live_fifo_does_not_block(spark, tmp_path):
    """A live pipe (writer still open) drains what's available instead of
    blocking for EOF; a partial line is buffered until its newline arrives."""
    import os as _os

    fifo = str(tmp_path / "pipe")
    _os.mkfifo(fifo)
    # open both ends non-blockingly: reader first (O_NONBLOCK), then writer
    rfd = _os.open(fifo, _os.O_RDONLY | _os.O_NONBLOCK)
    wfd = _os.open(fifo, _os.O_WRONLY)
    reader = _os.fdopen(rfd, "rb")
    try:
        msgs = _msgs(3)
        lines = [marshal_message_line(m, "t") for m in msgs]
        _os.write(wfd, (lines[0] + "\n" + lines[1] + "\n").encode())
        half = (lines[2] + "\n").encode()
        _os.write(wfd, half[: len(half) // 2])

        sub = IOSubscriber(spark, reader, close_reader=False)
        assert sub.subscribe("t").count() == 2  # returns promptly, writer open

        _os.write(wfd, half[len(half) // 2 :])
        assert sub.subscribe("t").count() == 1  # buffered partial completed
    finally:
        _os.close(wfd)
        reader.close()


def test_file_pubsub_topic_collision_isolated(spark, tmp_path):
    """Filename sanitization can collide ('a/b' vs 'a b' -> a_b.ndjson);
    the embedded wire topic keeps subscriptions isolated anyway."""
    ps = FilePubSub(spark, str(tmp_path))
    ps.publish("a/b", messages_df(spark, _msgs(3, "slash")))
    ps.publish("a b", messages_df(spark, _msgs(2, "space")))
    assert (tmp_path / "a_b.ndjson").exists()
    assert ps.subscribe("a/b").count() == 3
    assert ps.subscribe("a b").count() == 2


def test_io_subscriber_pipe_eof_flushes_partial_line(spark, tmp_path):
    """Writer closes mid-line: the unterminated tail is delivered as the
    final line (same contract as readlines on a regular file)."""
    import os as _os

    fifo = str(tmp_path / "pipe2")
    _os.mkfifo(fifo)
    rfd = _os.open(fifo, _os.O_RDONLY | _os.O_NONBLOCK)
    wfd = _os.open(fifo, _os.O_WRONLY)
    reader = _os.fdopen(rfd, "rb")
    try:
        line = marshal_message_line(_msgs(1)[0], "t")
        _os.write(wfd, line.encode())  # NO trailing newline
        sub = IOSubscriber(spark, reader, close_reader=False)
        assert sub.subscribe("t").count() == 0  # incomplete, writer open
        _os.close(wfd)
        wfd = -1
        assert sub.subscribe("t").count() == 1  # EOF flushes the tail
    finally:
        if wfd >= 0:
            _os.close(wfd)
        reader.close()


def test_io_subscriber_restores_blocking_mode(spark, tmp_path):
    """The fd is non-blocking only during a drain; the caller's mode is
    restored between rounds (shared open-file-descriptions stay sane)."""
    import os as _os

    fifo = str(tmp_path / "pipe3")
    _os.mkfifo(fifo)
    rfd = _os.open(fifo, _os.O_RDONLY | _os.O_NONBLOCK)
    wfd = _os.open(fifo, _os.O_WRONLY)
    _os.set_blocking(rfd, True)  # caller's choice: blocking
    reader = _os.fdopen(rfd, "rb")
    try:
        sub = IOSubscriber(spark, reader, close_reader=False)
        _os.write(wfd, (marshal_message_line(_msgs(1)[0], "t") + "\n").encode())
        assert sub.subscribe("t").count() == 1
        assert _os.get_blocking(rfd) is True  # restored after the drain
    finally:
        _os.close(wfd)
        reader.close()


def test_io_subscriber_sees_wrapper_buffered_bytes(spark, tmp_path):
    """Bytes a caller's readline() pre-buffered inside the BufferedReader
    are drained first, not skipped by the raw-fd reads."""
    import os as _os

    fifo = str(tmp_path / "pipe4")
    _os.mkfifo(fifo)
    rfd = _os.open(fifo, _os.O_RDONLY | _os.O_NONBLOCK)
    wfd = _os.open(fifo, _os.O_WRONLY)
    reader = _os.fdopen(rfd, "rb")
    try:
        lines = [marshal_message_line(m, "t") for m in _msgs(3)]
        _os.write(wfd, ("# header\n" + "\n".join(lines) + "\n").encode())
        # caller skips the header — BufferedReader slurps everything
        # available into its internal buffer doing so
        assert reader.readline() == b"# header\n"
        sub = IOSubscriber(spark, reader, close_reader=False)
        assert sub.subscribe("t").count() == 3
    finally:
        _os.close(wfd)
        reader.close()

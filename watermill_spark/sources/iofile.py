"""NDJSON line-protocol Pub/Sub — the watermill-io transport analog.

Parity target (public watermill-io package; the core contract it implements
is `/root/reference/message/pubsub.go:8-51`): a Publisher that marshals each
message through a writer (files, stdout, pipes) and a Subscriber that splits
a reader back into messages — the transport people use to glue watermill to
shell pipelines, log files, and fifos. Topic rides inside the marshaled
line, so one byte stream can multiplex topics (watermill-io passes the topic
to its MarshalMessageFunc the same way).

Wire format — one JSON object per line (NDJSON):

    {"uuid": ..., "topic": ..., "created_at": "...Z",
     "metadata": {...}, "payload_b64": "..."}

Payload is base64 (it is BINARY; raw bytes would break the line framing).

Spark-first / 100-TB stance:

- ``FilePubSub``'s READ path is fully distributed: ``spark.read.text`` over
  the topic file + ``from_json``/``unbase64`` JVM-side (no Python in the
  parse). NDJSON text is line-splittable, so a topic file that grew to many
  GB still scans as parallel tasks with column pruning on the parsed struct.
- The WRITE path is a driver-side append: a single sequential byte stream
  is what this transport IS (same stance as the SQL transport's collect —
  control-plane streams; bulk traffic rides parquet/kafka).
- ``IOPublisher``/``IOSubscriber`` wrap arbitrary file-like objects (the
  io.Writer/io.Reader shape) for pipe/stdin/stdout interop; they are
  driver-side by nature and bounded by the stream they wrap.
"""

from __future__ import annotations

import base64
import json
import os
import re
import threading
from collections import defaultdict
from datetime import datetime, timezone
from typing import IO, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

from watermill_spark.message import MESSAGE_SCHEMA, ensure_message_df

from .base import PubSub

_TOPIC_RE = re.compile(r"[^A-Za-z0-9_.-]")

# Schema of one marshaled line (parsed JVM-side with from_json).
LINE_SCHEMA = StructType(
    [
        StructField("uuid", StringType()),
        StructField("topic", StringType()),
        StructField("created_at", StringType()),
        StructField("metadata", MapType(StringType(), StringType())),
        StructField("payload_b64", StringType()),
    ]
)


def marshal_message_line(row, topic: str) -> str:
    """One message Row/dict → one NDJSON line (sorted keys: byte-stable)."""
    get = row.__getitem__
    payload = get("payload")
    meta = dict(get("metadata") or {})
    return json.dumps(
        {
            "uuid": get("uuid"),
            "topic": topic,
            "created_at": datetime.now(timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%S.%fZ"
            ),
            "metadata": meta,
            "payload_b64": (
                base64.b64encode(bytes(payload)).decode("ascii")
                if payload is not None
                else None
            ),
        },
        sort_keys=True,
    )


def unmarshal_message_line(line: str) -> dict | None:
    """One line → message dict (MESSAGE_SCHEMA keys); None for junk lines."""
    line = line.strip()
    if not line:
        return None
    try:
        obj = json.loads(line)
    except ValueError:
        return None
    if not isinstance(obj, dict) or "uuid" not in obj:
        return None
    b64 = obj.get("payload_b64")
    return {
        "uuid": obj["uuid"],
        "metadata": dict(obj.get("metadata") or {}),
        "payload": base64.b64decode(b64) if b64 is not None else None,
        "topic": obj.get("topic"),
        "event_time": None,
    }


def _parse_lines_df(spark: SparkSession, lines_df: DataFrame) -> DataFrame:
    """text lines → MESSAGE_SCHEMA, entirely JVM-side (from_json + unbase64);
    junk/blank lines (no parseable uuid) are dropped, matching
    ``unmarshal_message_line``."""
    m = F.from_json(F.col("value"), LINE_SCHEMA)
    return (
        lines_df.select(m.alias("m"))
        .where(F.col("m.uuid").isNotNull())
        .select(
            F.col("m.uuid").alias("uuid"),
            F.coalesce(
                F.col("m.metadata"),
                F.expr("map()").cast(MapType(StringType(), StringType())),
            ).alias("metadata"),
            F.unbase64(F.col("m.payload_b64")).alias("payload"),
            F.col("m.topic").alias("topic"),
            F.lit(None).cast("timestamp").alias("event_time"),
        )
    )


class IOPublisher(PubSub):
    """Marshal every published message as one line into a caller-supplied
    file-like object (the io.Writer shape: an open file, a pipe, stdout).

    Subscribe is unsupported — pair with :class:`IOSubscriber` on the read
    end. ``close`` flushes and (by default) closes the underlying stream,
    as watermill-io's publisher closes its WriteCloser.
    """

    def __init__(self, spark: SparkSession, writer: IO[str],
                 close_writer: bool = True):
        super().__init__(spark)
        self._writer = writer
        self._close_writer = close_writer
        self._lock = threading.Lock()

    def publish(self, topic: str, df: DataFrame) -> None:
        self._check_open()
        rows = ensure_message_df(df).collect()
        chunk = "".join(marshal_message_line(r, topic) + "\n" for r in rows)
        with self._lock:
            self._writer.write(chunk)
            self._writer.flush()

    def subscribe(self, topic: str) -> DataFrame:
        raise NotImplementedError("IOPublisher is write-only; use IOSubscriber")

    def close(self) -> None:
        if not self._closed:
            with self._lock:
                try:
                    self._writer.flush()
                finally:
                    if self._close_writer:
                        self._writer.close()
        super().close()


class IOSubscriber(PubSub):
    """Split a caller-supplied reader back into messages (io.Reader shape).

    ``subscribe(topic)`` drains everything currently readable and returns
    the messages whose embedded topic matches; ``subscribe("*")`` returns
    the whole multiplexed stream (topic column tells them apart). Repeated
    calls continue from the stream position — a pipe can be drained in
    rounds. Junk lines are skipped, not fatal (a log file may interleave
    non-message lines).

    Live pipes/FIFOs: a blocking ``readlines()`` would hang until the
    writer closes, so non-seekable streams with a real fd are drained with
    non-blocking reads — each drain returns the COMPLETE lines available
    right now and buffers any trailing partial line for the next round
    (flushed as the final line once the writer closes). The fd is flipped
    to non-blocking only for the duration of a drain and restored after.
    Pass BINARY/raw file objects for live pipes (``os.fdopen(fd, "rb")``) —
    a text-mode wrapper's internal buffer has no ``peek`` and bytes it
    pre-buffered would be invisible to the raw-fd reads. Seekable objects
    (files, StringIO) keep the plain readlines path.
    """

    def __init__(self, spark: SparkSession, reader: IO[str],
                 close_reader: bool = True):
        super().__init__(spark)
        self._reader = reader
        self._close_reader = close_reader
        self._lock = threading.Lock()
        self._partial = b""  # trailing unterminated line from a pipe drain
        try:
            fd = reader.fileno()
            self._pipe_fd = fd if not reader.seekable() else None
        except (AttributeError, OSError, ValueError):
            self._pipe_fd = None  # StringIO etc.

    def _read_lines(self) -> list[str]:
        if self._pipe_fd is None:
            return self._reader.readlines()
        # consume bytes the wrapping BufferedReader may have pre-buffered
        # (a caller's readline() before handing us the stream would
        # otherwise leave them invisible to the raw-fd reads below);
        # text-mode wrappers have no peek — pass binary/raw objects for
        # live pipes (as the docstring asks)
        peek = getattr(self._reader, "peek", None)
        chunks = [self._partial]
        eof = False
        # non-blocking only around the drain, restored after — the fd (and
        # any tty/open-file-description it shares) keeps the caller's mode
        # between rounds
        was_blocking = os.get_blocking(self._pipe_fd)
        os.set_blocking(self._pipe_fd, False)
        try:
            if peek is not None:
                try:
                    buffered = peek(0)
                except (BlockingIOError, ValueError):
                    buffered = b""
                if buffered:
                    chunks.append(self._reader.read(len(buffered)))
            while True:
                try:
                    b = os.read(self._pipe_fd, 1 << 16)
                except BlockingIOError:
                    break
                if not b:  # EOF: writer closed
                    eof = True
                    break
                chunks.append(b)
        finally:
            if was_blocking:
                os.set_blocking(self._pipe_fd, True)
        buf = b"".join(chunks)
        lines = buf.split(b"\n")
        self._partial = lines.pop()  # b"" when buf ends in \n
        if eof and self._partial:
            # writer closed mid-line: the unterminated tail is the final
            # line (same contract as readlines() on a regular file)
            lines.append(self._partial)
            self._partial = b""
        return [ln.decode("utf-8", errors="replace") for ln in lines]

    def _drain(self) -> Iterable[dict]:
        with self._lock:
            lines = self._read_lines()
        for line in lines:
            msg = unmarshal_message_line(line)
            if msg is not None:
                yield msg

    def publish(self, topic: str, df: DataFrame) -> None:
        raise NotImplementedError("IOSubscriber is read-only; use IOPublisher")

    def subscribe(self, topic: str) -> DataFrame:
        msgs = [
            m for m in self._drain() if topic == "*" or m["topic"] == topic
        ]
        rows = [
            (m["uuid"], m["metadata"], m["payload"], m["topic"], None)
            for m in msgs
        ]
        return self.spark.createDataFrame(rows, MESSAGE_SCHEMA)

    def close(self) -> None:
        if not self._closed and self._close_reader:
            self._reader.close()
        super().close()


class FilePubSub(PubSub):
    """Durable file-per-topic NDJSON Pub/Sub (watermill-io over files).

    ``<base_dir>/<topic>.ndjson``, append-only. Interops both ways with
    plain tools: ``wc -l`` counts messages, ``grep`` filters them, a line
    appended by any other process is a published message. The read side is
    a distributed Spark scan (module docstring), so unlike the pipe-shaped
    classes above this one is a full PubSub and runs the universal
    acceptance suite as the sixth transport.
    """

    def __init__(self, spark: SparkSession, base_dir: str):
        super().__init__(spark)
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        # concurrent publishes to ONE topic serialize (interleaved partial
        # lines would corrupt the framing); distinct topics are distinct
        # files and proceed in parallel — same stance as ParquetPubSub
        self._topic_locks: defaultdict[str, threading.Lock] = defaultdict(
            threading.Lock
        )
        self._locks_guard = threading.Lock()

    def _path(self, topic: str) -> str:
        return os.path.join(self.base_dir, _TOPIC_RE.sub("_", topic) + ".ndjson")

    def _lock(self, topic: str) -> threading.Lock:
        with self._locks_guard:
            return self._topic_locks[topic]

    def publish(self, topic: str, df: DataFrame) -> None:
        self._check_open()
        rows = ensure_message_df(df).collect()
        chunk = "".join(marshal_message_line(r, topic) + "\n" for r in rows)
        with self._lock(topic):
            with open(self._path(topic), "a", encoding="utf-8") as f:
                f.write(chunk)
                f.flush()
                os.fsync(f.fileno())

    def subscribe(self, topic: str) -> DataFrame:
        path = self._path(topic)
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            return self.spark.createDataFrame([], MESSAGE_SCHEMA)
        # topic filter on the embedded field: filename sanitization can
        # collide ('a/b' and 'a b' → a_b.ndjson) — the wire topic, not the
        # filename, is authoritative. Topic-less lines (foreign shell
        # producers that omitted the field) belong to the file's topic;
        # if colliding topics share the file, such lines surface on each of
        # them (can't be disambiguated) — foreign producers should set the
        # topic field, as examples/18 does.
        return _parse_lines_df(self.spark, self.spark.read.text(path)).where(
            (F.col("topic") == F.lit(topic)) | F.col("topic").isNull()
        )

    def subscribe_initialize(self, topic: str) -> None:
        with self._lock(topic):
            with open(self._path(topic), "a", encoding="utf-8"):
                pass

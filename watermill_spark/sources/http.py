"""HTTP Pub/Sub — the watermill-http transport analog, over real sockets.

Reference (behavioral parity target): the watermill-http package exposes a
Subscriber that is an HTTP server (each incoming request becomes one
message) and a Publisher that delivers each message as an HTTP request to a
remote endpoint — the building blocks of the webhook examples
(`_examples/real-world-examples/receiving-webhooks/main.go:30-76` consumes
the HTTP subscriber; `sending-webhooks/` drives the HTTP publisher).

Wire mapping (mirrors watermill-http's DefaultMarshalMessageFunc: payload =
request body, message metadata = headers):

- ``POST /{topic}`` with body = payload,
  ``X-Message-UUID`` header = uuid,
  ``X-Message-Metadata`` header = JSON-encoded metadata map.

Port shape: the subscriber side embeds one stdlib ``http.server`` per
transport instance on an ephemeral loopback port, buffering arrivals
per-topic (the reference subscriber buffers into its output channel the
same way); ``subscribe`` snapshots the buffer into a DataFrame. The
publisher POSTs each message of the batch; with no explicit
``publish_base_url`` it targets its own server (loopback self-delivery),
which is what lets the universal acceptance suite exercise the full
client→socket→server path.

Scale stance: HTTP is a CONTROL-plane transport (webhooks, callbacks,
command ingress) — per-message requests are the protocol's own granularity,
so the driver-side delivery loop is the honest shape. A data-plane fan-out
over HTTP would batch per partition via ``mapInPandas`` with connection
reuse; payload-heavy streams belong on the parquet/kafka transports.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame

from watermill_spark.message import MESSAGE_SCHEMA, ensure_message_df

from .base import PubSub

UUID_HEADER = "X-Message-UUID"
METADATA_HEADER = "X-Message-Metadata"


class HTTPPubSub(PubSub):
    def __init__(self, spark, publish_base_url: str | None = None):
        super().__init__(spark)
        self._buffers: dict[str, list] = {}
        self._lock = threading.Lock()
        buffers, lock = self._buffers, self._lock

        class _Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (stdlib naming)
                # Reject length-less/chunked requests instead of silently
                # buffering an empty payload: the sender would see 200 and
                # never retry — 411 makes the loss visible and retryable
                # (BaseHTTPRequestHandler does not decode chunked bodies).
                if "chunked" in (self.headers.get("Transfer-Encoding") or "").lower() \
                        or self.headers.get("Content-Length") is None:
                    self.send_response(411)  # Length Required
                    self.end_headers()
                    return
                topic = urllib.parse.unquote(self.path.strip("/"))
                body = self.rfile.read(int(self.headers["Content-Length"]))
                meta = json.loads(self.headers.get(METADATA_HEADER) or "{}")
                uuid = self.headers.get(UUID_HEADER) or ""
                with lock:
                    buffers.setdefault(topic, []).append((uuid, meta, body))
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):  # stdlib per-request stderr noise
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        self.listen_url = (
            f"http://127.0.0.1:{self._server.server_address[1]}"
        )
        self.publish_base_url = publish_base_url or self.listen_url

    def publish(self, topic: str, df: DataFrame) -> None:
        """POST each message of the batch to {base}/{topic} (one request per
        message — the protocol's granularity; see module docstring)."""
        self._check_open()
        rows = ensure_message_df(df).collect()
        url = f"{self.publish_base_url}/{urllib.parse.quote(topic, safe='')}"
        for r in rows:
            req = urllib.request.Request(
                url,
                data=bytes(r["payload"]) if r["payload"] is not None else b"",
                headers={
                    UUID_HEADER: r["uuid"],
                    METADATA_HEADER: json.dumps(dict(r["metadata"] or {})),
                    "Content-Type": "application/octet-stream",
                },
                method="POST",
            )
            try:
                # context manager: drain + close, no per-message socket leak
                with urllib.request.urlopen(req, timeout=30) as resp:
                    resp.read()
            except urllib.error.HTTPError as exc:  # non-2xx raises in urllib
                raise RuntimeError(
                    f"publish to {url} failed: HTTP {exc.code}"
                ) from exc

    def subscribe(self, topic: str) -> DataFrame:
        with self._lock:
            rows = [
                (uuid, meta, payload, None, None)
                for (uuid, meta, payload) in self._buffers.get(topic, [])
            ]
        return self.spark.createDataFrame(rows, MESSAGE_SCHEMA)

    def subscribe_initialize(self, topic: str) -> None:
        with self._lock:
            self._buffers.setdefault(topic, [])

    def topic_count(self, topic: str) -> int:
        with self._lock:
            return len(self._buffers.get(topic, []))

    def close(self) -> None:
        """Publisher close: in-flight requests completed synchronously in
        publish, so everything sent is already buffered; further publishes
        raise. The embedded server keeps serving reads (subscriber role);
        ``dispose()`` tears it down."""
        super().close()

    def dispose(self) -> None:
        self.close()
        self._server.shutdown()
        self._server.server_close()

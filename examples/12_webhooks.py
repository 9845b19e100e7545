"""Example 12 — Webhooks, both directions, over real HTTP.

Reference analogs:
- `_examples/real-world-examples/receiving-webhooks/` — an HTTP endpoint
  turns every incoming POST into a published message (watermill-http
  subscriber → Kafka publisher, `main.go:30-76`).
- `_examples/real-world-examples/sending-webhooks/` — a router consumes a
  topic and delivers each message as an HTTP POST to a downstream server
  (watermill-http publisher).

Port shape: stdlib `http.server` on ephemeral ports plays both the ingress
endpoint and the downstream webhook receiver; topics ride ParquetPubSub.
Delivery is driver-side over the collected batch — correct for webhooks,
which are a CONTROL-plane stream (low rate, external rate limits dominate).
If a webhook fan-out ever became data-plane-sized, the Spark form is
`mapInPandas` with per-partition connection reuse and bounded concurrency —
the partition count is the parallelism knob; noted here so nobody "scales"
this by looping faster on the driver.

Run:  python examples/12_webhooks.py
"""

from __future__ import annotations

import json
import tempfile
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, HTTPServer

from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub

TOPIC = "webhooks"


def _serve(handler_cls) -> tuple[HTTPServer, int]:
    srv = HTTPServer(("127.0.0.1", 0), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-webhooks")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example12-")
    ps = ParquetPubSub(spark, f"{base_dir}/topics")

    # -- ingress: HTTP POST → published message (receiving-webhooks) -------
    inbox: list[bytes] = []

    class Ingress(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (stdlib naming)
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            inbox.append(body)
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # silence stdlib request logging
            pass

    ingress_srv, ingress_port = _serve(Ingress)

    # external systems fire 5 webhooks at our endpoint
    for i in range(5):
        req = urllib.request.Request(
            f"http://127.0.0.1:{ingress_port}/webhooks",
            data=json.dumps({"object_kind": "push", "n": i}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        urllib.request.urlopen(req, timeout=10).read()

    # the endpoint publishes each received body as one message
    ps.publish(
        TOPIC,
        messages_df(
            spark, [new_message(body, metadata={"source": "http"}) for body in inbox]
        ),
    )

    # -- egress: consume topic → HTTP POST downstream (sending-webhooks) ---
    delivered: list[dict] = []

    class Downstream(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            delivered.append(json.loads(body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    down_srv, down_port = _serve(Downstream)

    rows = ps.subscribe(TOPIC).collect()
    sent = 0
    for r in rows:
        req = urllib.request.Request(
            f"http://127.0.0.1:{down_port}/hook",
            data=bytes(r["payload"]),
            headers={"Content-Type": "application/json", "X-Message-UUID": r["uuid"]},
            method="POST",
        )
        if urllib.request.urlopen(req, timeout=10).status == 200:
            sent += 1

    ingress_srv.shutdown()
    down_srv.shutdown()

    out = {
        "webhooks_received": len(inbox),
        "published": ps.subscribe(TOPIC).count(),
        "delivered_downstream": len(delivered),
        "delivered_ok": sent,
        "kinds": sorted({d["object_kind"] for d in delivered}),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()

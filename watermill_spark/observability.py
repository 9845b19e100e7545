"""Metrics + logging (SURVEY.md §2.A #42-44).

- Router metrics ≙ `components/metrics/builder.go:52-56` Prometheus
  decorators: counters (messages in/out/errors) + latency. Spark-native
  form: a `StreamingQueryListener` for per-batch rows/s and duration, and
  `df.observe()` for in-plan counters that cost nothing extra (computed
  during the pass, no second job).
- CaptureLogger ≙ `log.go` CaptureLoggerAdapter: a log-assert test helper.
- UUID/ULID generators ≙ `uuid.go:25-37`.
"""

from __future__ import annotations

import logging
import os
import time
import uuid as _uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # StreamingQueryListener import path (PySpark >= 3.4)
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[misc,assignment]


@dataclass
class BatchMetric:
    query_name: str
    batch_id: int
    num_input_rows: int
    input_rows_per_sec: float
    duration_ms: int


class RouterMetricsListener(StreamingQueryListener):
    """Collects per-batch throughput/latency for every router query —
    the `handler_execution_time_seconds` / messages counters analog.
    Export: scrape `snapshot()` from any prometheus/statsd bridge."""

    def __init__(self):
        self.batches: list[BatchMetric] = []

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        try:
            duration = int(p.durationMs.get("triggerExecution", 0))
        except Exception:  # noqa: BLE001
            duration = 0
        self.batches.append(
            BatchMetric(
                query_name=p.name or p.id,
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                input_rows_per_sec=p.inputRowsPerSecond or 0.0,
                duration_ms=duration,
            )
        )

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def snapshot(self) -> dict:
        total = sum(b.num_input_rows for b in self.batches)
        ms = sum(b.duration_ms for b in self.batches)
        return {
            "messages_total": total,
            "batches_total": len(self.batches),
            "processing_ms_total": ms,
            "throughput_msgs_per_sec": (total / (ms / 1000.0)) if ms else 0.0,
        }


def observe_counts(df: DataFrame, observation="wm_metrics") -> DataFrame:
    """In-plan counters via df.observe(): message count + error count ride
    the existing pass (no extra job) — `publish_time_seconds` counter
    analog. Pass a `pyspark.sql.Observation` to read values back in batch
    code (`obs.get`), or a name string for streaming queries (values arrive
    in StreamingQueryProgress.observedMetrics[name])."""
    from watermill_spark.streaming.router import ERROR_COL

    err = (
        F.sum(F.when(F.col(ERROR_COL).isNotNull(), 1).otherwise(0)).cast("long")
        if ERROR_COL in df.columns
        else F.lit(0).cast("long")
    )
    return df.observe(
        observation, F.count(F.lit(1)).alias("n_messages"), err.alias("n_errors")
    )


# -- Prometheus export bridge ----------------------------------------------
def _prom_label_escape(value: str) -> str:
    """Escape a label value per the Prometheus text exposition format 0.0.4:
    backslash, double-quote, and newline must be backslash-escaped or
    scrapers reject the whole exposition."""
    return value.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def prometheus_text(listener: RouterMetricsListener) -> str:
    """Render the listener's metrics in Prometheus text exposition format
    0.0.4 — the same series the reference registers
    (`components/metrics/builder.go:52-56`): per-handler message counters
    and execution-time totals, labeled by query name."""
    per_query: dict[str, dict[str, float]] = {}
    for b in listener.batches:
        q = per_query.setdefault(
            _prom_label_escape(str(b.query_name)),
            {"messages": 0, "batches": 0, "ms": 0},
        )
        q["messages"] += b.num_input_rows
        q["batches"] += 1
        q["ms"] += b.duration_ms
    lines = [
        "# HELP watermill_messages_received_total Messages consumed per handler query",
        "# TYPE watermill_messages_received_total counter",
    ]
    for name, q in sorted(per_query.items()):
        lines.append(
            f'watermill_messages_received_total{{handler_name="{name}"}} '
            f"{int(q['messages'])}"
        )
    lines += [
        "# HELP watermill_handler_execution_time_seconds_total Cumulative batch execution time per handler query",
        "# TYPE watermill_handler_execution_time_seconds_total counter",
    ]
    for name, q in sorted(per_query.items()):
        lines.append(
            f'watermill_handler_execution_time_seconds_total{{handler_name="{name}"}} '
            f"{q['ms'] / 1000.0:.6f}"
        )
    lines += [
        "# HELP watermill_batches_total Micro-batches processed per handler query",
        "# TYPE watermill_batches_total counter",
    ]
    for name, q in sorted(per_query.items()):
        lines.append(
            f'watermill_batches_total{{handler_name="{name}"}} {int(q["batches"])}'
        )
    return "\n".join(lines) + "\n"


def serve_metrics_http(
    listener: RouterMetricsListener, port: int = 0, addr: str = "127.0.0.1"
):
    """`components/metrics/http.go` CreateRegistryAndServeHTTP analog:
    serve `prometheus_text(listener)` at /metrics on a daemon thread.

    Returns (server, actual_port); call `server.shutdown()` to stop. Uses
    only the stdlib http.server — no prometheus client dependency. Runs on
    the DRIVER (metrics are driver-side listener state), which is also
    where a Spark-cluster scrape target belongs.
    """
    import http.server
    import threading

    class _Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path.rstrip("/") not in ("", "/metrics"):
                self.send_response(404)
                self.end_headers()
                return
            body = prometheus_text(listener).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    server = http.server.ThreadingHTTPServer((addr, port), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]


# -- logging ---------------------------------------------------------------
class CaptureLogger(logging.Handler):
    """CaptureLoggerAdapter analog (`log.go:189-272`): records every record
    for assertions in tests."""

    def __init__(self):
        super().__init__()
        self.records: list[logging.LogRecord] = []

    def emit(self, record: logging.LogRecord) -> None:
        self.records.append(record)

    def has(self, level: int, needle: str) -> bool:
        return any(
            r.levelno == level and needle in r.getMessage() for r in self.records
        )


def get_logger(name: str = "watermill_spark") -> logging.Logger:
    """StdLoggerAdapter analog: leveled, field-capable via `extra`."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s")
        )
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


# -- id generators ---------------------------------------------------------
_ULID_ALPHABET = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"  # Crockford base32


def new_uuid() -> str:
    """`uuid.go:25-27` NewUUID (v4)."""
    return str(_uuid.uuid4())


def new_short_uuid() -> str:
    """`uuid.go:30-32` NewShortUUID: base57-ish compact encoding."""
    return _uuid.uuid4().hex[:22]


def new_ulid() -> str:
    """`uuid.go:35-37` NewULID: 48-bit ms timestamp + 80 random bits,
    Crockford base32 — lexicographically sortable by creation time."""
    ts = int(time.time() * 1000) & ((1 << 48) - 1)
    rand = int.from_bytes(os.urandom(10), "big")
    n = (ts << 80) | rand
    chars = []
    for _ in range(26):
        chars.append(_ULID_ALPHABET[n & 0x1F])
        n >>= 5
    return "".join(reversed(chars))

"""Transport/router message-throughput probe — the direct analog of the
reference's Pub/Sub benchmark headline (`/root/reference/README.md`
Benchmarks table: GoChannel in-process 138,743 msg/s subscribe, 331k
publish; BASELINE.md pins these as the comparator).

Measures, on this host:

1. publish N messages into a transport (batch publish, the engine's unit);
2. route them: subscribe → passthrough handler (full middleware-capable
   path, `Router.run_once`) → publish to an out topic;
3. subscribe the out topic and count.

Reported msg/s = N / wall for each leg, plus end-to-end. Run:

    python tools_bench_pubsub.py [N] [transport]   # default 200000 memory

transports: memory (GoChannel analog), parquet, iofile, sqlite.
Spark amortizes per-batch overhead across rows, so throughput RISES with
batch size — report several Ns when comparing to the reference's
channel-at-a-time numbers (which are batch-size-independent).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import uuid as _uuid


def _make_messages_df(spark, n: int):
    """N synthetic messages born as a DataFrame (JVM-side generation: the
    honest engine-native path — messages enter as rows, not Python dicts)."""
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.expr("uuid()").alias("uuid"),
            F.create_map(F.lit("n"), F.col("id").cast("string")).alias("metadata"),
            F.concat(F.lit("payload-"), F.col("id")).cast("binary").alias("payload"),
            F.lit(None).cast("string").alias("topic"),
            F.lit(None).cast("timestamp").alias("event_time"),
        )
    )


def _transport(spark, name: str, workdir: str):
    from watermill_spark import sources as S

    if name == "parquet":
        return S.ParquetPubSub(spark, f"{workdir}/topics")
    if name == "iofile":
        return S.FilePubSub(spark, f"{workdir}/ndjson")
    if name == "sqlite":
        return S.SQLitePubSub(spark, f"{workdir}/bus.sqlite3")
    return S.MemoryPubSub(spark)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    name = sys.argv[2] if len(sys.argv) > 2 else "memory"

    from watermill_spark.session import get_spark
    from watermill_spark.streaming import Router
    from watermill_spark.streaming.router import passthrough_handler

    spark = get_spark("pubsub-bench")
    workdir = tempfile.mkdtemp(prefix="wm-pubsub-bench-")
    ps = _transport(spark, name, workdir)
    tin, tout = (f"bench-{_uuid.uuid4().hex[:6]}-{p}" for p in ("in", "out"))

    df = _make_messages_df(spark, n).localCheckpoint(eager=True)  # exclude gen

    t0 = time.monotonic()
    ps.publish(tin, df)
    t_pub = time.monotonic() - t0

    router = Router()
    router.add_handler("h", tin, ps, tout, ps, passthrough_handler)
    t0 = time.monotonic()
    router.run_once()
    t_route = time.monotonic() - t0

    t0 = time.monotonic()
    got = ps.subscribe(tout).count()
    t_sub = time.monotonic() - t0
    assert got == n, (got, n)

    print(json.dumps({
        "transport": name,
        "messages": n,
        "publish_msgs_per_sec": round(n / t_pub),
        "route_msgs_per_sec": round(n / t_route),
        "subscribe_msgs_per_sec": round(n / t_sub),
        "end_to_end_msgs_per_sec": round(n / (t_pub + t_route + t_sub)),
        "publish_sec": round(t_pub, 3),
        "route_sec": round(t_route, 3),
        "subscribe_sec": round(t_sub, 3),
    }, sort_keys=True))


if __name__ == "__main__":
    main()

"""Operator-facing CLI: `python -m watermill_spark.tools <command>`.

Analog of the reference's two CLI tools:

- `mill` (`/root/reference/tools/mill/README.md:1-12`): produce (stdin
  lines -> messages) and consume (messages -> stdout) against a Pub/Sub.
  Here the transport is the parquet-dir Pub/Sub (the in-repo persistent
  transport), so the same stdin/stdout piping patterns work:

      myservice | python -m watermill_spark.tools produce -d /data/topics -t logs
      python -m watermill_spark.tools consume -d /data/topics -t logs >> local.log

- `pq` (`/root/reference/tools/pq/README.md:1-5`,
  `tools/pq/cli/backend.go:28-32` Backend{AllMessages, Requeue, Ack}):
  browse a poison/requeue topic, requeue messages to their origin topic,
  or ack (drop) them. The reference's TUI is replaced by plain subcommands
  (`pq ls` / `pq requeue` / `pq ack`) — same three operations,
  pipe-friendly output.

  Semantics note: the reference's Requeue rewrites `_watermill_delayed_until`
  to "now" in place and lets the requeuer service pick the row up
  (`tools/pq/README.md` Commands). The parquet transport has no in-place
  update, so `pq requeue` here is the equivalent *move*: publish back to
  the origin topic (via the existing `Requeuer`, which increments
  `_watermill_requeuer_retries`) and remove from the queue topic. `pq ack`
  removes without republishing — "be careful — you will lose the message
  forever".
"""

from __future__ import annotations

import argparse
import json
import sys

__all__ = ["main"]


def _spark():
    from watermill_spark.session import get_spark

    return get_spark("watermill-tools")


def _pubsub(spark, base_dir: str, transport: str = "parquet"):
    """Transport factory for produce/consume (the mill CLI is pluggable
    over pub/subs the same way): parquet (default, topic dirs), iofile
    (NDJSON file per topic — shell-composable), sqlite (path = db file).
    The pq browser stays parquet-only: its remove primitive rewrites the
    topic dir."""
    if transport == "iofile":
        from watermill_spark.sources import FilePubSub

        return FilePubSub(spark, base_dir)
    if transport == "sqlite":
        from watermill_spark.sources import SQLitePubSub

        return SQLitePubSub(spark, base_dir)
    from watermill_spark.sources import ParquetPubSub

    return ParquetPubSub(spark, base_dir)


def cmd_produce(args) -> int:
    """stdin lines -> messages (auto UUID, empty metadata), one publish.

    Mirrors `tools/mill/cmd/produce.go`: payload = the line; batching the
    whole stdin into one publish keeps it a single parquet append."""
    from watermill_spark.message import messages_df, new_message

    lines = [ln.rstrip("\n") for ln in sys.stdin]
    lines = [ln for ln in lines if ln] if args.skip_empty else lines
    if not lines:
        print("no input lines; nothing published", file=sys.stderr)
        return 0
    spark = _spark()
    ps = _pubsub(spark, args.dir, getattr(args, "transport", "parquet"))
    ps.publish(args.topic, messages_df(spark, [new_message(ln) for ln in lines]))
    print(f"published {len(lines)} message(s) to {args.topic!r}", file=sys.stderr)
    return 0


def cmd_consume(args) -> int:
    """messages -> stdout. Default prints payloads (mill's consume mode);
    --output json adds uuid/metadata per line (the 'easily attainable by
    modification of the marshaling function' variant, as a flag)."""
    spark = _spark()
    ps = _pubsub(spark, args.dir, getattr(args, "transport", "parquet"))
    rows = ps.subscribe(args.topic).collect()
    for r in rows:
        payload = bytes(r["payload"] or b"").decode("utf-8", "replace")
        if args.output == "json":
            print(
                json.dumps(
                    {
                        "uuid": r["uuid"],
                        "payload": payload,
                        "metadata": dict(r["metadata"] or {}),
                    },
                    sort_keys=True,
                )
            )
        else:
            print(payload)
    return 0


def _pq_rows(ps, topic: str):
    from pyspark.sql import functions as F

    from watermill_spark.streaming.middleware import (
        DELAYED_FOR,
        DELAYED_UNTIL,
        POISONED_HANDLER,
        POISONED_TOPIC,
        REASON_POISONED,
    )

    meta = F.coalesce(F.col("metadata"), F.create_map())
    return (
        ps.subscribe(topic)
        .select(
            "uuid",
            F.substring(F.col("payload").cast("string"), 1, 60).alias("payload"),
            F.element_at(meta, POISONED_TOPIC).alias("origin"),
            F.element_at(meta, POISONED_HANDLER).alias("handler"),
            F.element_at(meta, REASON_POISONED).alias("reason"),
            F.element_at(meta, DELAYED_UNTIL).alias("delayed_until"),
            F.element_at(meta, DELAYED_FOR).alias("delayed_for"),
        )
        .collect()
    )


def cmd_pq_ls(args) -> int:
    """Browse the queue (`tools/pq/cli/backend.go:29` AllMessages)."""
    spark = _spark()
    ps = _pubsub(spark, args.dir)
    rows = _pq_rows(ps, args.topic)
    if args.output == "json":
        for r in rows:
            print(json.dumps(r.asDict(), sort_keys=True, default=str))
    else:
        cols = ("uuid", "origin", "handler", "reason", "delayed_until", "payload")
        widths = {
            c: max([len(c)] + [len(str(r[c] or "")) for r in rows]) for c in cols
        }
        print("  ".join(c.ljust(widths[c]) for c in cols))
        for r in rows:
            print("  ".join(str(r[c] or "").ljust(widths[c]) for c in cols))
    print(f"{len(rows)} message(s) in {args.topic!r}", file=sys.stderr)
    return 0


class _FilteredSubscriber:
    """Adapter: restrict a subscriber to selected UUIDs (pq acts on one
    highlighted message; this is the batch-CLI equivalent) and strip stale
    delay metadata — the reference's Requeue resets `_watermill_delayed_until`
    to now so the message is instantly deliverable (`tools/pq/README.md`
    Commands); the move-based equivalent is dropping the old delay keys."""

    def __init__(self, inner, uuids):
        self._inner = inner
        self._uuids = uuids

    def subscribe(self, topic):
        from pyspark.sql import functions as F

        from watermill_spark.streaming.middleware import (
            DELAYED_FOR,
            DELAYED_UNTIL,
        )

        df = self._inner.subscribe(topic)
        if self._uuids:
            df = df.filter(df["uuid"].isin(list(self._uuids)))
        return df.withColumn(
            "metadata",
            F.map_filter(
                F.coalesce(F.col("metadata"), F.create_map()),
                lambda k, _: ~k.isin(DELAYED_UNTIL, DELAYED_FOR),
            ),
        )


def _remove_from_topic(spark, ps, topic: str, uuids) -> int:
    """Drop messages (all, or by uuid) from a parquet topic by rewriting
    the topic dir — the transport's only delete primitive. Returns the
    number of removed messages."""
    import glob
    import os
    import shutil

    from watermill_spark.message import MESSAGE_COLUMNS

    df = ps.subscribe(topic)
    total = df.count()
    keep = df.filter(~df["uuid"].isin(list(uuids))) if uuids else df.limit(0)
    kept_rows = keep.select(*MESSAGE_COLUMNS).collect()
    d = ps._dir(topic)
    with ps._lock(topic):
        for f in glob.glob(os.path.join(d, "*")):
            (shutil.rmtree if os.path.isdir(f) else os.remove)(f)
    if kept_rows:
        from watermill_spark.message import MESSAGE_SCHEMA

        ps.publish(topic, spark.createDataFrame(kept_rows, MESSAGE_SCHEMA))
    return total - len(kept_rows)


def cmd_pq_requeue(args) -> int:
    """Move messages back to their origin topic (`backend.go:30` Requeue):
    republish via Requeuer (retries metadata incremented, delay stripped by
    delivery-time semantics) then remove from the queue topic."""
    from watermill_spark.components.requeuer import Requeuer

    spark = _spark()
    ps = _pubsub(spark, args.dir)
    uuids = set(args.uuid or [])
    sub = _FilteredSubscriber(ps, uuids)
    n_before = len([r for r in _pq_rows(ps, args.topic) if not uuids or r["uuid"] in uuids])
    Requeuer(
        subscriber=sub,
        publisher=ps,
        requeue_topic=args.topic,
        destination_topic=args.destination,
        delay_sec=args.delay,
    ).run_once()
    removed = _remove_from_topic(spark, ps, args.topic, uuids)
    print(
        f"requeued {n_before} message(s) from {args.topic!r}"
        f" (removed {removed} from queue)",
        file=sys.stderr,
    )
    return 0


def cmd_pq_ack(args) -> int:
    """Remove messages from the queue forever (`backend.go:31` Ack)."""
    if not args.uuid and not args.all:
        print("pq ack: pass --uuid UUID (repeatable) or --all", file=sys.stderr)
        return 2
    spark = _spark()
    ps = _pubsub(spark, args.dir)
    removed = _remove_from_topic(spark, ps, args.topic, set(args.uuid or []))
    print(f"acked (removed) {removed} message(s) from {args.topic!r}", file=sys.stderr)
    return 0


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m watermill_spark.tools",
        description=__doc__.split("\n\n")[0],
    )
    sub = p.add_subparsers(dest="command", required=True)

    def add_common(sp):
        sp.add_argument("-d", "--dir", required=True, help="topics base dir")
        sp.add_argument("-t", "--topic", required=True, help="topic name")

    def add_transport(sp):
        sp.add_argument(
            "--transport",
            choices=("parquet", "iofile", "sqlite"),
            default="parquet",
            help="topic storage: parquet dirs (default), NDJSON files "
            "(iofile; -d is the files dir), or sqlite (-d is the db path)",
        )

    sp = sub.add_parser("produce", help="stdin lines -> messages (mill produce)")
    add_common(sp)
    add_transport(sp)
    sp.add_argument("--skip-empty", action="store_true", help="drop blank lines")
    sp.set_defaults(fn=cmd_produce)

    sp = sub.add_parser("consume", help="messages -> stdout (mill consume)")
    add_common(sp)
    add_transport(sp)
    sp.add_argument("--output", choices=("payload", "json"), default="payload")
    sp.set_defaults(fn=cmd_consume)

    pq = sub.add_parser("pq", help="poison/requeue queue browser (pq tool)")
    pqsub = pq.add_subparsers(dest="pq_command", required=True)

    sp = pqsub.add_parser("ls", help="list queue messages")
    add_common(sp)
    sp.add_argument("--output", choices=("table", "json"), default="table")
    sp.set_defaults(fn=cmd_pq_ls)

    sp = pqsub.add_parser("requeue", help="republish to origin topic + remove")
    add_common(sp)
    sp.add_argument("--uuid", action="append", help="only this uuid (repeatable)")
    sp.add_argument(
        "--destination",
        default=None,
        help="override destination (default: each message's poisoned-on topic)",
    )
    sp.add_argument("--delay", type=int, default=0, help="requeue delay seconds")
    sp.set_defaults(fn=cmd_pq_requeue)

    sp = pqsub.add_parser("ack", help="remove messages (forever)")
    add_common(sp)
    sp.add_argument("--uuid", action="append", help="this uuid (repeatable)")
    sp.add_argument("--all", action="store_true", help="drop every message")
    sp.set_defaults(fn=cmd_pq_ack)

    return p


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    return args.fn(args)

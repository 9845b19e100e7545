"""Example 11 — Realtime feed: one post stream, two independent consumers
behind the full production middleware stack.

Reference analog: `_examples/basic/2-realtime-feed/` — producers publish
`postAdded` to `posts_published`; a router consumes it twice, each handler
its own consumer group: `posts_counter` (re-publishes running counts to
`posts_count`) and `feed_generator` (terminal consumer building the feed).
The consumer wires the canonical middleware onion
(`consumer/main.go:42-73`): Recoverer, Throttle, PoisonQueue, Retry,
CorrelationID + chaos.

Two deliberate Spark-first translations:
- the reference's counter is ONE atomic int (`consumer/main.go:119-131`) —
  the single thing in that app that cannot scale. Here the running count is
  partitioned by author (window over (author, seq)): same feed semantics,
  shard-parallel at any data size.
- chaos (RandomFail) is replaced by a deterministic bad message — a post
  whose payload isn't JSON — so the run is reproducible; `fail_rows` marks
  what each handler couldn't process and the poison queue absorbs it
  (per-handler DLQ, like per-consumer-group DLQs on Kafka).

Run:  python examples/11_realtime_feed.py
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming.middleware import (
    correlation_id,
    fail_rows,
    poison_queue,
    recoverer,
    retry,
    throttle,
)
from watermill_spark.streaming.router import Router, RouterConfig

POSTS = "posts_published"


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-realtime-feed")
    base_dir = base_dir or tempfile.mkdtemp(prefix="wm-example11-")
    ps = ParquetPubSub(spark, f"{base_dir}/topics")

    # 1. producers: 19 posts from 4 authors, plus one malformed payload
    posts = [
        new_message(
            json.dumps({"author": f"author-{i % 4}", "title": f"post #{i}"}),
            metadata={"seq": str(i)},
        )
        for i in range(19)
    ]
    posts.append(new_message("{not json", metadata={"seq": "19"}))
    ps.publish(POSTS, messages_df(spark, posts))

    # 2. the consumer router, middleware onion in reference order
    router = Router(RouterConfig(fail_on_unhandled_errors=False))
    router.add_middleware(
        recoverer(),      # handler exceptions → error rows, never a crash
        throttle(10),     # ≤10 messages per handler invocation
        poison_queue(ps, "poison_queue"),
        retry(max_retries=1),
        correlation_id,
    )

    payload_str = F.col("payload").cast("string")
    author = F.get_json_object(payload_str, "$.author")

    def posts_counter(df):
        """postAdded → postsCountUpdated, count partitioned by author."""
        w = Window.partitionBy(author).orderBy(
            F.element_at("metadata", "seq").cast("int")
        )
        count_payload = F.to_binary(
            F.to_json(
                F.struct(
                    author.alias("author"),
                    F.row_number().over(w).alias("new_count"),
                )
            ),
            F.lit("utf-8"),
        )
        return df.withColumn(
            "payload", F.when(author.isNotNull(), count_payload).otherwise(F.col("payload"))
        )

    feed: dict[str, int] = {}

    def feed_generator(df):
        """Terminal consumer: production would persist the feed; here it
        aggregates per author into driver-side storage (printFeedStorage
        analog)."""
        for r in (
            df.withColumn("author", author)
            .filter(F.col("author").isNotNull())
            .groupBy("author")
            .agg(F.count(F.lit(1)).alias("posts"))
            .collect()
        ):
            feed[r["author"]] = feed.get(r["author"], 0) + r["posts"]
        return df

    router.add_handler(
        "posts_counter",
        POSTS, ps,
        "posts_count", ps,
        posts_counter,
        middleware=[
            fail_rows(
                F.get_json_object(payload_str, "$.new_count").isNull(),
                "uncountable post payload",
            )
        ],
    )
    router.add_consumer_handler(
        "feed_generator",
        POSTS, ps,
        feed_generator,
        middleware=[fail_rows(author.isNull(), "invalid post payload")],
    )
    router.run_once()

    out = {
        "published": 20,
        "counted": ps.subscribe("posts_count").count(),
        "feed_posts": int(sum(feed.values())),
        "feed_authors": len(feed),
        "poisoned": ps.subscribe("poison_queue").count(),  # 1 per handler DLQ
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()

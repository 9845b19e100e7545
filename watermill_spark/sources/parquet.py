"""Persistent Pub/Sub: one parquet directory per topic.

The durable transport for local/cluster use without Kafka: publish appends
parquet files; batch subscribe scans the dir; streaming subscribe is a file
source (`readStream.schema(...).parquet(dir)`) which Structured Streaming
checkpoints by file — giving exactly the replayable-log semantics of the
reference's persistent GoChannel (`pubsub/gochannel/pubsub.go:115-122,
243-261`): new subscribers replay the backlog; nack ⇒ checkpoint replay.

Scale: append-only parquet with per-batch files is the standard streaming
file-sink layout; compaction is a maintenance concern outside the transport.
A real deployment would use Delta/Iceberg or Kafka; the contract is the same.
"""

from __future__ import annotations

import os
import threading
from collections import defaultdict

from pyspark.sql import DataFrame

from watermill_spark.message import MESSAGE_SCHEMA, ensure_message_df

from .base import PubSub


class ParquetPubSub(PubSub):
    def __init__(self, spark, base_dir: str):
        super().__init__(spark)
        self.base_dir = base_dir
        # Publish must be thread-safe (message/pubsub.go:13-18). Concurrent
        # appends to ONE topic dir race on the FileOutputCommitter's shared
        # `_temporary` staging dir (one writer's commit deletes the other's
        # staging), so appends serialize per topic; distinct topics still
        # publish in parallel. Kafka/Delta transports don't need this — their
        # commit protocols are concurrent by design.
        self._topic_locks: defaultdict[str, threading.Lock] = defaultdict(
            threading.Lock
        )
        self._locks_guard = threading.Lock()

    def _dir(self, topic: str) -> str:
        return os.path.join(self.base_dir, topic)

    def _lock(self, topic: str) -> threading.Lock:
        with self._locks_guard:
            return self._topic_locks[topic]

    def publish(self, topic: str, df: DataFrame) -> None:
        self._check_open()
        with self._lock(topic):
            ensure_message_df(df).write.mode("append").parquet(self._dir(topic))

    def subscribe(self, topic: str) -> DataFrame:
        d = self._dir(topic)
        if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)
        ):
            return self.spark.createDataFrame([], MESSAGE_SCHEMA)
        return self.spark.read.schema(MESSAGE_SCHEMA).parquet(d)

    def subscribe_stream(
        self, topic: str, max_files_per_trigger: int | None = None
    ) -> DataFrame:
        """Streaming subscribe (file source, checkpointed by file).

        ``ignoreMissingFiles`` is load-bearing for `compact()`: the
        generation swap renames the old files away, so a micro-batch
        planned over the old listing would otherwise kill the query with
        FILE_NOT_EXIST (observed at sf1 volume). With the option set, the
        swapped-away files are skipped — and the consolidated generation
        re-delivers the ENTIRE topic as new files, so nothing is lost:
        at-least-once is preserved by the swap itself and the duplicates
        are absorbed by the uuid-idempotent sink (the transport's
        documented pairing). Without a concurrent compact, files never
        vanish and the option is inert.
        """
        self.subscribe_initialize(topic)
        r = (
            self.spark.readStream.schema(MESSAGE_SCHEMA)
            .option("ignoreMissingFiles", "true")
        )
        if max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        return r.parquet(self._dir(topic))

    def subscribe_initialize(self, topic: str) -> None:
        os.makedirs(self._dir(topic), exist_ok=True)

    def topic_file_stats(self, topic: str) -> dict:
        """Operational surface: file count + bytes of a topic directory (the
        small-files pressure gauge that decides when to compact)."""
        d = self._dir(topic)
        files = [
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        ] if os.path.isdir(d) else []
        return {"n_files": len(files), "bytes": sum(os.path.getsize(f) for f in files)}

    def compact(self, topic: str, target_files: int = 1) -> dict:
        """Rewrite a topic's accumulated micro-batch files into
        `target_files` consolidated files (the streaming small-files fix:
        every `publish`/micro-batch appends a file; scans slow down as the
        file count grows — compaction restores scan efficiency without
        changing topic contents).

        Generation-swap protocol (no transactional log on plain parquet):
        write the consolidated copy to a sibling `<topic>.compact-tmp` dir,
        then atomically rename old→trash, new→live, then delete trash.
        A reader holding the old LISTING plans against paths that no
        longer exist after the swap — batch readers fail that one read and
        retry against the new generation; streaming readers skip the
        vanished files (`ignoreMissingFiles`, see `subscribe_stream`) and
        re-receive the full contents as the consolidated files, which are
        new to the checkpoint (at-least-once, uuid-idempotent sink absorbs
        it). Production would use Delta/Iceberg `OPTIMIZE`, which is this
        operation behind a real log.

        Returns {before: n_files, after: n_files}.
        """
        import shutil

        d = self._dir(topic)
        before = self.topic_file_stats(topic)["n_files"]
        if before <= target_files:
            return {"before": before, "after": before}
        tmp = d + ".compact-tmp"
        trash = d + ".compact-trash"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        (
            self.spark.read.schema(MESSAGE_SCHEMA)
            .parquet(d)
            .repartition(target_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.rename(d, trash)
        os.rename(tmp, d)
        shutil.rmtree(trash, ignore_errors=True)
        return {"before": before, "after": self.topic_file_stats(topic)["n_files"]}

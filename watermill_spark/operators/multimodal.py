"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partition sizing, Arrow-batched UDF
signatures, batch shapes — is real and tested; the codec kernels (actual
JPEG/wav/mp4 decode) are STUBBED behind `_decode_media` with a deterministic
fake, clearly marked, because no media libraries exist in this container. On
a real cluster one swaps `_decode_media`'s body for PIL/libav calls — the
dataflow around it does not change.

Design rules for 100 TB of media:
- media rows are WIDE (payload up to MBs): keep
  `spark.sql.files.maxPartitionBytes` at default 128 MB so a partition holds
  ~hundreds of items, and NEVER collect payloads to the driver.
- decode / feature-extract run in `mapInPandas` — one Arrow batch in, one
  out, so Python touches columnar buffers, not rows; metadata-only
  transforms stay JVM-side (never enter Python).
- derived features (dims, fingerprints, embeddings) are small typed columns
  — write them to a separate table keyed by content hash so re-featurizing
  never rewrites payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

_FEATURE_FIELDS = [
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("content_sha", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
]
FEATURE_SCHEMA = StructType(_FEATURE_FIELDS)


def media_df(spark: SparkSession, items: list[tuple[int, str, bytes]]) -> DataFrame:
    """Build a media table from (id, kind, payload) triples (test helper)."""
    rows = [(i, k, f"{k}/x-fake", p, {"src": "synthetic"}) for i, k, p in items]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _make_decode_kernel():
    """Build the mapInPandas decode kernel as a self-contained closure.

    Deliberately a nested function: cloudpickle ships closures BY VALUE
    (code + captured constants), so executors never need `watermill_spark`
    importable — the kernel runs on a bare cluster without --py-files.
    Module-level functions would pickle by reference and fail on workers
    that lack the repo on sys.path.
    """
    columns = [f.name for f in _FEATURE_FIELDS]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """mapInPandas kernel: decode each media item → feature row.

        Receives Arrow batches of MEDIA_SCHEMA, yields batches of
        FEATURE_SCHEMA. Payload bytes stay inside the batch — no per-row
        Python round trip to the JVM.
        """
        import hashlib as _hl

        import pandas as _pd

        def decode(payload: bytes, kind: str) -> dict:
            # STUB CODEC — deterministic fake standing in for PIL/libav.
            # Real deployment: replace this body with the actual decoder;
            # schemas/batching/partitioning around it are production
            # plumbing. Pseudo-dimensions derive from the content hash so
            # tests are reproducible end-to-end.
            h = _hl.sha256(payload).digest()
            if kind == "image":
                return {"width": 64 + h[0], "height": 64 + h[1], "n_frames": 1}
            if kind == "video":
                return {
                    "width": 64 + h[0],
                    "height": 64 + h[1],
                    "n_frames": 8 + h[2] % 24,
                }
            return {"width": None, "height": None, "n_frames": None}  # audio

        for pdf in batches:
            feats = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                d = decode(data, kind)
                feats.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "content_sha": _hl.sha256(data).hexdigest(),
                        "n_bytes": len(data),
                        "width": d["width"],
                        "height": d["height"],
                        "n_frames": d["n_frames"],
                    }
                )
            yield _pd.DataFrame(feats, columns=columns)

    return kernel


decode_stub_batch = _make_decode_kernel()


def extract_features(media: DataFrame) -> DataFrame:
    """media table → feature table (Arrow-batched, one pass).

    Only the columns the kernel reads cross the JVM→Python boundary
    (guide §4.1: Spark cannot see inside an opaque function, so an
    un-projected mapInPandas would ship — and read from storage — every
    column, including ``meta``/``mime`` that the decoder never touches).
    """
    return media.select("media_id", "kind", "payload").mapInPandas(
        decode_stub_batch, FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index. Frame *extraction* is part of the stubbed codec; the explode of
    sampled indices — the part that shapes the distributed plan — is real
    JVM-side work (no Python), producing (media_id, frame_idx) work units
    that a downstream mapInPandas decoder consumes."""
    feats = extract_features(media.filter(F.col("kind") == "video"))
    idxs = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return feats.select(
        "media_id", "content_sha", F.explode(idxs).alias("frame_idx")
    )


def resize_plan(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Image/video resize planning: integer target dimensions preserving
    aspect ratio with the long side capped at ``max_side``. The *plan* is
    pure JVM integer arithmetic on decoded dimensions — the actual pixel
    resample belongs to the (stubbed) codec kernel downstream, consuming
    (media_id, target_w, target_h) work units."""
    feats = extract_features(media.filter(F.col("kind") != "audio"))
    long_side = F.greatest("width", "height")
    needs = long_side > max_side
    tw = F.when(
        needs, F.floor((F.col("width") * max_side) / long_side).cast("int")
    ).otherwise(F.col("width"))
    th = F.when(
        needs, F.floor((F.col("height") * max_side) / long_side).cast("int")
    ).otherwise(F.col("height"))
    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        tw.alias("target_w"),
        th.alias("target_h"),
        needs.alias("needs_resize"),
    )


def audio_chunks(media: DataFrame, win: int = 128, hop: int = 64) -> DataFrame:
    """Audio chunking plumbing: one row per (overlapping) analysis window —
    start/end sample offsets derived from the decoded sample count (stub:
    1 byte = 1 sample). Chunk fan-out is JVM-side sequence+explode; the
    downstream feature extractor (spectrogram, embedding) consumes these
    bounded work units batch-wise in mapInPandas."""
    feats = extract_features(media.filter(F.col("kind") == "audio"))
    n_chunks = F.floor((F.col("n_bytes") + hop - 1) / hop).cast("int")
    idxs = F.sequence(F.lit(0), n_chunks - 1)
    return feats.select(
        "media_id", "content_sha", F.col("n_bytes").alias("n_samples"),
        F.explode(idxs).alias("chunk_idx"),
    ).select(
        "media_id",
        "content_sha",
        "n_samples",
        "chunk_idx",
        (F.col("chunk_idx") * hop).cast("bigint").alias("start_sample"),
        F.least(F.col("chunk_idx") * hop + win, F.col("n_samples"))
        .cast("bigint")
        .alias("end_sample"),
    )

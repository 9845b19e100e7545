"""Multimodal feature-extraction queries over the documents table.

The media table is derived deterministically from ``documents`` (payload =
UTF-8 bytes of the text, kind cycles image/audio/video by doc_id), then run
through the REAL Arrow-batched ``mapInPandas`` decode plumbing in
:mod:`watermill_spark.operators.multimodal`. The codec kernel is a stub
(sha256-derived pseudo-dimensions — no media libs in this container), but
precisely because the stub is deterministic arithmetic, DuckDB can replay it
in SQL and the driver hash-checks the whole Python-UDF path end-to-end:
Arrow batch transfer, schema, null handling, explode fan-out.

Scale notes (100 TB of media):
- the features query reads (doc_id, text) only — column pruning keeps the
  payload scan minimal; with real media the payload column IS the bulk, and
  the same plan streams it through Python once, batch-wise, never to the
  driver.
- frame sampling fans out JVM-side (sequence+explode after the feature
  pass), so per-frame work units are generated without re-entering Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from watermill_spark.operators.multimodal import MEDIA_SCHEMA, extract_features, frame_sample
from watermill_spark.session import tune_session

from .registry import load, register, spread

# CASE doc_id % 3: 0→image, 1→audio, 2→video
_SQL_KIND = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)
# byte k of the sha256 digest, as INTEGER (hex pair k of the hex string)
def _sql_byte(k: int) -> str:
    return f"CAST(('0x' || substr(sha256(text), {2 * k + 1}, 2)) AS INTEGER)"


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.lit("x/fake").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("src"), F.col("source")).alias("meta"),
    )


@register(
    "q_multimodal_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           {_SQL_KIND} AS kind,
           sha256(text) AS content_sha,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN doc_id % 3 = 1 THEN NULL
                ELSE CAST(64 + {_sql_byte(0)} AS INTEGER) END AS width,
           CASE WHEN doc_id % 3 = 1 THEN NULL
                ELSE CAST(64 + {_sql_byte(1)} AS INTEGER) END AS height,
           CASE WHEN doc_id % 3 = 0 THEN 1
                WHEN doc_id % 3 = 2 THEN CAST(8 + {_sql_byte(2)} % 24 AS INTEGER)
                ELSE NULL END AS n_frames
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    Exercises the full multimodal plumbing: binary payload column, typed
    metadata, MEDIA_SCHEMA → FEATURE_SCHEMA batch transform. The oracle
    replays the deterministic stub codec in SQL, so a hash match proves the
    Python batch path (not just the plan) is correct.
    """
    tune_session(spark)
    media = _media_from_documents(spark, sf_dir)
    assert media.schema == MEDIA_SCHEMA or [f.name for f in media.schema] == [
        f.name for f in MEDIA_SCHEMA
    ]
    return extract_features(media)


@register(
    "q_multimodal_frame_sample",
    oracle=f"""
    SELECT media_id, content_sha, CAST(unnest(range(0, n_frames, 4)) AS INTEGER)
             AS frame_idx
    FROM (
      SELECT doc_id AS media_id, sha256(text) AS content_sha,
             8 + {_sql_byte(2)} % 24 AS n_frames
      FROM documents WHERE doc_id % 3 = 2)
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: per-frame work units fanned out JVM-side.

    One row per every-4th frame index of each video. The explode happens
    after the (cheap) feature pass, so frame extraction workers downstream
    receive (media_id, frame_idx) units without Python in the loop.
    """
    tune_session(spark)
    media = _media_from_documents(spark, sf_dir)
    return frame_sample(media, every_n=4)

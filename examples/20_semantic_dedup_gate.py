"""Example 20 — streaming SEMANTIC dedup gate (embedding near-dups).

The companion to example 19: that gate suppresses *surface-form* near-dups
(MinHash over tokens); this one suppresses *semantic* near-dups — documents
whose embeddings point the same way even when their tokens differ (the
SemDeDup observation). At the 100-TB front door both run side by side over
the same transport.

1. documents arrive on ``vecs_raw`` with their embedding as the payload
   (utf-8 JSON array) and ``doc_id`` metadata — some are verbatim
   re-submissions under new ids (the planted near-dups), one has no
   embedding yet (must pass through: the gate never blocks on missing
   features);
2. `StreamingEmbeddingDedupFilter` (`streaming/dedup.py`) admits
   first-seen vectors to ``vecs_clean`` and rejects near-dups to
   ``vecs_dup`` with a ``DUP_OF`` stamp naming the admitted doc that
   blocked them. Candidates come from multi-table bit-sampling LSH bands
   (`analytics/similarity.py::hyperplane_bands` — cross-engine pinned by
   `q_dedup_embedding_lsh_pairs`); a bucket collision alone never rejects,
   only an exact ``round(cosine, 6) >= tau`` verification does.

Everything is micro-batched, checkpointed, and idempotent per batch; the
band + vector registry is a parquet table, not driver state, so the same
wiring scales to a cluster transport unchanged.

Run:  python examples/20_semantic_dedup_gate.py
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming.dedup import DUP_OF, StreamingEmbeddingDedupFilter

TAU = 0.95  # real near-dup threshold: corpus cross-cosines top out ~0.5


def main(spark=None, base_dir: str | None = None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-semantic-dedup")
    base = base_dir or tempfile.mkdtemp(prefix="wm-example20-")
    ps = ParquetPubSub(spark, os.path.join(base, "topics"))

    # 1. corpus vectors, plus every 10th re-submitted under a new id
    #    (id 1000+k, AFTER the originals — first-seen-wins blames the
    #    original), plus one doc whose embedding isn't computed yet
    vecs = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") < 50)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .orderBy("vec_id")
        .collect()
    )
    msgs = [
        new_message(json.dumps(list(r.emb)), metadata={"doc_id": str(r.vec_id)},
                    uuid=f"v{r.vec_id}")
        for r in vecs
    ] + [
        new_message(json.dumps(list(r.emb)), metadata={"doc_id": str(1000 + r.vec_id)},
                    uuid=f"v{1000 + r.vec_id}")
        for r in vecs
        if r.vec_id % 10 == 0
    ] + [
        new_message("null", metadata={"doc_id": "2000"}, uuid="v2000"),
    ]
    ps.publish("vecs_raw", messages_df(spark, msgs))

    # 2. the gate: admitted -> vecs_clean, semantic near-dups -> vecs_dup
    gate = StreamingEmbeddingDedupFilter(
        spark, os.path.join(base, "registry"), tau=TAU
    )
    q = gate.attach(ps, "vecs_raw", "vecs_clean", "vecs_dup",
                    os.path.join(base, "ck"))
    q.awaitTermination(300)

    clean = ps.subscribe("vecs_clean")
    dup = ps.subscribe("vecs_dup").select(
        F.element_at("metadata", "doc_id").cast("long").alias("doc_id"),
        F.element_at("metadata", DUP_OF).cast("long").alias("dup_of"),
    )
    return {
        "raw": len(msgs),
        "clean": clean.count(),
        "semantic_dups": {r.doc_id: r.dup_of for r in dup.collect()},
        "no_embedding_passed": clean.filter(
            F.element_at("metadata", "doc_id") == "2000"
        ).count(),
        "registry_vec_rows": gate.registry_vecs().count(),
    }


if __name__ == "__main__":
    print(json.dumps(main(), indent=2, default=int))

"""Similarity search over the ``embeddings`` table (array<float> vectors).

Brute-force cosine top-k is the exactness baseline; the LSH/IVF-bucketed
variants are the scale path (candidate pruning before exact scoring).

Determinism: dot products are computed by a *sequential* left-to-right fold
(`F.aggregate` in Spark, `list_dot_product`-equivalent loop in DuckDB) over
DOUBLE-cast elements, so both engines produce bit-identical IEEE results;
ranking ties are broken by vec_id.

Scale design: the query set is tiny and broadcast; candidates stream through
a narrow map (no shuffle) into a per-query top-k (`row_number` ≤ k after one
shuffle on query_id — k rows kept per partition by WindowGroupLimit). For a
billion-vector corpus the IVF variant prunes to the nearest cells first, so
the exact scoring touches ~n_probe/n_cells of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from watermill_spark.session import tune_session

from .registry import load, register

K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold dot product of two double arrays (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_SQL_COSINE = (
    "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
)


@register(
    "q_knn_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, sim FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({_SQL_COSINE}, 6) AS sim,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY round({_SQL_COSINE}, 6) DESC, c.vec_id)
               AS rn
      FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
      CROSS JOIN embeddings c
      WHERE c.vec_id <> q.vec_id)
    WHERE rn <= {K}
    """,
    bench=True,
)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: exact ANN baseline.

    Plan: broadcast the query vectors, narrow map computing cosine against
    every corpus vector, per-query top-k via row_number. The only shuffle is
    the final tiny top-k window on query_id.
    """
    tune_session(spark)
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").cast("array<double>").alias("c_emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("q_emb")
    )
    sim = F.round(cosine("q_emb", "c_emb"), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .drop("rn")
    )


@register(
    "q_knn_by_label",
    oracle=f"""
    SELECT query_id, neighbor_id, sim FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({_SQL_COSINE}, 6) AS sim,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY round({_SQL_COSINE}, 6) DESC, c.vec_id)
               AS rn
      FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
      JOIN embeddings c ON c.label = q.label AND c.vec_id <> q.vec_id)
    WHERE rn <= {K}
    """,
)
def q_knn_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned (IVF-style) ANN: restrict scoring to the query's cell.

    ``label`` stands in for an IVF cell id (at scale: nearest-centroid
    assignment, same plan shape). The equi-join on the cell id prunes the
    candidate set before exact scoring — the candidate scan reads
    ~1/n_cells of the corpus per query.
    """
    tune_session(spark)
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").cast("array<double>").alias("c_emb"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    sim = F.round(cosine("q_emb", "c_emb"), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        corpus.join(
            F.broadcast(queries),
            (F.col("c_label") == F.col("q_label")) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .drop("rn")
    )


@register(
    "q_embedding_norms",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
           CAST(len(embedding) AS BIGINT) AS dim
    FROM embeddings
    """,
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector norms + dimension audit (sanity surface for the ANN path)."""
    tune_session(spark)
    emb = load(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        "label",
        F.round(F.sqrt(_dot(e, e)), 6).alias("l2_norm"),
        F.size("embedding").cast("bigint").alias("dim"),
    )

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

from .registry import load, register, spread

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
    emb = spread(load(spark, sf_dir, "embeddings"))
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
    emb = spread(load(spark, sf_dir, "embeddings"))
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


NBITS = 8  # hyperplane count for the LSH signature
_P1, _P2, _MOD = 73856093, 19349663, 97  # deterministic pseudo-random plane signs


def _plane_sign(j, d):
    """±1 sign of hyperplane j at dimension d — pure integer arithmetic so
    Spark and DuckDB derive bit-identical planes with no shared RNG."""
    return F.when(((j * _P1 + d * _P2) % _MOD) % 2 == 0, F.lit(1.0)).otherwise(
        F.lit(-1.0)
    )


def lsh_bucket(emb: Column) -> Column:
    """Random-hyperplane LSH bucket id (NBITS sign bits packed into a long).

    bit j = sign(<v, plane_j>); planes are deterministic ±1 vectors. Vectors
    with small angle agree on most bits, so equal buckets ⇒ likely-near.
    The dot is rounded to 6 places before the sign test so float summation
    order can never flip a bit between engines.
    """
    def bit(j):
        dot = F.aggregate(
            F.transform(emb, lambda x, i: x * _plane_sign(j, i)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(
            F.round(dot, 6) >= 0, F.pow(F.lit(2.0), j).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(NBITS - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc + bit(j),
    )


_SQL_BUCKET = f"""
  CAST(list_sum(list_transform(range(0,{NBITS}), j ->
    CASE WHEN round(list_sum(list_transform(range(1, len(embedding)+1), d ->
           CAST(embedding[d] AS DOUBLE) *
           (CASE WHEN ((j*{_P1} + (d-1)*{_P2}) % {_MOD}) % 2 = 0
                 THEN 1.0 ELSE -1.0 END))), 6) >= 0
    THEN (1 << j) ELSE 0 END)) AS BIGINT)
"""


@register(
    "q_ann_lsh_hyperplane",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings)
    SELECT query_id, neighbor_id, bucket, sim FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
             round({_SQL_COSINE}, 6) AS sim,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY round({_SQL_COSINE}, 6) DESC, c.vec_id)
               AS rn
      FROM (SELECT * FROM sig WHERE vec_id < {N_QUERIES}) q
      JOIN sig c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id)
    WHERE rn <= {K}
    """,
)
def q_ann_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: random-hyperplane signatures prune candidates
    before exact cosine rescoring — the billion-vector scale path.

    Plan: one narrow map stamps every vector with an 8-bit hyperplane
    signature (pure JVM expression — no UDF, no shuffle), then candidates
    are equi-joined to the broadcast query set on the bucket id, exact-
    rescored, and top-k'd per query. The corpus is touched once; only
    same-bucket rows (~1/2^bits of all pairs per band) reach the scorer.
    At scale, multiple bands (repeat with different plane seeds, union)
    trade recall vs. cost exactly like MinHash LSH banding.
    """
    tune_session(spark)
    emb = spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    sig = emb.withColumn("bucket", lsh_bucket(F.col("emb")))
    corpus = sig.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket").alias("c_bucket"),
        F.col("emb").alias("c_emb"),
    )
    queries = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "bucket", F.col("emb").alias("q_emb")
    )
    sim = F.round(cosine("q_emb", "c_emb"), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        corpus.join(
            F.broadcast(queries),
            (F.col("c_bucket") == F.col("bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", "bucket", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .drop("rn")
    )


@register(
    "q_dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.40
    ORDER BY sim DESC, a_id, b_id
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact baseline).

    All (a < b) pairs with cosine ≥ threshold. This is the exactness oracle
    for embedding dedup; it is O(n²) by construction, so at 100 TB it is
    never run directly — the production path is `q_ann_lsh_hyperplane`'s
    bucket join (candidates = same-bucket pairs only) followed by this exact
    rescoring filter. Kept brute-force here because the oracle must be
    recall-perfect, and LSH pruning is probabilistic.
    """
    tune_session(spark)
    emb = spread(load(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").cast("array<double>").alias("a_emb")
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").cast("array<double>").alias("b_emb")
    )
    sim = F.round(cosine("a_emb", "b_emb"), 6)
    return (
        a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", sim.alias("sim"))
        .filter(F.col("sim") >= 0.40)
        .orderBy(F.desc("sim"), "a_id", "b_id")
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
    emb = spread(load(spark, sf_dir, "embeddings"))
    e = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        "label",
        F.round(F.sqrt(_dot(e, e)), 6).alias("l2_norm"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


# -- multi-table hyperplane banding (streaming near-dup + pair mining) -------

#: defaults calibrated to the synthetic corpus: its true near-dup pairs sit
#: at cosine 0.40-0.48 (θ ≈ 61-66°, per-plane agree-prob ≈ 0.63-0.66), so a
#: single long signature would never collide them. 16 tables × 4 bits gives
#: per-table collision ≈ 0.63⁴ ≈ 0.16 and overall recall ≈ 1-(1-0.16)¹⁶ ≈
#: 0.94 at the decision threshold. Production corpora with real near-dups
#: (cosine ≥ 0.9) raise N_BITS and the verify threshold together — the
#: recall math is the same banding trade MinHash-LSH makes.
N_TABLES = 16
N_BAND_BITS = 4


def hyperplane_bands(
    emb: Column, n_tables: int = N_TABLES, n_bits: int | Column = N_BAND_BITS
) -> Column:
    """array<struct<band_idx int, band_key long>> — one packed-sign-bit key
    per hash table, by BIT-SAMPLING LSH (Indyk–Motwani): bit (t, b) is the
    sign of coordinate d(t,b) = (t*_P1 + b*_P2) mod dim — an axis-aligned
    hyperplane chosen by deterministic integer arithmetic, so Spark and
    DuckDB derive bit-identical bands with no shared RNG.

    Why axis-aligned instead of `lsh_bucket`'s ±1-plane dots: (1) cost — one
    element_at + compare per bit instead of a dim-term dot, which keeps the
    banding ~dim× cheaper in Catalyst's interpreted higher-order-function
    path (measured: the dot form needed ~8 ms/row at 16 tables × 15 bits,
    stalling the sf5 sweep; this form is sub-µs); (2) determinism — the sign
    test reads a STORED value with no arithmetic before it, so there is no
    float-summation-order hazard at all, stronger than the round-to-6
    guard. For centered, roughly isotropic coordinates the per-bit
    agreement probability is the same 1 − θ/π as a random hyperplane (sign
    agreement of a bivariate normal), so the banding recall math is
    unchanged; when n_tables·n_bits exceeds dim, axes repeat across tables
    and table independence degrades gracefully (documented LSH trade).

    ``n_bits`` may be a Column (e.g. a corpus-size-derived width broadcast
    from a 1-row aggregate) — that is how `q_dedup_embedding_lsh_pairs`
    keeps expected bucket occupancy O(1) at any corpus size.

    Pure nested higher-order JVM expression — no UDF, no shuffle: the 100-TB
    cost is one narrow map over the vectors.
    """
    nb = F.lit(n_bits).cast("long") if isinstance(n_bits, int) else n_bits.cast("long")
    dim = F.size(emb).cast("long")

    def key(t: Column) -> Column:
        def bit(b: Column) -> Column:
            d = (t.cast("long") * _P1 + b.cast("long") * _P2) % dim
            return F.when(
                F.element_at(emb, (d + 1).cast("int")) >= 0,
                F.pow(F.lit(2.0), b).cast("long"),
            ).otherwise(F.lit(0).cast("long"))

        return F.aggregate(
            F.sequence(F.lit(0), (nb - 1).cast("int")),
            F.lit(0).cast("long"),
            lambda acc, b: acc + bit(b),
        )

    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.struct(
            t.cast("int").alias("band_idx"), key(t).alias("band_key")
        ),
    )


def sql_hyperplane_bands(n_tables: int = N_TABLES, n_bits: int | str = N_BAND_BITS) -> str:
    """DuckDB mirror of `hyperplane_bands`, as a lateral-join fragment:
    emits (band_idx, band_key) per input row given a lateral `range(0,{n})
    r(t)`. Generated from the SAME constants so the two engines cannot
    drift (the ADVICE-r4 lesson from diagnostic_doc_sample's SQL mirror).
    ``n_bits`` may be a SQL expression string (e.g. ``p.nb`` from a 1-row
    CTE) — the adaptive-width mirror.
    """
    return f"""
      CAST(r.t AS INTEGER) AS band_idx,
      CAST(list_sum(list_transform(range(0,{n_bits}), b ->
        CASE WHEN embedding[CAST((r.t*{_P1} + b*{_P2}) % len(embedding) AS INT) + 1] >= 0
        THEN (1 << b) ELSE 0 END)) AS BIGINT) AS band_key
    """


EMB_DEDUP_TAU = 0.40  # corpus-calibrated: matches q_dedup_embedding_cosine

#: adaptive band width: expected bucket occupancy n/2^nb stays O(1) at any
#: corpus size, so the band self-join's candidate volume is O(n · tables),
#: never n²/2^const. The price is recall at a FIXED similarity threshold
#: decaying as the corpus grows (p_agree^nb per table) — the fundamental
#: LSH trade; production pins nb to the target corpus size and raises the
#: threshold in step. Both engines derive nb from the same COUNT, so
#: parity is exact at every SF.
_SQL_NB = "GREATEST(4, CAST(ceil(log2(count(*))) AS INT))"


def _nb_col() -> Column:
    return F.greatest(F.lit(4), F.ceil(F.log2(F.count(F.lit(1))))).cast("int")


@register(
    "q_dedup_embedding_lsh_pairs",
    oracle=f"""
    WITH p AS (SELECT {_SQL_NB} AS nb FROM embeddings),
    bands AS (
      SELECT vec_id, {sql_hyperplane_bands(n_bits="p.nb")}
      FROM embeddings, p, range(0,{N_TABLES}) r(t)),
    cand AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.vec_id < b.vec_id)
    SELECT a_id, b_id,
           round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                        CAST(eb.embedding AS DOUBLE[])), 6) AS sim
    FROM cand
    JOIN embeddings ea ON ea.vec_id = a_id
    JOIN embeddings eb ON eb.vec_id = b_id
    WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                       CAST(eb.embedding AS DOUBLE[])), 6)
          >= {EMB_DEDUP_TAU}
    ORDER BY sim DESC, a_id, b_id
    """,
)
def q_dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup PAIRS the scale way: multi-table hyperplane-LSH
    candidates (recall stage), exact cosine re-score (precision stage).

    This is `q_dedup_embedding_cosine`'s production twin — same output
    contract (a_id < b_id, sim ≥ τ) with the LSH recall trade made
    explicit: band width adapts to the corpus (`_SQL_NB` docstring), so
    candidate volume is O(n·tables) at ANY scale — the design that
    survives the sf5 sweep where a fixed 4-bit band would stall in an
    n²/16 self-join — while recall at the fixed τ decays with corpus
    growth and is printed against the brute-force twin. It is also the
    batch face of `streaming/dedup.py::StreamingEmbeddingDedupFilter`:
    both build bands with `hyperplane_bands`, so this query's DuckDB
    parity pins the banding expression family the streaming filter
    trusts.

    Plan at 100 TB: a 1-row corpus-count aggregate broadcast picks the
    band width (BNLJ by necessity, 1-row build side — the whitelisted
    scalar-subquery shape); one narrow map + explode stamps 16
    (band_idx, band_key) rows per vector; the self-equi-join on the band
    shuffles those narrow keys only; DISTINCT bounds re-scoring to unique
    candidate pairs; the two joins back to `embeddings` fetch vectors for
    exactly the candidates instead of carrying 64 doubles through the
    band shuffle.
    """
    tune_session(spark)
    emb = spread(load(spark, sf_dir, "embeddings"))
    p = emb.agg(_nb_col().alias("nb"))
    bands = emb.crossJoin(p).select(
        "vec_id",
        F.explode(
            hyperplane_bands(
                F.col("embedding").cast("array<double>"), N_TABLES, F.col("nb")
            )
        ).alias("band"),
    ).select("vec_id", F.col("band.band_idx").alias("band_idx"),
             F.col("band.band_key").alias("band_key"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"))
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("a_id"),
                    F.col("embedding").cast("array<double>").alias("a_emb"))
    eb = emb.select(F.col("vec_id").alias("b_id"),
                    F.col("embedding").cast("array<double>").alias("b_emb"))
    sim = F.round(cosine("a_emb", "b_emb"), 6)
    return (
        cand.join(ea, "a_id")
        .join(eb, "b_id")
        .select("a_id", "b_id", sim.alias("sim"))
        .filter(F.col("sim") >= EMB_DEDUP_TAU)
        .orderBy(F.desc("sim"), "a_id", "b_id")
    )

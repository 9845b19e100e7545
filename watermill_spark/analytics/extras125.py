"""Analytics batch 133: MinHash-Jaccard estimator calibration, dataset
split balance audit, and a shingle-size dedup sensitivity sweep.

MinHash signature agreement IS a Jaccard estimator — this batch measures
its bias/error against exact Jaccard on the LSH candidates, the
calibration run that justifies a signature length. Split balance is the
mundane-but-critical op before any training run: assign train/val/test
deterministically by content hash and verify the strata stay
representative (a skewed split silently invalidates eval). The shingle
sweep answers "what n-gram size should dedup use?" by computing
candidate-pair Jaccard at shingle sizes 1/2/3 in one pass — bigger
shingles sharpen near-dup contrast at the cost of recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from watermill_spark.session import tune_session

from .dedup import (
    _SQL_MINHASH_CTES_SAMPLED,
    diagnostic_doc_sample,
    lsh_candidate_pairs,
    minhash_signatures,
)
from .det import bcount, dec
from .registry import load, register, spread

_D15 = "decimal(38,15)"
_SPLIT = (("train", 0, 8), ("val", 8, 9), ("test", 9, 10))  # md5 decile cuts


@register(
    "q_minhash_jaccard_calibration",
    oracle=_SQL_MINHASH_CTES_SAMPLED
    + """
    , toksets AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
      FROM sdocs
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             CAST((CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END
                 + CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END
                 + CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END
                 + CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END
                 + CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END
                 + CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END
                 + CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END
                 + CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END) AS DOUBLE)
               / 8.0 AS j_est,
             CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE)
               / (len(ta.ts) + len(tb.ts) - len(list_intersect(ta.ts, tb.ts)))
               AS j_true
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.doc_a
      JOIN sigs sb ON sb.doc_id = c.doc_b
      JOIN toksets ta ON ta.doc_id = c.doc_a
      JOIN toksets tb ON tb.doc_id = c.doc_b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(j_est AS DECIMAL(38,15))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_j_est,
           round(CAST(SUM(CAST(j_true AS DECIMAL(38,15))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_j_true,
           round(CAST(SUM(CAST(j_est - j_true AS DECIMAL(38,15))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_bias,
           round(CAST(SUM(CAST(abs(j_est - j_true) AS DECIMAL(38,15)))
                      AS DOUBLE) / COUNT(*), 6) AS mean_abs_err
    FROM scored
    """,
)
def q_minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration on the LSH candidate pairs: the
    8-signature agreement fraction (the MinHash Jaccard estimate,
    E[agree] = J exactly) against the true token Jaccard — mean
    estimate/truth, bias, and mean absolute error. The justification
    run for the signature length behind q_dedup_minhash_lsh: MAE here
    ~ 1/√k, so doubling signatures buys √2 sharper thresholds; a
    candidate-conditional bias shows the banding's selection effect
    (pairs that collide skew high — visible in mean_bias > 0).

    Determinism: signatures are lexicographic-min md5 (engine-identical);
    agreement counts are integers; Jaccards divide exact integer set
    sizes; all means ride DECIMAL(38,15).

    Scale (rewritten after the sf5 engine sweep): scoring is
    candidates-only, but on this near-dup-saturated corpus the candidate
    CLIQUE volume is itself quadratic by ground truth (~11G pairs at sf5,
    one 94k-doc band bucket). Calibration is a DIAGNOSTIC — its MAE
    estimate needs O(10^4) pairs, not all of them — so it runs on the
    deterministic ``diagnostic_doc_sample`` (full corpus ≤ 5000 docs, so
    every sf ≤ 0.1 value is unchanged; 1/16 md5 doc-slice above = uniform
    1/256 pair sample), mirrored exactly in the oracle's sdocs CTE.
    Production dedup (star edges / signature clusters) never pays this:
    only the grading does, and grading samples. §2.B [NS] /
    LLM-pipeline surface.
    """
    tune_session(spark)
    docs = diagnostic_doc_sample(spread(load(spark, sf_dir, "documents")))
    # checkpointed once (r6): cand + both signature sides + both tokenset
    # sides re-derived the sample scan and the 8-hash map per reference
    # (12 documents scans before)
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)
    cand = lsh_candidate_pairs(sigs)
    toksets = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ts")
    ).localCheckpoint(eager=True)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)]
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)]
    )
    ta = toksets.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("tsa"))
    tb = toksets.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("tsb"))
    agree = sum(
        [
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(8)
        ],
        F.lit(0),
    )
    inter = F.size(F.array_intersect("tsa", "tsb")).cast("double")
    union = F.size("tsa") + F.size("tsb") - F.size(F.array_intersect("tsa", "tsb"))
    scored = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            (agree.cast("double") / 8.0).alias("j_est"),
            (inter / union).alias("j_true"),
        )
    )
    cnt = F.count(F.lit(1))
    return scored.agg(
        bcount("n_pairs"),
        F.round(F.sum(F.col("j_est").cast(_D15)).cast("double") / cnt, 6).alias(
            "mean_j_est"
        ),
        F.round(F.sum(F.col("j_true").cast(_D15)).cast("double") / cnt, 6).alias(
            "mean_j_true"
        ),
        F.round(
            F.sum((F.col("j_est") - F.col("j_true")).cast(_D15)).cast("double")
            / cnt,
            6,
        ).alias("mean_bias"),
        F.round(
            F.sum(F.abs(F.col("j_est") - F.col("j_true")).cast(_D15)).cast(
                "double"
            )
            / cnt,
            6,
        ).alias("mean_abs_err"),
    )


@register(
    "q_data_split_balance",
    oracle="""
    WITH assigned AS MATERIALIZED (
      SELECT doc_id, source, lang,
             CASE
               WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1
                    < 12 THEN 'train'
               WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1
                    < 14 THEN 'val'
               ELSE 'test' END AS split
      FROM documents
    ),
    per AS (
      SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM assigned GROUP BY 1, 2
    ),
    tots AS (
      SELECT split, CAST(SUM(c) AS BIGINT) AS n FROM per GROUP BY 1
    ),
    gdist AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS g,
             (SELECT CAST(SUM(c) AS BIGINT) FROM per) AS gn
      FROM per GROUP BY 1
    )
    SELECT p.split, p.lang, p.c AS n_docs,
           round(CAST(p.c AS DOUBLE) / t.n, 6) AS split_share,
           round(CAST(g.g AS DOUBLE) / g.gn, 6) AS corpus_share,
           round(CAST(p.c AS DOUBLE) / t.n
                 - CAST(g.g AS DOUBLE) / g.gn, 6) AS share_delta
    FROM per p JOIN tots t ON t.split = p.split
    JOIN gdist g ON g.lang = p.lang
    ORDER BY p.split, p.lang
    """,
)
def q_data_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment with a balance audit:
    split by the first hex digit of md5(text) (12/2/2 of 16 ≈ 75/12.5/
    12.5) — content-hashed, so exact duplicates land in the SAME split
    (no train→test leakage through dups, the reason content hashing
    beats random splits for LLM corpora) — then per-(split, lang)
    shares against the corpus share. |share_delta| beyond sampling
    noise flags a stratum the eval under-represents. Pairs with
    q_ngram_contamination (cross-split leakage) and
    q_stratified_sample (the corrective).

    Determinism: md5-digit assignment is pure; counts are integers.

    Scale: one narrow map + two rollups; the assignment column is the
    same narrow map a writer would partition by. §2.B [NS] /
    LLM-pipeline surface.
    """
    tune_session(spark)
    docs = spread(load(spark, sf_dir, "documents"))
    digit = (
        F.instr(
            F.lit("0123456789abcdef"), F.substring(F.md5("text"), 1, 1)
        )
        - 1
    )
    assigned = docs.select(
        "lang",
        F.when(digit < 12, "train").when(digit < 14, "val").otherwise("test").alias(
            "split"
        ),
    )
    per = assigned.groupBy("split", "lang").agg(bcount("c"))
    # checkpointed once (r6): the split/lang marginals each re-scanned
    # documents and re-ran the md5 assignment, and the grand total was a
    # fourth full count (3+1 scans in the plan); the ≤3×|langs| grid
    # materializes once and the total is its exact integer sum
    per = per.localCheckpoint(eager=True)
    tots = per.groupBy("split").agg(F.sum("c").cast("bigint").alias("n"))
    glob = per.groupBy("lang").agg(F.sum("c").cast("bigint").alias("g"))
    gn = per.agg(F.sum("c")).collect()[0][0]
    return (
        per.join(F.broadcast(tots), "split")
        .join(F.broadcast(glob), "lang")
        .select(
            "split",
            "lang",
            F.col("c").alias("n_docs"),
            F.round(F.col("c").cast("double") / F.col("n"), 6).alias(
                "split_share"
            ),
            F.round(F.col("g").cast("double") / gn, 6).alias("corpus_share"),
            F.round(
                F.col("c").cast("double") / F.col("n")
                - F.col("g").cast("double") / gn,
                6,
            ).alias("share_delta"),
        )
        .orderBy("split", "lang")
    )


@register(
    "q_shingle_size_sweep",
    oracle="""
    WITH pre AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ts,
             md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS ph
      FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ),
    cand AS MATERIALIZED (
      SELECT a.doc_id AS da, b.doc_id AS db, a.ts AS ta, b.ts AS tb
      FROM pre a JOIN pre b ON b.ph = a.ph AND a.doc_id < b.doc_id
    ),
    ks AS (SELECT unnest(ARRAY[1, 2, 3]) AS k),
    sh AS (
      SELECT c.da, c.db, k.k,
             list_distinct(list_transform(
               range(1, len(c.ta) - k.k + 2), i ->
               array_to_string(c.ta[i:i + k.k - 1], ' '))) AS sa,
             list_distinct(list_transform(
               range(1, len(c.tb) - k.k + 2), i ->
               array_to_string(c.tb[i:i + k.k - 1], ' '))) AS sb
      FROM cand c, ks k
    )
    SELECT CAST(k AS BIGINT) AS shingle_size,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(
             CAST(len(list_intersect(sa, sb)) AS DOUBLE)
             / (len(sa) + len(sb) - len(list_intersect(sa, sb)))
             AS DECIMAL(38,15))) AS DOUBLE) / COUNT(*), 6) AS mean_jaccard,
           round(MIN(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                     / (len(sa) + len(sb) - len(list_intersect(sa, sb)))), 6)
             AS min_jaccard
    FROM sh
    GROUP BY k
    ORDER BY shingle_size
    """,
)
def q_shingle_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-size sensitivity sweep on prefix-blocked candidate pairs:
    mean and min n-gram-set Jaccard at shingle sizes 1, 2, 3 in one
    pass. Unigram Jaccard saturates for bag-of-words-similar docs;
    word-order-sensitive 2/3-shingles drop sharply unless the pair
    shares actual phrasing — the contrast curve that picks the shingle
    size for q_dedup_minhash_lsh's tokenizer (the standard w-shingling
    parameter decision).

    Determinism: shingle sets are positional slices joined with spaces;
    set sizes are exact integers; means ride DECIMAL(38,15).

    Scale: the sweep runs on blocked CANDIDATES only (prefix-hash
    equi-join); shingling is a narrow per-row transform ×3. §2.B [NS] /
    LLM-pipeline surface.
    """
    tune_session(spark)
    docs = spread(load(spark, sf_dir, "documents"))
    ts = F.split("text", " ")
    # checkpointed once (r6): both candidate-join sides re-scanned
    # documents and re-ran split+md5 (2 passes in the plan); the
    # tokenized projection materializes once (posting-list class: state
    # linear in the corpus)
    pre = docs.filter(F.size(ts) >= 8).select(
        "doc_id",
        ts.alias("ts"),
        F.md5(F.array_join(F.slice(ts, 1, 8), " ")).alias("ph"),
    ).localCheckpoint(eager=True)
    a = pre.select(
        F.col("doc_id").alias("da"), F.col("ts").alias("ta"), F.col("ph").alias("pha")
    )
    b = pre.select(
        F.col("doc_id").alias("db"), F.col("ts").alias("tb"), F.col("ph").alias("phb")
    )
    cand = a.join(
        b, (F.col("phb") == F.col("pha")) & (F.col("da") < F.col("db"))
    ).select("da", "db", "ta", "tb")
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k")
    )

    sh = cand.crossJoin(F.broadcast(ks)).select(
        "da",
        "db",
        "k",
        F.expr(
            "array_distinct(transform(sequence(1, size(ta) - k + 1),"
            " i -> array_join(slice(ta, i, k), ' ')))"
        ).alias("sa"),
        F.expr(
            "array_distinct(transform(sequence(1, size(tb) - k + 1),"
            " i -> array_join(slice(tb, i, k), ' ')))"
        ).alias("sb"),
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size("sa") + F.size("sb") - F.size(F.array_intersect("sa", "sb"))
    jac = inter / union
    return (
        sh.groupBy("k")
        .agg(
            bcount("n_pairs"),
            F.round(
                F.sum(jac.cast(_D15)).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_jaccard"),
            F.round(F.min(jac), 6).alias("min_jaccard"),
        )
        .select(
            F.col("k").cast("bigint").alias("shingle_size"),
            "n_pairs",
            "mean_jaccard",
            "min_jaccard",
        )
        .orderBy("shingle_size")
    )

"""Analytics batch 142: deterministic permutation test, n-gram novelty
audit, and Fellegi–Sunter record-linkage scoring.

The permutation test is the distribution-free p-value machine every A/B
shelf needs under non-normality — made reproducible by deriving the 200
label permutations from md5 hash order (exact group sizes preserved, no
RNG); n-gram novelty measures how much of the held-out split's bigram
space is unseen in train (the diversity/memorization dual of
q_ngram_contamination); Fellegi–Sunter is the classic probabilistic
record-linkage scorer — blocked candidate pairs, per-field
agreement log-odds, link/possible/non-link triage.

Reference parity: watermill has no analytics surface; [NS] SURVEY.md
§2.B testing/text/join-family operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from watermill_spark.session import tune_session

from .det import bcount, dec
from .registry import load, register, spread

_D15 = "decimal(38,15)"
_NPERM = 200


@register(
    "q_permutation_test_mean",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS y,
             CASE WHEN dayofweek(date_trunc('day', l_shipdate)) IN (0, 6)
                  THEN 1 ELSE 0 END AS we
      FROM lineitem GROUP BY 1, 3
    ),
    szs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(we) AS BIGINT) AS n_we
      FROM daily
    ),
    obs AS (
      SELECT
        CAST(SUM(CASE WHEN we = 1
                 THEN CAST(y AS DECIMAL(38,15)) END) AS DOUBLE)
          / SUM(CASE WHEN we = 1 THEN 1 ELSE 0 END)
        - CAST(SUM(CASE WHEN we = 0
                   THEN CAST(y AS DECIMAL(38,15)) END) AS DOUBLE)
          / SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS diff
      FROM daily
    ),
    perms AS (
      SELECT d.d, d.y, b.b, s.n_we,
             ROW_NUMBER() OVER (
               PARTITION BY b.b
               ORDER BY md5('perm:' || CAST(b.b AS VARCHAR) || ':'
                            || CAST(d.d AS VARCHAR)), d.d) AS rn
      FROM daily d
      CROSS JOIN (SELECT unnest(range(1, {_NPERM} + 1)) AS b) b
      CROSS JOIN szs s
    ),
    pdiff AS (
      SELECT b,
             CAST(SUM(CASE WHEN rn <= n_we
                      THEN CAST(y AS DECIMAL(38,15)) END) AS DOUBLE)
               / MAX(n_we)
             - CAST(SUM(CASE WHEN rn > n_we
                        THEN CAST(y AS DECIMAL(38,15)) END) AS DOUBLE)
               / (COUNT(*) - MAX(n_we)) AS diff
      FROM perms GROUP BY 1
    )
    SELECT s.n AS n_days, s.n_we AS n_weekend,
           round(o.diff, 6) AS obs_diff,
           CAST({_NPERM} AS BIGINT) AS n_perms,
           CAST(SUM(CASE WHEN abs(p.diff) >= abs(o.diff)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           round((1.0 + SUM(CASE WHEN abs(p.diff) >= abs(o.diff)
                            THEN 1 ELSE 0 END)) / (1.0 + {_NPERM}), 6)
             AS p_value
    FROM pdiff p, obs o, szs s
    GROUP BY s.n, s.n_we, o.diff
    """,
)
def q_permutation_test_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test of the weekend-vs-weekday daily-revenue mean
    difference, 200 deterministic permutations: permutation b re-labels
    the days by md5('perm:b:date') hash order — the first n_weekend ranks
    become pseudo-weekend — so each b is a uniform label permutation with
    the group sizes preserved exactly, and the whole test replays
    bit-identically (no RNG). p = (1 + #{|Δ_b| ≥ |Δ_obs|})/(1+B), the
    distribution-free companion to q_welch_ttest when normality is in
    doubt.

    Determinism: md5 order ties broken by date; all group sums route
    through DECIMAL(38,15); means divide in double.

    Scale: facts collapse to the day grid once; the B×days expansion is
    a broadcast cross onto the bounded grid (whitelisted), B fixed at
    200 — never the fact table. §2.B [NS].
    """
    tune_session(spark)
    li = load(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_trunc("day", "l_shipdate").cast("date").alias("d"),
        F.when(
            F.dayofweek(F.date_trunc("day", "l_shipdate")).isin(1, 7), 1
        )
        .otherwise(0)
        .alias("we"),
    ).agg(F.sum(dec("l_extendedprice")).cast("double").alias("y"))
    # checkpointed once (r6): the sizes, the observed diff, and the
    # permutation fan-out each re-derived the fact rollup (4 lineitem
    # scans in the plan); the calendar-bounded day grid materializes once
    daily = daily.localCheckpoint(eager=True)
    szs = daily.agg(bcount("n"), F.sum("we").cast("bigint").alias("n_we"))
    dsum = lambda cond: F.sum(  # noqa: E731
        F.when(cond, F.col("y").cast(_D15))
    ).cast("double")
    obs = daily.agg(
        (
            dsum(F.col("we") == 1) / F.sum(F.when(F.col("we") == 1, 1).otherwise(0))
            - dsum(F.col("we") == 0)
            / F.sum(F.when(F.col("we") == 0, 1).otherwise(0))
        ).alias("diff")
    )
    bgrid = spark.range(1, _NPERM + 1).select(F.col("id").alias("b"))
    wperm = Window.partitionBy("b").orderBy(
        F.md5(
            F.concat(
                F.lit("perm:"),
                F.col("b").cast("string"),
                F.lit(":"),
                F.col("d").cast("string"),
            )
        ),
        F.col("d"),
    )
    perms = (
        daily.crossJoin(F.broadcast(bgrid))
        .crossJoin(F.broadcast(szs))
        .select("d", "y", "b", "n_we", F.row_number().over(wperm).alias("rn"))
    )
    pdiff = perms.groupBy("b").agg(
        (
            dsum(F.col("rn") <= F.col("n_we")) / F.max("n_we")
            - dsum(F.col("rn") > F.col("n_we"))
            / (F.count(F.lit(1)) - F.max("n_we"))
        ).alias("diff")
    )
    joined = pdiff.crossJoin(F.broadcast(obs.select(F.col("diff").alias("odiff")))).crossJoin(
        F.broadcast(szs)
    )
    extreme = F.sum(
        F.when(F.abs(F.col("diff")) >= F.abs(F.col("odiff")), 1).otherwise(0)
    )
    return joined.groupBy("n", "n_we", "odiff").agg(
        extreme.cast("bigint").alias("n_extreme"),
        F.round((1.0 + extreme) / (1.0 + _NPERM), 6).alias("p_value"),
    ).select(
        F.col("n").alias("n_days"),
        F.col("n_we").alias("n_weekend"),
        F.round("odiff", 6).alias("obs_diff"),
        F.lit(_NPERM).cast("bigint").alias("n_perms"),
        "n_extreme",
        "p_value",
    )


@register(
    "q_ngram_novelty",
    oracle="""
    WITH pre AS MATERIALIZED (
      SELECT doc_id, lang, doc_id % 2 = 0 AS is_train,
             string_split(text, ' ') AS ts
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    bi AS MATERIALIZED (
      SELECT DISTINCT lang, is_train,
             unnest(list_transform(range(1, len(ts)),
                    j -> ts[j] || ' ' || ts[j+1])) AS g
      FROM pre
    ),
    uni AS MATERIALIZED (
      SELECT DISTINCT lang, is_train, unnest(ts) AS g FROM pre
    ),
    bi_stats AS (
      SELECT t.lang,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN tr.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
      FROM (SELECT lang, g FROM bi WHERE NOT is_train) t
      LEFT JOIN (SELECT lang, g FROM bi WHERE is_train) tr
        ON tr.lang = t.lang AND tr.g = t.g
      GROUP BY 1
    ),
    uni_stats AS (
      SELECT t.lang,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN tr.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM (SELECT lang, g FROM uni WHERE NOT is_train) t
      LEFT JOIN (SELECT lang, g FROM uni WHERE is_train) tr
        ON tr.lang = t.lang AND tr.g = t.g
      GROUP BY 1
    )
    SELECT b.lang,
           b.n_test AS test_bigrams,
           b.n_novel AS novel_bigrams,
           round(CAST(b.n_novel AS DOUBLE) / b.n_test, 6) AS bigram_novelty,
           u.n_test AS test_vocab,
           u.n_oov AS oov_vocab,
           round(CAST(u.n_oov AS DOUBLE) / u.n_test, 6) AS oov_rate
    FROM bi_stats b JOIN uni_stats u ON u.lang = b.lang
    ORDER BY b.lang
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty of the held-out split, per language: what fraction
    of the test half's distinct bigrams (and unigram vocabulary) never
    appears in the train half (doc_id parity split, the
    q_bigram_perplexity convention)? High novelty = diverse corpus /
    hard extrapolation; near-zero = templated text where a model can
    memorize its way to low perplexity. The diversity dual of
    q_ngram_contamination (which hunts *overlap* between splits).

    Determinism: pure distinct-set integer counting; ratios divide in
    double.

    Scale: tokenize once; distinct n-gram sets shuffle on (lang, gram)
    with map-side combine; the novelty join is per-language equi-join of
    the two distinct sets. LLM-pipeline surface.
    """
    tune_session(spark)
    docs = spread(load(spark, sf_dir, "documents"))
    ts = F.split("text", " ")
    pre = docs.filter(F.size(ts) >= 2).select(
        "lang", (F.col("doc_id") % 2 == 0).alias("is_train"), ts.alias("ts")
    )
    bigr = F.transform(
        F.sequence(F.lit(1), F.size("ts") - 1),
        lambda j: F.concat(
            F.element_at(F.col("ts"), j), F.lit(" "), F.element_at(F.col("ts"), j + 1)
        ),
    )
    # checkpoint both distinct n-gram sets once (r6): stats() reads each
    # twice (test + train side), re-tokenizing the corpus per reference
    bi = (
        pre.select("lang", "is_train", F.explode(bigr).alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    uni = (
        pre.select("lang", "is_train", F.explode("ts").alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def stats(d: DataFrame, novel_col: str) -> DataFrame:
        test = d.filter(~F.col("is_train")).select("lang", "g")
        train = d.filter(F.col("is_train")).select(
            F.col("lang").alias("tl"), F.col("g").alias("tg")
        )
        return (
            test.join(
                train,
                (F.col("tl") == F.col("lang")) & (F.col("tg") == F.col("g")),
                "left",
            )
            .groupBy("lang")
            .agg(
                bcount("n_test"),
                F.sum(F.when(F.col("tg").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(novel_col),
            )
        )

    bs = stats(bi, "n_novel")
    us = stats(uni, "n_oov").select(
        F.col("lang").alias("ul"),
        F.col("n_test").alias("u_test"),
        "n_oov",
    )
    return (
        bs.join(us, F.col("ul") == F.col("lang"))
        .select(
            "lang",
            F.col("n_test").alias("test_bigrams"),
            F.col("n_novel").alias("novel_bigrams"),
            F.round(F.col("n_novel").cast("double") / F.col("n_test"), 6).alias(
                "bigram_novelty"
            ),
            F.col("u_test").alias("test_vocab"),
            F.col("n_oov").alias("oov_vocab"),
            F.round(F.col("n_oov").cast("double") / F.col("u_test"), 6).alias(
                "oov_rate"
            ),
        )
        .orderBy("lang")
    )


def _fs_weight_sql(agree: str, m: float, u: float) -> str:
    return (
        f"CASE WHEN {agree} THEN ln({m} / {u})"
        f" ELSE ln({1.0 - m} / {1.0 - u}) END"
    )


@register(
    "q_fellegi_sunter_linkage",
    oracle=f"""
    WITH pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             abs(c.c_acctbal - s.s_acctbal) < 1000.0 AS a_bal,
             right(c.c_name, 1) = right(s.s_name, 1) AS a_name,
             c.c_custkey % 10 = s.s_suppkey % 10 AS a_key
      FROM customer c JOIN supplier s ON s.s_nationkey = c.c_nationkey
    ),
    scored AS (
      SELECT
        (CASE WHEN a_bal THEN 1 ELSE 0 END
         + CASE WHEN a_name THEN 1 ELSE 0 END
         + CASE WHEN a_key THEN 1 ELSE 0 END) AS n_agree,
        {_fs_weight_sql("a_bal", 0.9, 0.2)}
        + {_fs_weight_sql("a_name", 0.85, 0.1)}
        + {_fs_weight_sql("a_key", 0.8, 0.1)} AS w
      FROM pairs
    )
    SELECT CASE WHEN w > 4.0 THEN 'link'
                WHEN w < -2.0 THEN 'non-link'
                ELSE 'possible' END AS decision,
           CAST(n_agree AS BIGINT) AS n_agree,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(w AS DECIMAL(38,15))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_weight
    FROM scored GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage between customers and
    suppliers, blocked on nation: per candidate pair, three field
    agreements (account balance within 1000, name's trailing digit, key's
    trailing digit) contribute log-odds ln(m/u) on agreement and
    ln((1−m)/(1−u)) on disagreement with fixed (m,u) per field; total
    weight w triages pairs into link (w>4) / possible / non-link (w<−2).
    Reports the (decision, agreement-count) histogram with mean weights —
    the classic entity-resolution scorer that q_fuzzy_name_join's
    deterministic matcher graduates into.

    Determinism: agreements are exact string/threshold comparisons;
    weights are sums of fixed constants, so every pair's w takes one of
    2³ values; per-cell means route through DECIMAL.

    Scale: the nation block bounds candidate pairs (the 100-TB version
    blocks on (nation, phone-prefix) to keep blocks constant-size); one
    equi-join + one small groupBy — never a cross product. §2.B join
    family [NS].
    """
    tune_session(spark)
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    pairs = c.join(s, c.c_nationkey == s.s_nationkey).select(
        (F.abs(F.col("c_acctbal") - F.col("s_acctbal")) < 1000.0).alias("a_bal"),
        (
            F.substring("c_name", -1, 1) == F.substring("s_name", -1, 1)
        ).alias("a_name"),
        (F.col("c_custkey") % 10 == F.col("s_suppkey") % 10).alias("a_key"),
    )

    def weight(agree: str, m: float, u: float):
        import math

        return F.when(F.col(agree), F.lit(math.log(m / u))).otherwise(
            F.lit(math.log((1.0 - m) / (1.0 - u)))
        )

    scored = pairs.select(
        (
            F.when(F.col("a_bal"), 1).otherwise(0)
            + F.when(F.col("a_name"), 1).otherwise(0)
            + F.when(F.col("a_key"), 1).otherwise(0)
        ).alias("n_agree"),
        (
            weight("a_bal", 0.9, 0.2)
            + weight("a_name", 0.85, 0.1)
            + weight("a_key", 0.8, 0.1)
        ).alias("w"),
    )
    return (
        scored.groupBy(
            F.when(F.col("w") > 4.0, "link")
            .when(F.col("w") < -2.0, "non-link")
            .otherwise("possible")
            .alias("decision"),
            F.col("n_agree").cast("bigint").alias("n_agree"),
        )
        .agg(
            bcount("n_pairs"),
            F.round(
                F.sum(F.col("w").cast(_D15)).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_weight"),
        )
        .orderBy("decision", "n_agree")
    )

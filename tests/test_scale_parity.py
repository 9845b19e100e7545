"""Scale-proof parity at sf1+ (VERDICT r3 #1): the scale-critical family
must stay oracle-correct on 10x data, not just at the driver's sf0.01.

Gated: skipped unless SCALE_SF_DIR points at a generated scale dir
(`python tools_gen_scale.py 10 scale_data/sf1`), because the data is
synthesized locally (gitignored) and the runs are minutes, not seconds.

    SCALE_SF_DIR=$PWD/scale_data/sf1 pytest tests/test_scale_parity.py

Two comparison modes:
- row-hash (same as the driver gate) for every family member whose output
  stays bounded at scale;
- aggregate checksum (count + keyed sums, both engines) for the two
  pair-emission queries whose output is inherently ~quadratic on this
  near-dup-saturated corpus (31-token vocabulary: ~6% of ALL pairs are
  true J>=0.9 near-dups) — materializing 114M rows through the Python
  harness is a harness limit, not an engine one. Enable those with
  SCALE_PARITY_FULL=1 (they add ~15 min: both engines really compute the
  100M+ verified pairs).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from watermill_spark.analytics.registry import REGISTRY

from .oracle_harness import compare, duck_connect

SCALE_DIR = os.environ.get("SCALE_SF_DIR", "")

pytestmark = pytest.mark.skipif(
    not (SCALE_DIR and os.path.isdir(SCALE_DIR)),
    reason="SCALE_SF_DIR not set (generate with tools_gen_scale.py first)",
)

# bounded-output family: row-hash compare, driver-style
FAMILY = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_nation_revenue",
    "q10_returned_items",
    "q_dedup_exact",
    "q_dedup_minhash_signatures",
    "q_dedup_minhash_clusters",
    "q_dedup_simhash",
    "q_dedup_connected_components",
    "q_ann_lsh_hyperplane",
    "q_knn_ivf",
    "q_hard_negative_mining_ann",
    "q_events_sessionize",
    "q_events_hourly",
    "q_skew_salted_join",
    "q_incremental_rollup",
    "q_tfidf_top_terms",
    "q_stratified_sample",
]

# unbounded pair emitters: checksum compare (count + keyed sums)
CHECKSUM_FAMILY = ["q_dedup_minhash_lsh", "q_dedup_jaccard_pairs"]


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SCALE_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", FAMILY)
def test_scale_family_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    report = compare(q.fn(spark, SCALE_DIR), duck, q.oracle)
    assert report["ok"], f"{name}@{SCALE_DIR}: {report['detail']}"


@pytest.mark.skipif(
    os.environ.get("SCALE_PARITY_FULL") != "1",
    reason="pair-emission checksums add ~15 min; set SCALE_PARITY_FULL=1",
)
@pytest.mark.parametrize("name", CHECKSUM_FAMILY)
def test_scale_pair_emitters_checksum_match(spark, duck, name):
    q = REGISTRY[name]
    r = (
        q.fn(spark, SCALE_DIR)
        .agg(
            F.count("*").alias("n"),
            F.sum("doc_a").alias("sa"),
            F.sum("doc_b").alias("sb"),
            F.sum(F.round(F.col("jaccard") * 1e6).cast("long")).alias("sj"),
        )
        .collect()[0]
    )
    got = (r["n"], r["sa"], r["sb"], r["sj"])
    want = duck.execute(
        "SELECT COUNT(*), SUM(doc_a), SUM(doc_b), "
        "SUM(CAST(round(jaccard*1e6) AS BIGINT)) FROM ("
        + q.oracle
        + ")"
    ).fetchone()
    assert got == tuple(want), f"{name}@{SCALE_DIR}: {got} != {tuple(want)}"

"""q03 shape experiments: measure plan variants at sf0.1 (cache ON, warmed).

V0 current: li SMJ orders, then broadcast-cust filter, then agg, top-k
V1 cust-first: orders x broadcast(cust) BEFORE the fact SMJ (5x smaller side)
V2 pre-agg: lineitem revenue pre-aggregated per orderkey before the join
   (map-side combine shrinks the shuffle; agg partitioning is reused by the
   join so the agg side never re-shuffles)
V3 = V1 + V2
"""

from __future__ import annotations

import os
import sys
import time

os.environ["SPARK_GRAFT_CACHE_TABLES"] = "1"

from pyspark.sql import functions as F  # noqa: E402

from watermill_spark.analytics.registry import REGISTRY, load  # noqa: E402
from watermill_spark.analytics.tpch import _disc_price  # noqa: E402
from watermill_spark.session import get_spark, tune_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def _tables(spark):
    cust = load(spark, SF, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, SF, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, SF, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return cust, orders, li


def v0(spark):
    return REGISTRY["q03_top_revenue_orders"].fn(spark, SF)


def v1(spark):
    cust, orders, li = _tables(spark)
    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def v2(spark):
    cust, orders, li = _tables(spark)
    rev = li.groupBy("l_orderkey").agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )
    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        rev.join(o, rev.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def v3(spark):
    # v2 already folds in the cust-first join
    return v2(spark)


def main() -> None:
    spark = get_spark("q03-variants")
    spark.sparkContext.setLogLevel("ERROR")
    tune_session(spark)
    variants = {"v0": v0, "v1": v1, "v2": v2}
    for fn in variants.values():  # warm all shapes
        fn(spark).toPandas()
    base = {tuple(r) for r in v0(spark).collect()}
    for name, fn in variants.items():
        got = {tuple(r) for r in fn(spark).collect()}
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            len(fn(spark).toPandas())
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min {min(times)} times {times} same_result={got == base}")
    spark.stop()


if __name__ == "__main__":
    main()

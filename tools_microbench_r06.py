#!/usr/bin/env python
"""Micro-bench: time registry queries (or ad-hoc variants) via the noop sink.

Usage: python tools_microbench_r06.py q_name [q_name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, RUNS (default 5),
     CACHE (default 1 — match bench.py serving mode).

Times df.write.format('noop') per guide §1.4 (computes every column, no
sink cost) after one warmup, prints min/median. Labels jobs per §1.5.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", os.environ.get("CACHE", "1"))

from watermill_spark.analytics.registry import REGISTRY  # noqa: E402
from watermill_spark.session import get_spark  # noqa: E402


def time_df(spark, name, fn, sf_dir, runs):
    spark.sparkContext.setJobDescription(f"warmup:{name}")
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name}:{i}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return min(ts), statistics.median(ts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "5"))
    spark = get_spark("microbench-r06")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:]:
        q = REGISTRY[name]
        mn, md = time_df(spark, name, q.fn, sf_dir, runs)
        print(f"{name}: min={mn:.3f}s median={md:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

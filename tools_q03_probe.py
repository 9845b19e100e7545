"""q03 bench-creep probe (VERDICT r3 'what's wrong' #1).

Times q03_top_revenue_orders at sf0.1 under controlled conditions to
separate query cost from bench-harness interplay:

  A. bench-identical: serving cache ON, all 11 bench queries warmed first,
     then q03 min-of-3 (exactly bench.py's measurement).
  B. cache ON, only q03 warmed (no other bench queries touched).
  C. cache OFF (cold parquet scans), q03 warmed once, min-of-3.

Run each mode in a separate process: python tools_q03_probe.py {A|B|C}
"""

from __future__ import annotations

import os
import sys
import time

MODE = sys.argv[1] if len(sys.argv) > 1 else "A"
if MODE in ("A", "B"):
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "1"
else:
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"

from watermill_spark.analytics.registry import REGISTRY  # noqa: E402
from watermill_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("q03-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if MODE == "A":
        for q in {n: q for n, q in REGISTRY.items() if q.bench}.values():
            q.fn(spark, SF).toPandas()
    else:
        REGISTRY["q03_top_revenue_orders"].fn(spark, SF).toPandas()

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        len(REGISTRY["q03_top_revenue_orders"].fn(spark, SF).toPandas())
        times.append(round(time.perf_counter() - t0, 3))
    print(f"MODE {MODE}: q03 times {times} min {min(times)}")
    spark.stop()


if __name__ == "__main__":
    main()

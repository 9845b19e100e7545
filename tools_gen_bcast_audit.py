"""One-off: find BroadcastExchange build sides that derive from a
FACT-CLASS table without a bounding reduction (r4 verdict item 4).

A broadcast is safe at 100 TB only when its build side is cardinality-
bounded: a dim table (region/nation), a 1-row aggregate (Keys [0]), a
top-k (Limit/TakeOrdered/WindowGroupLimit), or a literal grid. A
broadcast of a keyed aggregate OVER A FACT TABLE (e.g. per-part
popularity: |parts| rows, grows with the corpus) degrades to an OOM
risk that AQE only partially absorbs — those must be explicitly
whitelisted with the rationale written down.

Writes /tmp/bcast_audit.json = {query: [flag descriptions]} for every
query with at least one unbounded fact-derived broadcast. The audit
test (tests/test_plan_audit.py) imports _broadcast_fact_flags so the
two can never diverge.

Limitations (documented, inherent to text-plan auditing):
- localCheckpoint/cache boundaries print as Scan ExistingRDD — fact
  provenance behind them is invisible (those queries pin their shapes
  in test_scale_plans.py instead).
- The bounding check is subtree-granular: a bounding node anywhere in
  the broadcast subtree excuses it (path-granular would need the full
  DAG; subtree granularity has produced zero false negatives on the
  current registry).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.test_plan_audit import _broadcast_fact_flags  # noqa: E402

from watermill_spark.analytics.registry import REGISTRY  # noqa: E402
from watermill_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("bcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for i, (name, q) in enumerate(sorted(REGISTRY.items())):
        spark.catalog.clearCache()
        try:
            # auto-broadcast off: only explicit F.broadcast() hints survive
            # (tune_session inside q.fn does not touch the threshold)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = q.fn(spark, SF)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            out[name] = [f"PLAN_ERROR: {exc}"]
            continue
        flags = _broadcast_fact_flags(plan)
        if flags:
            out[name] = flags
        if i % 100 == 0:
            print(f"{i}/{len(REGISTRY)}", file=sys.stderr)
    with open("/tmp/bcast_audit.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"{len(out)} queries with unbounded fact-derived broadcasts")
    for k, v in sorted(out.items()):
        print(k, v)


if __name__ == "__main__":
    main()

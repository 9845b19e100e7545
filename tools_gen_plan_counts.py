"""One-off: measure exact red-flag operator counts per registered query plan.

Writes /tmp/plan_counts.json = {name: {"CARTESIAN": n, "BNLJ": n, "SMJ": n}}
for every query with any nonzero count. Used to pin per-flag maxima in
tests/test_plan_audit.py (ADVICE r3: the allowlist must bound occurrence
counts, not just flag presence).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from watermill_spark.analytics.registry import REGISTRY
# single source of truth: the audit test's patterns drive the generator, so
# the two can never diverge (r4 review)
from tests.test_plan_audit import _FLAG_PAT as PAT
from watermill_spark.session import get_spark

SF = "/root/testdata/sf0.001"



def main() -> None:
    spark = get_spark("plan-counts")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for i, (name, q) in enumerate(sorted(REGISTRY.items())):
        # fresh cache state per query — must match the audit test, which
        # clears before building each plan (cache registration changes how
        # repeated subtrees print, hence the flag counts)
        spark.catalog.clearCache()
        plan = q.fn(spark, SF)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        counts = {f: len(p.findall(plan)) for f, p in PAT.items()}
        if any(counts.values()):
            out[name] = counts
        if i % 50 == 0:
            print(f"{i}/{len(REGISTRY)} {name}", flush=True)
    with open("/tmp/plan_counts.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"done: {len(out)} queries with nonzero counts")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Count parquet scans per base table in every registered query's plan.

Usage: python tools_scan_sweep.py [out.json] [query ...]

Explain-only sweep (queries that eagerly localCheckpoint a grain will run
those small jobs at the sweep SF). Writes {name: {"scans": {table: n}}} for
every query that scans any base table more than once. Used to rank residual
multi-scan offenders for the optimization rounds (guide §1.2 step 1).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"

from watermill_spark.analytics.registry import REGISTRY  # noqa: E402
from watermill_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
# base tables = parquet files of the harness corpus. In formatted explain
# the scan node header ("(1) Scan parquet") and its path are on DIFFERENT
# lines; the path appears exactly once per scan node in the details section
# as "Location: InMemoryFileIndex [file:...<table>.parquet]" — so counting
# Location lines counts actual scan nodes (a same-line "Scan parquet ...
# .parquet" regex matches nothing on Spark 4.1).
_TBL = re.compile(r"Location: \w*FileIndex \[[^\]\n]*?([a-z_0-9]+)\.parquet")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scan_sweep_head.json"
    names = sys.argv[2:]
    spark = get_spark("scan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = {}
    qs = sorted(names) if names else sorted(REGISTRY)
    for i, name in enumerate(qs):
        spark.catalog.clearCache()
        try:
            plan = REGISTRY[name].fn(spark, SF)._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 - sweep must survive one bad query
            out[name] = {"error": str(e)[:200]}
            continue
        counts: dict[str, int] = {}
        for m in _TBL.finditer(plan):
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
        multi = {t: c for t, c in counts.items() if c > 1}
        if multi:
            out[name] = {"scans": multi}
            # Queries that .cache()/.localCheckpoint() an intermediate print
            # the cached subtree's scan once per REFERENCE, but execution
            # materializes it once — flag them so the triage can discount
            # these plan-text-only "re-scans" (q_kcore_trade and friends).
            if "InMemoryRelation" in plan or "InMemoryTableScan" in plan:
                out[name]["cached"] = True
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(qs)} swept", flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"{len(out)} queries with multi-scans -> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()

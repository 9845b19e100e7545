#!/usr/bin/env python
"""Capture .explain('formatted') for bench (and selected) queries → plans/r07/.

Usage: python tools_plans_r07.py before|after [query ...]

Runs WITHOUT the serving-mode table cache so plans show the real parquet
scans (PushedFilters / ReadSchema), matching what the driver's correctness
runs execute. Bench-mode plans (cached tables) differ only in the scan leaf.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"

from watermill_spark.analytics.registry import REGISTRY  # noqa: E402
from watermill_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans-r06")
    spark.sparkContext.setLogLevel("ERROR")
    qs = (
        {n: REGISTRY[n] for n in names}
        if names
        else {n: q for n, q in REGISTRY.items() if q.bench}
    )
    for name, q in sorted(qs.items()):
        df = q.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        txt = buf.getvalue()
        n_ex = txt.count("Exchange")
        joins = [
            k
            for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin")
            if k in txt
        ]
        py = [k for k in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas", "FlatMapGroupsInPandas") if k in txt]
        print(f"{name}: Exchange={n_ex} joins={joins} python={py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Census of single-task global windows/sorts over data-scaled streams.

Usage: python tools_window_census.py [out.json] [query ...]

An unpartitioned window (``Window.orderBy`` with no partitionBy) executes
in ONE task — Spark moves every input row to a single partition (the
WindowExec "No Partition Defined" warning). Over a bounded grid (days,
brands, ≤shuffle-partition pid rows) that is fine; over a fact-volume or
entity-keyed stream it is the definitive straggler at 100 TB (guide §2.5).

Detector: every ``Exchange`` whose detail block says ``SinglePartition``;
its subtree is classified BOUNDED if any Limit/TakeOrdered or an
aggregate keyed only by non-entity columns (the broadcast audit's rule)
sits below, else flagged with the fact tables it scans. Writes
{name: {"flags": [...]}}.

Known limitation: a global window executed INSIDE an eager
localCheckpoint is invisible to the final explain (its subplan ran at
materialization). The census prints an ``@@QUERY <name>`` marker to
stderr before each fn call so the JVM's interleaved
``WARN WindowExec: No Partition Defined`` lines can be attributed by
hand when stderr is kept (run with ``2> census.err`` and grep between
markers); checkpoint-hidden offenders need that manual pass or a code
grep for ``Window.orderBy`` with no partitionBy.
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

_FACT_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}
_TBL = re.compile(r"Location: \w*FileIndex \[[^\]\n]*?([a-z_0-9]+)\.parquet")
_ENTITY_KEY = re.compile(
    r"(?<!nation)(?<!region)(?:key|id|uuid|qid|nid)\d*$", re.IGNORECASE
)
_TOKEN_KEY = re.compile(
    r"(?:^|_)(?:term|token|tok|word|shingle|[a-z]*gram|band_key|sig|"
    r"minhash|hash)s?\d*$",
    re.IGNORECASE,
)
_BOUNDING = ("GlobalLimit", "LocalLimit", "CollectLimit", "TakeOrderedAndProject",
             "WindowGroupLimit")


def _details(plan: str) -> dict[int, tuple[str, str]]:
    out, cur_id, cur_name, body = {}, None, None, []
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) (\S.*?)(?: \[codegen id : \d+\])?$", line)
        if m:
            if cur_id is not None:
                out[cur_id] = (cur_name, "\n".join(body))
            cur_id, cur_name, body = int(m.group(1)), m.group(2), []
        elif cur_id is not None:
            body.append(line)
    if cur_id is not None:
        out[cur_id] = (cur_name, "\n".join(body))
    return out


def _flags(plan: str) -> list[str]:
    details = _details(plan)

    def agg_bounded(nid: int) -> bool:
        det = details.get(nid)
        if det is None:
            return False
        if re.search(r"Keys \[0\]|^Keys: \[\]", det[1], re.M):
            return True
        km = re.search(r"Keys \[\d+\]: \[(.*?)\]", det[1], re.S)
        if not km:
            return False
        keys = []
        for part in km.group(1).split(","):
            m = re.search(r"([A-Za-z_][A-Za-z_0-9]*)#\d+", part)
            keys.append(m.group(1) if m else part.strip())
        return all(
            not (_ENTITY_KEY.search(k) or _TOKEN_KEY.search(k)) for k in keys
        )

    flags: list[str] = []
    tree: list[tuple[int, str, int]] = []

    def audit(t):
        for i, (depth, name, nid) in enumerate(t):
            if not name.startswith("Exchange"):
                continue
            det = details.get(nid)
            if det is None or "SinglePartition" not in det[1]:
                continue
            sub = []
            for j in range(i + 1, len(t)):
                if t[j][0] <= depth:
                    break
                sub.append(t[j])
            facts, bounded = set(), False
            for d2, n2, id2 in sub:
                if n2.startswith("Scan parquet"):
                    d = details.get(id2)
                    if d:
                        facts |= set(_TBL.findall(d[1])) & _FACT_TABLES
                if any(n2.startswith(b) for b in _BOUNDING):
                    bounded = True
                if "Aggregate" in n2 and agg_bounded(id2):
                    bounded = True
            if facts and not bounded:
                flags.append(
                    f"Exchange SinglePartition({nid}) over {sorted(facts)} "
                    f"with no bounding reduction"
                )
        return

    tree_re = re.compile(r"^([ :+-]*)\*?\(?\d*\)? ?(\S.*) \((\d+)\)$")
    for line in plan.splitlines():
        m = tree_re.match(line)
        if m:
            tree.append((len(m.group(1)), m.group(2).lstrip("* "), int(m.group(3))))
        else:
            if tree:
                audit(tree)
            tree = []
    if tree:
        audit(tree)
    return flags


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/window_census.json"
    names = sys.argv[2:]
    spark = get_spark("window-census")
    spark.sparkContext.setLogLevel("WARN")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out = {}
    qs = sorted(names) if names else sorted(REGISTRY)
    for i, name in enumerate(qs):
        spark.catalog.clearCache()
        # marker so WindowExec warnings in the process stderr can be
        # attributed to the query that triggered them (checkpoint
        # materialization happens inside fn)
        print(f"@@QUERY {name}", file=sys.stderr, flush=True)
        try:
            plan = (
                REGISTRY[name]
                .fn(spark, SF)
                ._jdf.queryExecution()
                .explainString(mode)
            )
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            continue
        flags = _flags(plan)
        if flags:
            out[name] = {"flags": flags}
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(qs)} censused", flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"{len(out)} queries flagged -> {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

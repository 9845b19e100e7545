"""Summarize a tools_scale_sweep.py JSONL run into a markdown snippet for
SCALE.md: totals, status breakdown, slowest-ok table, quarantined table.

    python tools_sweep_report.py /tmp/sweep_sf5.jsonl
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    path = sys.argv[1]
    rows, summary = [], None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue  # stderr warn lines, shard separators
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("summary"):
                summary = rec
            elif "status" in rec:
                rows.append(rec)
            # records missing 'status' (older formats, hand-concatenated
            # shards) are skipped rather than raising KeyError below
    ok = [r for r in rows if r["status"] == "ok"]
    bad = [
        r for r in rows
        if r["status"] != "ok" and not r.get("quarantined", False)
    ]
    quar = [r for r in rows if r.get("quarantined", False)]
    walls = sorted(r.get("wall_sec", 0.0) for r in ok)
    n = len(walls)
    pct = lambda p: walls[min(n - 1, int(p * n))] if n else 0.0  # noqa: E731
    print(f"swept: {len(rows)}  ok: {len(ok)}  "
          f"failed/over-budget (non-quarantined): {len(bad)}  "
          f"quarantined: {len(quar)}")
    print(f"wall p50 {pct(.5):.1f}s  p90 {pct(.9):.1f}s  p99 {pct(.99):.1f}s  "
          f"max {walls[-1] if walls else 0:.1f}s  total {sum(walls)/60:.1f}min")
    if bad:
        print("\nNON-QUARANTINED FAILURES:")
        for r in bad:
            print(f"  {r['name']}: {r['status']} ({r['wall_sec']}s)")
    print("\nslowest ok:")
    for r in sorted(ok, key=lambda r: -r.get("wall_sec", 0.0))[:12]:
        print(f"| `{r['name']}` | {r.get('wall_sec', 0.0):.1f} "
              f"| {r.get('rows', -1)} |")
    print("\nquarantined (documented quadratic recall oracles):")
    for r in quar:
        print(f"| `{r['name']}` | {r['status']} "
              f"| {r.get('wall_sec', 0.0):.1f} |")
    if summary:
        print("\nsummary line present:", summary.get("ok"), "/",
              summary.get("total"))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Render the bench history (BENCH_r*.json) in calibration-normalized
units (r4 verdict item 8).

bench.py emits fixed-work calibration probes since round 4
(`calib_jvm_agg_sec`: a constant-size JVM aggregation, independent of the
query suite). Dividing by the probe removes host speed from the suite
wall, so rounds measured on different VMs become comparable:

    normalized_suite = suite_wall_sec * (REF_CALIB / calib_jvm_agg_sec)

REF_CALIB anchors the scale to the session-2 host (calib 0.108 measured
there, SCALE.md), i.e. "seconds this suite would take on the session-2
machine". Rounds 1-3 predate the probes — their rows are printed raw and
marked UNCALIBRATED ESTIMATE (same-host comparisons in SCALE.md remain
the only reliable cross-round statements for them).

    python tools_bench_normalize.py            # markdown table to stdout
"""

from __future__ import annotations

import glob
import json
import os
import re

REF_CALIB = 0.108  # session-2 host's measured calib_jvm_agg_sec (SCALE.md)


def main() -> int:
    rows = []
    for path in sorted(glob.glob("BENCH_r*.json")):
        rnd = re.search(r"BENCH_r(\d+)", os.path.basename(path)).group(1)
        with open(path) as fh:
            parsed = json.load(fh).get("parsed") or {}
        wall = parsed.get("value")
        calib = parsed.get("calib_jvm_agg_sec")
        if wall is None:
            rows.append((rnd, None, None, None, "unparseable"))
            continue
        if calib:
            rows.append(
                (rnd, wall, calib, wall * REF_CALIB / calib, "")
            )
        else:
            rows.append((rnd, wall, None, None, "UNCALIBRATED ESTIMATE"))
    print("| round | suite wall (s) | calib_jvm (s) | normalized (s, "
          f"ref calib {REF_CALIB}) | note |")
    print("|---|---|---|---|---|")
    for rnd, wall, calib, norm, note in rows:
        wall_s = f"{wall:.3f}" if wall is not None else "—"
        calib_s = f"{calib:.4f}" if calib else "—"
        norm_s = f"{norm:.3f}" if norm is not None else "—"
        print(f"| r{rnd} | {wall_s} | {calib_s} | {norm_s} | {note} |")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

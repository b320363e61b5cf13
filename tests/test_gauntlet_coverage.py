"""Meta-pin: every registry op is enrolled in a degenerate-input gauntlet.

Each gauntlet module parametrizes over `ops_reading(table)` at
collection time, so ops auto-enroll the moment their oracle references
an augmented fixture table. This test closes the remaining hole: a new
op whose oracle references NO fixture table (or a brand-new table the
family does not augment) would silently skip adversarial coverage.
Such ops must be added to the explicit allowlist below with a reason —
the diff review sees the exemption instead of an invisible gap.
"""

from __future__ import annotations

from snapshot_s3_util_spark import REGISTRY
from tests.gauntlet_common import ops_reading

_GAUNTLET_TABLES = (
    "documents", "events", "embeddings", "orders", "lineitem",
    "customer", "nation", "region", "supplier", "part",
)

# Ops legitimately outside the family: oracle reads no fixture table.
_EXEMPT = {
    # asserts parquet schema metadata against an inline literal
    # contract — there is no row content for adversarial rows to vary.
    "scan_schema_contract",
}


def test_every_op_is_gauntlet_enrolled_or_exempt():
    # Coverage must come from ops_reading (what the gauntlets actually
    # parametrize over) — no category blanket, or a future llm op whose
    # oracle reads no fixture table would silently skip coverage.
    covered: set[str] = set()
    for t in _GAUNTLET_TABLES:
        covered.update(ops_reading(t))
    missing = sorted(set(REGISTRY) - covered - _EXEMPT)
    assert not missing, (
        "ops with no degenerate-input gauntlet coverage (enroll the "
        f"table or add an _EXEMPT entry with a reason): {missing}"
    )
    stale = sorted(_EXEMPT & covered)
    assert not stale, f"_EXEMPT entries now covered — remove: {stale}"
    assert _EXEMPT <= set(REGISTRY), "unknown op in _EXEMPT"

"""Degenerate-customer gauntlet: joins/graphs/string ops vs dirty rows.

The customer fixture is uniform in ways a real CRM table never is:
every c_name matches 'Customer#\\d{9}' ASCII, every c_nationkey
resolves, every customer has orders (so the customer-order graph has
no isolated vertices), c_mktsegment is never NULL and comes from a
closed set of 5. Adversarial rows:

- an EMPTY name, a unicode name (diacritics + CJK), an apostrophe +
  multi-space name, and a duplicate of an existing name under a new
  key (string functions, collation, group-by-name assumptions),
- an orphan c_nationkey (dimension joins must not silently drop or
  fabricate), a NULL c_mktsegment and an unseen segment value,
- a deep negative and an exactly-zero c_acctbal (sign/ratio paths),
- all four new customers have NO orders: the customer-order graph ops
  (pagerank, k-core, clustering coefficient, label propagation, ...)
  must agree on isolated-vertex handling — the classic graph-engine
  divergence (dropped vs kept with degree 0).

Contract per gauntlet_common: Spark must not raise AND oracle ops stay
hash-exact on the augmented table.
"""

from __future__ import annotations

import pytest

from snapshot_s3_util_spark import REGISTRY
from tests.gauntlet_common import (
    assert_op_matches,
    build_augmented_dir,
    duck_views,
    ops_reading,
)

# Fixture maxima: c_custkey 149, n_nationkey 24 — 91xxxx keys and
# nationkey 99 are disjoint / unresolvable by construction.
_ADVERSARIAL = """
SELECT * FROM (VALUES
  (910001, '',                          99, 0.0,      NULL),
  (910002, 'Zoë Müller-宏',              3, -5000.25, 'BUILDING'),
  (910003, 'Customer#000000001',         4, 100.0,   'WEIRD_SEG'),
  (910004, 'O''Brien  van  der Berg',    5, 0.0,     'AUTOMOBILE')
) v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
"""


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("degenerate_customer"))
    return build_augmented_dir(out, "customer", _ADVERSARIAL)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duck_views(adv_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ops_reading("customer"))
def test_customer_op_survives_degenerate_rows(name, spark, adv_dir, adv_duck):
    assert_op_matches(REGISTRY[name], spark, adv_dir, adv_duck)

"""Degenerate-relational gauntlet: orders/lineitem ops vs dirty rows.

The TPC-H-ish fixture honors invariants real transactional exports
break daily: every foreign key resolves, (l_orderkey, l_linenumber) is
a primary key, prices are positive, discounts stay in [0, 0.1], status
and flag columns come from a closed vocabulary, and dates live inside
1995–2001. Each is a divergence class the documents/events/embeddings
gauntlets caught elsewhere. Coordinated adversarial rows in BOTH
tables:

- an order whose o_custkey resolves to NO customer, and a lineitem
  whose l_orderkey resolves to NO order (outer/anti/semi join paths),
- an order carrying unseen o_orderstatus / o_orderpriority values, and
  a lineitem with unseen l_returnflag / l_linestatus (group-by and
  pivot vocabularies must not be hardcoded),
- zero and NEGATIVE o_totalprice (credit memo), a zero-quantity
  zero-price lineitem at 100% discount (ratio denominators),
- an exact duplicate (l_orderkey, l_linenumber) pair (PK violation —
  aggregate multiplicity must match between engines),
- o_orderdate / l_shipdate at the 1970 epoch and in 2099 (date bucket
  arithmetic outside the fixture's range).

Contract per gauntlet_common: Spark must not raise AND oracle ops stay
hash-exact on the augmented tables.
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

# Fixture maxima: o_orderkey/l_orderkey 1499, o_custkey/c_custkey 149,
# l_partkey 199, l_suppkey 9 — 91xxxx keys are disjoint new rows.
_ORDERS = """
SELECT * FROM (VALUES
  (910001, 999999, 'O', 100.0, TIMESTAMP '1996-06-01', '1-URGENT'),
  (910002, 5,      'X', 200.0, TIMESTAMP '1996-06-02', 'zz-unseen'),
  (910003, 6,      'F', 0.0,   TIMESTAMP '1996-06-03', '5-LOW'),
  (910004, 7,      'F', -10.5, TIMESTAMP '1996-06-04', '5-LOW'),
  (910005, 8,      'O', 300.0, TIMESTAMP '1970-01-01', '2-HIGH'),
  (910006, 9,      'O', 400.0, TIMESTAMP '2099-12-31', '3-MEDIUM')
) v(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    o_orderpriority)
"""

_LINEITEM = """
SELECT * FROM (VALUES
  (910001, 10, 1, 1, 5.0, 500.0, 0.05, 0.02, 'N', 'O',
   TIMESTAMP '1996-06-05'),
  (919999, 11, 2, 1, 2.0, 100.0, 0.0,  0.0,  'N', 'O',
   TIMESTAMP '1996-06-06'),
  (910002, 12, 3, 1, 0.0, 0.0,   1.0,  0.0,  'N', 'O',
   TIMESTAMP '1996-06-07'),
  (910003, 13, 4, 1, 3.0, 150.0, 0.1,  0.05, 'X', 'Z',
   TIMESTAMP '1996-06-08'),
  (910005, 14, 5, 1, 1.0, 50.0,  0.0,  0.0,  'A', 'F',
   TIMESTAMP '1996-06-09'),
  (910005, 14, 5, 1, 1.0, 50.0,  0.0,  0.0,  'A', 'F',
   TIMESTAMP '1996-06-09'),
  (910005, 15, 6, 2, 1.0, 60.0,  0.0,  0.0,  'R', 'F',
   TIMESTAMP '1970-01-01')
) v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    l_shipdate)
"""


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("degenerate_relational"))
    return build_augmented_dir(
        out, {"orders": _ORDERS, "lineitem": _LINEITEM}
    )


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duck_views(adv_dir)
    yield con
    con.close()


def _rel_ops():
    return sorted(set(ops_reading("orders")) | set(ops_reading("lineitem")))


@pytest.mark.parametrize("name", _rel_ops())
def test_relational_op_survives_degenerate_rows(name, spark, adv_dir, adv_duck):
    assert_op_matches(REGISTRY[name], spark, adv_dir, adv_duck)

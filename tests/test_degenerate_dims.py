"""Degenerate-dimensions gauntlet: nation/region/supplier/part dirt.

Completes the gauntlet family over the broadcast dimension tables. The
fixture dims are referentially perfect and vocabulary-closed; real
dimension feeds are not. Coordinated adversarial rows:

- a nation with an ORPHAN n_regionkey and a unicode name, plus a
  nation that duplicates an existing name under a new key (dimension
  joins and region rollups must not fabricate or drop),
- a region no nation points at (empty rollup groups),
- a supplier with an orphan s_nationkey, a negative balance, and an
  empty name — none of them supplying any lineitem (isolated dim rows
  through outer joins),
- a part with size 0, a NEGATIVE retail price, an unseen brand/type
  vocabulary, and a unicode name — never referenced by lineitem.

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

# Fixture maxima: n_nationkey 24, r_regionkey 4, s_suppkey 9,
# p_partkey 199 — 9xx keys are disjoint new rows.
_SELECTS = {
    "nation": """
SELECT * FROM (VALUES
  (901, 'NACIÓN_龍', 99),
  (902, 'NATION_1', 2)
) v(n_nationkey, n_name, n_regionkey)
""",
    "region": """
SELECT * FROM (VALUES
  (905, 'TERRA NULLIUS')
) v(r_regionkey, r_name)
""",
    "supplier": """
SELECT * FROM (VALUES
  (901, '', 99, -1234.5),
  (902, 'Süpplier#宏 Gmbh & Co.', 3, 0.0)
) v(s_suppkey, s_name, s_nationkey, s_acctbal)
""",
    "part": """
SELECT * FROM (VALUES
  (901, 'größe-零 widget', 'Brand#XX', 'UNSEEN-TYPE', 0, -1.25)
) v(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
""",
}


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("degenerate_dims"))
    return build_augmented_dir(out, _SELECTS)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duck_views(adv_dir)
    yield con
    con.close()


def _dim_ops():
    names: set[str] = set()
    for t in _SELECTS:
        names |= set(ops_reading(t))
    return sorted(names)


@pytest.mark.parametrize("name", _dim_ops())
def test_dim_op_survives_degenerate_rows(name, spark, adv_dir, adv_duck):
    assert_op_matches(REGISTRY[name], spark, adv_dir, adv_duck)

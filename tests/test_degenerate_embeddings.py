"""Degenerate-embeddings gauntlet: similarity ops vs pathological vectors.

The sf0.001 embeddings fixture is geometrically friendly: every vector
is 64-dim, none is the zero vector (cosine denominators never hit 0),
no two vectors are bit-identical, and every label has many members.
Real embedding pipelines violate all four (failed encoder calls emit
zeros or empties; crawl dups produce identical vectors; rare labels are
singletons). Adversarial rows:

- the ZERO vector (norm 0 — cosine must not divide by zero, and both
  engines must agree on what it scores),
- an exact duplicate vector pair (cosine exactly 1.0, distance 0 —
  top-k ties),
- a HUGE-magnitude vector (1e3 per coord; norms ~8e3, dot ~6.4e7 stays
  well inside 6-decimal canonical rounding for float32),
- a singleton label (no same-label neighbor — per-label kNN and
  retrieval metrics must keep, not silently drop, the probe).

Deliberately absent: dimension-mismatched / empty arrays. The engine's
documented contract (SCALE.md) is fixed-width vectors validated at
ingest; zip_with over ragged arrays pads with NULLs in Spark but errors
in DuckDB list functions, so there is no common semantics to pin.

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

# 64-dim literals built in SQL; fixture max vec_id is 499 → 9xxx new.
_ADVERSARIAL = """
SELECT vec_id, embedding, label FROM (
  SELECT 9001 AS vec_id,
         CAST(list_transform(range(64), x -> 0.0) AS FLOAT[]) AS embedding,
         3 AS label
  UNION ALL
  SELECT 9002,
         CAST(list_transform(range(64), x -> 0.25 + 0.01 * x) AS FLOAT[]),
         4
  UNION ALL
  SELECT 9003,
         CAST(list_transform(range(64), x -> 0.25 + 0.01 * x) AS FLOAT[]),
         4
  UNION ALL
  SELECT 9004,
         CAST(list_transform(range(64), x -> 1000.0) AS FLOAT[]),
         5
  UNION ALL
  SELECT 9005,
         CAST(list_transform(range(64), x -> CASE WHEN x % 7 = 0
                THEN -0.5 ELSE 0.125 END) AS FLOAT[]),
         99
  UNION ALL
  -- NULL embedding (encoder row never arrived) with a valid label
  SELECT 9006, CAST(NULL AS FLOAT[]), 7
)
"""


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("degenerate_embeddings"))
    return build_augmented_dir(out, "embeddings", _ADVERSARIAL)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duck_views(adv_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ops_reading("embeddings"))
def test_embedding_op_survives_degenerate_rows(name, spark, adv_dir, adv_duck):
    assert_op_matches(REGISTRY[name], spark, adv_dir, adv_duck)

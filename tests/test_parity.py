"""Oracle-parity pre-flight: every registered op vs its DuckDB oracle.

Runs the driver's t2 comparison locally at sf0.001 (fast); tools/check.py
runs the same at sf0.01 (the driver's actual scale).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from snapshot_s3_util_spark import REGISTRY
from snapshot_s3_util_spark.parity import canon_lines, table_hash


def all_ops():
    return sorted(REGISTRY)


def _cached_run(op, spark, sf_dir, op_runs):
    if op.name not in op_runs:
        df = op.fn(spark, sf_dir)
        op_runs[op.name] = (df.columns, [tuple(r) for r in df.collect()])
    return op_runs[op.name]


@pytest.mark.parametrize("name", all_ops())
def test_op_parity(name, spark, sf_dir, duck, op_runs):
    op = REGISTRY[name]
    s_cols, s_rows = _cached_run(op, spark, sf_dir, op_runs)

    if op.oracle is None:
        assert len(s_rows) > 0, f"{name}: rows-only op returned 0 rows"
        return

    cur = duck.execute(op.oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    sn, sh = table_hash(s_cols, s_rows)
    dn, dh = table_hash(d_cols, d_rows)
    assert sn == dn, f"{name}: row count {sn} vs {dn}"
    if sh != dh:
        ls, ld = canon_lines(s_cols, s_rows), canon_lines(d_cols, d_rows)
        diffs = [(a, b) for a, b in zip(ls, ld) if a != b][:3]
        pytest.fail(f"{name}: value hash mismatch; first diffs: {diffs}")


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert len(df.collect()) > 0


def test_oracle_keys_subset():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


@pytest.mark.parametrize("name", all_ops())
def test_determinism(name, spark, sf_dir, op_runs):
    """Every declared query must hash-identically across two runs (the
    first run is shared with test_op_parity via the op_runs cache)."""
    op = REGISTRY[name]
    h1 = table_hash(*_cached_run(op, spark, sf_dir, op_runs))
    df = op.fn(spark, sf_dir)
    h2 = table_hash(df.columns, [tuple(r) for r in df.collect()])
    assert h1 == h2, f"{name}: nondeterministic result"

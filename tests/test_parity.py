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

    # Arrow fetch, not fetchall(): fetchall() coerces DECIMAL/HUGEINT to
    # Python int, masking the oracle-type mismatches the driver's
    # pandas-based canonicalization catches (round-3 hb_balanced_splits/
    # llm_pack_sequences failures). Arrow yields Decimal -> canon "f:",
    # which correctly diverges from Spark's int64 "i:".
    tbl = duck.execute(op.oracle).fetch_arrow_table()
    d_cols = list(tbl.column_names)
    d_rows = [tuple(rec[c] for c in d_cols) for rec in tbl.to_pylist()]

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


def test_oracle_no_decimal_outputs(duck):
    """No oracle may output DECIMAL/HUGEINT columns.

    DuckDB returns SUM(BIGINT) as DECIMAL128(38,0); the driver
    canonicalizes oracle results via pandas, where DECIMAL renders as
    float ("123.0") while Spark emits int64 ("123") — a guaranteed hash
    mismatch even with identical values (round-3 driver failures on
    hb_balanced_splits / llm_pack_sequences). Planning each oracle with
    LIMIT 0 exposes the output schema without running it.
    """
    offenders = {}
    for name, op in REGISTRY.items():
        if op.oracle is None:
            continue
        tbl = duck.execute(
            f"SELECT * FROM ({op.oracle}) AS __q LIMIT 0"
        ).fetch_arrow_table()
        bad = [
            f"{f.name}:{f.type}"
            for f in tbl.schema
            if "decimal" in str(f.type).lower()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles with DECIMAL output columns (add CAST(... AS "
        f"BIGINT/DOUBLE)): {offenders}"
    )


def test_window_ranking_computed():
    """A never-verified op must sort into the driver's 50-entry window.

    Round 3 shipped fn_try with no external correctness row because the
    window was a hand-curated list; the ranking is now computed from
    CORRECTNESS_r*.json, so any op absent from every artifact outranks
    all already-green ops.
    """
    import snapshot_s3_util_spark as pkg
    from snapshot_s3_util_spark.registry import Op

    dummy = "zz_dummy_never_verified"
    assert dummy not in REGISTRY
    REGISTRY[dummy] = Op(
        name=dummy, fn=lambda spark, sf: None, oracle=None, category="test"
    )
    try:
        pkg.load_all_operators()
        names = list(REGISTRY)
        window = names[:50]
        # The real invariant: a never-verified op outranks every op
        # that already has a green row — EXCEPT the hand-declared
        # behavior-changed ops, which policy rule 1 puts first even
        # when green (a behavior change needs a fresh external row).
        # (When >50 never-verified ops exist — as at the end of round
        # 5 — the dummy can't also fit in the window, so assert rank
        # order, not membership.)
        from pathlib import Path as _P

        _checked, _latest, _green = pkg._verification_history(
            _P(__file__).resolve().parent.parent
        )
        first_green_pos = next(
            (
                i
                for i, n in enumerate(names)
                if n in _green and n not in pkg._WINDOW_CHANGED_THIS_ROUND
            ),
            len(names),
        )
        assert names.index(dummy) < first_green_pos, (
            "never-verified op ranked below a green op"
        )
        never_verified = [n for n in names if n not in _checked]
        if len(never_verified) <= 50:
            assert dummy in window, "never-verified op fell outside the window"
        # any op whose LATEST driver row failed must sit in the window;
        # computed from the artifacts so this never goes stale (the
        # round-4 hand-list version of this assertion broke the moment
        # those ops earned fresh green rows and rotated out)
        from pathlib import Path

        repo = Path(__file__).resolve().parent.parent
        checked, latest, green = pkg._verification_history(repo)
        for name in REGISTRY:
            if name == dummy or name not in checked:
                continue
            if green.get(name) != checked[name]:
                assert name in window, f"latest-row-failed {name} not in window"
    finally:
        REGISTRY.pop(dummy, None)
        pkg.load_all_operators()


@pytest.mark.parametrize("name", all_ops())
def test_determinism(name, spark, sf_dir, op_runs):
    """Every declared query must hash-identically across two runs (the
    first run is shared with test_op_parity via the op_runs cache)."""
    op = REGISTRY[name]
    h1 = table_hash(*_cached_run(op, spark, sf_dir, op_runs))
    df = op.fn(spark, sf_dir)
    h2 = table_hash(df.columns, [tuple(r) for r in df.collect()])
    assert h1 == h2, f"{name}: nondeterministic result"


def test_docstrings_have_no_literal_placeholders():
    """load_all_operators interpolates {_CONST} docstring references
    (round-3 ADVICE): after loading, no registered op's help() text
    may render a brace placeholder literally."""
    import re

    from snapshot_s3_util_spark import REGISTRY

    bad = [
        op.name
        for op in REGISTRY.values()
        if re.search(r"\{_[A-Z][A-Z0-9_]*\}", op.fn.__doc__ or "")
    ]
    assert bad == [], bad

"""Shared plumbing for the degenerate-input gauntlets.

Each gauntlet module augments ONE real sf0.001 table with adversarial
rows, then replays every operator that reads that table against the
augmented directory. The contract (same as test_degenerate_corpus.py,
where the pattern started):

- the Spark side must not raise at plan or run time, and
- where the op carries a DuckDB oracle, both engines must still agree
  (column set + row count + order-insensitive value hash), so a
  "graceful" Spark path that silently diverges from SQL semantics on
  weird input is a failure, not a pass.

Augmenting (rather than replacing) keeps every op's statistical
machinery solvable — group-bys stay populated, fits keep enough
points — so a failure here means edge-case handling, not a starved
fixture.
"""

from __future__ import annotations

import os
import re
import shutil

import duckdb

from snapshot_s3_util_spark import REGISTRY
from snapshot_s3_util_spark.io import TABLES
from snapshot_s3_util_spark.parity import table_hash

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def build_augmented_dir(
    out: str, table: str | dict[str, str], union_select: str | None = None
) -> str:
    """Copy every sf0.001 parquet into `out`, replacing each augmented
    table with (original UNION ALL adversarial-select) written by
    DuckDB. Accepts a single (table, union_select) pair or a dict
    {table: union_select} for coordinated multi-table dirt (e.g.
    orphan foreign keys need rows on both sides)."""
    if isinstance(table, dict):
        selects = table
    else:
        if union_select is None:
            raise ValueError(
                "union_select is required when augmenting a single table"
            )
        selects = {table: union_select}
    for t in TABLES:
        if t in selects:
            continue
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"),
                    os.path.join(out, f"{t}.parquet"))
    con = duckdb.connect()
    for t, sel in selects.items():
        con.execute(
            f"""
            COPY (
              SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')
              UNION ALL
              {sel}
            ) TO '{out}/{t}.parquet' (FORMAT PARQUET)
            """
        )
    con.close()
    return out


def duck_views(adv_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{adv_dir}/{t}.parquet')"
        )
    return con


def ops_reading(table: str) -> list[str]:
    """Ops whose DuckDB oracle references `table` as a word (catches
    FROM/JOIN uses, not columns like n_events).  SQL comments are
    stripped first so a table name mentioned only in a `--` note cannot
    spuriously enroll an op in an unrelated gauntlet."""
    pat = re.compile(rf"\b{table}\b")
    return sorted(
        n
        for n, op in REGISTRY.items()
        if op.oracle and pat.search(re.sub(r"--[^\n]*", "", op.oracle))
    )


def assert_op_matches(op, spark, adv_dir: str, con) -> None:
    df = op.fn(spark, adv_dir)  # must not raise at plan OR run time
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    if op.oracle is None:
        return  # rows-only op: crash-freedom is the contract here
    tbl = con.execute(op.oracle).fetch_arrow_table()
    d_cols = list(tbl.column_names)
    d_rows = [tuple(rec[c] for c in d_cols) for rec in tbl.to_pylist()]
    assert sorted(s_cols) == sorted(d_cols)
    sn, sh = table_hash(s_cols, s_rows)
    dn, dh = table_hash(d_cols, d_rows)
    assert sn == dn, f"{op.name}: {sn} spark rows vs {dn} duckdb rows"
    assert sh == dh, f"{op.name}: value hash mismatch on degenerate input"

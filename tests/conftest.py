from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import snapshot_s3_util_spark  # noqa: E402
from snapshot_s3_util_spark.io import TABLES  # noqa: E402
from snapshot_s3_util_spark.session import get_spark  # noqa: E402

snapshot_s3_util_spark.load_all_operators()

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def op_runs():
    """Session-wide cache of one materialized run per op: name ->
    (cols, rows). Parity checks read the cached run and determinism
    re-runs exactly once more — so every op executes at most twice per
    suite (streaming ops execute a real micro-batch query per run,
    which dominated the old 3-runs-per-op wall clock)."""
    return {}

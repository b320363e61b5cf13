"""Table loading — the engine's scan layer.

Mirrors the reference's data substrate (HBase snapshots exported as
immutable files; SURVEY.md §1.1) onto columnar Parquet: one immutable
parquet file per table per scale factor (TESTDATA.md). All reads go
through :func:`load_table` so the single mandatory custom piece — the
`events` nanosecond-timestamp normalization — lives in exactly one place.

Scale notes (100 TB): `spark.read.parquet` on a directory tree gets
file-listing parallelism, partition pruning and row-group skipping for
free; the loaders below add nothing driver-side (no collect, no schema
inference loops), so they scale with the FileSourceScanExec machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapshot_s3_util_spark.session import ensure_conf

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; canonicalizes the `events` timestamp.

    `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) which Spark 4
    refuses to read natively. With `nanosAsLong=true` it arrives as
    bigint nanos; `timestamp_micros(ts DIV 1000)` truncates ns->us with
    integer division — float division would round half-microseconds and
    diverge from DuckDB's `CAST(ts AS TIMESTAMP)` truncation
    (SURVEY.md §1.2, verified).
    """
    ensure_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-API paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

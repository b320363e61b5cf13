"""Scan operators (SURVEY.md §2B "Scans / sources / sinks").

These are the engine's analogs of the reference's read surface: a full
HBase-table read, a column-family projection, and a rowkey-range scan
(HBase `Scan(startRow, stopRow)`). On Parquet all three resolve to a
single FileSourceScanExec with column pruning and min/max row-group
skipping — verify with `.explain("formatted")`: `ReadSchema` shows the
pruned columns and `PushedFilters` the key-range predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.params import KEYRANGE_HI, KEYRANGE_LO
from snapshot_s3_util_spark.registry import register
from snapshot_s3_util_spark.sql_helpers import EVENTS_REL


@register("scan_full", oracle="SELECT * FROM nation", category="scan")
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan (HBase full-table Scan analog)."""
    return load_table(spark, sf_dir, "nation")


@register(
    "scan_pruned",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
    category="scan",
)
def scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning — the column-family projection analog (SURVEY §1.1).

    The physical plan must read ONLY these two parquet columns
    (ReadSchema: struct<l_orderkey:bigint,l_quantity:double>).
    """
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "scan_keyrange",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey >= {KEYRANGE_LO} AND o_orderkey < {KEYRANGE_HI}
    """,
    category="scan",
)
def scan_keyrange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rowkey-range scan analog (HBase Scan(start, stop), half-open).

    The range predicate is pushed to the parquet reader (PushedFilters:
    GreaterThanOrEqual, LessThan) so non-overlapping row groups are
    skipped via footer min/max — the columnar equivalent of HBase
    seeking directly to the start key.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderkey") >= KEYRANGE_LO) & (F.col("o_orderkey") < KEYRANGE_HI))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "source_json_props",
    oracle=f"""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
    FROM {EVENTS_REL} e
    """,
    category="scan",
)
def source_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingest: parse the JSON `props` column.

    `from_json` with an explicit schema stays JVM-side (Jackson inside
    codegen) — no Python in the loop, so this scales with the scan.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), "k LONG").getField("k").alias("k"),
    )


@register(
    "scan_file_metadata",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(doc_id) AS BIGINT) AS first_row_idx,
           CAST(MAX(doc_id) AS BIGINT) AS last_row_idx,
           TRUE AS is_key_ordered,
           MD5(STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS order_fp
    FROM documents
    """,
    category="scan",
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout audit via the hidden `_metadata` column — the
    engine-side analog of the reference's snapshot verification (A7):
    row count, physical row-index range, an `is_key_ordered` verdict
    (every row's `_metadata.row_index` equals its doc_id — the file is
    physically clustered on the key), and a fingerprint of doc_ids in
    PHYSICAL read order.

    The verdict is the checkable contract: DuckDB states the expected
    physical order via the logical key (`ORDER BY doc_id` + TRUE), and
    Spark proves the file delivers it (`bool_and(row_index = doc_id)`),
    certifying both engines read identical bytes in identical order —
    what a snapshot verifier signs off before declaring an export
    faithful. `_metadata` is generated per-split at scan time: no extra
    shuffle beyond the final single-row aggregate, file pruning intact.
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = d.select(
        "doc_id", F.col("_metadata.row_index").alias("row_idx")
    )
    return rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("row_idx").cast("bigint").alias("first_row_idx"),
        F.max("row_idx").cast("bigint").alias("last_row_idx"),
        F.bool_and(F.col("row_idx") == F.col("doc_id")).alias("is_key_ordered"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("row_idx"),
                                F.col("doc_id").cast("string").alias("d"),
                            )
                        )
                    ),
                    lambda s: s["d"],
                ),
                ",",
            )
        ).alias("order_fp"),
    )

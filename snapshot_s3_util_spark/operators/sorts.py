"""Sort / limit / top-k operators (SURVEY.md §2B).

The order itself can't be asserted through an order-insensitive hash,
so `sort_multi` materializes the rank of each row under the sort as a
column — making ordering (incl. NULLS FIRST placement) value-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.params import TOPK_LIMIT
from snapshot_s3_util_spark.plans.rank import global_row_number
from snapshot_s3_util_spark.registry import register

# npart for the two-pass global rank is derived from input size with a
# cores floor since r15 (plans.rank._derive_npart) — at local[32]/sf0.1
# that is 32, bit-identical to the r6-r14 constant; at 100 TB it grows
# with the orders table instead of pinning 32 range partitions.


@register(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, status_or_null, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY status_or_null ASC NULLS FIRST,
                              o_totalprice DESC, o_orderkey ASC) AS sort_pos
    FROM (SELECT o_orderkey, o_totalprice,
                 CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END
                   AS status_or_null
          FROM orders)
    """,
    category="sort",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit NULLS FIRST, exact global rank
    materialized — WITHOUT a single-partition window.

    Two-pass range-partitioned rank (the 100 TB shape, replacing the
    r5-flagged global `Window.orderBy` row_number) via the shared
    `plans.rank.global_row_number` helper — see that module for the
    full plan derivation (range partition -> local row_number ->
    broadcast count-prefix offsets) and for why the range-exchanged
    spine is localCheckpoint'ed (the offsets ledger and the rank side
    must observe ONE RangePartitioner; ReuseExchange only guarantees
    that while column pruning keeps both subtrees identical, which
    payload columns break).  Asserted in test_plans: no no-partition
    WindowExec anywhere in the plan.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "P", None)
        .otherwise(F.col("o_orderstatus"))
        .alias("status_or_null"),
    )
    keys = [
        F.col("status_or_null").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ]
    return global_row_number(o, keys, out="_rn").select(
        "o_orderkey",
        "status_or_null",
        "o_totalprice",
        F.col("_rn").cast("int").alias("sort_pos"),
    )


@register(
    "limit_topk",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT {TOPK_LIMIT}
    """,
    category="sort",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT k.

    Physical plan is TakeOrderedAndProject: each partition keeps a
    k-heap, the driver merges k*partitions rows — no global sort ever
    happens, which is why this is safe at any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(TOPK_LIMIT)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )

"""Sort / limit / top-k operators (SURVEY.md §2B).

The order itself can't be asserted through an order-insensitive hash,
so `sort_multi` materializes the rank of each row under the sort as a
column — making ordering (incl. NULLS FIRST placement) value-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.params import TOPK_LIMIT
from snapshot_s3_util_spark.registry import register


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
    """Multi-column sort with explicit NULLS FIRST, rank materialized.

    A global ROW_NUMBER forces a single total order; at 100 TB you'd
    range-partition (repartitionByRange) and add per-partition offsets
    instead — here the driver-checkable form needs the exact rank.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "P", None)
        .otherwise(F.col("o_orderstatus"))
        .alias("status_or_null"),
    )
    w = Window.orderBy(
        F.col("status_or_null").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )
    return o.select(
        "o_orderkey",
        "status_or_null",
        "o_totalprice",
        F.row_number().over(w).alias("sort_pos"),
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

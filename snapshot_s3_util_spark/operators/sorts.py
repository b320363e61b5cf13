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

_SORT_NPART = 32  # range partitions for sort_multi's two-pass global rank


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
    r5-flagged global `Window.orderBy` row_number):
      1. `repartitionByRange` on the full sort key — partition i holds
         strictly smaller keys than partition i+1, every partition
         bounded at ~|orders|/N rows.
      2. LOCAL row_number per range partition (window PARTITIONED by
         `spark_partition_id()` — never a no-partition WindowExec).
      3. Global rank = local rank + the count-prefix offset of the
         partition: a groupBy(pid).count() (N bounded rows), prefix-
         summed by a window over those N rows (partitioned by a
         constant so the frame is explicit and tiny), broadcast back.
    Everything is ONE plan: RangePartitioner seeds its boundary
    sampling with the RDD id, so a recomputed exchange can place
    boundary rows differently across separate jobs — the offsets
    subtree therefore reuses the SAME range exchange via Spark's
    ReuseExchange (identical canonical subplan), never a second
    execution.  Asserted in test_plans: one ReusedExchange, no
    no-partition WindowExec warning class.
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
    part = o.repartitionByRange(_SORT_NPART, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = part.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # partition the N-row prefix sum by a NON-FOLDABLE constant
    # (`_pid % 1` = 0): a foldable literal is optimized out of the
    # partition spec, which would re-trigger the no-partition WindowExec
    # warning this op exists to avoid.  The frame is |N| = 32 rows.
    w_prefix = (
        Window.partitionBy(F.col("_pid") % 1)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_prefix), F.lit(0)).alias("_off"),
    )
    w_local = Window.partitionBy("_pid").orderBy(*keys)
    return (
        part.withColumn("_lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .select(
            "o_orderkey",
            "status_or_null",
            "o_totalprice",
            (F.col("_off") + F.col("_lrn")).cast("int").alias("sort_pos"),
        )
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

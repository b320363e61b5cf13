"""Aggregation operators (SURVEY.md §2B "Aggregations").

All plans are two-phase HashAggregate (partial map-side combine + final
after a key shuffle) — Catalyst does this automatically for every
`groupBy().agg()` below; at 100 TB the partial aggregation bounds the
shuffle to |groups| x partitions rows, so low-cardinality keys like
(l_returnflag, l_linestatus) shuffle kilobytes regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.params import Q1_SHIP_CUTOFF
from snapshot_s3_util_spark.registry import register

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 4)                                    AS sum_qty,
  ROUND(SUM(l_extendedprice), 4)                               AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)            AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
  ROUND(AVG(l_quantity), 6)                                    AS avg_qty,
  ROUND(AVG(l_extendedprice), 6)                               AS avg_price,
  ROUND(AVG(l_discount), 6)                                    AS avg_disc,
  COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_hash_groupby", oracle=_Q1_ORACLE, category="agg")
def agg_hash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (flagship; also `entry()`).

    Plan shape: parquet scan (shipdate predicate pushed to row groups,
    8-column pruned read) -> partial HashAggregate -> exchange on the
    2 grouping keys -> final HashAggregate. Whole-stage codegen spans
    the scan+partial-agg stage.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

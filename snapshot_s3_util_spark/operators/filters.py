"""Projection / filter operators (SURVEY.md §2B).

Pure narrow transformations — no shuffle at any scale; Catalyst folds
the predicate into the scan (PushedFilters) and the projections into
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.registry import register


@register(
    "filter_predicate",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('F', 'O')
           AND o_totalprice BETWEEN 50000 AND 200000
           AND o_orderpriority LIKE '1-%')
       OR (NOT o_orderstatus = 'F' AND o_custkey IS NULL)
    """,
    category="filter",
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL."""
    o = load_table(spark, sf_dir, "orders")
    left = (
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").like("1-%")
    )
    right = (~(F.col("o_orderstatus") == "F")) & F.col("o_custkey").isNull()
    return o.filter(left | right).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@register(
    "project_compute",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net_charge,
      CASE WHEN l_quantity >= 40 THEN 'bulk'
           WHEN l_quantity >= 10 THEN 'mid'
           ELSE 'small' END AS qty_band,
      CAST(l_quantity >= 25 AS BOOLEAN) AS is_heavy
    FROM lineitem
    """,
    category="filter",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived columns: arithmetic, CASE WHEN, boolean predicate column."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
        ).alias("net_charge"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        (F.col("l_quantity") >= 25).alias("is_heavy"),
    )

"""snapshot_s3_util_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference (`lospro7/snapshot-s3-util`, an HBase snapshot -> S3 export
CLI; see SURVEY.md §0-§2), re-expressed Spark-first:

- The reference's ETL workflow (snapshot / export / import / TTL-cleanup /
  verify) becomes declarative DataFrame read->transform->write plans
  (`hbase/` package).
- The relational + LLM-data-pipeline operator surface mandated by
  BASELINE.json's north star lives in `operators/`, `functions/`,
  `llm/`, `streaming/`, `udf/`.

Every operator registers itself in `registry.REGISTRY` with a DuckDB
oracle SQL string (or None for rows-only checks); `__spark_entry__.py`
exposes the registry to the driver harness.
"""

from snapshot_s3_util_spark.registry import REGISTRY, register  # noqa: F401


def load_all_operators() -> None:
    """Import every operator module so REGISTRY is fully populated."""
    import snapshot_s3_util_spark.operators  # noqa: F401
    import snapshot_s3_util_spark.functions  # noqa: F401
    import snapshot_s3_util_spark.hbase  # noqa: F401
    import snapshot_s3_util_spark.llm  # noqa: F401
    import snapshot_s3_util_spark.streaming  # noqa: F401
    import snapshot_s3_util_spark.udf  # noqa: F401
    import snapshot_s3_util_spark.sources  # noqa: F401

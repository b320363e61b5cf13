"""Relational operator surface (SURVEY.md §2B)."""

import snapshot_s3_util_spark.operators.aggregates  # noqa: F401
import snapshot_s3_util_spark.operators.composites  # noqa: F401
import snapshot_s3_util_spark.operators.extras  # noqa: F401
import snapshot_s3_util_spark.operators.filters  # noqa: F401
import snapshot_s3_util_spark.operators.graphs  # noqa: F401
import snapshot_s3_util_spark.operators.joins  # noqa: F401
import snapshot_s3_util_spark.operators.scans  # noqa: F401
import snapshot_s3_util_spark.operators.setops  # noqa: F401
import snapshot_s3_util_spark.operators.sorts  # noqa: F401
import snapshot_s3_util_spark.operators.windows  # noqa: F401

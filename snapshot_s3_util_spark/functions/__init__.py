"""Scalar function families (SURVEY.md §2B)."""

import snapshot_s3_util_spark.functions.scalars  # noqa: F401

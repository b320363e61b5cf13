"""Relational operator surface (SURVEY.md §2B)."""

import snapshot_s3_util_spark.operators.aggregates  # noqa: F401

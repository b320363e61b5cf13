"""Structured Streaming operators (SURVEY.md §2B)."""

import snapshot_s3_util_spark.streaming.stream_ops  # noqa: F401
import snapshot_s3_util_spark.streaming.stateful  # noqa: F401

"""HBase-workflow semantics as Spark plans (SURVEY.md §2A)."""

import snapshot_s3_util_spark.hbase.snapshot_ops  # noqa: F401

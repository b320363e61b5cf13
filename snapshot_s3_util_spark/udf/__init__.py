"""UDF / UDAF / UDTF surface (SURVEY.md §2B)."""

import snapshot_s3_util_spark.udf.vector_udfs  # noqa: F401

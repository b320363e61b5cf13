"""Sources and sinks: parquet export/import emulation (SURVEY.md §2A A3/A4)."""

import snapshot_s3_util_spark.sources.python_sink  # noqa: F401
import snapshot_s3_util_spark.sources.sinks  # noqa: F401
import snapshot_s3_util_spark.sources.stream_source  # noqa: F401

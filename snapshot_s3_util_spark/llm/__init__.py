"""LLM-data-pipeline operators (SURVEY.md §2B llm_*)."""

import snapshot_s3_util_spark.llm.dedup  # noqa: F401
import snapshot_s3_util_spark.llm.similarity  # noqa: F401
import snapshot_s3_util_spark.llm.textstats  # noqa: F401
import snapshot_s3_util_spark.llm.multimodal  # noqa: F401
import snapshot_s3_util_spark.llm.clustering  # noqa: F401
import snapshot_s3_util_spark.llm.pipeline  # noqa: F401
import snapshot_s3_util_spark.llm.mixture  # noqa: F401
import snapshot_s3_util_spark.llm.tokenizer  # noqa: F401
import snapshot_s3_util_spark.llm.quality  # noqa: F401

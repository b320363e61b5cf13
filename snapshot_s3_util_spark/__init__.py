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


# The driver's correctness harness checks the FIRST 50 registry entries in
# registration order.  Rotation policy (round-3 revision, per ADVICE):
# 1. Never-verified and changed-since-last-verified ops ALWAYS outrank
#    rotation — a behavior change must get a fresh external row.
# 2. Then the backlog of ops whose most recent green row is oldest
#    (round 3 = the relational core last hard-checked in round 1).
# 3. Then everything else (most recently re-verified), preserving
#    registration order.
_WINDOW_FIRST_NAMES = [
    # never driver-checked (registered late in round 2)
    "stream_foreach_batch_export",
    # new in round 3
    "llm_dedup_simhash_pairs",
    "llm_sim_ann_lsh",
    "agg_approx_percentile",
    "stream_join_static",
    "stream_stream_join",
    "sink_sorted_layout",
    "join_bucketed_colocated",
    "sink_compaction",
    "udtf_python_table",
    "hb_balanced_splits",
    "llm_split_assign",
    "llm_pack_sequences",
    "llm_domain_mixture",
    "llm_sample_weighted",
    "llm_repetition_stats",
    "llm_tfidf_topterms",
    "agg_hll_sketch_union",
    "join_salted_skew",
    "llm_dedup_incremental",
    "sink_partition_overwrite",
    "fn_variant",
    "scan_file_metadata",
    "sink_observed_export",
    "agg_approx_topk",
    "win_fill_forward",
    "agg_histogram",
    "llm_pipeline_export",
    "set_intersect_all",
    "set_except_distinct",
    "fn_map",
    # fn/oracle changed in round 3 — need fresh rows for the new behavior
    "stream_session",          # oracle cumsum (ts, event_id) tiebreaker
    "hb_incremental_export",   # remodeled as partial-failure resume
    "llm_dedup_components",    # convergence loop + recursive-CTE oracle
    "llm_dedup_embedding",     # SRP sign test on round(dot, 6)
    "sink_jsonl_shards",       # NULL-safe fingerprint (coalesce)
    "hb_export_import_cycle",  # NULL-safe fingerprint (coalesce)
]
# Round-1-only backlog, ordered so the categories touched by round-2
# refactors (join_anti rewrite 6c9ef68, scan pushdown 24aa982) re-verify
# soonest. The r2-green members of these categories are skipped.
# Round-3 window = 31 never-verified + 6 changed + the first 13 of this
# backlog (the full join family + 2 scans); the tail that slips (aggs,
# windows, sorts, setops, fn_*, composites — untouched since their r1
# green rows) rotates to the front of round 4's window.
_WINDOW_NEXT_CATEGORIES = [
    "join", "scan", "filter", "agg", "window", "sort", "setop",
    "function", "composite",
]
_WINDOW_SKIP_NAMES = {
    # already re-verified green in round 2's window
    "agg_hash_groupby", "agg_approx_distinct", "agg_collect_ordered",
    "fn_array", "multimodal_bytes",
}


def load_all_operators() -> None:
    """Import every operator module so REGISTRY is fully populated.

    After importing, reorder REGISTRY so ops needing a driver
    correctness row soonest come first (see window-rotation note
    above); relative order within each group is preserved.
    """
    import snapshot_s3_util_spark.operators  # noqa: F401
    import snapshot_s3_util_spark.functions  # noqa: F401
    import snapshot_s3_util_spark.hbase  # noqa: F401
    import snapshot_s3_util_spark.llm  # noqa: F401
    import snapshot_s3_util_spark.streaming  # noqa: F401
    import snapshot_s3_util_spark.udf  # noqa: F401
    import snapshot_s3_util_spark.sources  # noqa: F401

    def _rank(op) -> tuple:
        if op.name in _WINDOW_FIRST_NAMES:
            return (0, _WINDOW_FIRST_NAMES.index(op.name))
        if op.category in _WINDOW_NEXT_CATEGORIES and op.name not in _WINDOW_SKIP_NAMES:
            return (1, _WINDOW_NEXT_CATEGORIES.index(op.category))
        return (2, 0)

    ordered = sorted(REGISTRY.values(), key=_rank)  # stable sort
    REGISTRY.clear()
    REGISTRY.update({op.name: op for op in ordered})

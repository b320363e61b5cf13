"""Shared assembly for the bucket-cap recall-audit ops.

`llm_simhash_recall_bucket_cap` (llm/dedup.py) and the
`multimodal_{ahash,phash}_recall_bucket_cap` pair (llm/multimodal.py)
all report the same single-row contract — bucket totals, over-cap
bucket count, true/kept/dropped pair counts, exact recall — differing
only in how their band frames and pair sets are built.  The row
assembly lives HERE once so a change to the contract (rounding, the
empty-truth convention, a new column) cannot drift between the audits
(round-11 review finding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cap_recall_row(
    bands: DataFrame,
    key_cols: list,
    cap: int,
    true: DataFrame,
    kept: DataFrame,
) -> DataFrame:
    """One audit row from a band frame and the true/kept pair frames.

    `kept` must be a subset of `true` — every caller guarantees it by
    construction (cap-sampled blocks ⊆ full blocks, identical verify),
    which is what makes recall = kept/true exact rather than an
    estimate.  Empty truth reports recall 1.0 (nothing to lose).  The
    three single-row aggregates meet in broadcast cross-joins — no
    data-sized shuffle beyond what the inputs already did."""
    bsz = bands.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("bn"))
    b = bsz.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.when(F.col("bn") > cap, 1).otherwise(0))
        .cast("bigint")
        .alias("n_overcap_buckets"),
    )
    t = true.agg(F.count(F.lit(1)).cast("bigint").alias("true_pairs"))
    k = kept.agg(F.count(F.lit(1)).cast("bigint").alias("kept_pairs"))
    return (
        b.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(k))
        .select(
            "n_buckets",
            "n_overcap_buckets",
            "true_pairs",
            "kept_pairs",
            (F.col("true_pairs") - F.col("kept_pairs"))
            .cast("bigint")
            .alias("dropped_pairs"),
            F.round(
                F.when(F.col("true_pairs") == 0, F.lit(1.0)).otherwise(
                    F.col("kept_pairs").cast("double") / F.col("true_pairs")
                ),
                6,
            ).alias("recall"),
        )
    )

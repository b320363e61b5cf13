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


def _recall_of(kept_col: str) -> "F.Column":
    return F.round(
        F.when(F.col("true_pairs") == 0, F.lit(1.0)).otherwise(
            F.col(kept_col).cast("double") / F.col("true_pairs")
        ),
        6,
    )


def cap_recall_row(
    bands: DataFrame,
    key_cols: list,
    cap: int,
    true: DataFrame,
    kept: DataFrame,
    margins: "tuple | None" = None,
) -> DataFrame:
    """One audit row from a band frame and the true/kept pair frames.

    `kept` must be a subset of `true` — every caller guarantees it by
    construction (cap-sampled blocks ⊆ full blocks, identical verify),
    which is what makes recall = kept/true exact rather than an
    estimate.  Empty truth reports recall 1.0 (nothing to lose).  The
    single-row aggregates meet in broadcast cross-joins — no
    data-sized shuffle beyond what the inputs already did.

    `margins`, when given, is ((cap_lo, kept_lo), (cap_hi, kept_hi)) —
    the same pipeline run at half and double the shipped sample width
    (r12 verdict ask #4: the one sub-1.0 audited recall reported a
    point estimate only). The extra columns turn the point into a
    local recall-vs-width CURVE: a large recall - recall_lo gap says
    the shipped width sits just past a saturation cliff, and
    recall_hi - recall says what the next doubling would buy — the
    instrument that catches the next saturation regime before a
    dropped pair does, exactly like the minhash margin columns."""
    bsz = bands.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("bn"))
    b = bsz.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.when(F.col("bn") > cap, 1).otherwise(0))
        .cast("bigint")
        .alias("n_overcap_buckets"),
    )
    t = true.agg(F.count(F.lit(1)).cast("bigint").alias("true_pairs"))
    k = kept.agg(F.count(F.lit(1)).cast("bigint").alias("kept_pairs"))
    row = b.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(k))
    cols = [
        F.col("n_buckets"),
        F.col("n_overcap_buckets"),
        F.col("true_pairs"),
        F.col("kept_pairs"),
        (F.col("true_pairs") - F.col("kept_pairs"))
        .cast("bigint")
        .alias("dropped_pairs"),
        _recall_of("kept_pairs").alias("recall"),
    ]
    if margins is not None:
        (cap_lo, kept_lo), (cap_hi, kept_hi) = margins
        klo = kept_lo.agg(
            F.count(F.lit(1)).cast("bigint").alias("kept_lo")
        )
        khi = kept_hi.agg(
            F.count(F.lit(1)).cast("bigint").alias("kept_hi")
        )
        row = row.crossJoin(F.broadcast(klo)).crossJoin(F.broadcast(khi))
        cols += [
            F.lit(cap_lo).cast("bigint").alias("cap_lo"),
            _recall_of("kept_lo").alias("recall_lo"),
            F.lit(cap_hi).cast("bigint").alias("cap_hi"),
            _recall_of("kept_hi").alias("recall_hi"),
        ]
    return row.select(*cols)

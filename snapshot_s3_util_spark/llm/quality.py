"""Corpus-quality EVALUATION operators: distinctive-term log-odds,
annotator agreement, filter-score calibration, inference batching
efficiency, char-entropy gating, tokenizer fertility, pass@k, and the
Zipf corpus-health fit.

These audit the *decisions* a curation pipeline makes — which terms
mark a subcorpus, whether two cheap labelers agree, whether a filter's
confidence score is honest, what padding an inference fleet pays,
whether the token distribution still looks like language — all as
single-pass map-side-combined aggregates (or fully doc-local array
expressions) that hold their shape at 100 TB: outputs are |vocab|-,
|bins|-, |buckets|-, |langs|- or |k|-bounded, never row-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.registry import register

# ------------------------------------ distinctive terms (log-odds)
# Monroe / Colaresi / Quinn "Fightin' Words" (2008): log-odds-ratio
# with an informative Dirichlet prior drawn from the pooled corpus,
# z-scored.  Group A = English docs, group B = everything else.
_LO_PRIOR = 10.0  # total prior mass a0 spread per pooled term share
_LO_TOPK = 15     # report the K most A-leaning and K most B-leaning
_LO_MIN_CNT = 5   # ignore terms rarer than this in the pooled corpus

_LOGODDS_ORACLE = f"""
WITH toks AS (
  SELECT lang = 'en' AS is_a, UNNEST(string_split(text, ' ')) AS term
  FROM documents
),
cnt AS (
  SELECT term,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS DOUBLE) AS ya,
         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS DOUBLE) AS yb
  FROM toks GROUP BY term
),
tot AS (
  SELECT SUM(ya) AS na, SUM(yb) AS nb, SUM(ya + yb) AS n FROM cnt
),
z AS (
  SELECT term, ya, yb,
         LN((ya + aw) / (na + {_LO_PRIOR} - ya - aw))
           - LN((yb + aw) / (nb + {_LO_PRIOR} - yb - aw)) AS delta,
         1.0 / (ya + aw) + 1.0 / (yb + aw) AS var
  FROM (SELECT c.*, t.na, t.nb,
               {_LO_PRIOR} * (c.ya + c.yb) / t.n AS aw
        FROM cnt c CROSS JOIN tot t)
  WHERE ya + yb >= {_LO_MIN_CNT}
),
ranked AS (
  SELECT term,
         CAST(ya AS BIGINT) AS cnt_a, CAST(yb AS BIGINT) AS cnt_b,
         ROUND(delta / SQRT(var), 6) AS zscore,
         ROW_NUMBER() OVER (ORDER BY delta / SQRT(var) DESC, term) AS ra,
         ROW_NUMBER() OVER (ORDER BY delta / SQRT(var) ASC, term) AS rb
  FROM z
)
SELECT term, cnt_a, cnt_b, zscore,
       CASE WHEN ra <= {_LO_TOPK} THEN 'a' ELSE 'b' END AS leans
FROM ranked WHERE ra <= {_LO_TOPK} OR rb <= {_LO_TOPK}
"""


@register("llm_distinctive_terms_logodds", oracle=_LOGODDS_ORACLE, category="llm")
def llm_distinctive_terms_logodds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The {_LO_TOPK} terms most characteristic of the English
    subcorpus and the {_LO_TOPK} most characteristic of the rest, by
    the Monroe et al. log-odds-ratio with an informative Dirichlet
    prior (prior mass {_LO_PRIOR} spread by pooled term share),
    z-scored by the delta's variance — the standard "what words mark
    this source" diagnostic, more robust than raw PMI/tf-idf because
    the prior shrinks rare-term noise.

    Plan: one token explode into a map-side-combined groupBy(term)
    conditional-sum (the only data-sized shuffle, keyed by term);
    totals are a broadcast 1-row frame; each top-K side is an
    orderBy+limit — TakeOrderedAndProject, a parallel per-partition
    heap + K-row driver merge, NEVER a global window — so the scored
    |vocab|-row frame (tens of millions of rows under Zipf at 100 TB)
    is never funneled through one task.  The B side anti-joins the
    broadcast K-row A side so a term in both cuts keeps leans='a',
    matching the oracle's CASE.  ln() on doubles is bit-identical
    across engines; z is rounded once.
    """
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select(
            (F.col("lang") == "en").alias("is_a"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .groupBy("term")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0))
            .cast("double")
            .alias("ya"),
            F.sum(F.when(F.col("is_a"), 0).otherwise(1))
            .cast("double")
            .alias("yb"),
        )
    )
    tot = cnt.agg(
        F.sum("ya").alias("na"),
        F.sum("yb").alias("nb"),
        F.sum(F.col("ya") + F.col("yb")).alias("n"),
    )
    aw = F.lit(_LO_PRIOR) * (F.col("ya") + F.col("yb")) / F.col("n")
    delta = F.log(
        (F.col("ya") + aw) / (F.col("na") + F.lit(_LO_PRIOR) - F.col("ya") - aw)
    ) - F.log(
        (F.col("yb") + aw) / (F.col("nb") + F.lit(_LO_PRIOR) - F.col("yb") - aw)
    )
    var = 1.0 / (F.col("ya") + aw) + 1.0 / (F.col("yb") + aw)
    z = (
        cnt.filter(F.col("ya") + F.col("yb") >= _LO_MIN_CNT)
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.col("ya").cast("bigint").alias("cnt_a"),
            F.col("yb").cast("bigint").alias("cnt_b"),
            (delta / F.sqrt(var)).alias("_z"),
        )
    )
    top_a = (
        z.orderBy(F.desc("_z"), F.asc("term"))
        .limit(_LO_TOPK)
        .withColumn("leans", F.lit("a"))
    )
    top_b = (
        z.orderBy(F.asc("_z"), F.asc("term"))
        .limit(_LO_TOPK)
        .join(F.broadcast(top_a.select("term")), "term", "left_anti")
        .withColumn("leans", F.lit("b"))
    )
    return top_a.unionByName(top_b).select(
        "term",
        "cnt_a",
        "cnt_b",
        F.round("_z", 6).alias("zscore"),
        "leans",
    )


# ------------------------------------------ annotator agreement
# Two deterministic cheap labelers stand in for a pair of LLM judges:
# rater A keeps docs by raw length, rater B by token count.  Cohen's
# kappa corrects their observed agreement for chance.
_KAPPA_A_MIN_CHARS = 250
_KAPPA_B_MIN_TOKS = 45

_KAPPA_ORACLE = f"""
WITH lab AS (
  SELECT CASE WHEN LEN(text) >= {_KAPPA_A_MIN_CHARS} THEN 1 ELSE 0 END AS a,
         CASE WHEN LEN(string_split(text, ' ')) >= {_KAPPA_B_MIN_TOKS}
              THEN 1 ELSE 0 END AS b
  FROM documents
),
m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(a * b) AS DOUBLE) AS kk,
         CAST(SUM(a * (1 - b)) AS DOUBLE) AS kd,
         CAST(SUM((1 - a) * b) AS DOUBLE) AS dk,
         CAST(SUM((1 - a) * (1 - b)) AS DOUBLE) AS dd
  FROM lab
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(kk AS BIGINT) AS both_keep, CAST(dd AS BIGINT) AS both_drop,
       CAST(kd AS BIGINT) AS a_only, CAST(dk AS BIGINT) AS b_only,
       ROUND((kk + dd) / n, 6) AS po,
       ROUND(((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)) / (n * n), 6)
         AS pe,
       ROUND(((kk + dd) / n
              - ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)) / (n * n))
             / (1 - ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)) / (n * n)),
             6) AS kappa
FROM m
"""


@register("llm_annotator_agreement", oracle=_KAPPA_ORACLE, category="llm")
def llm_annotator_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic keep/drop labelers
    (rater A: >= {_KAPPA_A_MIN_CHARS} chars; rater B: >=
    {_KAPPA_B_MIN_TOKS} tokens) — the inter-annotator-agreement audit
    a labeling pipeline runs before trusting an ensemble of cheap
    LLM judges: kappa = (po - pe) / (1 - pe) corrects raw agreement
    for the agreement two biased coin-flippers would get for free.

    Plan: one narrow scan -> four map-side-combined conditional sums
    -> 1 row; the kappa arithmetic is driver-free column algebra on
    that single row.  No shuffle carries more than the partial-agg
    rows; holds at any corpus size.
    """
    # when/otherwise (not a bare cast): a NULL-text doc labels as DROP
    # (0) for both raters in both engines — a bare cast would carry
    # NULL into the sums while the oracle's CASE yields 0.
    lab = load_table(spark, sf_dir, "documents").select(
        F.when(F.length("text") >= _KAPPA_A_MIN_CHARS, 1)
        .otherwise(0)
        .alias("a"),
        F.when(F.size(F.split("text", " ")) >= _KAPPA_B_MIN_TOKS, 1)
        .otherwise(0)
        .alias("b"),
    )
    m = lab.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("double").alias("kk"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("double").alias("kd"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("double").alias("dk"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("double").alias("dd"),
    )
    n, kk, kd, dk, dd = (F.col(c) for c in ("n", "kk", "kd", "dk", "dd"))
    po = (kk + dd) / n
    pe = ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)) / (n * n)
    return m.select(
        n.cast("bigint").alias("n_docs"),
        kk.cast("bigint").alias("both_keep"),
        dd.cast("bigint").alias("both_drop"),
        kd.cast("bigint").alias("a_only"),
        dk.cast("bigint").alias("b_only"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )


# ------------------------------------------ filter calibration (ECE)
# A quality filter emits a keep-probability; calibration asks whether
# "0.8 confidence" really keeps 80%.  Score: logistic in token count
# (centered mid-corpus); outcome: the n_chars ground truth the score
# tries to predict.  Ten equal-width bins + the expected calibration
# error, the reliability-diagram standard.
_ECE_BINS = 10
_ECE_TOK_MID = 55.0
_ECE_TOK_SCALE = 15.0
_ECE_POS_CHARS = 300

_ECE_ORACLE = f"""
WITH scored AS (
  SELECT 1.0 / (1.0 + EXP(-(LEN(string_split(text, ' ')) - {_ECE_TOK_MID})
                          / {_ECE_TOK_SCALE})) AS conf,
         CASE WHEN n_chars >= {_ECE_POS_CHARS} THEN 1.0 ELSE 0.0 END AS y
  FROM documents
),
b AS (
  SELECT LEAST(CAST(FLOOR(conf * {_ECE_BINS}) AS BIGINT), {_ECE_BINS} - 1)
           AS bin,
         COUNT(*) AS n, AVG(conf) AS avg_conf, AVG(y) AS frac_pos
  FROM scored GROUP BY 1
),
tot AS (
  SELECT SUM(n * ABS(avg_conf - frac_pos)) / SUM(n) AS ece FROM b
)
SELECT bin, CAST(n AS BIGINT) AS n_docs,
       ROUND(avg_conf, 6) AS avg_conf, ROUND(frac_pos, 6) AS frac_pos,
       ROUND(avg_conf - frac_pos, 6) AS gap,
       ROUND(tot.ece, 6) AS ece
FROM b CROSS JOIN tot
ORDER BY bin
"""


@register("llm_filter_calibration_ece", oracle=_ECE_ORACLE, category="llm")
def llm_filter_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for a quality
    filter's keep-probability (logistic in token count, centered at
    {_ECE_TOK_MID}) against the >= {_ECE_POS_CHARS}-chars outcome it
    predicts: {_ECE_BINS} equal-width confidence bins with mean
    confidence vs realized positive rate, and ECE = Σ n_b/N ·
    |conf_b - pos_b| — the audit that tells you whether a threshold
    on that score means what it claims before it gates 100 TB.

    Plan: one scan -> map-side-combined groupBy(bin) ({_ECE_BINS}
    rows); ECE is an aggregate OVER those bins, broadcast back onto
    them — constant-bounded frames beyond the single data pass.
    """
    scored = load_table(spark, sf_dir, "documents").select(
        (
            1.0
            / (
                1.0
                + F.exp(
                    -(F.size(F.split("text", " ")) - F.lit(_ECE_TOK_MID))
                    / F.lit(_ECE_TOK_SCALE)
                )
            )
        ).alias("conf"),
        F.when(F.col("n_chars") >= _ECE_POS_CHARS, 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    b = scored.groupBy(
        F.least(
            F.floor(F.col("conf") * _ECE_BINS).cast("bigint"),
            F.lit(_ECE_BINS - 1).cast("bigint"),
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("conf").alias("avg_conf"),
        F.avg("y").alias("frac_pos"),
    )
    tot = b.agg(
        (
            F.sum(F.col("n_docs") * F.abs(F.col("avg_conf") - F.col("frac_pos")))
            / F.sum("n_docs")
        ).alias("ece")
    )
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_docs",
            F.round("avg_conf", 6).alias("avg_conf"),
            F.round("frac_pos", 6).alias("frac_pos"),
            F.round(F.col("avg_conf") - F.col("frac_pos"), 6).alias("gap"),
            F.round("ece", 6).alias("ece"),
        )
        .orderBy("bin")
    )


# ------------------------------------------ length-bucket batching
# Inference fleets batch fixed-shape tensors: each sequence pads up to
# its bucket's cap.  Bucketing by next-power-of-two bounds waste at
# <50% worst-case; this op reports what the corpus actually pays.
_LBB_MIN_CAP = 16
_LBB_MAX_CAP = 2048
_LBB_BATCH = 32

_LBB_ORACLE = f"""
WITH lens AS (
  SELECT GREATEST(LEAST(LEN(string_split(text, ' ')), {_LBB_MAX_CAP}), 1)
           AS n_toks
  FROM documents
),
b AS (
  SELECT GREATEST(
           CAST(POWER(2, CEIL(LOG2(CAST(n_toks AS DOUBLE)))) AS BIGINT),
           {_LBB_MIN_CAP}) AS bucket_cap,
         COUNT(*) AS n_docs,
         SUM(n_toks) AS real_tokens
  FROM lens GROUP BY 1
)
SELECT bucket_cap, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(real_tokens AS BIGINT) AS real_tokens,
       CAST(CEIL(CAST(n_docs AS DOUBLE) / {_LBB_BATCH}) AS BIGINT)
         AS n_batches,
       CAST(n_docs * bucket_cap AS BIGINT) AS padded_tokens,
       ROUND(1.0 - CAST(real_tokens AS DOUBLE) / (n_docs * bucket_cap), 6)
         AS pad_waste
FROM b ORDER BY bucket_cap
"""


@register("llm_length_bucket_batching", oracle=_LBB_ORACLE, category="llm")
def llm_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference batching plan by power-of-two length buckets (caps
    clamped to [{_LBB_MIN_CAP}, {_LBB_MAX_CAP}]): per bucket, document
    count, batch count at batch size {_LBB_BATCH}, and the padding
    waste (1 - real/padded tokens) the fleet pays because every
    sequence in a bucket pads to the cap — the number that decides
    whether finer bucketing or sequence packing is worth it.

    Plan: one scan -> map-side-combined groupBy(bucket): the shuffle
    carries O(log2 {_LBB_MAX_CAP}) rows per map task regardless of
    corpus size.  All bucket math is integer column algebra.
    """
    lens = load_table(spark, sf_dir, "documents").select(
        F.greatest(
            F.least(F.size(F.split("text", " ")), F.lit(_LBB_MAX_CAP)),
            F.lit(1),
        ).alias("n_toks")
    )
    cap = F.greatest(
        F.pow(
            F.lit(2.0),
            F.ceil(F.log2(F.col("n_toks").cast("double"))).cast("double"),
        ).cast("bigint"),
        F.lit(_LBB_MIN_CAP).cast("bigint"),
    )
    b = lens.groupBy(cap.alias("bucket_cap")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("real_tokens"),
    )
    return b.select(
        "bucket_cap",
        "n_docs",
        "real_tokens",
        F.ceil(F.col("n_docs").cast("double") / _LBB_BATCH)
        .cast("bigint")
        .alias("n_batches"),
        (F.col("n_docs") * F.col("bucket_cap"))
        .cast("bigint")
        .alias("padded_tokens"),
        F.round(
            1.0
            - F.col("real_tokens").cast("double")
            / (F.col("n_docs") * F.col("bucket_cap")),
            6,
        ).alias("pad_waste"),
    ).orderBy("bucket_cap")


# ------------------------------------------ char-entropy gibberish gate
# Natural prose sits near 4-4.5 bits/char at the character level;
# repetitive spam collapses toward 0, key-mash / binary spew pushes
# toward log2(alphabet).  Both tails get flagged.
_ENT_LO = 3.0
_ENT_HI = 5.2

_CHAR_ENTROPY_ORACLE = f"""
WITH chars AS (
  SELECT doc_id, UNNEST(string_split(text, '')) AS c FROM documents
),
dist AS (
  SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS k FROM chars GROUP BY 1, 2
),
withn AS (
  SELECT doc_id, k, SUM(k) OVER (PARTITION BY doc_id) AS n FROM dist
),
ent AS (
  SELECT doc_id,
         CAST(MAX(n) AS BIGINT) AS n_chars,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         -SUM((k / n) * LOG2(k / n)) AS h
  FROM withn GROUP BY doc_id
)
SELECT doc_id, n_chars, n_distinct,
       ROUND(h, 6) AS bits_per_char,
       (h < {_ENT_LO} OR h > {_ENT_HI}) AS flagged
FROM ent
"""


@register("llm_char_entropy_filter", oracle=_CHAR_ENTROPY_ORACLE, category="llm")
def llm_char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document with a two-sided
    gibberish gate: flag below {_ENT_LO} bits/char (repetitive spam —
    the mode n-gram filters miss when the repeat unit is long) or
    above {_ENT_HI} (key-mash / base64 / binary spew).  The standard
    cheap pre-filter a curation funnel runs before any tokenization.

    Plan: entirely DOC-LOCAL — the char histogram and the entropy sum
    are higher-order array expressions over split(text, ''), so the
    operator is one narrow projection with NO shuffle at all (the
    distinct-char loop is O(|alphabet| x len) per doc, alphabet <= a
    few hundred).  Summation order over distinct chars is pinned by
    array_sort in Spark; the oracle's GROUP BY sum differs only at
    ~1e-16, absorbed by the 6dp rounding.
    """
    # NULL-text docs have no characters to measure: dropped in both
    # engines (the oracle's UNNEST drops them implicitly).
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # r15 (guide §1.2 per-task work): the char array is SPLIT ONCE into
    # an inner projection and every consumer references the alias —
    # the previous form re-ran the regex `split(text, '')` inside the
    # entropy lambda for EVERY distinct character of every row
    # (O(|alphabet|) regex splits per doc; measured 6.37 -> 0.35 s
    # warm median at sf0.1). CollapseProject keeps the alias because
    # it is non-cheap and multiply referenced, so the plan stays one
    # narrow two-level projection with no shuffle; the arithmetic —
    # including the array_sort'ed summation order — is unchanged, so
    # results are bit-identical.
    # r15 (guide §2.5 input skew): the interpreted entropy lambda sat
    # on the one-row-group documents scan, running on a single core —
    # respread via the shared gate (io.spread_compute; no-op at
    # deployment scale, so the op stays shuffle-free there, as the
    # plan note above claims).
    from snapshot_s3_util_spark.io import spread_compute

    cs = spread_compute(
        d.select("doc_id", F.split("text", "").alias("cs")), "doc_id"
    )
    n = F.size("cs")
    # per distinct char c: k = occurrences; accumulate -p*log2(p)
    h = F.expr(
        "aggregate(array_sort(array_distinct(cs)), 0D,"
        " (acc, c) -> acc - (cast(size(filter(cs, x -> x = c))"
        "                        AS double) / size(cs))"
        "             * log2(cast(size(filter(cs, x -> x = c))"
        "                        AS double) / size(cs)))"
    )
    return cs.select(
        "doc_id",
        n.cast("bigint").alias("n_chars"),
        F.size(F.array_distinct("cs")).cast("bigint").alias("n_distinct"),
        F.round(h, 6).alias("bits_per_char"),
        ((h < _ENT_LO) | (h > _ENT_HI)).alias("flagged"),
    )


# ------------------------------------------ tokenizer fertility by lang
# Fertility = subword tokens per whitespace word (the ~4-chars-per-
# token estimate llm_token_count uses for budget accounting); languages
# with high fertility pay more sequence length for the same text — the
# multilingual-tokenizer-equity number mixture planning needs.

_FERTILITY_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS words,
         CAST((SELECT SUM(CAST(CEIL(LEN(w) / 4.0) AS BIGINT))
               FROM UNNEST(string_split(text, ' ')) AS t(w)) AS BIGINT)
           AS subwords,
         CAST(LEN(text) AS BIGINT) AS chars
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS words,
       CAST(SUM(subwords) AS BIGINT) AS subwords,
       CAST(SUM(chars) AS BIGINT) AS chars,
       ROUND(CAST(SUM(subwords) AS DOUBLE) / SUM(words), 6) AS fertility,
       ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(subwords), 6)
         AS chars_per_token
FROM per_doc GROUP BY lang ORDER BY lang
"""


@register("llm_tokenizer_fertility", oracle=_FERTILITY_ORACLE, category="llm")
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword tokens per whitespace
    word and chars per token, under the same ceil(len/4) subword
    estimate `llm_token_count` budgets with.  High-fertility languages
    consume more context window per sentence — this is the table a
    mixture planner reads to convert document shares into TOKEN shares
    per language (and the fairness audit for tokenizer choice).

    Plan: word and subword counts are DOC-LOCAL array aggregates (no
    explode — the token stream never leaves its row); the only shuffle
    is the map-side-combined groupBy(lang), |langs| rows.  All counts
    are exact bigints; the two ratios divide once and round once.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    subwords = F.expr(
        "aggregate(split(text, ' '), 0L,"
        " (acc, w) -> acc + cast(ceil(length(w) / 4.0) AS bigint))"
    )
    per = d.select(
        "lang",
        F.size(toks).cast("bigint").alias("words"),
        subwords.alias("subwords"),
        F.length("text").cast("bigint").alias("chars"),
    )
    g = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").alias("words"),
        F.sum("subwords").alias("subwords"),
        F.sum("chars").alias("chars"),
    )
    return g.select(
        "lang",
        "n_docs",
        "words",
        "subwords",
        "chars",
        F.round(F.col("subwords").cast("double") / F.col("words"), 6).alias(
            "fertility"
        ),
        F.round(F.col("chars").cast("double") / F.col("subwords"), 6).alias(
            "chars_per_token"
        ),
    ).orderBy("lang")


# ------------------------------------------ pass@k estimator
# Codex-paper unbiased estimator: per problem with n samples of which
# c pass, pass@k = 1 - C(n-c, k)/C(n, k) = 1 - prod_{i<k} (n-c-i)/(n-i).
# Events stand in for an eval harness: user_id = problem, one event =
# one sample, success = value above the ~88th-percentile bar.
_PAK_KS = (1, 5, 10)
_PAK_BAR = 100.0

_PASS_AT_K_ORACLE = f"""
WITH per AS (
  SELECT user_id AS problem,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value > {_PAK_BAR} THEN 1 ELSE 0 END) AS BIGINT)
           AS c
  FROM events GROUP BY user_id
),
terms AS (
  SELECT p.problem, p.n, p.c, u.k, t.i,
         CAST(p.n - p.c - t.i AS DOUBLE) / (p.n - t.i) AS term
  FROM per p
  CROSS JOIN (SELECT UNNEST([{', '.join(map(str, _PAK_KS))}]) AS k) u
  CROSS JOIN UNNEST(range(0, {max(_PAK_KS)})) AS t(i)
  WHERE t.i < u.k AND p.n >= u.k
),
perk AS (
  SELECT k, problem, 1.0 - PRODUCT(term) AS pak
  FROM terms GROUP BY k, problem
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_problems,
       ROUND(AVG(pak), 6) AS pass_at_k
FROM perk GROUP BY k ORDER BY k
"""


@register("llm_eval_pass_at_k", oracle=_PASS_AT_K_ORACLE, category="llm")
def llm_eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k for k in {_PAK_KS} by the unbiased Codex estimator
    1 - C(n-c,k)/C(n,k), averaged over problems (events grouped by
    user as the stand-in eval harness; success = value > {_PAK_BAR}).
    The estimator — NOT the naive empirical top-k — is what an eval
    pipeline must compute when n varies per problem; the hypergeometric
    product form avoids factorial overflow entirely.

    Plan: one map-side-combined groupBy(problem) to (n, c); the k-term
    product is a doc-local higher-order `aggregate` over
    sequence(0, k-1) (exact integer ratios in double, a zero factor
    short-circuits the c > n-k case to pass@k = 1); the final mean is
    a |k|-row reduce.  Nothing after the first aggregate is
    data-sized.
    """
    per = load_table(spark, sf_dir, "events").groupBy(
        F.col("user_id").alias("problem")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > _PAK_BAR, 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    ks = per.withColumn(
        "k", F.explode(F.array(*[F.lit(k) for k in _PAK_KS]))
    ).filter(F.col("n") >= F.col("k"))
    pak = 1.0 - F.expr(
        "aggregate(sequence(0, k - 1), 1D,"
        " (acc, i) -> acc * cast(n - c - i AS double) / (n - i))"
    )
    return (
        ks.select("k", pak.alias("pak"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_problems"),
            F.round(F.avg("pak"), 6).alias("pass_at_k"),
        )
        .select(F.col("k").cast("bigint").alias("k"), "n_problems", "pass_at_k")
        .orderBy("k")
    )


# ------------------------------------------ Zipf exponent fit
_ZIPF_TOP = 500  # fit over the top-N frequency ranks

_ZIPF_ORACLE = f"""
WITH cnt AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term
),
top AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS r
  FROM cnt ORDER BY c DESC, term ASC LIMIT {_ZIPF_TOP}
),
pts AS (SELECT LN(CAST(r AS DOUBLE)) AS x, LN(CAST(c AS DOUBLE)) AS y
        FROM top),
fit AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND(-( (n * sxy - sx * sy) / (n * sxx - sx * sx) ), 6)
         AS zipf_exponent,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS log_intercept,
       ROUND(POWER(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM fit
"""


@register("llm_zipf_fit", oracle=_ZIPF_ORACLE, category="llm")
def llm_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit over the top-{_ZIPF_TOP} token frequency
    ranks: least-squares slope of ln(freq) on ln(rank) (reported as
    the positive exponent), intercept, and r².  Natural corpora sit
    near exponent 1 with high r²; template/boilerplate floods flatten
    the head and machine-generated spam steepens it — a one-row
    corpus-health gate cheap enough to run per ingest batch.

    Plan: one token explode into a map-side-combined groupBy(term);
    the top-N cut is orderBy+limit (TakeOrderedAndProject — the
    |vocab| frame never crosses one task); ranking and the moment fit
    then run on the constant {_ZIPF_TOP}-row frame (the W-gated
    window is ALLOW-listed with that bound).  Ties rank by term, so
    both engines fit identical points.
    """
    from pyspark.sql import Window

    cnt = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), F.asc("term")).limit(_ZIPF_TOP)
    ranked = top.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("term")))
        .alias("r"),
    )
    pts = ranked.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.select(
        F.col("n").alias("n_terms"),
        F.round(-slope, 6).alias("zipf_exponent"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "log_intercept"
        ),
        F.round(
            F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    )


# ------------------------------------------ lexicon sentiment scoring
# Lexicon-based polarity (EDBT'16 Twitter-on-Spark shape): counts are
# doc-local array matches against broadcast-literal word lists; the
# lexicon below is the corpus's own performance vocabulary — swap in
# AFINN/VADER lists for natural text, the machinery is identical.
_SENT_POS = ("fast", "small")
_SENT_NEG = ("slow", "big")


def _sent_sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


_SENTIMENT_ORACLE = f"""
WITH scored AS (
  SELECT source,
         CAST(LEN(list_filter(string_split(text, ' '),
                              w -> w IN ({_sent_sql_list(_SENT_POS)})))
              AS BIGINT) AS pos_hits,
         CAST(LEN(list_filter(string_split(text, ' '),
                              w -> w IN ({_sent_sql_list(_SENT_NEG)})))
              AS BIGINT) AS neg_hits
  FROM documents
),
pol AS (
  SELECT source, pos_hits, neg_hits,
         CASE WHEN pos_hits + neg_hits = 0 THEN 0.0
              ELSE CAST(pos_hits - neg_hits AS DOUBLE)
                   / (pos_hits + neg_hits) END AS polarity
  FROM scored
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(pos_hits) AS BIGINT) AS pos_hits,
       CAST(SUM(neg_hits) AS BIGINT) AS neg_hits,
       ROUND(AVG(polarity), 6) AS avg_polarity,
       ROUND(AVG(CASE WHEN polarity > 0 THEN 1.0 ELSE 0.0 END), 6)
         AS share_positive,
       ROUND(AVG(CASE WHEN polarity < 0 THEN 1.0 ELSE 0.0 END), 6)
         AS share_negative
FROM pol GROUP BY source ORDER BY source
"""


@register("llm_sentiment_lexicon", oracle=_SENTIMENT_ORACLE, category="llm")
def llm_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment per source: doc-local positive/negative
    hit counts against literal word lists, polarity =
    (pos - neg)/(pos + neg), aggregated to per-source mean polarity and
    positive/negative shares — the Spark-native shape of lexicon
    sentiment at scale (EDBT 2016 Twitter study): the lexicon rides
    the closure as a literal array, so scoring is a narrow projection
    with ZERO shuffles before the |sources| groupBy; an AFINN-sized
    list (~2.5k words) still folds into the plan as a literal.

    All counts are exact bigints; polarity divides once per doc and
    the per-source means round once.
    """
    d = load_table(spark, sf_dir, "documents")
    pos_arr = ", ".join(f"'{w}'" for w in _SENT_POS)
    neg_arr = ", ".join(f"'{w}'" for w in _SENT_NEG)
    scored = d.select(
        "source",
        F.expr(
            f"cast(size(filter(split(text, ' '),"
            f" w -> w IN ({pos_arr}))) AS bigint)"
        ).alias("pos_hits"),
        F.expr(
            f"cast(size(filter(split(text, ' '),"
            f" w -> w IN ({neg_arr}))) AS bigint)"
        ).alias("neg_hits"),
    )
    pol = scored.withColumn(
        "polarity",
        F.when(F.col("pos_hits") + F.col("neg_hits") == 0, F.lit(0.0)).otherwise(
            (F.col("pos_hits") - F.col("neg_hits")).cast("double")
            / (F.col("pos_hits") + F.col("neg_hits"))
        ),
    )
    return (
        pol.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("pos_hits").cast("bigint").alias("pos_hits"),
            F.sum("neg_hits").cast("bigint").alias("neg_hits"),
            F.round(F.avg("polarity"), 6).alias("avg_polarity"),
            F.round(
                F.avg(F.when(F.col("polarity") > 0, 1.0).otherwise(0.0)), 6
            ).alias("share_positive"),
            F.round(
                F.avg(F.when(F.col("polarity") < 0, 1.0).otherwise(0.0)), 6
            ).alias("share_negative"),
        )
        .orderBy("source")
    )

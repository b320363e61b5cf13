"""Tokenizer-training / text-normalization operators (SURVEY.md §2B
llm_* extension class: "the operations a large-scale training-data
pipeline would need").

Two jobs every tokenizer/training stack runs over the FULL corpus —
exactly the workloads that must be distributed-first:

- `llm_bpe_merge_step`: the inner statistic of BPE tokenizer training
  (count adjacent-symbol pairs, corpus-weighted; the argmax pair is the
  next merge rule). One training iteration = one run of this shape;
  real trainers loop it over a cached word-frequency table, so the
  expensive part — collapsing 100 TB of text to the |vocab|-row
  word-frequency ledger — is the part shown here.
- `llm_unicode_normalize`: NFC normalization, the canonical first step
  of text cleaning (composed vs decomposed accents hash differently,
  splitting dedup groups and double-counting vocabulary). No Spark
  built-in exists, so this is a deliberate Arrow-batched pandas-UDF op
  (category "udf") — the sanctioned slow path, batched not per-row.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.registry import register

# Top-K candidate merge pairs to emit (a real trainer takes the argmax;
# emitting a ranked K-row table makes the statistic inspectable).
_BPE_TOPK = 20

_BPE_ORACLE = f"""
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
pairs AS (
  SELECT UNNEST([c[i] || ' ' || c[i+1] FOR i IN RANGE(1, LEN(c))]) AS pair, f
  FROM (SELECT regexp_split_to_array(w, '') AS c, f FROM words)
)
SELECT pair, CAST(SUM(f) AS BIGINT) AS pair_freq
FROM pairs GROUP BY pair
ORDER BY pair_freq DESC, pair LIMIT {_BPE_TOPK}
"""


@register("llm_bpe_merge_step", oracle=_BPE_ORACLE, category="llm")
def llm_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE tokenizer-training iteration: corpus-weighted adjacent
    character-pair frequencies, top-{_BPE_TOPK} (the argmax row is the
    next merge rule). Ties break lexicographically so re-runs pick the
    same merge.

    Plan: the corpus collapses to the |word-vocab| frequency ledger in
    ONE map-side-combined explode+groupBy — the only pass whose input
    grows with data volume. Pair extraction then runs over vocab rows
    (`zip_with(slice, slice)`, ≤ |word|-1 pairs each), and the pair
    aggregate's key space is bounded by |alphabet|² — tiny shuffle.
    The final top-K is `orderBy().limit()` → TakeOrderedAndProject,
    never a global sort. A full BPE trainer loops this statistic with
    the merge applied; each iteration reuses the cached vocab ledger,
    so per-iteration cost is vocab-sized, not corpus-sized.
    """
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    # '(?!^)(?=.)' splits between characters only (no leading/trailing
    # empty strings — a bare '(?!^)' leaves a trailing '' in Spark).
    chars = F.split(F.col("w"), "(?!^)(?=.)")
    n = F.size(chars)
    pairs = F.zip_with(
        F.slice(chars, 1, n - 1),
        F.slice(chars, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        words.select(F.explode(pairs).alias("pair"), "f")
        .groupBy("pair")
        .agg(F.sum("f").alias("pair_freq"))
        .orderBy(F.desc("pair_freq"), "pair")
        .limit(_BPE_TOPK)
    )


# Decoration guarantees the op is non-vacuous on ASCII-only corpora:
# 'e' + U+0301 (combining acute) composes to 'é' under NFC, so every
# row must shrink by exactly one code point or the kernel is wrong.
_NFC_PREFIX_SPARK = "e\u0301"  # DECOMPOSED on purpose; NFC composes it
_NFC_WIDTH = 40

_NFC_ORACLE = f"""
WITH deco AS (
  SELECT doc_id, 'e' || chr(769) || LEFT(text, {_NFC_WIDTH}) AS raw
  FROM documents
)
SELECT doc_id,
       CAST(LENGTH(raw) AS BIGINT) AS len_raw,
       CAST(LENGTH(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
       LENGTH(raw) <> LENGTH(nfc_normalize(raw)) AS changed,
       LEFT(nfc_normalize(raw), 12) AS nfc_head
FROM deco
"""


@register("llm_unicode_normalize", oracle=_NFC_ORACLE, category="udf")
def llm_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC unicode normalization over a text column — the cleaning step
    that makes composed ('é') and decomposed ('e'+U+0301) spellings
    byte-identical before hashing, dedup, or vocabulary counting.

    Spark has no normalization built-in, so the kernel is an
    Arrow-batched pandas UDF (`unicodedata.normalize` per batch —
    category "udf", the sanctioned Python path); everything around it
    (decoration, lengths, comparison) stays JVM-side. Each doc is
    prefixed with a decomposed accent so the op provably transforms
    every row even on an ASCII corpus (len_nfc = len_raw - 1); the
    DuckDB oracle's independent `nfc_normalize` must agree exactly.

    Plan: narrow map, zero shuffles; one ArrowEvalPython stage whose
    input is pruned to (doc_id, 1+{_NFC_WIDTH} chars).
    """

    @F.pandas_udf(StringType())
    def nfc(col: pd.Series) -> pd.Series:
        # NULL rows pass through (DuckDB's nfc_normalize(NULL) is NULL)
        return col.map(
            lambda s: None if s is None else unicodedata.normalize("NFC", s)
        )

    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(F.lit(_NFC_PREFIX_SPARK), F.substring("text", 1, _NFC_WIDTH))
    deco = d.select("doc_id", raw.alias("raw")).withColumn("n", nfc("raw"))
    return deco.select(
        "doc_id",
        F.length("raw").cast("bigint").alias("len_raw"),
        F.length("n").cast("bigint").alias("len_nfc"),
        (F.length("raw") != F.length("n")).alias("changed"),
        F.substring("n", 1, 12).alias("nfc_head"),
    )

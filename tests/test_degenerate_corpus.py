"""Degenerate-corpus gauntlet: every llm op vs adversarial documents.

The round-7 ADVICE found that `llm_heaps_law_fit` would CRASH on a
sub-3-token document in Spark (negative `slice()` length) while the
DuckDB oracle degraded gracefully — an engine-divergence class that a
fixture whose shortest doc has 10 tokens can never catch. This module
generalizes that probe: it AUGMENTS the real sf0.001 documents table
with adversarial rows (empty text, 1/2/3-token docs, a 10k-char single
token, unicode/CJK/emoji/RTL, whitespace runs, exact + near duplicate
pairs, a 300x-repeated token) and runs EVERY llm-category operator
against the augmented directory:

- the Spark side must not raise (the heaps-law bug class), and
- where the op carries a DuckDB oracle, both engines must still agree
  (row count + order-insensitive value hash), so a "graceful" Spark
  path that silently diverges from SQL semantics on weird input is a
  failure, not a pass.

Augmenting (rather than replacing) keeps every op's statistical
machinery solvable — group-bys stay populated, OLS fits keep enough
checkpoints — so a failure here means edge-case handling, not a
starved fixture.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from snapshot_s3_util_spark import REGISTRY
from snapshot_s3_util_spark.io import TABLES
from snapshot_s3_util_spark.parity import table_hash

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

# (doc_id, text, lang, source) — n_chars is derived. Ids far above the
# fixture range so split/probe id-windows keep their real members.
_ADVERSARIAL = [
    (900001, "", "en", "src0"),                       # empty text
    (900002, "solo", "en", "src1"),                   # 1 token
    (900003, "two tokens", "de", "src2"),             # 2 tokens
    (900004, "exactly three tokens", "fr", "src3"),   # 3 tokens (trigram edge)
    (900005, "x" * 10000, "en", "src4"),              # one 10k-char token
    (900006, "héllo wörld çafé naïve détente über straße", "de", "src5"),
    (900007, "模型 训练 数据 去重 质量 评估 然后 再来 一些 词元", "zh", "src6"),
    (900008, "🙂 emoji 🚀 tokens 🌍 mixed ascii too yes ok", "en", "src7"),
    (900009, "مرحبا بالعالم هذا نص تجريبي قصير للاختبار فقط حسنا نعم", "en", "src8"),
    (900010, "dup dup dup a duplicate pair body here ok", "en", "src9"),
    (900011, "dup dup dup a duplicate pair body here ok", "en", "src9"),
    (900012, "dup dup dup a duplicate pair body here no", "en", "src9"),  # near-dup
    (900013, "  leading and   multiple   spaces inside here ok", "en", "src10"),
    (900014, ("tok " * 300).strip(), "en", "src11"),  # 300x same token
    (900015, "UPPER lower MiXeD CASE tokens for case folds", "es", "src12"),
    (900016, "123 456 7.89 1e10 -42 0x1f numbers only here", "en", "src13"),
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("degenerate_sf"))
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"),
                    os.path.join(out, f"{t}.parquet"))
    con = duckdb.connect()
    vals = ",\n".join(
        "({}, {}, '{}', '{}')".format(
            d, "'" + txt.replace("'", "''") + "'", lang, src
        )
        for d, txt, lang, src in _ADVERSARIAL
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')
          UNION ALL
          SELECT doc_id, text, lang, source,
                 CAST(LENGTH(text) AS BIGINT) AS n_chars
          FROM (VALUES {vals}) v(doc_id, text, lang, source)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return out


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{adv_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _llm_ops():
    return sorted(n for n, op in REGISTRY.items() if op.category == "llm")


@pytest.mark.parametrize("name", _llm_ops())
def test_llm_op_survives_degenerate_docs(name, spark, adv_dir, adv_duck):
    op = REGISTRY[name]
    df = op.fn(spark, adv_dir)  # must not raise at plan OR run time
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    if op.oracle is None:
        return  # rows-only op: crash-freedom is the contract here
    tbl = adv_duck.execute(op.oracle).fetch_arrow_table()
    d_cols = list(tbl.column_names)
    d_rows = [tuple(rec[c] for c in d_cols) for rec in tbl.to_pylist()]
    assert sorted(s_cols) == sorted(d_cols)
    sn, sh = table_hash(s_cols, s_rows)
    dn, dh = table_hash(d_cols, d_rows)
    assert sn == dn, f"{name}: {sn} spark rows vs {dn} duckdb rows"
    assert sh == dh, f"{name}: value hash mismatch on degenerate corpus"

"""Unicode / whitespace-adversarial robustness for the text pipeline.

The driver's synthetic documents are single-space-separated ASCII, so the
oracle-parity suite never exercises the places where Spark and DuckDB
string semantics can diverge: multi-byte UTF-8 (char-vs-byte confusion),
empty strings, multi-space runs, leading/trailing separators, CJK without
spaces, emoji, combining accents, embedded tabs, quotes and backslashes.

Every text/dedup/sampling/multimodal operator with an oracle must
hash-match DuckDB on this corpus too. This already caught one real bug:
m01's `magic` oracle used substr on TEXT (4 characters), while the Spark
side takes 4 payload BYTES — identical on ASCII, divergent on CJK.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sqlrs_spark.registry import all_specs
from tests.oracle import compare

SPECS = all_specs()

DOCS = [
    (0, "hello world the end", "en", "src1"),
    (1, "", "en", "src1"),                          # empty text
    (2, "a  b   c", "en", "src1"),                  # multi-space runs
    (3, "café naïve résumé éclair", "fr", "src1"),  # accents
    (4, "你好世界 测试", "zh", "src2"),              # CJK, multi-byte
    (5, "emoji \U0001F600 \U0001F680 test", "en", "src2"),
    (6, "tab\there newline", "en", "src2"),
    (7, "quote \"double\" 'single' back\\slash", "en", "src2"),
    (8, " leading and trailing ", "en", "src3"),
    (9, "hello world the end", "en", "src3"),       # exact dup of doc 0
]

OPS = [
    "t01_token_count",
    "t02_language_id",
    "t03_quality_score",
    "t04_fingerprint",
    "t05_chunking",
    "t06_repetition",
    "t07_pattern_scrub",
    "p01_dedup_exact",
    "p04_dedup_ngram",
    "p12_stratified_sample",
    "p13_token_budget_pack",
    "p14_domain_mix",
    "p16_dedup_minhash_capped",
    "p19_rag_prep",
    "m01_multimodal_meta",
    "m04_resize",
]


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("unicode_docs"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in DOCS], pa.int64()),
                "text": pa.array([r[1] for r in DOCS]),
                "lang": pa.array([r[2] for r in DOCS]),
                "source": pa.array([r[3] for r in DOCS]),
                "n_chars": pa.array([len(r[1]) for r in DOCS], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


@pytest.fixture(scope="module")
def unicode_duck(duck, unicode_dir, sf_dir):
    duck.execute(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{unicode_dir}/documents.parquet'"
    )
    yield duck
    # restore the shared connection's view so test-order changes can't
    # leak the adversarial corpus into other modules
    duck.execute(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )


@pytest.mark.parametrize("name", OPS)
def test_op_matches_oracle_on_adversarial_text(spark, unicode_dir, unicode_duck, name):
    spec = SPECS[name]
    ok, msg = compare(spec.fn(spark, unicode_dir), unicode_duck, spec.oracle)
    assert ok, f"{name}: {msg}"


class TestT09UnicodeClean:
    """t09's cleaning contract on adversarial inputs, differentially:
    the same dirty strings through the Spark pandas-UDF path AND the
    DuckDB nfc_normalize oracle must produce identical cleaned text."""

    CASES = [
        "café composed?",        # decomposed e + combining acute -> é
        "﻿BOM lead",               # BOM stripped
        "zero​width",              # ZWSP stripped
        "tab\tand\nnewline  runs",      # whitespace collapse
        "\x07control\x1fchars\x7f",     # control strip
        "ﬁ ligature ｆｕｌｌwidth",      # NFC keeps compatibility chars
        "  edge  spaces  ",
    ]

    def test_cross_engine_clean_agreement(self, spark):
        import duckdb

        from sqlrs_spark.operators.text import _t09_clean_py, _t09_oracle

        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        for i, c in enumerate(self.CASES):
            con.execute("INSERT INTO documents VALUES (?, ?)", [i, c])
        oracle_rows = con.execute(_t09_oracle()).fetchall()

        sdf = spark.createDataFrame(
            list(enumerate(self.CASES)), "doc_id long, text string"
        )
        sdf.createOrReplaceTempView("__t09_adv")
        py_clean = [_t09_clean_py(c) for c in self.CASES]
        # python contract == duckdb contract (length + digest + changed)
        from sqlrs_spark.functions.hashing import P31
        import hashlib

        for (doc_id, n, dig, changed), cleaned, raw in zip(
            oracle_rows, py_clean, self.CASES
        ):
            assert n == len(cleaned), (raw, cleaned)
            exp = int(hashlib.md5(cleaned.encode()).hexdigest()[:15], 16) % P31
            assert dig == exp, (raw, cleaned)
            assert changed == (cleaned != raw)

    def test_clean_idempotent(self):
        from sqlrs_spark.operators.text import _t09_clean_py

        for c in self.CASES:
            once = _t09_clean_py(c)
            assert _t09_clean_py(once) == once


def test_t09_null_text_rows_survive_the_union_split(spark, tmp_path):
    """Regression (round-3 review): rlike(NULL) is NULL, so a plain
    ~is_ascii filter on the slow arm would drop NULL-text rows from BOTH
    union arms — the SQL oracle keeps one row per document with NULL
    ctext/digest, so the row must survive with NULL stats."""
    d = str(tmp_path)
    df = spark.createDataFrame(
        [(1, "plain ascii"), (2, None), (3, "café")],
        "doc_id bigint, text string",
    )
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r.doc_id: r for r in SPECS["t09_unicode_clean"].fn(spark, d).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].n_chars_clean is None
    assert rows[2].clean_digest is None
    assert rows[2].changed is None
    assert rows[1].changed is False and rows[3].changed is False

"""Text-analysis quality gate: language-ID must classify text that carries
a language signal.

The driver's synthetic documents use the same English-ish tech vocabulary
for every `lang` label (verified in test_driver_docs_carry_no_language_
signal) — the label is metadata, not content — so accuracy there is
bounded at the majority-class rate for ANY classifier. This fixture
builds sentences around each language's real function words mixed with
shared content tokens; on it the stopword heuristic must be near-perfect.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from sqlrs_spark.registry import all_specs

SPECS = all_specs()

_SAMPLES = {
    "en": "the data is a stream of rows and the plan is fast to run in memory",
    "de": "der plan ist ein stream und die daten sind das ergebnis und der test ist ein lauf",
    "es": "el plan es un stream de datos y la tabla que une un grupo de filas",
    "fr": "le plan et la table des données sont un stream et les lignes un groupe",
    "zh": "这个 计划 是 一个 流 的 数据 和 表 在 一起 了 是 的",
}


@pytest.fixture(scope="module")
def multilingual_dir(tmp_path_factory):
    rng = np.random.default_rng(3)
    filler = [f"tok{j}" for j in range(50)]
    rows = []
    doc_id = 0
    for lang, sent in _SAMPLES.items():
        for _ in range(20):
            extra = " ".join(rng.choice(filler, size=8))
            text = f"{sent} {extra}"
            rows.append((doc_id, text, lang, "fix", len(text)))
            doc_id += 1
    d = str(tmp_path_factory.mktemp("multilingual"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array([r[3] for r in rows]),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_language_id_on_signal_bearing_text(spark, multilingual_dir):
    df = SPECS["t02_language_id"].fn(spark, multilingual_dir)
    n = df.count()
    correct = df.filter(F.col("lang_guess") == F.col("lang_label")).count()
    assert n == 100
    assert correct / n >= 0.95, f"language-ID accuracy {correct / n:.2f} < 0.95"


def test_driver_docs_carry_no_language_signal(duck, oracle_sf_dir):
    # documents WHY the accuracy gate uses a constructed fixture: driver
    # docs share one vocabulary across labels — non-English function words
    # never appear, so content cannot separate the labels
    duck.execute(
        f"CREATE OR REPLACE VIEW doc_chk AS "
        f"SELECT * FROM '{oracle_sf_dir}/documents.parquet'"
    )
    (hits,) = duck.execute(
        """
        SELECT COUNT(*) FROM doc_chk
        WHERE lang <> 'en'
          AND len(list_filter(string_split(text, ' '),
                  t -> list_contains(['der','die','und','el','la','le','et','的','是'], t))) > 0
        """
    ).fetchone()
    assert hits == 0, "driver docs unexpectedly contain non-English function words"


def test_p33_scrubs_exactly_the_planted_spans(spark, tmp_path):
    """Closed-form pin for p33 beyond oracle parity: plant one 5-token
    header shared by 4 documents (>= the 3-doc threshold) ahead of
    unique bodies, plus one doc that IS the bare header.  Exactly the
    header tokens must be removed — overlapping grams that straddle
    header and body are unique per doc and must NOT extend the cut —
    and the kept digest must equal md5int(body) (empty string for the
    bare-header doc)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    header = "h0 h1 h2 h3 h4"
    bodies = {
        0: "a0 a1 a2 a3 a4 a5",
        1: "b0 b1 b2 b3 b4 b5",
        2: "c0 c1 c2 c3 c4 c5",
        3: "d0 d1 d2 d3 d4 d5",
    }
    rows = {i: f"{header} {bodies[i]}" for i in range(4)}
    rows[4] = header  # fully-boilerplate doc -> scrubbed to empty
    for i in range(5, 10):  # unrelated docs, untouched
        rows[i] = " ".join(f"u{i}_{j}" for j in range(8))
    d = str(tmp_path / "p33")
    import os

    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(rows), pa.int64()),
                "text": pa.array([rows[i] for i in sorted(rows)], pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    def md5int(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    got = {
        r["doc_id"]: r
        for r in SPECS["p33_span_scrub"].fn(spark, d).collect()
    }
    for i in range(4):
        assert got[i]["n_removed"] == 5, got[i]
        assert got[i]["changed"] is True
        assert got[i]["kept_digest"] == md5int(bodies[i]), i
    assert got[4]["n_removed"] == 5 and got[4]["kept_digest"] == md5int("")
    for i in range(5, 10):
        assert got[i]["n_removed"] == 0 and got[i]["changed"] is False
        assert got[i]["kept_digest"] == md5int(rows[i])

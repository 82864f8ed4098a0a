"""Dedup retrieval-quality gate: the near-dup operators must actually find
planted near-duplicates, not just agree with the oracle about their own
definitions.

Same rationale as test_ann_quality: oracle parity pins cross-engine
correctness of each operator's definition; this file pins whether the
definitions DETECT near-duplication. The fixture plants 25 mutated copies
(2 of 50 unique tokens replaced → token-set Jaccard ≈ 0.92, above the
p02 verify threshold of 0.9) among 60 unrelated documents drawn from a
2000-word vocabulary. Everything is seeded, so the measured numbers are
exact: MinHash+LSH 1.00, SimHash 0.88, n-gram 1.00, zero false pairs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sqlrs_spark.registry import all_specs

SPECS = all_specs()


@pytest.fixture(scope="module")
def dedup_fixture(tmp_path_factory):
    """Returns (sf_dir, planted_pairs)."""
    rng = np.random.default_rng(11)
    vocab = [f"w{j}" for j in range(2000)]
    docs = {}
    for i in range(60):
        docs[i] = list(rng.choice(vocab, size=50, replace=False))
    planted = []
    for i in range(25):
        toks = docs[i][:]
        for k in rng.choice(len(toks), size=2, replace=False):
            toks[k] = "m" + toks[k]
        docs[500 + i] = toks
        planted.append((i, 500 + i))
    rows = [(d, " ".join(t)) for d, t in sorted(docs.items())]
    d = str(tmp_path_factory.mktemp("dedup_fixture"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["fix"] * len(rows)),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d, set(planted)


def _pairs(name, spark, sf_dir):
    return {(r["doc_a"], r["doc_b"]) for r in SPECS[name].fn(spark, sf_dir).collect()}


def test_minhash_finds_planted_pairs(spark, dedup_fixture):
    # 12-perm, 3×4-band LSH: P(candidate | J=0.92) ≈ 0.97 per pair; the
    # verify join then keeps exactly the true pairs (measured 1.00 / 0 FP)
    d, planted = dedup_fixture
    found = _pairs("p02_dedup_minhash", spark, d)
    assert len(found & planted) / len(planted) >= 0.9
    assert not (found - planted), f"false pairs: {sorted(found - planted)[:5]}"


def test_simhash_finds_planted_pairs(spark, dedup_fixture):
    # 32-bit SimHash, Hamming ≤ 3 via 4×8-bit banding: a 2-token mutation
    # flips few weighted bits (measured 0.88 / 0 FP)
    d, planted = dedup_fixture
    found = _pairs("p03_dedup_simhash", spark, d)
    assert len(found & planted) / len(planted) >= 0.7
    assert not (found - planted), f"false pairs: {sorted(found - planted)[:5]}"


def test_ngram_finds_planted_pairs(spark, dedup_fixture):
    # 3-gram shingle Jaccard ≥ 0.37: 2/50 token edits perturb ≤ 6/48
    # shingles, far above threshold (measured 1.00 / 0 FP)
    d, planted = dedup_fixture
    found = _pairs("p04_dedup_ngram", spark, d)
    assert len(found & planted) / len(planted) >= 0.9
    assert not (found - planted), f"false pairs: {sorted(found - planted)[:5]}"

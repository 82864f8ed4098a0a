"""Degenerate-table sweep for the embeddings and events families
(VERDICT r6 #5: the documents sweep found 14 real divergences; the other
two table families never had the treatment).

Fixtures are constructed adversarially per family:

- **embeddings**: zero vectors (cosine/PQ paths divide by norms), NULL
  embedding arrays, NaN elements inside otherwise-normal vectors, NULL
  labels.  Dimensionality (64) matches the driver testdata — the PQ/
  patch-grid operators assume the production dim, and an empty array is
  a schema violation no real corpus exhibits, so it is out of scope.
- **events**: NULL ts (watermark/window paths), NULL event_type (pivot/
  funnel match keys), NULL value (aggregates), NULL and malformed props
  (JSON extraction), a single-event user (degenerate sessions), a user
  whose events all share one timestamp (window ties), and out-of-order
  event ids vs ts.

Policy, same as the documents sweep: an operator may choose any
degenerate-row policy (skip, count, classify) — it must implement the
SAME policy in both engines, and any irreconcilable engine difference
gets pinned in DEVIATIONS.md with a regression test.
"""

from __future__ import annotations

import math
import os
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sqlrs_spark.registry import all_specs
from tests.oracle import compare

SPECS = all_specs()

_ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _tables_of(sql: str) -> set[str]:
    return {t for t in _ALL_TABLES if re.search(rf"\b{t}\b", sql)}


def _family_specs(table: str) -> list[str]:
    """Ops whose oracle reads ``table`` (documents may ride along — the
    degenerate documents fixture from the r6 sweep is provided too)."""
    out = []
    for name, s in SPECS.items():
        if not s.oracle:
            continue
        ts = _tables_of(s.oracle)
        if table in ts and ts <= {table, "documents"}:
            out.append(name)
    return out


DIM = 64


def _vec(i: int) -> list[float]:
    # deterministic pseudo-random unit-ish vector; no numpy RNG state
    return [math.sin(0.7 * i + 0.13 * j) / 3.0 for j in range(DIM)]


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degenerate_tables"))

    # --- embeddings: 40 rows -------------------------------------------
    vecs: list[list[float] | None] = []
    for i in range(40):
        if i % 11 == 0:
            vecs.append(None)  # NULL array
        elif i % 7 == 0:
            vecs.append([0.0] * DIM)  # zero vector: norm == 0
        elif i == 17:
            v = _vec(i)
            v[3] = float("nan")  # NaN element
            vecs.append(v)
        else:
            vecs.append(_vec(i))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(
                    [None if i % 13 == 0 else i % 4 for i in range(40)],
                    pa.int32(),
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )

    # --- events: 90 rows over 8 users ----------------------------------
    base = 1_700_000_000_000_000  # micros epoch, naive
    ids, tss, users, etypes, values, props = [], [], [], [], [], []
    types = ["view", "click", "purchase", "error"]
    for i in range(90):
        ids.append(i)
        if i % 9 == 0:
            tss.append(None)  # NULL ts
        elif i % 10 == 7:
            tss.append(base + 3_600_000_000)  # shared-tie timestamp
        else:
            # out-of-order vs event_id on purpose
            tss.append(base + ((i * 37) % 90) * 60_000_000)
        if i < 80:
            users.append(i % 6)
        elif i == 80:
            users.append(7)  # single-event user
        else:
            users.append(8)  # all-ties user (ts fixed below)
        if i > 80:
            tss[-1] = base + 7_200_000_000
        etypes.append(None if i % 7 == 0 else types[i % 4])
        values.append(
            None if i % 8 == 0 else (float("nan") if i == 33 else round(i * 0.7, 2))
        )
        if i % 12 == 0:
            props.append(None)
        elif i % 12 == 1:
            props.append("not json {")
        elif i % 12 == 2:
            props.append("")
        else:
            props.append('{"k": %d}' % (i % 17))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(etypes, pa.string()),
                "value": pa.array(values, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )

    # --- documents (ride-along, same shape as the r6 docs sweep) -------
    texts = []
    for i in range(60):
        if i % 13 == 0:
            texts.append(None)
        elif i % 7 == 0:
            texts.append("")
        else:
            texts.append(f"tok{i} tok{i % 5} the quick tok{i % 3} brown fox")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [["en", "en", "fr", "de", "zh"][i % 5] for i in range(len(texts))],
                    pa.string(),
                ),
                "source": pa.array(
                    [f"s{i % 4}" for i in range(len(texts))], pa.string()
                ),
                "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


@pytest.fixture(scope="module")
def degenerate_duck(degenerate_dir):
    con = duckdb.connect()
    for t in ("embeddings", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{degenerate_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", _family_specs("embeddings"))
def test_embeddings_op_survives_degenerate_table(
    spark, name, degenerate_dir, degenerate_duck
):
    spec = SPECS[name]
    ok, msg = compare(spec.fn(spark, degenerate_dir), degenerate_duck, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _family_specs("events"))
def test_events_op_survives_degenerate_table(
    spark, name, degenerate_dir, degenerate_duck
):
    spec = SPECS[name]
    ok, msg = compare(spec.fn(spark, degenerate_dir), degenerate_duck, spec.oracle)
    assert ok, f"{name}: {msg}"

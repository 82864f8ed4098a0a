"""Partitioning-invariance: the determinism discipline, tested directly.

The repo's claim (README §Scale design, operators/common.dec2) is that
results are bit-identical regardless of how Spark partitions the work —
because money aggregates run in DECIMAL, thresholds compare exactly, and
every sampling/dedup decision is a pure row function. On a cluster the
partitioning changes with executor count, file splits, and AQE decisions,
so any partitioning-dependence is a nondeterminism bug waiting for a
topology change.

This re-runs representative queries under deliberately different
shuffle-partition counts and tiny input splits and requires the collected
results to match exactly (same multiset normalization the oracle compare
uses).
"""

from __future__ import annotations

import pytest

from sqlrs_spark.registry import all_specs
from tests.oracle import rows_multiset

SPECS = all_specs()

# one per discipline: decimal agg, decimal threshold, hash-draw sampling,
# digest dedup, window packing, argmin struct, float-division priority
# ranking, and an Arrow mapInPandas whose batch boundaries move with the
# partitioning (m06 — per-doc windows must not depend on batch shape)
QUERIES = [
    "q01_pricing_summary",
    "q29_important_parts",
    "p12_stratified_sample",
    "p16_dedup_minhash_capped",
    "p13_token_budget_pack",
    "q34_min_cost_supplier",
    "p23_pps_sample",
    "m06_audio_windows",
    # corpus-global statistic joined back per row (t12: the vocabulary
    # count shuffle + score join must not depend on split shape) and the
    # union-split UDF/JVM row routing (t09: the rlike partition must
    # commute with any partitioning)
    "t12_unigram_lm_score",
    "t09_unicode_clean",
    # round-6 additions: integer-grid PQ encode/ADC sums (p35 — argmin
    # packing and BIGINT LUT sums must not depend on split shape), the
    # ordered string_agg reassembly after a coverage window (p33), and
    # the monoid MV merge whose base state is written then re-read (p34)
    "p35_pq_ann",
    "p33_span_scrub",
    "p34_incremental_agg",
    # late round-6 additions: the boundary-stratum window + broadcast
    # cutoffs of the grouped-budget cap (p37), the per-cell top-k +
    # unordered-edge mutuality aggregation (p38), the per-doc tagged
    # as-of carry-forward whose union order must not matter (m09), and
    # the ppm-draw resampler (p39)
    "p37_domain_cap_select",
    "p38_knn_graph",
    "m09_av_keyframe_align",
    "p39_target_mix_resample",
]


def _run(spark, name, sf_dir, shuffle_parts, split_bytes):
    saved = {
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
    }
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
        df = SPECS[name].fn(spark, sf_dir)
        return rows_multiset(df.collect(), df.columns)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", QUERIES)
def test_result_is_partitioning_invariant(spark, sf_dir, name):
    wide = _run(spark, name, sf_dir, shuffle_parts=32, split_bytes=1 << 27)
    narrow = _run(spark, name, sf_dir, shuffle_parts=2, split_bytes=1 << 16)
    assert wide == narrow, f"{name} differs across partitionings"

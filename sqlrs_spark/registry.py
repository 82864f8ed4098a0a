"""Query registry — single source of truth for the driver contract.

Every implemented operator gets a named QuerySpec: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the exact
DuckDB oracle SQL the driver diffs against.  ``__spark_entry__.py``,
``bench.py`` and the pytest oracle suite all read from this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over views region/nation/.../embeddings
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: add a query callable to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench, doc=fn.__doc__ or ""
        )
        return fn

    return deco


# The driver's CORRECTNESS gate samples the FIRST 50 registry entries in
# dict order (round-1 finding: registration order left every pipeline/
# text/multimodal/streaming query outside the window, so the flagship
# beyond-reference operators had zero hard driver verification).  This
# curated prefix puts one green row on every p/t/m/s query plus one
# representative per SURVEY §2 operator family; the remaining entries
# (TPC-H shapes q03-q38 etc. — §2 evidence already driver-verified in
# round 1 — and the rest of the x-extensions) follow in registration
# order and keep their local pytest oracles.
# Round-3 curation (VERDICT r2 "Next round" #2): re-verify what CHANGED,
# verify what NEVER was.  Rotated out: the p/t/s pipeline rows that went
# green in round 2 and are code-identical since (p01/p03-p17/p19-p23,
# t01-t08/t10, m01/m02/m04/m06, s01-s07 keep their green r2 rows + the
# local parity suite).  Rotated in, by reason:
DRIVER_WINDOW: tuple[str, ...] = (
    # Round-9 curation (optimization round 2).  Exactly the
    # tools/window_due.py claim for r9 plus this round's rewrites plus
    # prefills from the r10-due set (the same smoothing r8 used):
    # (a) the 17 entries window_due names for r9 (tier-1 r6-latest,
    # tier-2 r5-latest, tier-3 r4-latest — p20 was REWRITE_DEBT(8), its
    # rotation empties the debt dict):
    "p01_dedup_exact",
    "p11_corpus_pipeline",
    "p13_token_budget_pack",
    "p20_tfidf_terms",
    "p25_split_assign",
    "p28_filter_cascade",
    "p29_snapshot_diff",
    "q03_shipping_priority",
    "q05_local_volume",
    "q25_large_orders",
    "q28_nation_profit",
    "s09_stream_stream_outer_join",
    "t11_ngram_novelty",
    "t12_unigram_lm_score",
    "t14_vocab_growth",
    "v04_csv_roundtrip",
    "x28_qualify_topk",
    # (b) this round's optimization rewrites (the rewrite lint's claim —
    # every one already re-proven vs its unchanged DuckDB oracle at
    # sf0.001/0.01/0.1 in-round): p40 fused per-cell connected
    # components, p38 shares the refactored _cell_mutual_topk kernel,
    # p33 opts into the unsplittable-input scan repartition, and p09
    # rides along because the r8-ADVICE rounds_per_pin validation landed
    # in connected_components (same-module closure of p09's fn):
    "p33_span_scrub",
    "p38_knn_graph",
    "p40_semantic_clusters",
    "p09_dedup_clusters",
    # (c) 29 prefills from the 31-entry r10-due set (window_due
    # --next-round 10), so next round's mandatory demand shrinks to the
    # two remaining entries (x30, v02 — displaced for p09 above) plus
    # whatever r9 itself rewrites.  Tier-1 first (p06), then the
    # r6-latest tier-2 pipeline block, the r5-latest tier-3 q/v/x tail:
    "p06_ann_bruteforce",
    "m09_av_keyframe_align",
    "p31_incremental_dedup",
    "p32_source_overlap_matrix",
    "p34_incremental_agg",
    "p36_curriculum_order",
    "p37_domain_cap_select",
    "p39_target_mix_resample",
    "t15_token_concentration",
    "q17_join_residual",
    "q19_disjunctive_pred",
    "q21_top_supplier",
    "q23_market_share",
    "q24_promo_effect",
    "q31_top_supplier",
    "q32_small_qty_revenue",
    "q33_supplier_cnt",
    "q36_waiting_suppliers",
    "q38_excess_suppliers",
    "v05_catalog_tables",
    "v06_ctas",
    "v07_catalog_columns",
    "v08_replacement_scan",
    "v13_schema_evolution",
    "v14_gzip_jsonl_source",
    "x01_semi_join",
    "x03_set_ops",
    "x05_expressions",
    "x29_numeric_range_windows",
)


# Escape hatch for a mid-round rewrite when the window is already full:
# list the rewritten entry here with the round whose artifact its stale
# evidence belongs to.  The rewritten=>re-verify lint excuses it ONLY
# until an artifact round NEWER than the recorded round exists, so the
# next curation cannot miss it.  Round 6 used this for the 16
# degenerate-corpus rewrites (a46d7f7); round 7 rotated all 16 (plus
# p30, the constant-only rewrite the round-6 ADVICE flagged) into
# DRIVER_WINDOW and emptied the dict — keep it empty unless a mid-round
# rewrite genuinely cannot claim a window slot.
REWRITE_DEBT: dict[str, int] = {
    # Round-9 curation rotated p20 (the r8 optimization round's one debt
    # entry) into DRIVER_WINDOW — debt paid.  This round's own rewrites
    # (p33/p38/p40) hold window slots directly, so the dict stays empty.
}


def all_specs() -> dict[str, QuerySpec]:
    # import for side effect of registration
    import sqlrs_spark.operators.relational  # noqa: F401
    import sqlrs_spark.operators.analytics  # noqa: F401
    import sqlrs_spark.operators.analytics_deep  # noqa: F401
    import sqlrs_spark.operators.statements  # noqa: F401
    import sqlrs_spark.operators.extensions  # noqa: F401
    import sqlrs_spark.operators.dedup  # noqa: F401
    import sqlrs_spark.operators.sampling  # noqa: F401
    import sqlrs_spark.operators.temporal  # noqa: F401
    import sqlrs_spark.operators.similarity  # noqa: F401
    import sqlrs_spark.operators.rag  # noqa: F401
    import sqlrs_spark.operators.text  # noqa: F401
    import sqlrs_spark.operators.multimodal  # noqa: F401
    import sqlrs_spark.streaming.ops  # noqa: F401

    ordered = {name: REGISTRY[name] for name in DRIVER_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered

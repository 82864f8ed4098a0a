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
    # Round-7 curation.  Slot arithmetic moved to a THREE-TIER cadence
    # this round (tests/test_registry_window.py — VERDICT r6 #2: the old
    # two-tier 3/4 cadence demanded 47.8 of 50 steady-state slots at 163
    # entries, and r7's acute demand was 66): bench-flagged re-row every
    # <=3 rounds, non-bench p/t/m/s every <=4, q/x/v every <=5.  Steady
    # demand 18/3 + 67/4 + 78/5 = 38.4 of 50, lint-asserted live by
    # test_cadence_demand_fits_window.
    # (a) the 16 REWRITE_DEBT entries (degenerate-corpus NULL-guard
    # rewrites, a46d7f7, AFTER their latest rows) — VERDICT r6 #1's first
    # claim; the debt dict is emptied by this rotation:
    "p04_dedup_ngram",
    "p09_dedup_clusters",
    "p19_rag_prep",
    "p23_pps_sample",
    "t03_quality_score",
    "t04_fingerprint",
    "t05_chunking",
    "t06_repetition",
    "m01_multimodal_meta",
    "m02_frame_sample",
    "m03_fake_embed",
    "m04_resize",
    "m05_image_neardup",
    "m06_audio_windows",
    "m07_patch_grid",
    "m08_scene_change",
    # (a') p30: round-6 ADVICE — its feature SQL constants gained the
    # NULL-text guard after its r5 row; caught by the constant-aware
    # fingerprint this round (tests/test_registry_window.py
    # _fn_closure_src now walks module-level constants):
    "p30_quality_budget_select",
    # (b) the ENTIRE 25-entry r3 tail (VERDICT r6 #3): all hit the old
    # 4-round cadence boundary the moment this round's artifact lands.
    # Cleared in one pass rather than amortized under the new tier-3
    # cadence — no entry's latest row is older than r4 after r7:
    "v03_ddl_roundtrip",
    "v09_partitioned_sink",
    "v10_jsonl_roundtrip",
    "v11_partitioned_write",
    "v12_orc_roundtrip",
    "x04_window_topk",
    "x06_rollup",
    "x07_conditional_pivot",
    "x08_json_extract",
    "x09_events_tumbling",
    "x10_sessionization",
    "x11_correlated_subquery",
    "x13_range_join",
    "x14_quantiles",
    "x16_retention_cohorts",
    "x17_grouping_sets",
    "x19_running_windows",
    "x20_correlated_subqueries",
    "x21_recursive_cte",
    "x22_lateral_topn",
    "x23_unpivot",
    "x24_dist_windows",
    "x25_pivot",
    "x26_bucketed_fact_join",
    "x27_range_windows",
    # (c) oldest-r4 fills, 8 slots: the displaced round-6 fills
    # (s01/s07/s10/p27) plus the head of the deferred-r4 pipeline list
    # (p02/p03/t02/t13).  The remaining r4 pipeline entries (p05, p07/
    # p08, p12/p14/p15, p17/p21/p22, s02-s06, t07/t08/t10, m-entries
    # already in (a)) keep r4 rows — legal under tier-2 <=4 until r8,
    # where they are the documented first claim (~18 slots) alongside
    # the r5-latest bench entries (q01/q06/q22/q34/t01/t09/x12/x18,
    # 8 slots):
    "s01_stream_tumbling",
    # (c') rewritten mid-round-7 by the embeddings degenerate-table sweep
    # (tests/test_degenerate_tables.py — the shared NULL/zero-norm/NaN
    # validity filter, operators/common.emb_valid): the five slots the
    # r4 advance-fills s07/s10/p27/p02/p03 held go to the rewritten ops
    # instead (the displaced fills keep r4 rows, legal under tier-2 <=4
    # until r8); the remaining four rewrites (p05/p07/p08/p15) are r4
    # pipeline entries already due at r8 and sit in REWRITE_DEBT:
    "p06_ann_bruteforce",
    "p18_ann_ivf_kmeans",
    "p24_embedding_quant",
    "p26_semantic_dedup",
    "p35_pq_ann",
    # (d) promoted to the bench headline set this round (VERDICT r6 #7:
    # the heaviest round-6 plans get scale trend lines) — the bench flag
    # edits their decorators, so the rewrite lint demands fresh rows:
    "p33_span_scrub",
    "p38_knn_graph",
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
    # embeddings degenerate-table sweep rewrites (operators/common.
    # emb_valid) that did not fit the round-7 window after its mandatory
    # claims (16 r6 debt + p30 + the 25-entry r3 tail + p33/p38 bench
    # promotions + the five slots given to p06/p18/p24/p26/p35).  All
    # four are r4-latest pipeline entries, so tier-2 cadence puts them
    # in round 8's window regardless — the debt rows just make the
    # rewritten=>re-verify lint enforce that explicitly.
    "p05_dedup_embedding": 7,
    "p07_ann_lsh": 7,
    "p08_ann_ivf": 7,
    "p15_ann_multiprobe": 7,
    # events degenerate-table sweep rewrites (NULL-ts / NaN-value policy,
    # operators/common.VAL_NAN_NULL) outside the full round-7 window.
    # s02/s03 are r4-latest tier-2 entries due at r8 regardless; the
    # other five hold r6 rows and the debt forces their r8 rotation:
    "x31_range_join_bucketed": 7,
    "x32_scd2_history": 7,
    "x33_interval_union": 7,
    "s02_stream_stateful_sessions": 7,
    "s03_stream_sliding": 7,
    "s11_stream_cdc_apply": 7,
    "s12_stream_scd2": 7,
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

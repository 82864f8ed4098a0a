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
    # Round-4 curation. The recency rule (test_registry_window) demands a
    # driver row at least every two rounds, so the bulk of this window is
    # (a) every pipeline p/t/m/s entry whose latest row is r2 — they must
    # re-verify now or fall out of hard verification next round:
    "p01_dedup_exact",
    "p02_dedup_minhash",
    "p03_dedup_simhash",
    "p04_dedup_ngram",
    "p05_dedup_embedding",
    "p06_ann_bruteforce",
    "p07_ann_lsh",
    "p08_ann_ivf",
    "p09_dedup_clusters",
    "p11_corpus_pipeline",
    "p12_stratified_sample",
    "p13_token_budget_pack",
    "p14_domain_mix",
    "p15_ann_multiprobe",
    "p16_dedup_minhash_capped",
    "p17_decontaminate",
    "p19_rag_prep",
    "p20_tfidf_terms",
    "p21_fuzzy_vocab",
    "p22_temperature_mix",
    "p23_pps_sample",
    "t02_language_id",
    "t03_quality_score",
    "t04_fingerprint",
    "t05_chunking",
    "t06_repetition",
    "t07_pattern_scrub",
    "t08_quality_rules",
    "t10_boilerplate",
    "m01_multimodal_meta",
    "m02_frame_sample",
    "m04_resize",
    "m06_audio_windows",
    "s01_stream_tumbling",
    "s02_stream_stateful_sessions",
    "s03_stream_sliding",
    "s04_stream_dedup",
    "s05_stream_static_join",
    "s06_stream_funnel",
    "s07_stream_stream_join",
    # (b) rewritten THIS round after their r3 rows — the hash gate must
    # see the current plans: q03/q05 (tiered measured-join strategy +
    # bloom prefilter), q25/q28 (bucketed-layout promotion routing), x15
    # (error-bound contract rework: new schema, first-ever value hash)
    "q03_shipping_priority",
    "q05_local_volume",
    "q25_large_orders",
    "q28_nation_profit",
    "x15_approx_sketches",
    # (c) NEW operators this round — first-ever driver rows: CDC
    # changelog apply, asymmetric n-gram containment, native streaming
    # session windows, the QUALIFY frontend rewrite — plus one
    # oldest-evidence refresh (CSV frontend, r1-only row)
    "p27_cdc_upsert",
    "t13_ngram_containment",
    "s10_stream_session_window",
    "x28_qualify_topk",
    "v04_csv_roundtrip",
)


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

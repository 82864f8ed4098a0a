"""Plan-shape tests — the Spark analogue of the reference's planner golden
tests (tests/planner/*.planner.sql). Assert the scale-critical properties:
predicate pushdown into the parquet scan, column pruning, broadcast joins
for dimensions, map-side partial aggregation, no accidental cartesian
products in the LSH self-joins."""

from __future__ import annotations

import pytest

from sqlrs_spark.plans import (
    count_nodes,
    explain_str,
    has_broadcast_join,
    has_partial_agg,
    pushed_filters,
    read_schema_columns,
)
from sqlrs_spark.registry import all_specs

SPECS = all_specs()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    # reference rule: PushPredicateThroughNonJoin/Join → here: datasource V2
    df = SPECS["q02_filter_project"].fn(spark, sf_dir)
    pf = pushed_filters(df)
    assert any("o_orderstatus" in f for f in pf), pf
    assert any("o_totalprice" in f for f in pf), pf


def test_column_pruning_reaches_scan(spark, sf_dir):
    # reference rule: PushProjectIntoTableScan → ReadSchema must be minimal
    df = SPECS["q02_filter_project"].fn(spark, sf_dir)
    schemas = read_schema_columns(df)
    # minimal read set = projected ∪ filter columns (filters are re-checked
    # after best-effort parquet pushdown); orderdate/priority must be pruned
    assert schemas and set(schemas[0]) == {
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderstatus",
    }, schemas


def test_q01_partial_aggregation(spark, sf_dir):
    # map-side combine before the shuffle — mandatory at 100 TB
    df = SPECS["q01_pricing_summary"].fn(spark, sf_dir)
    assert has_partial_agg(df)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), pf


def test_q03_broadcasts_dimension(spark, sf_dir):
    df = SPECS["q03_shipping_priority"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_q05_broadcasts_dimension_chain(spark, sf_dir):
    df = SPECS["q05_local_volume"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s


def test_no_cartesian_in_lsh_joins(spark, sf_dir):
    # LSH candidate generation must be an equi-join on band/bucket keys
    for name in ("p02_dedup_minhash", "p03_dedup_simhash", "p07_ann_lsh"):
        df = SPECS[name].fn(spark, sf_dir)
        s = explain_str(df)
        assert "CartesianProduct" not in s, name


def test_topk_fuses_to_take_ordered(spark, sf_dir):
    # reference: Order+Limit separate operators; Spark fuses (SURVEY §2.6)
    df = SPECS["q03_shipping_priority"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_text_ops_are_pure_projection(spark, sf_dir):
    # no shuffle except the cosmetic final sort: a single Exchange allowed
    df = SPECS["t04_fingerprint"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s  # no Python UDFs


def test_q20_topk_and_no_cartesian(spark, sf_dir):
    # 4-way join chain must stay equi-join based and fuse the final
    # order+limit into TakeOrderedAndProject
    df = SPECS["q20_returned_items"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "TakeOrderedAndProject" in s
    assert "CartesianProduct" not in s


def test_q19_residual_disjunction_no_cartesian(spark, sf_dir):
    # the OR-of-conjunctions must ride on the p_partkey equi-join, not
    # degrade the join to a nested-loop cross product
    df = SPECS["q19_disjunctive_pred"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "CartesianProduct" not in s
    assert has_partial_agg(df)


def test_q21_scalar_subquery_broadcasts(spark, sf_dir):
    # the 1-row max-revenue side must broadcast, not shuffle
    df = SPECS["q21_top_supplier"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s


def test_p08_ivf_centroid_broadcast(spark, sf_dir):
    # the 8-row centroid set must broadcast (nested-loop over a broadcast
    # side, never CartesianProduct); candidate joins stay equi-joins
    df = SPECS["p08_ann_ivf"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" in s or "BroadcastHashJoin" in s


def test_q22_nation_filter_first(spark, sf_dir):
    # the Q7 rewrite: nation filters must reach the supplier/customer side
    # BEFORE the fact-fact shuffle; exactly one shuffled (non-broadcast)
    # join may remain (lineitem⋈orders on orderkey)
    df = SPECS["q22_volume_shipping"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "CartesianProduct" not in s
    assert count_nodes(df, "BroadcastHashJoin") >= 2
    assert count_nodes(df, "SortMergeJoin") + count_nodes(df, "ShuffledHashJoin") <= 1
    assert any("n_name" in f for f in pushed_filters(df)), pushed_filters(df)


def test_q25_agg_then_join_shape(spark, sf_dir):
    # large-orders: lineitem aggregates (partial → final) before joining
    # back; final order+limit fuses to TakeOrderedAndProject
    df = SPECS["q25_large_orders"].fn(spark, sf_dir)
    s = explain_str(df)
    assert has_partial_agg(df)
    assert "TakeOrderedAndProject" in s
    assert "CartesianProduct" not in s


def test_p10_argmax_is_aggregate_not_window(spark, sf_dir):
    # canonical-doc selection must compile to a partial-aggregating
    # argmax, not a Window over a per-partition sort — and the argmax
    # must be the decimal-packed HashAggregate form: a struct orderand
    # buffer demotes the whole aggregate to SortAggregate (a full
    # per-partition sort, the exact cost this formulation exists to avoid)
    df = SPECS["p10_dedup_canonical"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "Window" not in s
    assert "SortAggregate" not in s
    assert has_partial_agg(df)


def test_t05_chunking_no_shuffle_before_sort(spark, sf_dir):
    # the chunk fan-out (explode) must not introduce an exchange; the only
    # exchange allowed is the cosmetic final ORDER BY's range partitioning
    df = SPECS["t05_chunking"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert count_nodes(df, "Exchange") <= 1
    assert "Generate" in s  # the explode


def test_x12_asof_no_pair_join(spark, sf_dir):
    # union+window as-of: no join node at all — the only exchanges are the
    # user_id hash partition for the window and the cosmetic final sort
    df = SPECS["x12_asof_join"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "Join" not in s, "as-of must not materialize pairs"
    assert count_nodes(df, "Exchange") <= 2
    assert "Window" in s


def test_x13_range_join_broadcasts(spark, sf_dir):
    # 4-row band side must broadcast; the range predicate rides on the
    # nested loop, never a shuffled cartesian
    df = SPECS["x13_range_join"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "BroadcastNestedLoopJoin" in s
    assert "CartesianProduct" not in s


def test_q28_dims_broadcast_and_partial_agg(spark, sf_dir):
    # Q9-shape profit: part/supplier/nation broadcast at this SF purely
    # from size stats (no forced hints on the SF-scaling dims); the profit
    # agg partial-aggregates map-side; the p_name LIKE filter reaches the
    # part scan
    df = SPECS["q28_nation_profit"].fn(spark, sf_dir)
    s = explain_str(df)
    assert count_nodes(df, "BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in s
    assert has_partial_agg(df)


def test_broadcasts_adapt_to_size_not_pinned(spark, sf_dir):
    # The 100×-scale guard: dims that grow with SF (part/customer/supplier)
    # must be broadcast by Catalyst's SIZE decision, not by a forced hint.
    # Disabling the size threshold must therefore flip those joins to
    # shuffle joins — if a hint were pinned, the plan could not adapt and
    # would OOM executors at the 100 TB target.  Fixed-cardinality sides
    # (nation: 25 rows; 1-row aggregate frames) keep explicit hints and
    # must STILL broadcast with the threshold off.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # q28: the orders join degrades to shuffle; nation's hint
        # survives, and part/supplier survive through measured_broadcast —
        # whose adaptation is by MEASURED row count against its own
        # ceiling (the honest scale guard), deliberately independent of
        # the static size threshold being probed here
        df = SPECS["q28_nation_profit"].fn(spark, sf_dir)
        # nation + measured part + measured supplier
        assert count_nodes(df, "BroadcastHashJoin") == 3
        assert (
            count_nodes(df, "SortMergeJoin") + count_nodes(df, "ShuffledHashJoin") >= 1
        )
        # q21: the 1-row max-revenue frame must keep broadcasting (hinted)
        df2 = SPECS["q21_top_supplier"].fn(spark, sf_dir)
        assert count_nodes(df2, "BroadcastHashJoin") >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q30_preaggregates_orders_before_join(spark, sf_dir):
    # Q13-shape: orders must aggregate to one row per custkey BEFORE the
    # outer join (join input |custkeys|, not |orders|) — the partial agg
    # and two hash aggs (per-cust, distribution) show up; no cartesian
    df = SPECS["q30_customer_distribution"].fn(spark, sf_dir)
    s = explain_str(df)
    assert has_partial_agg(df)
    assert count_nodes(df, "HashAggregate") >= 4  # 2 aggs × partial+final
    assert "CartesianProduct" not in s


def test_q32_exact_threshold_stays_jvm_side(spark, sf_dir):
    # Q17-shape: the 20%-of-avg membership test must be pure codegen (no
    # Python eval) and the Brand#1 filter must reach the part scan
    df = SPECS["q32_small_qty_revenue"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert any("Brand#1" in f for f in pushed_filters(df)), pushed_filters(df)


def test_q34_argmin_single_aggregate_no_window(spark, sf_dir):
    # Q2-shape argmin: one packed-decimal min aggregate, no Window, no
    # join-back re-aggregation (≤2 exchanges: agg + final sort), and
    # hash-aggregated — min(struct(...)) would demote to SortAggregate
    df = SPECS["q34_min_cost_supplier"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "Window" not in s
    assert "SortAggregate" not in s
    assert has_partial_agg(df)
    assert count_nodes(df, "Exchange") <= 2


def test_p12_sampling_is_scan_local(spark, sf_dir):
    # rate sampling must be a row-local filter: no Window, no Python eval,
    # only the final agg/sort exchanges — the 100 TB path is one scan
    df = SPECS["p12_stratified_sample"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "Window" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert count_nodes(df, "Exchange") <= 2
    assert has_partial_agg(df)


def test_p13_packing_single_window_pass(spark, sf_dir):
    # offset-based packing: exactly one Window (the per-source running
    # sum); integer div for pack ids; everything JVM-side
    df = SPECS["p13_token_budget_pack"].fn(spark, sf_dir)
    s = explain_str(df)
    assert count_nodes(df, "Window") == 1
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_p14_quota_window_input_pruned(spark, sf_dir):
    # quota fill: the per-stratum funnel must move only (lang, doc_id,
    # n_chars) — the text column must not reach the window
    df = SPECS["p14_domain_mix"].fn(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    for cols in read_schema_columns(df):
        assert "text" not in cols, cols


def test_p17_decontamination_bipartite_no_cartesian(spark, sf_dir):
    # train×eval candidate generation must ride band-key equi-joins and the
    # digest equi-join — a cartesian between the corpora would be train×eval
    # row products at scale
    df = SPECS["p17_decontaminate"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert has_partial_agg(df)


def test_q36_single_key_pipeline(spark, sf_dir):
    # Q21 decorrelation: both aggregates and every fact join key on
    # l_orderkey; supplier broadcasts; top-20 fuses to TakeOrderedAndProject
    df = SPECS["q36_waiting_suppliers"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "CartesianProduct" not in s
    assert "TakeOrderedAndProject" in s
    assert has_partial_agg(df)


def test_v11_partition_pruning(spark, sf_dir):
    # the partitioned round-trip must prune DIRECTORIES, not filter rows:
    # the scan's PartitionFilters carry event_type and the file listing
    # covers only the two selected partitions
    df = SPECS["v11_partitioned_write"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "PartitionFilters" in s and "event_type" in s.split("PartitionFilters", 1)[1][:200], s[:2000]


def test_x19_single_window_sort(spark, sf_dir):
    # all four frame aggregates share one (user_id, ts, event_id) window
    # spec -> Catalyst must plan ONE shuffle and at most two Window nodes
    # (running + 3-row frames), not one per aggregate
    df = SPECS["x19_running_windows"].fn(spark, sf_dir)
    s = explain_str(df)
    assert s.count("Window") <= 2, s[:2000]


def test_x27_range_frames_fuse_one_window(spark, sf_dir):
    # both interval frames (1h, 24h) share the (user_id, ts) spec ->
    # Catalyst plans ONE Window node and one exchange+sort, not one per
    # frame width; the frames differ only in their RangeFrame bound
    df = SPECS["x27_range_windows"].fn(spark, sf_dir)
    s = explain_str(df)
    assert count_nodes(df, "Window") == 1, s[:2000]
    assert count_nodes(df, "Exchange") <= 2  # user_id shuffle + output sort


def test_x26_bucketed_join_no_fact_shuffle(spark, sf_dir):
    # the co-bucketed orders/lineitem scans satisfy the join's
    # distribution requirement, so with broadcast ruled out (at real SFs
    # neither fact side fits; at the toy test SF AQE would rightly
    # broadcast the tiny orders side) the join runs WITHOUT any shuffle
    # Exchange on either input — the scans themselves report the needed
    # hash partitioning (Bucketed: true / SelectedBucketsCount)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = SPECS["x26_bucketed_fact_join"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_idx = plan.find("Join")
    assert join_idx != -1, plan[:2000]
    assert "Bucketed: true" in plan, plan[:2000]
    assert "Exchange" not in plan[join_idx:], plan[join_idx:][:2000]


def test_new_text_ops_prune_and_stay_codegen(spark, sf_dir):
    """Round-5 text/pipeline ops keep the family contract: minimal
    ReadSchema on the documents scan and no Python in the plan."""
    for name, need in (
        ("t14_vocab_growth", {"doc_id", "text"}),
        # doc_id pruned too: the cascade reads nothing it doesn't aggregate
        ("p28_filter_cascade", {"lang", "n_chars", "text"}),
    ):
        df = SPECS[name].fn(spark, sf_dir)
        schemas = read_schema_columns(df)
        assert schemas and set(schemas[0]) == need, (name, schemas)
        s = explain_str(df)
        assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s, name


def test_p29_diff_shuffles_digests_not_text(spark, sf_dir):
    """The snapshot-diff join must move ids+digests only: every Exchange
    in the plan carries doc_id/lang/digest-shaped rows, never `text` —
    digests are computed map-side before the shuffle."""
    df = SPECS["p29_snapshot_diff"].fn(spark, sf_dir)
    s = explain_str(df)
    for line in s.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line


def test_p30_no_global_sort_of_corpus(spark, sf_dir):
    """p30's spec is a full-corpus sort; the plan must NOT contain one —
    only the boundary-stratum window's sort (bounded by one quality
    value) and no Sort over the unfiltered feature relation."""
    df = SPECS["p30_quality_budget_select"].fn(spark, sf_dir)
    s = explain_str(df)
    # the only rangepartitioning exchange allowed is the final ORDER BY
    # over the per-lang aggregate (<= |langs| rows)
    sorts = [ln for ln in s.splitlines() if "Exchange rangepartitioning" in ln]
    assert all("lang" in ln for ln in sorts), sorts


def test_x30_metrics_ride_the_main_pass(spark, sf_dir):
    """x30's whole point: the quality counters must be a CollectMetrics
    node inside the main job's plan — one scan, not a second metrics
    scan.  Asserted on the observed aggregate the operator executes."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from sqlrs_spark.operators.common import t

    obs = Observation("dq_plan_probe")
    docs = t(spark, sf_dir, "documents").observe(
        obs, F.count(F.lit(1)).alias("n_rows")
    )
    main = docs.agg(F.max("n_chars").alias("max_chars"))
    s = explain_str(main)
    assert "CollectMetrics" in s, s
    # formatted explain names each node twice (tree line + detail
    # section) — one scan node means exactly two "Scan parquet" mentions
    assert s.count("Scan parquet") <= 2, s


def test_x31_range_join_is_hash_join_not_nested_loop(spark, sf_dir):
    """x31's whole point: the interval-overlap join must plan as a
    bucket-keyed HASH (or sort-merge) equi-join with the interval bounds
    as residual filters — never the BroadcastNestedLoopJoin a raw
    inequality join degenerates to when both sides scale with the data
    (x13's tiny-dim BNLJ is the documented exception, not this shape)."""
    df = SPECS["x31_range_join_bucketed"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "NestedLoop" not in s, s
    assert "CartesianProduct" not in s, s
    assert any(
        j in s for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), s


def test_x34_dynamic_partition_pruning(spark, sf_dir):
    # the fact scan's partition selection must come from the DIM side at
    # runtime: a dynamicpruning expression under the day-partitioned scan
    # (static pruning is impossible — which days survive is only known
    # after the dim's tag filter runs)
    df = SPECS["x34_dynamic_partition_pruning"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "dynamicpruning" in s.lower(), s[:3000]


def test_p33_no_cartesian_and_bounded_windows(spark, sf_dir):
    # coverage is a per-doc window over the positions, never a positions x
    # starts range join; the frequent-span join is an equi hash join
    df = SPECS["p33_span_scrub"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "CartesianProduct" not in s and "BroadcastNestedLoop" not in s, s[:2000]


def test_p35_adc_is_equi_join(spark, sf_dir):
    # the ADC scoring join must be an (m, code) equi hash join — a
    # nested-loop here would score every (query, vector, code) triple
    df = SPECS["p35_pq_ann"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "CartesianProduct" not in s, s[:2000]


def test_x32_single_window_pass(spark, sf_dir):
    # lead() and row_number share one (user_id; ts, event_id) spec ->
    # exactly one Window node, one hash-partition exchange below it
    df = SPECS["x32_scd2_history"].fn(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    assert count_nodes(df, "Exchange") <= 2  # user_id shuffle + output sort


def test_x33_window_and_agg_share_exchange(spark, sf_dir):
    # the sweep-line window and the per-user aggregate both key on
    # user_id -> one hash-partition exchange serves both
    df = SPECS["x33_interval_union"].fn(spark, sf_dir)
    assert count_nodes(df, "Window") == 1
    assert count_nodes(df, "Exchange") <= 2


def test_x35_listagg_after_reduction(spark, sf_dir):
    """x35's contract: the ordered concat (ObjectHashAggregate/listagg)
    runs on the post-count frame, never on the customer fact — the fact
    path is a pruned scan + broadcast nation join + partial/final count,
    and the rank<=5 predicate reaches the window as a group limit."""
    df = SPECS["x35_string_agg"].fn(spark, sf_dir)
    s = explain_str(df)
    assert has_broadcast_join(df)
    assert has_partial_agg(df)
    # pruned fact read: only the two columns the count needs
    schemas = read_schema_columns(df)
    assert ["c_mktsegment", "c_nationkey"] in [sorted(c) for c in schemas], schemas
    assert "WindowGroupLimit" in s, "rank<=5 must push down as a group limit"


def test_p37_no_full_corpus_sort(spark, sf_dir):
    """p37's spec is one sorted window PER SOURCE over the whole corpus;
    the plan must confine sorting to the boundary strata — like p30, the
    only range exchange allowed is the final ORDER BY over the per-source
    aggregate (<= |sources| rows)."""
    df = SPECS["p37_domain_cap_select"].fn(spark, sf_dir)
    s = explain_str(df)
    sorts = [ln for ln in s.splitlines() if "Exchange rangepartitioning" in ln]
    assert all("source" in ln for ln in sorts), sorts
    # the cutoff table joins as a broadcast, never a shuffle of the corpus
    assert has_broadcast_join(df)


def test_p38_single_scoring_pass_and_no_unbounded_nlj(spark, sf_dir):
    """p38's pairing stage is ONE per-cell kernel behind ONE exchange
    (r8 optimization round): a vector lives in exactly one LSH cell, so
    candidates, directed top-k and mutuality all resolve inside
    FlatMapGroupsInPandas — the plan must carry NO join of any kind
    (the r7 shape self-joined the cell frame, re-shuffled for a top-k
    window and again for the mutuality agg), no window, and exactly one
    hash exchange on the cell key plus the presentation sort."""
    df = SPECS["p38_knn_graph"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "CartesianProduct" not in s
    assert count_nodes(df, "FlatMapGroupsInPandas") == 1, "one cell kernel"
    # the whole knn pipeline runs once, joinless and windowless
    assert count_nodes(df, "Window") == 0, "top-k lives in the kernel"
    joins = (
        count_nodes(df, "SortMergeJoin")
        + count_nodes(df, "ShuffledHashJoin")
        + count_nodes(df, "BroadcastHashJoin")
        + count_nodes(df, "BroadcastNestedLoopJoin")
    )
    assert joins == 0, f"pairing must be joinless, saw {joins} joins"
    # one cell-hash exchange + the final presentation range sort
    # (formatted mode prints exchange keys on Arguments: detail lines)
    hash_ex = [
        ln
        for ln in s.splitlines()
        if "Arguments: hashpartitioning" in ln
    ]
    assert len(hash_ex) == 1 and "cell" in hash_ex[0], hash_ex


def test_p40_single_cell_kernel_no_iterative_rounds(spark, sf_dir):
    """p40's components are computed INSIDE the per-cell kernel (r9
    optimization round): every p38 edge is intra-cell by construction
    (candidates come from the a.cell = b.cell equi-join and a vector
    hashes to exactly one cell), so no component spans cells and the
    whole operator must plan like p38 — one FlatMapGroupsInPandas
    behind one hash(cell) exchange plus the presentation sort; no
    joins, no windows, no checkpointed loop state (Scan ExistingRDD
    was the r8 star-loop's pinned-edge signature)."""
    df = SPECS["p40_semantic_clusters"].fn(spark, sf_dir)
    s = explain_str(df)
    assert count_nodes(df, "FlatMapGroupsInPandas") == 1, "one cell kernel"
    assert count_nodes(df, "Window") == 0
    joins = (
        count_nodes(df, "SortMergeJoin")
        + count_nodes(df, "ShuffledHashJoin")
        + count_nodes(df, "BroadcastHashJoin")
        + count_nodes(df, "BroadcastNestedLoopJoin")
    )
    assert joins == 0, f"labels must be kernel-local, saw {joins} joins"
    assert "Scan ExistingRDD" not in s, "no pinned iterative loop state"
    hash_ex = [ln for ln in s.splitlines() if "Arguments: hashpartitioning" in ln]
    assert len(hash_ex) == 1 and "cell" in hash_ex[0], hash_ex


def test_p40_labels_match_general_cc_loop(spark, sf_dir):
    """Equivalence of the fused per-cell union-find against the general
    large-star/small-star loop (dedup.connected_components) on the SAME
    p38 edge set — the two implementations must label every vector
    identically (cluster ids are component minima in both)."""
    from sqlrs_spark.operators.common import EMB_VALID_SPARK
    from sqlrs_spark.operators.dedup import connected_components
    from sqlrs_spark.operators.similarity import _p38_mutual_edges
    from sqlrs_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("embeddings",))
    edges = _p38_mutual_edges(spark, sf_dir).selectExpr("src_id AS a", "dst_id AS b")
    nodes = (
        spark.table("embeddings").where(EMB_VALID_SPARK).selectExpr("vec_id AS doc_id")
    )
    want = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges, nodes).collect()
    }
    got = {
        r.vec_id: r.cluster_id
        for r in SPECS["p40_semantic_clusters"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_m09_alignment_is_windowed_not_pair_joined(spark, sf_dir):
    """m09's as-of must be the tagged-window carry-forward: no pair join
    between keyframes and windows (SortMergeJoin/NestedLoop would put
    the O(frames x windows) product on the plan), and every exchange is
    keyed by doc_id — the alignment never leaves the doc partition."""
    df = SPECS["m09_av_keyframe_align"].fn(spark, sf_dir)
    s = explain_str(df)
    assert "CartesianProduct" not in s
    assert count_nodes(df, "SortMergeJoin") == 0
    assert count_nodes(df, "BroadcastNestedLoopJoin") == 0
    hash_ex = [ln for ln in s.splitlines() if "hashpartitioning(" in ln]
    assert hash_ex and all("doc_id" in ln for ln in hash_ex), hash_ex

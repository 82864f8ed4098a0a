"""Scale-path tests: bucketed co-located joins and skew salting.

These exercise the two plan-level tools the 100 TB design leans on beyond
AQE (README §Scale design): bucketing both fact tables on the join key so
orders⋈lineitem never shuffles, and deterministic salting for hot keys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlrs_spark.operators.skew import salted_join
from sqlrs_spark.sources.bucketing import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)
from sqlrs_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"drop table if exists {t}")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_by="o_orderkey")
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8, sort_by="l_orderkey")
    yield "orders_b", "lineitem_b"
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"drop table if exists {t}")


def test_bucketed_fact_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the test proves bucketing (not broadcast) elides
    # the exchanges — at real scale neither side is broadcastable anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert bucketed_join_is_shuffle_free(
            spark, left, right, on=[F.col("o_orderkey") == F.col("l_orderkey")]
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_sorted_bucketed_join_no_sort(spark, bucketed_tables):
    """Sorted one-file-per-bucket writes must elide the SMJ's runtime
    sorts too — the layout's whole point is paying the sort once at
    ingest (at the 1000x replica the unsorted-bucket q28 still spent most
    of its time sorting 150M orders + 77M lineitem rows per query)."""
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table(left)
            .join(spark.table(right), F.col("o_orderkey") == F.col("l_orderkey"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        assert "Exchange" not in plan, plan
        # match the Sort NODE, not the "Sort" inside "SortMergeJoin"
        assert not re.search(r"\bSort \[", plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(load_table(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    bucketed = (
        spark.table(left)
        .join(spark.table(right), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert plain == bucketed > 0


def test_salted_join_matches_plain_inner(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    salted = salted_join(li, orders, "l_orderkey", "o_orderkey", salt=8).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_matches_plain_left(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    # restrict the dim so some fact rows go unmatched (exercise null-extension)
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left").count()
    salted = salted_join(li, orders, "l_orderkey", "o_orderkey", salt=8, how="left").count()
    assert plain == salted > 0


def test_salted_join_rejects_dim_preserving(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        salted_join(li, orders, "l_orderkey", "o_orderkey", how="right")


def test_salted_join_spreads_shuffle_key(spark, sf_dir):
    # plan must shuffle on (key, salt), not key alone
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = salted_join(li, orders, "l_orderkey", "o_orderkey", salt=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "__salt" in plan


def test_bucketed_agg_join_pipeline_no_shuffle(spark, bucketed_tables):
    # q25_large_orders' shape on bucketed tables: the per-order aggregate
    # runs on the bucket key (no exchange), and the join-back to orders is
    # co-located — the whole pipeline is shuffle-free.  This is the scale
    # fix for q25's linearly-growing intermediate (README scale notes).
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        qty = (
            spark.table(right)
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 250.0)
        )
        joined = spark.table(left).join(
            qty, F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_q25_plan_bucketed_matches_plain(spark, sf_dir, bucketed_tables):
    """The real q25_plan through the bucketed sources must return the
    identical result as its plain-parquet form — this is the pair the
    scaled bench times (q25_large_orders[bucketed])."""
    from sqlrs_spark.operators.analytics import q25_plan

    left, right = bucketed_tables
    plain = q25_plan(spark, sf_dir).collect()
    bucketed = q25_plan(
        spark, sf_dir, spark.table(left), spark.table(right)
    ).collect()
    assert plain == bucketed
    assert len(plain) > 0


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """AQE skew-join must actually activate on a hot key.

    Production thresholds (256 MiB) never trip on local test data, so this
    lowers them to force the mechanism and asserts the executed plan shows
    the skew=true marker on the sort-merge join — proving the config wired
    in session.build_spark does what the 100 TB design relies on: a hot
    join key is split across tasks at runtime instead of serializing one
    straggler partition.
    """
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # hot key: 80% of the fact rows share join key 0
        fact = (
            spark.range(0, 200_000)
            .withColumn("k", F.when(F.col("id") % 5 < 4, F.lit(0)).otherwise(F.col("id")))
            .withColumn("payload", F.concat(F.lit("x" * 32), F.col("id")))
        )
        dim = spark.range(0, 200_000).select(
            F.col("id").alias("k2"), (F.col("id") * 2).alias("v")
        )
        joined = fact.join(dim, F.col("k") == F.col("k2")).groupBy().count()
        joined.collect()  # materialize so AQE finalizes the plan
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)


def test_cache_table_serves_from_memory(spark, sf_dir):
    """CACHE TABLE surface: a cached view plans as InMemoryTableScan and
    returns identical results — the reuse story for iterative pipelines
    (p09/p18 style loops re-read their inputs every pass)."""
    from sqlrs_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("nation",))
    spark.sql("CACHE TABLE nation")
    try:
        assert spark.catalog.isCached("nation")
        plan = (
            spark.sql("SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "InMemoryRelation" in plan
        rows = spark.sql(
            "SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"
        ).collect()
        assert sum(r.n for r in rows) == 25
    finally:
        spark.sql("UNCACHE TABLE nation")


def test_adopted_bucketed_table_keeps_layout(spark, sf_dir, bucketed_tables):
    """Re-adopting a bucketed directory written by a PREVIOUS session
    (sources/bucketing.adopt_bucketed — the ensure_bucketed fast path when
    the in-memory catalog died with the JVM) must preserve both the data
    and the zero-Exchange/zero-Sort join property, because the bucket id
    lives in the file names, not the catalog."""
    import os
    import re
    import shutil
    from urllib.parse import urlparse

    from sqlrs_spark.sources.bucketing import adopt_bucketed

    left, right = bucketed_tables
    wh = spark.conf.get("spark.sql.warehouse.dir")
    wh_path = urlparse(wh).path or wh
    spark.sql("drop table if exists orders_adopted")
    adopted_loc = os.path.join(wh_path, "orders_adopted_files")
    shutil.rmtree(adopted_loc, ignore_errors=True)
    # simulate "files outlived the catalog": a copy of the bucketed dir
    # that THIS session's catalog has never seen under any table name
    shutil.copytree(os.path.join(wh_path, left), adopted_loc)
    try:
        adopt_bucketed(
            spark, "orders_adopted", adopted_loc, "o_orderkey", 8,
            sort_by="o_orderkey",
        )
        assert (
            spark.table("orders_adopted").count() == spark.table(left).count() > 0
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                spark.table("orders_adopted")
                .join(
                    spark.table(right),
                    F.col("o_orderkey") == F.col("l_orderkey"),
                )
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "Exchange" not in plan, plan
            assert not re.search(r"\bSort \[", plan), plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql("drop table if exists orders_adopted")
        shutil.rmtree(adopted_loc, ignore_errors=True)


def test_adopted_facts_route_query_plans(spark, sf_dir):
    """Path-equivalence gate for the bucketed-layout promotion (round-3
    verdict #6): once a co-bucketed fact layout exists, the registered
    q03/q05/q25/q28 entry points must route through it transparently and
    return bit-identical results to the plain path."""
    from sqlrs_spark.operators.analytics_deep import q28_nation_profit, q28_plan
    from sqlrs_spark.operators.relational import q03_shipping_priority, q03_plan
    from sqlrs_spark.sources.bucketing import (
        adopted_bucketed_facts,
        ensure_bucketed_facts,
    )

    plain_q28 = [tuple(r) for r in q28_plan(spark, sf_dir).collect()]
    plain_q03 = [tuple(r) for r in q03_plan(spark, sf_dir).collect()]
    o_t, l_t = ensure_bucketed_facts(spark, sf_dir)
    try:
        facts = adopted_bucketed_facts(spark, sf_dir)
        assert facts is not None, "layout probe missed a just-built layout"
        # the registered entry point now routes through the layout...
        routed_q28 = [tuple(r) for r in q28_nation_profit(spark, sf_dir).collect()]
        routed_q03 = [tuple(r) for r in q03_shipping_priority(spark, sf_dir).collect()]
        assert routed_q28 == plain_q28
        assert routed_q03 == plain_q03
        # ...and the explicit bucketed sources agree too (the bench path)
        bucketed_q28 = [
            tuple(r)
            for r in q28_plan(spark, sf_dir, spark.table(o_t), spark.table(l_t)).collect()
        ]
        assert bucketed_q28 == plain_q28
        # the bench's plain pass must be able to opt out: with adoption
        # disabled the probe misses even though the layout exists
        spark.conf.set("spark.sqlrs.bucketedAdoption", "off")
        try:
            assert adopted_bucketed_facts(spark, sf_dir) is None
        finally:
            spark.conf.unset("spark.sqlrs.bucketedAdoption")
    finally:
        import os
        import shutil
        from urllib.parse import urlparse

        wh = spark.conf.get("spark.sql.warehouse.dir")
        wh_path = urlparse(wh).path or wh
        for tbl in (o_t, l_t):
            spark.sql(f"drop table if exists {tbl}")
            shutil.rmtree(os.path.join(wh_path, tbl), ignore_errors=True)


def test_adopted_facts_probe_misses_cleanly(spark, tmp_path):
    """The probe must return None (not ETL, not raise) for a dataset with
    no layout — plain directories keep today's plan."""
    from sqlrs_spark.sources.bucketing import adopted_bucketed_facts

    assert adopted_bucketed_facts(spark, str(tmp_path)) is None


def test_measured_join_strategy_tiers(spark, sf_dir):
    """The tiered join-side policy (common.measured_join_strategy): at
    test SFs the reduction measures far below the SHJ crossover, so the
    strategy must return a broadcast-hinted frame and NO prefilter on
    both layouts; forcing the crossover to zero with a partitioned fact
    must flip it to the shuffle-hash + bloom shape.

    A join-strategy hint only survives Catalyst when the hinted frame is
    under a join (HintErrorLogger drops it otherwise), so every tier is
    asserted on the PHYSICAL PLAN OF A JOIN against the lineitem fact —
    the plan callers actually run — never on the standalone frame.
    """
    from pyspark.sql import functions as F

    from sqlrs_spark.operators.common import measured_join_strategy

    fact = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    reduction = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000.0)
        .select("o_orderkey")
    )

    def joined_plan(side, pre):
        probe = fact if pre is None else fact.filter(pre)
        j = probe.join(side, probe["l_orderkey"] == side["o_orderkey"])
        return j._jdf.queryExecution().executedPlan().toString()

    side, pre = measured_join_strategy(reduction, "o_orderkey", F.col("l_orderkey"))
    assert pre is None
    assert "BroadcastHashJoin" in joined_plan(side, pre)
    # crossover forced to zero + co-partitioned fact -> SHJ tier w/ bloom
    side2, pre2 = measured_join_strategy(
        reduction,
        "o_orderkey",
        F.col("l_orderkey"),
        shj_rows=1,
        fact_partitioned=True,
    )
    assert pre2 is not None  # the might_contain prefilter
    plan2 = joined_plan(side2, pre2)
    assert "ShuffledHashJoin" in plan2
    assert "might_contain" in plan2
    # unpartitioned fact at the same size keeps the broadcast tier
    side3, pre3 = measured_join_strategy(
        reduction, "o_orderkey", F.col("l_orderkey"), shj_rows=1
    )
    assert pre3 is None
    assert "BroadcastHashJoin" in joined_plan(side3, pre3)


def test_bloom_prefilter_rejects_non_integral_key(spark, sf_dir):
    """The BIGINT cast inside bloom_prefilter is lossy for non-integral
    keys (non-ANSI: string -> NULL), which would build the filter from
    NULLs and silently drop every matching probe row — the guard must
    raise instead (ADVICE r4)."""
    from pyspark.sql import functions as F

    from sqlrs_spark.operators.common import bloom_prefilter, measured_broadcast

    red = load_table(spark, sf_dir, "customer").select("c_mktsegment")
    measured_broadcast(red)  # populate the measured memo the builder needs
    with pytest.raises(TypeError, match="integral"):
        bloom_prefilter(red, "c_mktsegment", F.col("l_comment"))


def test_q34_partkey_layout_routing(spark, sf_dir):
    """q34 through a partkey-bucketed lineitem layout (r4 verdict #6):
    the registered entry must adopt an existing layout transparently and
    return identical rows; the layout-fed plan's argmin aggregate must
    inherit the scan's partitioning (no Exchange between the bucketed
    scan and the partial/final HashAggregate pair collapsing to one)."""
    from sqlrs_spark.operators.analytics_deep import q34_min_cost_supplier, q34_plan
    from sqlrs_spark.sources.bucketing import (
        adopted_bucketed_source,
        ensure_bucketed,
    )

    plain = [tuple(r) for r in q34_plan(spark, sf_dir).collect()]
    li_t = ensure_bucketed(spark, sf_dir, "lineitem", "l_partkey", buckets=32)
    try:
        li_b = adopted_bucketed_source(spark, sf_dir, "lineitem", "l_partkey")
        assert li_b is not None, "layout probe missed a just-built layout"
        routed = [tuple(r) for r in q34_min_cost_supplier(spark, sf_dir).collect()]
        assert routed == plain
        bucketed = [tuple(r) for r in q34_plan(spark, sf_dir, li_b).collect()]
        assert bucketed == plain
        assert len(plain) > 0
        # plan shape: the aggregate runs on the bucketed scan's own hash
        # partitioning — exactly ONE single-stage HashAggregate pair and
        # no Exchange between scan and aggregate (the final orderBy's
        # range exchange remains, and is bounded by |parts| rows)
        plan = (
            q34_plan(spark, sf_dir, li_b)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning(l_partkey" not in plan, plan
        assert "HashAggregate" in plan, plan
    finally:
        import os
        import shutil
        from urllib.parse import urlparse

        wh = spark.conf.get("spark.sql.warehouse.dir")
        wh_path = urlparse(wh).path or wh
        spark.sql(f"drop table if exists {li_t}")
        shutil.rmtree(os.path.join(wh_path, li_t), ignore_errors=True)

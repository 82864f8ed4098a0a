"""Round-6 measurement (r5 verdict #2): isolate q05's 1000x bottleneck.

q05's plain plan is scan(600M, 4 cols) -> probe ordc (8.7M-entry
broadcast map) -> probe supplier (1M-entry broadcast map, two-column
condition) -> 5-group money agg.  The orderkey-bucketed layout helped
only 12.1 -> 11.1s, so the exchange was never the cost.  Candidates:

Variant "scan"  — the floor: 4-column lineitem scan + count/cheap sums
                  (forces full decode of both money doubles).
Variant "base"  — HEAD's q05_plan, plain layout.
Variant "semi"  — semi-reduce lineitem by the ASIA-filtered supplier
                  set FIRST: supp_asia is |supplier|/5 rows (~200k at
                  the 1000x replica) carrying (s_suppkey, s_nationkey,
                  n_name), a cheap near-cache probe that kills ~80% of
                  the fact BEFORE the expensive 8.7M-entry ordc probe;
                  the two-column condition becomes a residual
                  c_nationkey = s_nationkey filter after the ordc join.
Variant "base_b"/"semi_b" — same through the orderkey-bucketed layout.

One variant per process (bench-hygiene: separate pre-warmed JVMs,
best-of-N across invocations, never mid-session):

    python tools/exp_q05.py scan|base|semi|semi2|base_b|semi_b|semi2_b \
        [--dir /tmp/sqlrs_replica1000x]

ROUND-6 RESULTS (1000x replica, best-of-2 in each of 1-2 processes):
    scan    2.017s           — 4-column scan+decode floor
    base    12.149 / 10.583s — HEAD-at-r5, plain
    semi    19.247s          — MEASURED NEGATIVE: the extra full-fact
                               probe stage costs ~7s even against a
                               200k-entry map; probe order stands
    semi2   11.981 / 10.447s — ties base on plain
    base_b  11.841s          — r5 bucketed shape
    semi2_b  9.631 /  9.793s — ADOPTED: bucketed + ASIA-only supplier
                               map, 11.8 -> 9.6s
Conclusion (r5 verdict #2): the bottleneck is the per-row cost of the
fused 600M-row probe pipeline itself — fully whole-stage-codegen'd
(verified in the final AQE plan), insensitive to build-map size (semi2
== base on plain) and to the exchange (bucketed -1s) — an engine
constant relative to DuckDB's ~3.3s, not a plan defect.  semi2's shape
was adopted into q05_plan for its bucketed-path win.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def scan_floor(spark, sf_dir):
    from pyspark.sql import functions as F

    from sqlrs_spark.operators.common import t

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return li.agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_orderkey") % 1000).alias("sk"),  # mod: key-shifted
        F.sum(F.col("l_suppkey") % 1000).alias("ss"),  # replica keys overflow
        F.sum("l_extendedprice").alias("se"),
        F.sum("l_discount").alias("sd"),
    )


def semi_plan(spark, sf_dir, orders_src=None, li_src=None):
    from pyspark.sql import functions as F

    from sqlrs_spark.operators.common import (
        measured_broadcast,
        measured_join_strategy,
        money_sum_aggs,
        money_sum_total,
        rev_cents,
        t,
    )

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        (orders_src if orders_src is not None else t(spark, sf_dir, "orders"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (li_src if li_src is not None else t(spark, sf_dir, "lineitem")).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat_asia = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    # ASIA suppliers with the nation name attached: |supplier|/5 rows
    supp_asia = measured_broadcast(
        t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nat_asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust_asia = measured_broadcast(
        cust.join(
            F.broadcast(nat_asia), cust.c_nationkey == nat_asia.n_nationkey
        ).select("c_custkey", "c_nationkey")
    )
    ordc_red = orders.join(
        cust_asia, orders.o_custkey == cust_asia.c_custkey
    ).select("o_orderkey", "c_nationkey")
    ordc, li_pre = measured_join_strategy(
        ordc_red,
        "o_orderkey",
        F.col("l_orderkey"),
        fact_partitioned=li_src is not None,
    )
    if li_pre is not None:
        li = li.filter(li_pre)
    return (
        li.join(supp_asia, li.l_suppkey == F.col("s_suppkey"))
        .join(ordc, li.l_orderkey == ordc.o_orderkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .select("n_name", rev_cents().alias("rev_c"))
        .groupBy("n_name")
        .agg(*money_sum_aggs("rev_c"))
        .select("n_name", money_sum_total("rev_c").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def semi2_plan(spark, sf_dir, orders_src=None, li_src=None):
    """base's probe ORDER (ordc first), but the supplier side is the
    ASIA-only 1/5-size map with n_name attached and the two-column
    condition split into suppkey-equi + nationkey residual — isolates
    'smaller supplier map' from 'probe-order flip' (variant semi)."""
    from pyspark.sql import functions as F

    from sqlrs_spark.operators.common import (
        measured_broadcast,
        measured_join_strategy,
        money_sum_aggs,
        money_sum_total,
        rev_cents,
        t,
    )

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        (orders_src if orders_src is not None else t(spark, sf_dir, "orders"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (li_src if li_src is not None else t(spark, sf_dir, "lineitem")).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat_asia = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp_asia = measured_broadcast(
        t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nat_asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust_asia = measured_broadcast(
        cust.join(
            F.broadcast(nat_asia), cust.c_nationkey == nat_asia.n_nationkey
        ).select("c_custkey", "c_nationkey")
    )
    ordc_red = orders.join(
        cust_asia, orders.o_custkey == cust_asia.c_custkey
    ).select("o_orderkey", "c_nationkey")
    ordc, li_pre = measured_join_strategy(
        ordc_red,
        "o_orderkey",
        F.col("l_orderkey"),
        fact_partitioned=li_src is not None,
    )
    if li_pre is not None:
        li = li.filter(li_pre)
    return (
        li.join(ordc, li.l_orderkey == ordc.o_orderkey)
        .join(
            supp_asia,
            (li.l_suppkey == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .select("n_name", rev_cents().alias("rev_c"))
        .groupBy("n_name")
        .agg(*money_sum_aggs("rev_c"))
        .select("n_name", money_sum_total("rev_c").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "variant",
        choices=["scan", "base", "semi", "semi2", "base_b", "semi_b", "semi2_b"],
    )
    ap.add_argument("--dir", default="/tmp/sqlrs_replica1000x")
    args = ap.parse_args()

    from bench import bench_session_conf, shuffle_parts, verify_heap
    from sqlrs_spark.operators.relational import q05_plan
    from sqlrs_spark.session import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    conf = bench_session_conf(args.dir, cpus)
    spark = build_spark(
        f"exp_q05_{args.variant}",
        cores=cpus,
        shuffle_partitions=shuffle_parts(args.dir, cpus),
        extra_conf=conf,
    )
    verify_heap(spark, conf)

    srcs = ()
    if args.variant.endswith("_b"):
        from sqlrs_spark.sources.bucketing import ensure_bucketed_facts

        orders_t, lineitem_t = ensure_bucketed_facts(spark, args.dir, buckets=64)
        srcs = (spark.table(orders_t), spark.table(lineitem_t))
    else:
        spark.conf.set("spark.sqlrs.bucketedAdoption", "off")

    plans = {
        "scan": lambda: scan_floor(spark, args.dir),
        "base": lambda: q05_plan(spark, args.dir),
        "semi": lambda: semi_plan(spark, args.dir),
        "semi2": lambda: semi2_plan(spark, args.dir),
        "base_b": lambda: q05_plan(spark, args.dir, *srcs),
        "semi_b": lambda: semi_plan(spark, args.dir, *srcs),
        "semi2_b": lambda: semi2_plan(spark, args.dir, *srcs),
    }
    fn = plans[args.variant]
    if os.environ.get("EXP_EXPLAIN"):
        from sqlrs_spark.plans.checks import explain_str

        print(explain_str(fn()))
        spark.stop()
        return
    if os.environ.get("EXP_EXPLAIN_FINAL"):
        from sqlrs_spark.plans.checks import explain_str

        df = fn()
        df.collect()
        print(explain_str(df))
        spark.stop()
        return
    rows = fn().collect()  # warm (JIT, codegen, broadcast build, page cache)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rows = fn().collect()
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT {args.variant} {best:.3f}s rows={len(rows)} top={rows[0]}")
    spark.stop()


if __name__ == "__main__":
    main()

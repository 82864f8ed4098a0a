"""Round-5 measurement (r4 verdict #5): q03 plain-layout probe tail.

Variant "base"   — HEAD's q03_plan: shipdate-filtered lineitem (~60% of
                   the fact) probes the broadcast reduced-orders map row
                   by row, then the grouped money aggregate runs on the
                   ~20% survivors.
Variant "preagg" — pre-aggregate the filtered lineitem by l_orderkey
                   (partial-agg map-side, split-radix money sums) BEFORE
                   the probe: probes drop from ~350M rows to ~|distinct
                   orderkeys|, and the post-join aggregate disappears
                   entirely (o_orderdate is functionally dependent on the
                   key, so the pre-agg row IS the final group).

One variant per process (bench-hygiene: separate pre-warmed JVMs,
best-of-N across invocations, never mid-session):

    python tools/exp_q03_preagg.py base|preagg [--dir /tmp/sqlrs_replica1000x]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def preagg_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    from sqlrs_spark.operators.common import (
        measured_broadcast,
        measured_join_strategy,
        money_sum_aggs,
        money_sum_total,
        rev_cents,
        t,
    )

    cust = measured_broadcast(
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    ordc_red = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    ordc, pre = measured_join_strategy(
        ordc_red, "o_orderkey", F.col("l_orderkey")
    )
    if pre is not None:
        li = li.filter(pre)
    li_agg = (
        li.select("l_orderkey", rev_cents().alias("rev_c"))
        .groupBy("l_orderkey")
        .agg(*money_sum_aggs("rev_c"))
    )
    return (
        li_agg.join(ordc, li_agg.l_orderkey == ordc.o_orderkey)
        .select(
            "l_orderkey",
            money_sum_total("rev_c").alias("revenue"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["base", "preagg"])
    ap.add_argument("--dir", default="/tmp/sqlrs_replica1000x")
    args = ap.parse_args()

    from bench import bench_session_conf, shuffle_parts, verify_heap
    from sqlrs_spark.operators.relational import q03_plan
    from sqlrs_spark.session import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    conf = bench_session_conf(args.dir, cpus)
    spark = build_spark(
        f"exp_q03_{args.variant}",
        cores=cpus,
        shuffle_partitions=shuffle_parts(args.dir, cpus),
        extra_conf=conf,
    )
    verify_heap(spark, conf)
    spark.conf.set("spark.sqlrs.bucketedAdoption", "off")  # plain layout only

    fn = (lambda: q03_plan(spark, args.dir)) if args.variant == "base" else (
        lambda: preagg_plan(spark, args.dir)
    )
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

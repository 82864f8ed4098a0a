"""Round-6 measurement (r5 verdict #3): q01's scan+agg gap (10.3s vs
DuckDB 3.2s at the 1000x replica) — one profiling pass before declaring
floor.

Variant "scan" — the floor: the 7 needed columns scanned + cheap sums
                 (forces full decode incl. the three money doubles and
                 the shipdate filter).
Variant "base" — HEAD's q01: 5 integer sums, sum_charge split-radix as
                 sc_hi/sc_lo with the cents product written twice
                 (once via F.expr, once via Column algebra — possibly
                 not CSE'd, so the 3-multiply chain may run twice/row).
Variant "proj" — the product computed ONCE in a pre-agg projection,
                 then sum(sc div 1e6) / sum(sc % 1e6).
Variant "dec"  — sum_charge as a single DECIMAL(38,0) sum instead of
                 the two-bigint split radix (two fewer long columns
                 through the shuffle vs decimal128 partials).

One variant per process (bench-hygiene):

    python tools/exp_q01.py scan|base|proj|dec [--dir /tmp/sqlrs_replica1000x]

ROUND-6 RESULTS (1000x replica, quiet box, pre-warmed page cache,
best-of-2 after a warm run):
    scan  5.407s   — floor probe; the two string MAXes over 322M rows
                     cost more than base's whole grouped agg, so this
                     "floor" overshoots and is diagnostic only
    base  3.787s   — HEAD's q01, unchanged
    proj  3.987s   — pre-projected product: no win; Catalyst already
                     CSEs the cents product across sc_hi/sc_lo
    dec   5.671s   — single DECIMAL(38,0) charge sum: 1.9s WORSE; the
                     decimal128 partial aggregate costs more than two
                     extra bigint columns, split radix stands
Conclusion (r5 verdict #3): q01 at HEAD runs 3.8s fresh-process vs the
10.3s in BENCH1000X_r05 — the committed number was mid-sweep page-cache
competition (the p16 artifact class), NOT a plan gap: 3.8s vs DuckDB's
3.2s is ~1.18x.  No plan change adopted; the bench fresh_retry
self-defense (r5 verdict #4) keeps this class out of future artifacts.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _filtered(spark, sf_dir):
    from pyspark.sql import functions as F

    from sqlrs_spark.operators.common import t

    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )


def scan_floor(spark, sf_dir):
    from pyspark.sql import functions as F

    f = _filtered(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    )
    return f.agg(
        F.count("*").alias("n"),
        F.sum("l_quantity").alias("sq"),
        F.sum("l_extendedprice").alias("se"),
        F.sum("l_discount").alias("sd"),
        F.sum("l_tax").alias("st"),
        F.max("l_returnflag").alias("mr"),
        F.max("l_linestatus").alias("ml"),
    )


def proj_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("bigint")  # noqa: E731
    f = _filtered(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        cents("l_extendedprice").alias("pc"),
        cents("l_discount").alias("dc"),
        cents("l_tax").alias("tc"),
    )
    f = f.withColumn("sd_i", F.col("pc") * (100 - F.col("dc"))).withColumn(
        "sc_i", F.col("sd_i") * (100 + F.col("tc"))
    )
    g = f.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("pc").alias("sb_c"),
        F.sum("sd_i").alias("sd_i"),
        F.sum(F.expr("sc_i div 1000000")).alias("sc_hi"),
        F.sum(F.col("sc_i") % 1000000).alias("sc_lo"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("count_order"),
    )
    charge_exact = F.col("sc_hi").cast("decimal(38,0)") * 1000000 + F.col("sc_lo")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        (F.col("sb_c") / 100.0).alias("sum_base_price"),
        (F.col("sd_i") / 10000.0).alias("sum_disc_price"),
        (charge_exact.cast("double") / 1000000.0).alias("sum_charge"),
        "min_qty",
        "max_price",
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def dec_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("bigint")  # noqa: E731
    f = _filtered(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        cents("l_extendedprice").alias("pc"),
        cents("l_discount").alias("dc"),
        cents("l_tax").alias("tc"),
    )
    sd_i = F.col("pc") * (100 - F.col("dc"))
    sc_dec = (sd_i * (100 + F.col("tc"))).cast("decimal(38,0)")
    g = f.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("pc").alias("sb_c"),
        F.sum(sd_i).alias("sd_i"),
        F.sum(sc_dec).alias("sc_d"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        (F.col("sb_c") / 100.0).alias("sum_base_price"),
        (F.col("sd_i") / 10000.0).alias("sum_disc_price"),
        (F.col("sc_d").cast("double") / 1000000.0).alias("sum_charge"),
        "min_qty",
        "max_price",
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["scan", "base", "proj", "dec"])
    ap.add_argument("--dir", default="/tmp/sqlrs_replica1000x")
    args = ap.parse_args()

    from bench import bench_session_conf, shuffle_parts, verify_heap
    from sqlrs_spark.registry import all_specs
    from sqlrs_spark.session import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    conf = bench_session_conf(args.dir, cpus)
    spark = build_spark(
        f"exp_q01_{args.variant}",
        cores=cpus,
        shuffle_partitions=shuffle_parts(args.dir, cpus),
        extra_conf=conf,
    )
    verify_heap(spark, conf)
    spark.conf.set("spark.sqlrs.bucketedAdoption", "off")

    base_fn = all_specs()["q01_pricing_summary"].fn
    plans = {
        "scan": lambda: scan_floor(spark, args.dir),
        "base": lambda: base_fn(spark, args.dir),
        "proj": lambda: proj_plan(spark, args.dir),
        "dec": lambda: dec_plan(spark, args.dir),
    }
    fn = plans[args.variant]
    rows = fn().collect()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rows = fn().collect()
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT {args.variant} {best:.3f}s rows={len(rows)} top={rows[0]}")
    spark.stop()


if __name__ == "__main__":
    main()

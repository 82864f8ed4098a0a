"""Round-6 measurement (r5 verdict #6): bucketed q03's last unmeasured
idea — a TIGHTER bloom prefilter on the SHJ tier.

The bucketed q03 runs the reduction through a shuffle-hash join into
lineitem's orderkey partitioning with a bloom prefilter at the default
fpp=0.05 (~11 MB at the ~14.5M-row reduction).  q03's probe survivors
are ~20% of the filtered fact; if a meaningful share of the surviving
probes were bloom FALSE POSITIVES, a 1%/0.3% filter would cut real work
at the cost of a bigger, colder filter (0.01 -> ~24 MB, k=7; 0.003 ->
~33 MB, k=8).

    python tools/exp_q03_fpp.py 0.05|0.01|0.003 [--dir /tmp/sqlrs_replica1000x]

ROUND-6 RESULTS (1000x replica, quiet box, one pre-warmed JVM per fpp,
best-of-2 after a warm run):
    fpp=0.05   9.078s   (r5 artifact's 8.1s, within the noise band)
    fpp=0.01  14.278s
    fpp=0.003 17.404s
Tighter is strictly WORSE: the bit array outgrows cache and k rises
4 -> 7 -> 8 probes/row, charged on EVERY fact row, while q03's probe
survivors are overwhelmingly real matches — there was almost no false-
positive work to remove.  0.05 stands as the default
(spark.sqlrs.bloomPrefilter.fpp); q03's bucketed tier is CLOSED — this
was its last unmeasured idea (r5 verdict #6).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("fpp", type=float)
    ap.add_argument("--dir", default="/tmp/sqlrs_replica1000x")
    args = ap.parse_args()

    from bench import bench_session_conf, shuffle_parts, verify_heap
    from sqlrs_spark.operators.relational import q03_plan
    from sqlrs_spark.session import build_spark
    from sqlrs_spark.sources.bucketing import ensure_bucketed_facts

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    conf = bench_session_conf(args.dir, cpus)
    spark = build_spark(
        f"exp_q03_fpp{args.fpp}",
        cores=cpus,
        shuffle_partitions=shuffle_parts(args.dir, cpus),
        extra_conf=conf,
    )
    verify_heap(spark, conf)
    spark.conf.set("spark.sqlrs.bloomPrefilter.fpp", str(args.fpp))

    orders_t, lineitem_t = ensure_bucketed_facts(spark, args.dir, buckets=64)
    srcs = (spark.table(orders_t), spark.table(lineitem_t))

    fn = lambda: q03_plan(spark, args.dir, *srcs)  # noqa: E731
    rows = fn().collect()  # warm (bloom build, codegen, page cache)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rows = fn().collect()
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT fpp={args.fpp} {best:.3f}s rows={len(rows)} top={rows[0]}")
    spark.stop()


if __name__ == "__main__":
    main()

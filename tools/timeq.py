"""Time individual registry queries on a replica dir — the iteration loop
for perf work between full bench10x runs.

Usage: python tools/timeq.py <sf_dir> <query> [<query> ...] [--runs N]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from bench import bench_session_conf, shuffle_parts
    from sqlrs_spark.registry import all_specs
    from sqlrs_spark.session import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # the FULL bench session conf, not a hand-copied subset: the warehouse
    # override matters here too — timing a bucketed-layout op (x26,
    # ensure_bucketed_facts callers) without it ETLs multi-GB bucketed
    # tables into the repo-cwd warehouse
    spark = build_spark(
        "sqlrs_timeq",
        cores=cpus,
        shuffle_partitions=shuffle_parts(args.sf_dir, cpus),
        extra_conf=bench_session_conf(args.sf_dir, cpus),
    )
    specs = all_specs()
    for name in args.queries:
        s = specs[name]
        gc.collect()
        spark.sparkContext._jvm.System.gc()  # drive ContextCleaner (bench.py note)
        s.fn(spark, args.sf_dir).toArrow()  # warm
        times = []
        for _ in range(args.runs):
            gc.collect()
            t0 = time.perf_counter()
            n = s.fn(spark, args.sf_dir).toArrow().num_rows
            times.append(time.perf_counter() - t0)
        print(f"{name}: {min(times):.3f}s ({n} rows) all={[round(x,2) for x in times]}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from sqlrs_spark.registry import all_specs
    from sqlrs_spark.session import build_spark

    # Scale-aware input split size: target ≥2 splits per core on the largest
    # table so every core scans, clamped to [4 MiB, 128 MiB].  At cluster
    # scale (TB+ inputs) the formula saturates at Spark's 128 MiB default —
    # this only kicks in when the data is small relative to the core count.
    # The 4 MiB floor matters at toy SFs: below a few MB per task the
    # per-task scheduling overhead dominates the scan itself (measured ~25%
    # of total bench wall at sf0.1 with a 1 MiB floor).
    def table_bytes(entry: str) -> int:
        # a "table" is either a single parquet file or a directory of part
        # files (the layout every real cluster dataset has) — getsize on a
        # directory returns the dirent size, not the data size
        path = os.path.join(sf_dir, entry)
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
            )
        return os.path.getsize(path)

    biggest = max((table_bytes(f) for f in os.listdir(sf_dir)), default=0)
    mpb = min(max(biggest // (2 * cpus), 4 << 20), 128 << 20)
    spark = build_spark(
        "sqlrs_spark_bench",
        cores=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(mpb),
            "spark.sql.files.openCostInBytes": str(256 << 10),
        },
    )
    specs = [s for s in all_specs().values() if s.bench]

    # Protocol: one untimed warm run per query (JIT + codegen + parquet
    # footer cache), then the timed run. This measures steady-state engine
    # throughput — the number that scales to a long-lived cluster — rather
    # than single-process JVM warmup, which is a fixed cost amortized over
    # a session's lifetime.
    # Best-of-2 timed runs damp local-machine noise (GC pauses, other
    # processes) without hiding real cost — both runs execute the full plan.
    timings: dict[str, float] = {}
    for s in specs:
        s.fn(spark, sf_dir).collect()  # warm
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(s.fn(spark, sf_dir).collect())
            best = min(best, time.perf_counter() - t0)
        timings[s.name] = round(best, 4)
        print(f"# {s.name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""10x-scale benchmark (VERDICT r1 #4): the tracked perf artifact.

Builds (or reuses) a 10x key-shifted replica of sf0.1 (~sf1) as a
directory of part files per table — the layout every real cluster
dataset has — then times the bench query set on it in BOTH engines on
identical bytes: Spark via bench.bench_spark, DuckDB by running each
spec's oracle SQL.  Emits one JSON line and writes BENCH10X_r{N}.json.

Key shifting keeps join fan-out identical to the base data (replica i
adds i*STRIDE to every join key, so each replica joins only within
itself); nation/region are fixed-cardinality dimensions and are copied
once, preserving TPC-H's dim/fact ratios.  Text/embedding payloads
replicate as-is: dedup/ANN queries then measure the same shuffle and
candidate-generation cost per byte as the base corpus.

Usage: python tools/bench10x.py [--round N] [--dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICAS = 10
STRIDE = 10**9
SRC = "/root/testdata/sf0.1"

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["nation", "region"]


def build_replica(spark, dst: str) -> None:
    from pyspark.sql import functions as F

    done_marker = os.path.join(dst, "_REPLICA_OK")
    if os.path.exists(done_marker):
        print(f"# reusing replica at {dst}", file=sys.stderr)
        return
    rep = spark.range(REPLICAS).select(F.col("id").alias("__r"))
    for t, cols in SHIFT_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet").crossJoin(F.broadcast(rep))
        for c in cols:
            df = df.withColumn(c, F.col(c) + F.col("__r") * STRIDE)
        # 16 part files per table: a real multi-file directory without
        # drowning a 175 MB corpus in tiny files
        df.drop("__r").repartition(16).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"# built {t} x{REPLICAS}", file=sys.stderr)
    for t in COPY_ONCE:
        spark.read.parquet(f"{SRC}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    open(done_marker, "w").write("ok\n")


def bench_duckdb(specs, dst: str) -> dict[str, float]:
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 4}")
    for t in list(SHIFT_COLS) + COPY_ONCE:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{dst}/{t}.parquet/*.parquet'"
        )
    timings: dict[str, float] = {}
    for s in specs:
        if not s.oracle:
            continue
        con.execute(s.oracle).fetchall()  # warm (I/O cache, plan)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(s.oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[s.name] = round(best, 4)
        print(f"# duckdb {s.name}: {best:.3f}s", file=sys.stderr)
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--dir", default="/tmp/sqlrs_replica10x")
    args = ap.parse_args()

    from bench import bench_spark
    from sqlrs_spark.session import build_spark

    builder = build_spark("sqlrs_replica_build")
    build_replica(builder, args.dir)
    builder.stop()

    spark, specs, spark_t = bench_spark(args.dir, app="sqlrs_spark_bench10x")
    spark.stop()
    duck_t = bench_duckdb(specs, args.dir)

    common = [n for n in spark_t if n in duck_t]
    result = {
        "metric": "bench10x_total",
        "value": round(sum(spark_t.values()), 4),
        "unit": "sec",
        "queries": spark_t,
        "duckdb_total": round(sum(duck_t.values()), 4),
        "duckdb_queries": duck_t,
        "ratio_total": round(
            sum(spark_t[n] for n in common) / max(sum(duck_t[n] for n in common), 1e-9),
            3,
        ),
        "ratio_queries": {
            n: round(spark_t[n] / max(duck_t[n], 1e-9), 2) for n in common
        },
        "sf": "1.0 (10x key-shifted sf0.1, multi-file layout)",
    }
    line = json.dumps(result)
    print(line)
    out = os.path.join(REPO, f"BENCH10X_r{args.round:02d}.json")
    with open(out, "w") as f:
        f.write(json.dumps(result, indent=2) + "\n")
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Parquet star-schema sources (driver testdata, TESTDATA.md).

At 100 TB these would be partitioned/bucketed external tables; the read
path here is a plain `spark.read.parquet` so Catalyst's datasource V2
pushdown (filters + column pruning + partition pruning) applies untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
# region/nation are fixed-size in TPC-H; supplier/part/customer grow with SF
# but stay several orders of magnitude below the fact tables.
BROADCAST_SAFE = ("region", "nation")

#: path -> (dir/file mtime_ns, total row groups, total rows).  File-layout
#: METADATA only (the same thing Spark's own InMemoryFileIndex caches per
#: session) — never query results, so reruns still compute from parquet.
_SCAN_UNITS_CACHE: dict[str, tuple[int, int, int]] = {}


def _scan_units(path: str) -> tuple[int, int]:
    """(splittable units, rows) of a parquet table: the number of row
    groups across part files — the finest granularity Spark can assign to
    independent scan tasks (parquet is row-group-splittable, never
    within a row group)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = [
            os.path.join(root, f)
            for root, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]
        stamp = os.stat(path).st_mtime_ns
    else:
        files = [path]
        stamp = os.stat(path).st_mtime_ns
    hit = _SCAN_UNITS_CACHE.get(path)
    if hit and hit[0] == stamp:
        return hit[1], hit[2]
    units = rows = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        units += md.num_row_groups
        rows += md.num_rows
    _SCAN_UNITS_CACHE[path] = (stamp, units, rows)
    return units, rows


def register_parallelized(spark: SparkSession, sf_dir: str, name: str) -> None:
    """Re-register view ``name`` with the unsplittable-input repartition —
    the optimization guide's §2.5 remedy ("one huge unsplittable file …
    repartition immediately after the read"), OPT-IN per consumer.

    Parquet scans parallelize at row-group granularity, and the small-SF
    testdata ships every table as ONE file with ONE row group — so every
    pre-exchange stage of every query runs on a single core no matter the
    session's core count.  Whether that matters is a per-CONSUMER
    question the optimizer cannot answer (guide §8: use what you know
    that it does not): measured same-session interleaved at sf0.1/32
    cores, the md5-per-gram explode pipeline (p33) wins ~2x
    (off {3.35, 2.76, 2.88, 2.62} s vs on {1.90, 1.41, 1.34, 1.42} s)
    because its per-row compute is ~200 md5+conv calls per document,
    while every cheap-per-row consumer LOSES the cost of the extra
    exchange: q01 0.78→1.19, q05 0.97→1.44, t01 0.93→1.52,
    p01 0.28→0.51, p06 0.74→0.91, p38 1.48→1.89, p20 1.07→1.39 (measured
    before a blanket version of this was rejected).  Hence: a consumer
    that knows its per-row cost is heavyweight calls this AFTER
    register_views; everyone else keeps the plain scan.

    Scale honesty: the trigger is the MEASURED layout — row groups <
    session parallelism — never a scale factor, so on any real cluster
    dataset (thousands of row groups) or the sharded bench replicas this
    is a no-op; the row floor keeps toy fixtures (sf0.001/0.01
    correctness runs, degenerate-table fixtures) out.  The round-robin
    repartition carries only the columns Catalyst keeps below it
    (pruning and filter pushdown both pass through a Repartition node —
    plans/r09/p33_span_scrub_after.txt).  Disable with
    SQLRS_SCAN_PARALLELIZE=0.
    """
    if os.environ.get("SQLRS_SCAN_PARALLELIZE", "1") == "0":
        return
    path = f"{sf_dir}/{name}.parquet"
    df = load_table(spark, sf_dir, name)
    try:
        par = spark.sparkContext.defaultParallelism
        units, rows = _scan_units(path)
    except Exception:  # noqa: BLE001 — layout probing must never break a read
        return
    if units >= par or rows < 32 * par:
        return
    df.repartition(par).createOrReplaceTempView(name)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.ts has shipped as both TIMESTAMP(NANOS) (round 1) and naive
        # timestamp[us] (current testdata).  NANOS is rejected by Spark's
        # vectorized reader, so keep the nanos-as-long fallback: if the file
        # is NANOS the column surfaces as bigint and gets truncated to
        # micros (the same truncation DuckDB applies); a micros file reads
        # straight through as TIMESTAMP_NTZ and the branch is a no-op.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each parquet table as a temp view named by table name."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

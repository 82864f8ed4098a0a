"""Parquet star-schema sources (driver testdata, TESTDATA.md).

At 100 TB these would be partitioned/bucketed external tables; the read
path here is a plain `spark.read.parquet` so Catalyst's datasource V2
pushdown (filters + column pruning + partition pruning) applies untouched.
"""

from __future__ import annotations

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as both TIMESTAMP(NANOS) (round 1) and naive
        # timestamp[us] (current testdata).  NANOS is rejected by Spark's
        # vectorized reader, so keep the nanos-as-long fallback: if the file
        # is NANOS the column surfaces as bigint and gets truncated to
        # micros (the same truncation DuckDB applies); a micros file reads
        # straight through as TIMESTAMP_NTZ and the branch is a no-op.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each parquet table as a temp view named by table name."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

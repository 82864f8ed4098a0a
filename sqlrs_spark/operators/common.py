"""Shared helpers for operator implementations."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlrs_spark.session import configure_runtime
from sqlrs_spark.sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, sf_dir, name)


def dec2(c: str | Column) -> Column:
    """Money column → exact DECIMAL(18,2).

    The synthetic money columns are exact 2-decimal doubles; decimal
    aggregation is associative and overflow-free at any partitioning, so
    results are bit-identical regardless of Spark's partial-agg order (and
    identical to the DuckDB oracle's `x::DECIMAL(18,2)` path). At 100 TB
    this is also the correct type: double sums drift, decimals don't.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def as_double(c: Column) -> Column:
    return c.cast("double")


def epoch_us(c: str | Column) -> Column:
    """Timestamp → epoch microseconds (BIGINT), timezone-proof.

    The testdata parquet stores naive `timestamp[us]`, which Spark 4 reads
    as TIMESTAMP_NTZ while `unix_micros` requires TIMESTAMP_LTZ.  With the
    session pinned to UTC (session.py) the cast is value-preserving for
    NTZ and a no-op if a future regeneration ships tz-aware timestamps —
    either way matching DuckDB's `epoch_us` on the same file.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp_ltz"))

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

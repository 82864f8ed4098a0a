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


def cents(c: str | Column) -> Column:
    """Money column (exact 2-decimal double) → exact BIGINT cents.

    FLOOR(x*100 + 0.5) is bit-identical across engines (double->int CAST
    is not: Spark truncates, DuckDB rounds half-even), and the double's
    representation error (~1e-9) is far below the 0.5 margin.  Long-typed
    money lets partial aggregates run as plain integer adds — measured 5x
    faster than DECIMAL(18,2) accumulation at the 1000x replica (q01) —
    and halves the shuffle width when revenue rides an exchange as one
    BIGINT instead of two decimals (q03/q05/q22/q28).  Same exactness and
    partitioning-invariance as dec2; the scale factor is explicit at the
    final divide.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col * 100 + F.lit(0.5)).cast("bigint")


def cents_sql(col: str) -> str:
    """DuckDB oracle twin of :func:`cents`."""
    return f"CAST(FLOOR({col} * 100 + 0.5) AS BIGINT)"


def rev_cents() -> Column:
    """Revenue l_extendedprice*(1-l_discount) in exact 1e-4-dollar units:
    price_cents * (100 - discount_cents).  Per-row ≤ ~1e9, so BIGINT sums
    are overflow-safe past SF100; divide by 10000.0 at the end."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))


REV_CENTS_SQL = (
    "(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
    " * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)))"
)

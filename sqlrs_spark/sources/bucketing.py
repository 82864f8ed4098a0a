"""Bucketed-table write/read path — co-located fact-fact joins at scale.

The reference is single-node and has no partitioning concept (SURVEY
§4.2); at 100 TB the dominant cost of orders⋈lineitem-shaped joins is the
shuffle of both fact tables.  Bucketing both sides on the join key at
write time makes that join shuffle-free forever after: Spark's scan
reports HashPartitioning(key, n) and Catalyst elides both Exchanges.

Usage (ETL side, once):
    write_bucketed(orders_df,   "orders_b",   "o_orderkey", 64)
    write_bucketed(lineitem_df, "lineitem_b", "l_orderkey", 64)
Query side:
    spark.table("orders_b").join(spark.table("lineitem_b"),
                                 on=[...])   # no Exchange on either side

Bucket-count guidance: buckets × target-file-size ≈ table size; at 100 TB
with 256 MB files that is O(400k) buckets — pick a power of two so future
2× growth splits evenly, and keep the SAME count on both join sides
(mismatched counts force a shuffle of the smaller side).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins (the scan satisfies both the distribution and the
    ordering requirement).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on
) -> bool:
    """True when joining the two bucketed tables adds no Exchange."""
    plan = (
        spark.table(left_table)
        .join(spark.table(right_table), on=on)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return "Exchange" not in plan


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    source: str,
    key: str,
    buckets: int = 32,
    sort_by: str | None = None,
) -> str:
    """Materialize (once per dataset) a bucketed copy of one testdata
    table; returns the managed table name.

    Table names are versioned by a digest of (sf_dir, source, key,
    buckets) so different datasets / layouts never collide in the shared
    warehouse, and an existing table is REUSED: real deployments bucket
    once at ingest and amortize the layout over every subsequent join —
    exactly what the reuse models (and what the bucketed bench variant
    measures: the recurring query cost, not the one-time ETL).
    """
    import hashlib

    from sqlrs_spark.sources.tables import load_table

    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{source}|{key}|{buckets}|{sort_by}".encode()
    ).hexdigest()[:10]
    table = f"{source}_b_{tag}"
    if not spark.catalog.tableExists(table):
        # a PREVIOUS session may have left the managed location behind
        # (bucket metadata lives in the catalog, not the files, so the
        # stale directory cannot be re-adopted — clear it and rewrite)
        import shutil
        from urllib.parse import urlparse

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        wh_path = urlparse(warehouse).path or warehouse
        shutil.rmtree(os.path.join(wh_path, table), ignore_errors=True)
        write_bucketed(
            load_table(spark, sf_dir, source), table, key, buckets, sort_by=sort_by
        )
    return table


def ensure_bucketed_facts(
    spark: SparkSession, sf_dir: str, buckets: int = 32
) -> tuple[str, str]:
    """Bucketed orders/lineitem co-bucketed on the order key — the ETL
    half of the zero-shuffle fact-fact join (same count on both sides;
    mismatched counts force a shuffle of the smaller side)."""
    return (
        ensure_bucketed(spark, sf_dir, "orders", "o_orderkey", buckets),
        ensure_bucketed(spark, sf_dir, "lineitem", "l_orderkey", buckets),
    )

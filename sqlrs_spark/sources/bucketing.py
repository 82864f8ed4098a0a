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

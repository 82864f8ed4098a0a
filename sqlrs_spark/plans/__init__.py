from sqlrs_spark.plans.checks import (
    count_nodes,
    explain_str,
    has_broadcast_join,
    has_partial_agg,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "count_nodes",
    "explain_str",
    "has_broadcast_join",
    "has_partial_agg",
    "pushed_filters",
    "read_schema_columns",
]

"""Physical-plan inspection helpers.

The reference verifies its optimizer with golden plan-shape tests
(tests/planner/*.planner.sql, SURVEY §5 layer 2). The Spark equivalent is
asserting properties of the Catalyst physical plan: filters reached the
parquet scan, projection was pruned to the read schema, small dimensions
broadcast, aggregates have a map-side partial phase. These are the
properties that decide whether a plan survives a 100× scale-up.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def count_nodes(df: DataFrame, node: str) -> int:
    """Occurrences of a physical node in the plan, counted once per node.

    ``formatted`` explain prints every operator twice (tree line + the
    ``(n) NodeName`` detail header) — counting raw substrings double-counts,
    so count the numbered detail headers only.
    """
    return len(re.findall(rf"\(\d+\) {re.escape(node)}\b", explain_str(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def has_partial_agg(df: DataFrame) -> bool:
    s = explain_str(df)
    return "partial_" in s or "HashAggregate" in s and "Partial" in s

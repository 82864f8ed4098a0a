"""DuckDB-oracle comparison utilities, mirroring the driver's t2 check:
row-count + schema + order-insensitive value comparison."""

from __future__ import annotations

import datetime
import decimal
import math

from sqlrs_spark.sources.tables import TABLES


def register_duck_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def rows_multiset(rows, colnames):
    """Order-insensitive multiset of rows, columns sorted by name."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = sorted(
        tuple(str(_norm(r[i])) for i in order) for r in rows
    )
    return out


def compare(spark_df, duck_con, oracle_sql: str):
    """Return (ok, message) comparing a Spark DataFrame against DuckDB SQL."""
    sp_rows = spark_df.collect()
    sp_cols = spark_df.columns
    # Fetch via Arrow, not fetchall(): duckdb's fetchall() renders HUGEINT
    # (the widened type of SUM(BIGINT)) as a plain Python int equal to
    # Spark's bigint, silently masking SUM-widening oracle bugs that the
    # driver's Arrow-based value hash catches (v10 regression, round 1).
    du_tbl = duck_con.execute(oracle_sql).arrow()
    du_cols = du_tbl.column_names
    du_py_cols = [c.to_pylist() for c in du_tbl.columns]
    du_rows = list(zip(*du_py_cols)) if du_py_cols else []

    if sorted(sp_cols) != sorted(du_cols):
        return False, f"column mismatch: spark={sorted(sp_cols)} duck={sorted(du_cols)}"
    if len(sp_rows) != len(du_rows):
        return False, f"row count mismatch: spark={len(sp_rows)} duck={len(du_rows)}"
    sp_set = rows_multiset([tuple(r) for r in sp_rows], sp_cols)
    du_set = rows_multiset(du_rows, du_cols)
    if sp_set != du_set:
        diffs = [
            (a, b) for a, b in zip(sp_set, du_set) if a != b
        ][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"

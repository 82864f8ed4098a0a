"""sqllogictest-style golden-file runner over the Session SQL frontend.

The reference's primary test harness is sqllogictest (SURVEY §5):
``tests/slt/*.slt`` files run through both engine generations
(tests/sqllogictest/src/lib.rs:33-73), with batches rendered to
whitespace-joined lines (src/util/mod.rs ``record_batch_to_string``) and
diffed against golden output.  This module reproduces that harness for the
Spark engine: parse ``.slt`` files, execute each record through
:class:`sqlrs_spark.session.Session`, and compare rendered rows.

Format supported (the subset the reference corpus uses):

- ``statement ok`` / ``statement error`` followed by one-or-more SQL
  statements (blocks may contain several ``;``-separated statements —
  client_context.rs:35-52 loops over parsed statements).
- ``query <types> [rowsort|valuesort]`` followed by SQL, ``----``, and
  expected lines until a blank line.  The ``<types>`` column-type string is
  accepted but not enforced (the reference runner ignores it too for
  comparison purposes; duckdb arbitration covers types in our oracle layer).
- Conditional directives ``skipif <label>`` / ``onlyif <label>`` on the
  line before a record (tests/slt/aggregation.slt:1-2 uses engine labels).
- ``#`` comments and blank-line record separators.

Rendering parity (record_batch_to_string + slt conventions):
NULL → ``NULL``, empty string → ``(empty)``, booleans → ``true``/``false``,
floats trimmed of trailing zeros, dates ISO — matching the reference's
golden files.  Because Spark's row order is nondeterministic where the
reference's volcano engine was deterministic (SURVEY §4.2), files authored
for this engine use ``rowsort`` on every query without ORDER BY.
"""

from __future__ import annotations

import datetime as _dt
import math
import re
from dataclasses import dataclass, field

from sqlrs_spark.session import Session

__all__ = ["SltRecord", "SltError", "parse_slt", "run_slt_file", "run_slt_text"]


class SltError(AssertionError):
    """A record's actual output did not match its golden output."""


@dataclass
class SltRecord:
    kind: str  # "statement_ok" | "statement_error" | "query"
    sql: str
    line: int
    expected: list[str] = field(default_factory=list)
    sort_mode: str = "nosort"  # nosort | rowsort | valuesort
    skipif: set[str] = field(default_factory=set)
    onlyif: set[str] = field(default_factory=set)


def parse_slt(text: str) -> list[SltRecord]:
    records: list[SltRecord] = []
    lines = text.splitlines()
    i = 0
    skipif: set[str] = set()
    onlyif: set[str] = set()
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        m = re.match(r"^(skipif|onlyif)\s+(\S+)$", line)
        if m:
            (skipif if m.group(1) == "skipif" else onlyif).add(m.group(2))
            i += 1
            continue
        if line.startswith("statement"):
            kind = "statement_error" if "error" in line else "statement_ok"
            start = i + 1
            sql_lines = []
            i += 1
            while i < len(lines) and lines[i].strip() and not lines[i].startswith("#"):
                sql_lines.append(lines[i])
                i += 1
            records.append(
                SltRecord(
                    kind=kind,
                    sql="\n".join(sql_lines).strip(),
                    line=start,
                    skipif=skipif,
                    onlyif=onlyif,
                )
            )
            skipif, onlyif = set(), set()
            continue
        if line.startswith("query"):
            parts = line.split()
            sort_mode = parts[2] if len(parts) > 2 else "nosort"
            start = i + 1
            sql_lines = []
            i += 1
            while i < len(lines) and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            i += 1  # skip ----
            expected = []
            while i < len(lines) and lines[i].strip():
                expected.append(lines[i].rstrip("\n"))
                i += 1
            records.append(
                SltRecord(
                    kind="query",
                    sql="\n".join(sql_lines).strip(),
                    line=start,
                    expected=expected,
                    sort_mode=sort_mode,
                    skipif=skipif,
                    onlyif=onlyif,
                )
            )
            skipif, onlyif = set(), set()
            continue
        raise ValueError(f"unparseable slt line {i + 1}: {line!r}")
    return records


def render_value(v, dtype: str = "") -> str:
    """One cell → slt string (record_batch_to_string conventions)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if dtype == "float":
            # FloatType surfaces as widened Python float (5.1 → 5.099999…);
            # display at float32 precision like the reference's arrow Float32
            v = float(f"{v:.7g}")
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (_dt.date, _dt.datetime)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    s = str(v)
    return s if s else "(empty)"


def render_rows(rows, dtypes: list[str] | None = None) -> list[str]:
    dtypes = dtypes or []
    return [
        " ".join(
            render_value(v, dtypes[i] if i < len(dtypes) else "")
            for i, v in enumerate(row)
        )
        for row in rows
    ]


def _norm(line: str) -> str:
    return re.sub(r"\s+", " ", line.strip())


def run_slt_text(
    session: Session, text: str, labels: set[str] | None = None, name: str = "<slt>"
) -> int:
    """Run slt records; raise :class:`SltError` on the first mismatch.

    ``labels`` drive skipif/onlyif: a record is skipped when any skipif
    label matches or when it has onlyif labels none of which match.
    Returns the number of executed (non-skipped) records.
    """
    labels = labels or set()
    ran = 0
    for rec in parse_slt(text):
        if rec.skipif & labels:
            continue
        if rec.onlyif and not (rec.onlyif & labels):
            continue
        ran += 1
        where = f"{name}:{rec.line}"
        if rec.kind == "statement_ok":
            try:
                df = session.sql(rec.sql)
                if df is not None:
                    df.collect()  # force execution — Spark is lazy
            except Exception as e:  # pragma: no cover - failure path
                raise SltError(f"{where}: statement failed: {e}\nSQL: {rec.sql}") from e
        elif rec.kind == "statement_error":
            try:
                df = session.sql(rec.sql)
                if df is not None:
                    df.collect()
            except Exception:
                continue
            raise SltError(f"{where}: statement expected to error\nSQL: {rec.sql}")
        else:
            try:
                df = session.sql(rec.sql)
                rows = df.collect()
            except Exception as e:
                raise SltError(f"{where}: query failed: {e}\nSQL: {rec.sql}") from e
            actual = [_norm(r) for r in render_rows(rows, [t for _, t in df.dtypes])]
            expected = [_norm(r) for r in rec.expected]
            if rec.sort_mode == "rowsort":
                actual, expected = sorted(actual), sorted(expected)
            elif rec.sort_mode == "valuesort":
                actual = sorted(v for r in actual for v in r.split(" "))
                expected = sorted(v for r in expected for v in r.split(" "))
            if actual != expected:
                raise SltError(
                    f"{where}: mismatch\nSQL: {rec.sql}\n"
                    f"expected:\n  " + "\n  ".join(expected) + "\n"
                    "actual:\n  " + "\n  ".join(actual)
                )
    return ran


def run_slt_file(session: Session, path: str, labels: set[str] | None = None) -> int:
    with open(path) as f:
        text = f.read()
    return run_slt_text(session, text, labels=labels, name=path)

"""Interactive REPL over the Session frontend — parity with the reference's
CLI (src/cli.rs): `\\load csv name path`, `\\dt`, `\\explain <sql>`,
per-statement wall-clock timing (cli.rs:40-44), NULL rendering.

Run: python -m sqlrs_spark.cli [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
import time

from sqlrs_spark.session import Session, build_spark
from sqlrs_spark.sources.tables import register_views

PROMPT = "sqlrs> "


def render(df, max_rows: int = 40) -> str:
    """Render a DataFrame like the reference's record_batch_to_string
    (NULL printed literally, left-aligned columns)."""
    rows = df.take(max_rows + 1)
    truncated = len(rows) > max_rows
    rows = rows[:max_rows]
    cols = df.columns
    cells = [[("NULL" if v is None else str(v)) for v in r] for r in rows]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    lines = [
        " | ".join(c.ljust(w) for c, w in zip(cols, widths)),
        "-+-".join("-" * w for w in widths),
    ]
    lines += [" | ".join(v.ljust(w) for v, w in zip(row, widths)) for row in cells]
    if truncated:
        lines.append(f"... (showing first {max_rows} rows)")
    return "\n".join(lines)


def run_statement(session: Session, line: str) -> str:
    line = line.strip().rstrip(";")
    if not line:
        return ""
    if line.startswith("\\"):
        parts = line.split()
        cmd = parts[0]
        if cmd == "\\load" and len(parts) == 4 and parts[1] == "csv":
            session.load_csv(parts[2], parts[3])
            return f"loaded table {parts[2]} from {parts[3]}"
        if cmd == "\\dt":
            return render(session.sql("show tables"))
        if cmd == "\\explain":
            return render(session.sql("explain " + " ".join(parts[1:])), max_rows=200)
        if cmd in ("\\q", "\\quit"):
            raise EOFError
        return f"unknown meta-command: {cmd} (try \\load csv <name> <path>, \\dt, \\explain <sql>, \\q)"
    return render(session.sql(line))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="sqlrs_spark REPL")
    ap.add_argument("--sf-dir", default=None, help="register testdata views from this dir")
    ap.add_argument("-c", "--command", default=None, help="run one statement and exit")
    args = ap.parse_args(argv)

    spark = build_spark("sqlrs_spark_cli")
    session = Session(spark)
    if args.sf_dir:
        register_views(spark, args.sf_dir)
        print(f"registered testdata views from {args.sf_dir}")

    if args.command is not None:
        t0 = time.perf_counter()
        out = run_statement(session, args.command)
        print(out)
        print(f"time consumed: {time.perf_counter() - t0:.3f}s")
        return

    print("sqlrs_spark REPL — \\load csv <name> <path>, \\dt, \\explain <sql>, \\q")
    while True:
        try:
            line = input(PROMPT)
        except (EOFError, KeyboardInterrupt):
            print()
            break
        try:
            t0 = time.perf_counter()
            out = run_statement(session, line)
            if out:
                print(out)
            print(f"time consumed: {time.perf_counter() - t0:.3f}s")
        except EOFError:
            break
        except Exception as e:  # keep the REPL alive on query errors
            msg = str(e).splitlines()
            print(f"error: {msg[0] if msg else e}", file=sys.stderr)


if __name__ == "__main__":
    main()

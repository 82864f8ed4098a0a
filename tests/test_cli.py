"""REPL smoke test — the reference drives its CLI interactively
(src/cli.rs:119-167); here the same surface runs through run_statement
in-process (a subprocess REPL would pay a fresh JVM per test).

Covers: \\load csv, \\dt, SQL with NULL rendering, \\explain, timing-free
meta errors, and \\q termination.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from sqlrs_spark.cli import render, run_statement
from sqlrs_spark.session import Session


@pytest.fixture(scope="module")
def session(spark):
    return Session(spark)


@pytest.fixture(scope="module")
def csv_path():
    path = os.path.join(tempfile.mkdtemp(prefix="cli_csv_"), "people.csv")
    with open(path, "w") as f:
        f.write("id,name\n1,ada\n2,\n")
    return path


def test_load_dt_select_roundtrip(session, csv_path):
    out = run_statement(session, f"\\load csv people {csv_path}")
    assert "loaded table people" in out
    assert "people" in run_statement(session, "\\dt")
    got = run_statement(session, "select id, name from people order by id")
    # empty CSV field renders as the literal NULL, like the reference
    assert "ada" in got and "NULL" in got


def test_explain_renders_plan(session, csv_path):
    run_statement(session, f"\\load csv people {csv_path}")
    out = run_statement(session, "\\explain select id from people where id > 1")
    assert "physical" in out.lower() or "plan" in out.lower()


def test_unknown_meta_and_quit(session):
    assert "unknown meta-command" in run_statement(session, "\\nope")
    with pytest.raises(EOFError):
        run_statement(session, "\\q")


def test_render_truncates(spark):
    df = spark.range(0, 50).toDF("n")
    out = render(df, max_rows=10)
    assert "showing first 10 rows" in out

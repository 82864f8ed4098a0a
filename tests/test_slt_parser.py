"""Unit tests for the sqllogictest parser/renderer (sqlrs_spark/slt.py) —
no SparkSession needed, so these pin the harness itself cheaply."""

from __future__ import annotations

import datetime

from sqlrs_spark.slt import parse_slt, render_value


def test_parse_statement_and_query():
    text = """
# comment
statement ok
create table t(a int);
insert into t values (1);

query I rowsort
select a from t
----
1

statement error
select broken
"""
    recs = parse_slt(text)
    assert [r.kind for r in recs] == ["statement_ok", "query", "statement_error"]
    assert "create table" in recs[0].sql and "insert into" in recs[0].sql
    assert recs[1].sort_mode == "rowsort"
    assert recs[1].expected == ["1"]
    assert recs[2].kind == "statement_error"


def test_parse_directives():
    text = """
skipif spark
statement error
select 1;

onlyif spark
query I
select 2
----
2
"""
    recs = parse_slt(text)
    assert recs[0].skipif == {"spark"} and not recs[0].onlyif
    assert recs[1].onlyif == {"spark"} and not recs[1].skipif


def test_parse_empty_expected():
    recs = parse_slt("query I\nselect 1 where false\n----\n")
    assert recs[0].expected == []


def test_render_null_empty_bool():
    assert render_value(None) == "NULL"
    assert render_value("") == "(empty)"
    assert render_value(True) == "true"
    assert render_value(False) == "false"


def test_render_floats():
    assert render_value(2.5) == "2.5"
    assert render_value(4.0) == "4"
    assert render_value(float("nan")) == "NaN"
    # float32 noise displayed at 7 significant digits
    assert render_value(5.099999904632568, dtype="float") == "5.1"


def test_render_dates():
    assert render_value(datetime.date(2021, 1, 2)) == "2021-01-02"
    assert (
        render_value(datetime.datetime(2021, 1, 2, 3, 4, 5))
        == "2021-01-02 03:04:05"
    )

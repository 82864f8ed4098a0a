"""QUALIFY clause frontend tests (session.Session._rewrite_qualify).

The registered x28 pins cross-engine value parity (DuckDB executes the
same text through its native QUALIFY); these pin the rewrite's shape
rules: alias vs inline predicate, trailing ORDER/LIMIT movement, string
literals containing the keyword, and no-op on QUALIFY-free statements.
"""

from __future__ import annotations

import pytest

from sqlrs_spark.session import Session
from sqlrs_spark.sources.tables import register_views


@pytest.fixture(scope="module")
def sess(spark, sf_dir):
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return Session(spark)


def test_qualify_alias_reference(sess):
    rows = sess.sql(
        "SELECT o_custkey, o_orderkey, "
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC,"
        " o_orderkey) AS rn "
        "FROM orders QUALIFY rn = 1 ORDER BY o_custkey LIMIT 20"
    ).collect()
    assert len(rows) == 20
    assert all(r.rn == 1 for r in rows)
    # one row per customer: the window filter kept only the top order
    assert len({r.o_custkey for r in rows}) == 20


def test_qualify_inline_window_function(sess):
    rows = sess.sql(
        "SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey"
        " ORDER BY o_totalprice DESC, o_orderkey) <= 2 "
        "ORDER BY o_custkey, o_totalprice DESC LIMIT 30"
    ).collect()
    assert len(rows) == 30
    per_cust: dict[int, int] = {}
    for r in rows:
        per_cust[r.o_custkey] = per_cust.get(r.o_custkey, 0) + 1
    assert max(per_cust.values()) <= 2


def test_qualify_equivalent_to_manual_subquery(sess, spark):
    via_qualify = sess.sql(
        "SELECT l_orderkey, l_linenumber, "
        "RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC,"
        " l_orderkey, l_linenumber) AS rk "
        "FROM lineitem QUALIFY rk <= 3"
    )
    manual = spark.sql(
        "SELECT * FROM (SELECT l_orderkey, l_linenumber, "
        "RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC,"
        " l_orderkey, l_linenumber) AS rk FROM lineitem) WHERE rk <= 3"
    )
    assert sorted(map(tuple, via_qualify.collect())) == sorted(
        map(tuple, manual.collect())
    )


def test_qualify_keyword_in_literal_untouched(sess):
    rows = sess.sql("SELECT 'does qualify matter' AS s").collect()
    assert rows[0].s == "does qualify matter"


def test_no_qualify_passthrough(sess):
    assert sess._rewrite_qualify("SELECT 1 AS x") == "SELECT 1 AS x"

"""v2 pending-query surface (reference src/main_entry/, VERDICT r1 'missing' #1).

Covers the ClientContext lifecycle the reference implements: prepare →
pending → execute, stale-handle invalidation, multi-statement query(), and
interrupt() as a real Spark job-group cancellation.
"""

from __future__ import annotations

import threading
import time

import pytest

from sqlrs_spark.client_context import (
    _STALE_MSG,
    ClientContext,
    MaterializedQueryResult,
)


@pytest.fixture()
def ctx(spark):
    return ClientContext(spark)


def test_query_materializes_names_types_rows(ctx):
    res = ctx.query("select 1 as a, 'x' as b")
    assert isinstance(res, MaterializedQueryResult)
    assert res.names == ["a", "b"]
    assert res.types == ["int", "string"]
    assert res.rows == [(1, "x")]
    assert len(res) == 1


def test_pending_prepares_without_executing(ctx):
    pending = ctx.pending_query("select 41 + 1 as answer")
    # prepared: plan exists and is analyzed (schema known) pre-execution
    assert pending.dataframe.schema.fieldNames() == ["answer"]
    assert pending.execute().rows == [(42,)]


def test_new_pending_invalidates_old_handle(ctx):
    first = ctx.pending_query("select 1 as x")
    second = ctx.pending_query("select 2 as x")
    with pytest.raises(RuntimeError, match=_STALE_MSG.split()[0]):
        first.execute()
    assert second.execute().rows == [(2,)]


def test_interrupt_invalidates_pending(ctx):
    pending = ctx.pending_query("select 1 as x")
    ctx.interrupt()
    with pytest.raises(RuntimeError, match=_STALE_MSG.split()[0]):
        pending.execute()


def test_multi_statement_returns_last(ctx):
    res = ctx.query(
        "create or replace temp view ctx_t as select * from values (1),(2) as v(n);"
        " select sum(n) as s from ctx_t"
    )
    assert res.rows == [(3,)]


def test_frontend_sugar_flows_through(ctx, tmp_path):
    p = tmp_path / "ctx.csv"
    p.write_text("id,name\n1,ada\n2,lin\n")
    res = ctx.query(f"select name from read_csv('{p}', header=>true) order by name")
    assert res.rows == [("ada",), ("lin",)]


def test_interrupt_cancels_running_job(ctx):
    """interrupt() must kill an in-flight collect via the job group."""
    slow = ctx.pending_query(
        # two fat local cross joins: ~10^8+ rows of work, far beyond the
        # cancellation latency but bounded if cancellation were broken
        "select count(*) as n from (select explode(sequence(1, 10000)) a) x "
        "join (select explode(sequence(1, 10000)) b) y "
        "join (select explode(sequence(1, 50)) c) z"
    )
    errors: list[Exception] = []

    def run():
        try:
            slow.execute()
        except Exception as e:  # cancellation surfaces as a Spark job error
            errors.append(e)

    t = threading.Thread(target=run)
    start = time.monotonic()
    t.start()
    time.sleep(2.0)  # let tasks actually start
    ctx.interrupt()
    t.join(timeout=60)
    elapsed = time.monotonic() - start
    assert not t.is_alive(), "collect survived interrupt()"
    assert errors, "interrupted query should raise, not return"
    assert elapsed < 60


# ---------------------------------------------------------------------------
# prepared statements (prepared_statement_data.rs / query_context.rs)
# ---------------------------------------------------------------------------


def test_prepare_execute_many_positional(ctx):
    ctx.query(
        "create or replace temp view prep_t as "
        "select * from values (1, 'a'), (2, 'b'), (3, 'c') as v(id, tag)"
    )
    stmt = ctx.prepare("select tag from prep_t where id = ? order by tag")
    assert ctx.execute_prepared(stmt, 1).rows == [("a",)]
    assert ctx.execute_prepared(stmt, 3).rows == [("c",)]
    # names/types captured from the analyzed schema
    assert stmt.names == ["tag"]
    assert stmt.types == ["string"]


def test_prepare_execute_many_named(ctx):
    ctx.query(
        "create or replace temp view prep_n as "
        "select * from values (1, 10.0), (2, 20.0), (3, 30.0) as v(id, val)"
    )
    stmt = ctx.prepare(
        "select sum(val) as s from prep_n where id >= :lo and id <= :hi"
    )
    assert ctx.execute_prepared(stmt, lo=1, hi=2).rows == [(30.0,)]
    assert ctx.execute_prepared(stmt, lo=2, hi=3).rows == [(50.0,)]


def test_prepare_parse_error_is_eager(ctx):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="parse"):
        ctx.prepare("selec 1")


def test_prepare_rejects_frontend_commands(ctx):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not preparable"):
        ctx.prepare("show tables")


def test_prepare_binding_is_not_string_splicing(ctx):
    """A quote in a bound string must be a literal value, not SQL."""
    ctx.query(
        "create or replace temp view prep_inj as "
        "select * from values ('x''; drop', 1), ('safe', 2) as v(tag, n)"
    )
    stmt = ctx.prepare("select n from prep_inj where tag = :t")
    assert ctx.execute_prepared(stmt, t="x'; drop").rows == [(1,)]


def test_prepare_applies_frontend_rewrites(ctx, tmp_path):
    p = tmp_path / "prep.csv"
    p.write_text("id,name\n1,ada\n2,lin\n3,tess\n")
    stmt = ctx.prepare(
        f"select name from read_csv('{p}', header=>true) where id > ? order by name"
    )
    assert ctx.execute_prepared(stmt, 1).rows == [("lin",), ("tess",)]


def test_prepare_applies_alias_in_where_retry(ctx):
    """Round-3 review: the prepared path must support the same binder
    quirks sql() retries — alias-in-WHERE resolves only at analysis,
    which for a parameterized statement happens at execute time."""
    ctx.query(
        "create or replace temp view prep_a as "
        "select * from values (1), (2), (3) as v(v1)"
    )
    stmt = ctx.prepare("select v1 + 1 as a from prep_a where a >= ? order by a")
    assert ctx.execute_prepared(stmt, 3).rows == [(3,), (4,)]
    # the rewritten text is kept: the second execute takes the fast path
    assert ctx.execute_prepared(stmt, 4).rows == [(4,)]

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

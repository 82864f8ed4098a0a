"""v2 client session surface: pending queries, materialized results, interrupt.

Mirrors the reference's v2 entry path (``ClientContext::query`` →
``pending_statement_or_prepared_statement`` → ``PendingQueryResult::execute``,
src/main_entry/client_context.rs:34-102, pending_query_result.rs:14-45)
re-expressed on Spark's execution model:

- **prepare** = building the DataFrame: Spark analyzes and optimizes the
  plan eagerly at ``spark.sql(...)`` time, which is exactly the reference's
  ``create_prepared_statement`` (plan + result names + types, without
  running anything).
- **pending → execute** = the deferred action: nothing runs until
  ``PendingQueryResult.execute()`` collects.
- **invalidation**: starting a new pending query closes the previous one;
  executing a stale handle raises the reference's exact error
  (client_context.rs ``is_active_request`` / pending_query_result.rs:35-44).
- **interrupt** (``ClientContext::interrupted`` AtomicBool) maps to Spark's
  real cancellation primitive: every execute runs under a per-context job
  group, and ``interrupt()`` cancels that group on the cluster — not a
  flag checked between operators, but an actual kill of running tasks.

At scale nothing here collects more than the user asked for: execution
stays a single Spark action over the prepared plan, and the
materialization is the same rows a ``Session.sql(...).collect()`` returns.
"""

from __future__ import annotations

import itertools
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from sqlrs_spark.session import Session

_STALE_MSG = "Attempting to execute an unsuccessful or closed pending query result"


@dataclass
class MaterializedQueryResult:
    """names/types/rows, the reference's MaterializedQueryResult
    (query_result.rs: BaseQueryResult{names,types} + collection)."""

    names: list[str]
    types: list[str]
    rows: list[tuple] = field(repr=False)

    def __len__(self) -> int:
        return len(self.rows)


class PendingQueryResult:
    """A prepared-but-unexecuted statement (pending_query_result.rs)."""

    def __init__(self, context: "ClientContext", df: DataFrame, token: int):
        self._context = context
        self._df = df
        self._token = token

    @property
    def dataframe(self) -> DataFrame:
        """The prepared plan — inspectable (explain) without executing."""
        return self._df

    def execute(self) -> MaterializedQueryResult:
        """Run the prepared plan and materialize (execute(), rs:14-33).

        Raises the reference's stale-handle error if a newer query was
        prepared on the context or the context was interrupted since.
        """
        if not self._context._is_active(self._token):
            raise RuntimeError(_STALE_MSG)
        return self._context._run(self._df)


class ClientContext:
    """Per-client v2 session state (client_context.rs:18-32).

    >>> ctx = ClientContext(spark)
    >>> pending = ctx.pending_query("select 1 as x")
    >>> pending.execute().rows
    [(1,)]
    """

    _ids = itertools.count()

    def __init__(self, spark_or_session):
        self.session = (
            spark_or_session
            if isinstance(spark_or_session, Session)
            else Session(spark_or_session)
        )
        self.spark = self.session.spark
        self._group = f"sqlrs-client-{next(self._ids)}"
        self._lock = threading.Lock()
        self._active_token: int | None = None
        self._next_token = itertools.count()

    # -- reference surface ---------------------------------------------------

    def query(self, sql: str) -> MaterializedQueryResult:
        """``ClientContext::query``: run statements in order, return the
        last statement's materialized result (client_context.rs:34-56)."""
        return self.pending_query(sql).execute()

    def pending_query(self, sql: str) -> PendingQueryResult:
        """Prepare a statement; invalidates any prior pending handle
        (initial_cleanup + active_query bookkeeping, rs:69-86)."""
        df = self.session.sql(sql)  # analysis/optimization happens HERE
        with self._lock:
            token = next(self._next_token)
            self._active_token = token
        return PendingQueryResult(self, df, token)

    def prepare(self, sql: str):
        """Prepare a statement for execute-many with parameter binding —
        the ActiveQueryContext.prepared slot (query_context.rs:1-32,
        prepared_statement_data.rs:1-18).  Returns the Session-level
        PreparedStatement; run it through :meth:`execute_prepared` to get
        materialized results under this context's job group."""
        return self.session.prepare(sql)

    def execute_prepared(self, prepared, *args, **params) -> MaterializedQueryResult:
        """Execute a prepared statement with bound parameters and
        materialize, interruptible like any pending query."""
        return self._run(prepared.execute(*args, **params))

    def interrupt(self) -> None:
        """Cancel the running execution (the ``interrupted`` AtomicBool,
        rs:22/107): kills this context's Spark job group cluster-wide and
        invalidates the active pending handle."""
        with self._lock:
            self._active_token = None
        self.spark.sparkContext.cancelJobGroup(self._group)

    # -- internals -----------------------------------------------------------

    def _is_active(self, token: int) -> bool:
        with self._lock:
            return self._active_token == token

    def _run(self, df: DataFrame) -> MaterializedQueryResult:
        sc = self.spark.sparkContext
        sc.setJobGroup(self._group, "sqlrs pending query", interruptOnCancel=True)
        try:
            rows = [tuple(r) for r in df.collect()]
        finally:
            sc.setJobGroup("", "")
        return MaterializedQueryResult(
            names=list(df.columns),
            types=[f.dataType.simpleString() for f in df.schema.fields],
            rows=rows,
        )

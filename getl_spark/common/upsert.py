"""Distributed RDBMS upserts via ``foreachPartition``.

The one place the engine legitimately drops below the DataFrame API
(reference ``getl/common/upsert.py``): JDBC writers can't express
``INSERT … ON CONFLICT``, so each *executor* opens a connection per
partition and streams batched upsert statements. Scale properties:
parallelism = number of partitions (control with
``df.repartition(n)`` before the sink), bounded memory via paging, and
per-batch retry with backoff for transient DB failures.

psycopg2 / mysql-connector are optional deps, imported inside the
partition function so the engine imports cleanly without them.
"""

from __future__ import annotations

import time
from typing import Iterator, List, Optional

from pyspark.sql import DataFrame

PAGE_SIZE = 1000
MAX_TRIES = 10
SLEEP_SECONDS = 60


def _paged(rows: Iterator, size: int) -> Iterator[List[tuple]]:
    page: List[tuple] = []
    for row in rows:
        page.append(tuple(row))
        if len(page) >= size:
            yield page
            page = []
    if page:
        yield page


def _with_retry(fn, max_tries: int = MAX_TRIES, sleep: int = SLEEP_SECONDS):
    for attempt in range(1, max_tries + 1):
        try:
            return fn()
        except Exception:  # noqa: BLE001 - transient DB errors by contract
            if attempt == max_tries:
                raise
            time.sleep(sleep)


def run_upsert_partitions(
    df: DataFrame,
    columns: List[str],
    flush_factory,
    max_tries: int = MAX_TRIES,
    sleep: int = SLEEP_SECONDS,
) -> None:
    """Shared executor-side upsert loop: per partition, build a flush
    callable (``flush_factory() -> flush(page)``), page the rows, and
    retry each page with backoff. The postgres/mysql upserts are this
    loop plus their connector-specific flush; integration tests drive
    the SAME loop against an embedded engine (sqlite) so the
    paging/conflict/retry logic executes real SQL, not mocks."""

    def run_partition(rows: Iterator) -> None:
        flush = flush_factory()
        for page in _paged(rows, PAGE_SIZE):
            _with_retry(lambda: flush(page), max_tries=max_tries, sleep=sleep)

    # DataFrame-API foreachPartition (not .rdd.foreachPartition): same
    # executor-side execution on classic Spark, and it keeps the op
    # available under Spark Connect where .rdd does not exist
    df.select(*columns).foreachPartition(run_partition)


def postgres_upsert_statement(
    table: str,
    columns: List[str],
    conflict_columns: List[str],
    update_columns: Optional[List[str]] = None,
) -> str:
    """The literal ``INSERT … ON CONFLICT (…) DO UPDATE`` string the
    executors send (``VALUES %s`` is psycopg2 ``execute_values``'s
    template slot — the client library expands it to row tuples before
    the statement reaches the server). Exposed as a pure function so
    integration tests can execute the exact string against a real
    UPSERT grammar (sqlite accepts the postgres form verbatim)."""
    update_columns = update_columns or [
        c for c in columns if c not in conflict_columns
    ]
    col_sql = ", ".join(columns)
    conflict_sql = ", ".join(conflict_columns)
    update_sql = ", ".join(f"{c} = EXCLUDED.{c}" for c in update_columns)
    return (
        f"INSERT INTO {table} ({col_sql}) VALUES %s "
        f"ON CONFLICT ({conflict_sql}) DO UPDATE SET {update_sql}"
    )


def mysql_upsert_statement(
    table: str,
    columns: List[str],
    update_columns: Optional[List[str]] = None,
) -> str:
    """The literal ``INSERT … ON DUPLICATE KEY UPDATE`` string the
    executors send (``%s`` placeholders are mysql-connector's
    paramstyle, one per column)."""
    update_columns = update_columns or columns
    col_sql = ", ".join(columns)
    placeholders = ", ".join(["%s"] * len(columns))
    update_sql = ", ".join(f"{c} = VALUES({c})" for c in update_columns)
    return (
        f"INSERT INTO {table} ({col_sql}) VALUES ({placeholders}) "
        f"ON DUPLICATE KEY UPDATE {update_sql}"
    )


def postgres_upsert(
    df: DataFrame,
    conn_url: str,
    user: str,
    password: str,
    table: str,
    columns: List[str],
    conflict_columns: List[str],
    update_columns: Optional[List[str]] = None,
) -> None:
    """``INSERT … ON CONFLICT (…) DO UPDATE`` executed on executors.

    ``update_columns`` defaults to ``columns − conflict_columns``
    (reference ``getl/common/upsert.py:26-27``).
    """
    statement = postgres_upsert_statement(
        table, columns, conflict_columns, update_columns
    )

    def flush_factory():
        import psycopg2
        from psycopg2.extras import execute_values

        def flush(page: List[tuple]) -> None:
            conn = psycopg2.connect(dsn=conn_url, user=user, password=password)
            try:
                with conn.cursor() as cur:
                    execute_values(cur, statement, page, page_size=PAGE_SIZE)
                conn.commit()
            finally:
                conn.close()

        return flush

    run_upsert_partitions(df, columns, flush_factory)


def mysql_upsert(
    df: DataFrame,
    host: str,
    port: int,
    database: str,
    user: str,
    password: str,
    table: str,
    columns: List[str],
    update_columns: Optional[List[str]] = None,
) -> None:
    """``INSERT … ON DUPLICATE KEY UPDATE`` executed on executors."""
    statement = mysql_upsert_statement(table, columns, update_columns)

    def flush_factory():
        import mysql.connector

        def flush(page: List[tuple]) -> None:
            conn = mysql.connector.connect(
                host=host, port=port, database=database, user=user, password=password
            )
            try:
                cur = conn.cursor()
                cur.executemany(statement, page)
                conn.commit()
            finally:
                conn.close()

        return flush

    run_upsert_partitions(df, columns, flush_factory)

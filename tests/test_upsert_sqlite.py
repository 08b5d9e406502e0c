"""Upsert integration against a REAL database engine (sqlite, stdlib):
the shared executor-side loop (run_upsert_partitions — the same code
postgres_upsert / mysql_upsert run) executes genuine
``INSERT … ON CONFLICT … DO UPDATE`` statements with paging, conflict
resolution, and retry, instead of the fake-connection checks in
test_upsert.py."""

from __future__ import annotations

import os
import sqlite3

import pytest

from getl_spark.common.upsert import (
    mysql_upsert_statement,
    postgres_upsert_statement,
    run_upsert_partitions,
)


def _sqlite_flush_factory(db_path: str, statement: str):
    """Executor-side flush against sqlite — same shape as the
    psycopg2/mysql flushes: connect per page, executemany, commit."""

    def factory():
        def flush(page):
            conn = sqlite3.connect(db_path, timeout=30)
            try:
                conn.execute("PRAGMA busy_timeout = 30000")
                conn.executemany(statement, page)
                conn.commit()
            finally:
                conn.close()

        return flush

    return factory


# The LITERAL statement postgres_upsert sends, with only psycopg2's
# client-side execute_values expansion applied (the single `VALUES %s`
# template slot becomes per-row value tuples before any SQL reaches the
# server — `(?, ?, ?)` is that expansion in sqlite's qmark paramstyle).
# sqlite's UPSERT grammar accepts the postgres ON CONFLICT form
# verbatim, so every test below parses AND executes the dialect-exact
# string, not a hand-written lookalike.
UPSERT_SQL = postgres_upsert_statement(
    "target", ["k", "v", "n"], conflict_columns=["k"]
).replace("%s", "(?, ?, ?)")


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "upsert.db")
    conn = sqlite3.connect(path)
    conn.execute("PRAGMA journal_mode = WAL")  # concurrent partition writers
    conn.execute("CREATE TABLE target (k INTEGER PRIMARY KEY, v TEXT, n INTEGER)")
    conn.commit()
    conn.close()
    return path


def _read_all(path):
    conn = sqlite3.connect(path)
    try:
        return sorted(conn.execute("SELECT k, v, n FROM target").fetchall())
    finally:
        conn.close()


def test_upsert_inserts_then_updates_on_conflict(spark, db):
    base = spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(50)], "k INT, v STRING, n INT"
    )
    run_upsert_partitions(base, ["k", "v", "n"], _sqlite_flush_factory(db, UPSERT_SQL))
    assert _read_all(db) == [(i, f"v{i}", 1) for i in range(50)]

    # second wave: 25 conflicting keys (updated), 10 new keys (inserted)
    wave = spark.createDataFrame(
        [(i, f"new{i}", 2) for i in range(25)]
        + [(i, f"v{i}", 1) for i in range(50, 60)],
        "k INT, v STRING, n INT",
    )
    run_upsert_partitions(wave, ["k", "v", "n"], _sqlite_flush_factory(db, UPSERT_SQL))
    rows = _read_all(db)
    assert len(rows) == 60
    assert all(v == f"new{k}" and n == 2 for k, v, n in rows[:25])
    assert all(v == f"v{k}" and n == 1 for k, v, n in rows[25:])


def test_upsert_pages_across_boundary(spark, db):
    """More rows than PAGE_SIZE in one partition -> multiple real
    executemany flushes; every row must land exactly once."""
    n = 2500  # PAGE_SIZE is 1000 -> 3 pages in a single partition
    df = spark.createDataFrame(
        [(i, "x", 0) for i in range(n)], "k INT, v STRING, n INT"
    ).coalesce(1)
    run_upsert_partitions(df, ["k", "v", "n"], _sqlite_flush_factory(db, UPSERT_SQL))
    rows = _read_all(db)
    assert len(rows) == n and rows[0] == (0, "x", 0) and rows[-1] == (n - 1, "x", 0)


def test_upsert_retries_transient_failure(spark, db, tmp_path):
    """First flush attempt per executor fails AFTER starting a real
    transaction — the retry must re-run the page and converge to
    exactly-once results (the page's statements are idempotent
    upserts)."""
    flag_dir = str(tmp_path / "flags")
    os.makedirs(flag_dir, exist_ok=True)

    def factory():
        def flush(page):
            conn = sqlite3.connect(db, timeout=30)
            try:
                conn.execute("PRAGMA busy_timeout = 30000")
                conn.executemany(UPSERT_SQL, page)
                flag = os.path.join(flag_dir, f"pid{os.getpid()}_{page[0][0]}")
                if not os.path.exists(flag):
                    open(flag, "w").close()
                    raise RuntimeError("transient: died before commit")
                conn.commit()
            finally:
                conn.close()

        return flush

    df = spark.createDataFrame(
        [(i, f"v{i}", 7) for i in range(100)], "k INT, v STRING, n INT"
    ).coalesce(2)
    run_upsert_partitions(df, ["k", "v", "n"], factory, sleep=0)
    assert _read_all(db) == [(i, f"v{i}", 7) for i in range(100)]


def test_postgres_statement_literal_form():
    """The generated postgres statement is exactly the documented
    dialect string — a regression pin on the SQL the executors send."""
    assert postgres_upsert_statement("t", ["a", "b", "c"], ["a"]) == (
        "INSERT INTO t (a, b, c) VALUES %s "
        "ON CONFLICT (a) DO UPDATE SET b = EXCLUDED.b, c = EXCLUDED.c"
    )
    # explicit update_columns override
    assert postgres_upsert_statement("t", ["a", "b", "c"], ["a"], ["c"]) == (
        "INSERT INTO t (a, b, c) VALUES %s "
        "ON CONFLICT (a) DO UPDATE SET c = EXCLUDED.c"
    )


def test_mysql_statement_literal_form_and_paramstyle():
    """Pinned golden for the mysql dialect string (no embeddable MySQL
    grammar exists in this container, so the exact string is asserted)
    plus the paramstyle contract: exactly one %s per column, so
    executemany's tuple arity always matches."""
    stmt = mysql_upsert_statement("t", ["a", "b", "c"])
    assert stmt == (
        "INSERT INTO t (a, b, c) VALUES (%s, %s, %s) "
        "ON DUPLICATE KEY UPDATE a = VALUES(a), b = VALUES(b), c = VALUES(c)"
    )
    assert stmt.count("%s") == 3
    assert mysql_upsert_statement("t", ["a", "b"], ["b"]) == (
        "INSERT INTO t (a, b) VALUES (%s, %s) "
        "ON DUPLICATE KEY UPDATE b = VALUES(b)"
    )


def test_postgres_statement_round_trips_through_sqlite_grammar(db):
    """The dialect-exact postgres string (modulo the execute_values
    client-side expansion) is parsed and executed by a real UPSERT
    grammar: insert, then conflict-update, single connection — no
    Spark needed, pure statement-validity check."""
    stmt = postgres_upsert_statement(
        "target", ["k", "v", "n"], conflict_columns=["k"]
    ).replace("%s", "(?, ?, ?)")
    conn = sqlite3.connect(db)
    try:
        conn.executemany(stmt, [(1, "x", 10), (2, "y", 20)])
        conn.executemany(stmt, [(2, "y2", 21), (3, "z", 30)])
        conn.commit()
    finally:
        conn.close()
    assert _read_all(db) == [(1, "x", 10), (2, "y2", 21), (3, "z", 30)]

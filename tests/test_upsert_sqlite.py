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

from getl_spark.common.upsert import run_upsert_partitions


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


UPSERT_SQL = (
    "INSERT INTO target (k, v, n) VALUES (?, ?, ?) "
    "ON CONFLICT (k) DO UPDATE SET v = excluded.v, n = excluded.n"
)


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

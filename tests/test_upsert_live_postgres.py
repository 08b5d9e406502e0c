"""Upsert dialect verification against a LIVE PostgreSQL server.

This container ships the full postgres server toolchain (initdb /
pg_ctl / postgres / psql) but no python driver (psycopg2) and no JDBC
jar — so the full executor loop still integration-tests under sqlite's
UPSERT grammar (test_upsert_sqlite.py), while THESE tests execute the
LITERAL ``postgres_upsert_statement`` string against a real
PostgreSQL 15 instance: its parser, its conflict resolution, its
EXCLUDED semantics. That closes the "dialect never parsed by the real
engine" half of the environment gate; the psycopg2 transport half
remains honestly gated (the ``VALUES %s`` slot is expanded here
exactly the way ``psycopg2.extras.execute_values`` expands it
client-side — per-row literal tuples — before any SQL reaches a
server in production too).

The instance is throwaway: initdb into tmp_path, listen on a unix
socket only (no TCP, no port conflicts), torn down after the module.
Skips cleanly where the server toolchain is absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from getl_spark.common.upsert import postgres_upsert_statement

def _server_user():
    """initdb/postgres refuse to run as root; test environments often
    run pytest as root with a `postgres` system user available. Return
    the runuser wrapper prefix (empty when already unprivileged), or
    None when no way to run the server exists."""
    if os.geteuid() != 0:
        return []
    import pwd

    try:
        pwd.getpwnam("postgres")
    except KeyError:
        return None
    return ["runuser", "-u", "postgres", "--"] if shutil.which("runuser") else None


_TOOLCHAIN = bool(
    shutil.which("initdb") and shutil.which("pg_ctl") and shutil.which("psql")
)
pytestmark = pytest.mark.skipif(
    not _TOOLCHAIN or _server_user() is None,
    reason="postgres server toolchain (or an unprivileged user to run it) absent",
)


@pytest.fixture(scope="module")
def pg():
    """A throwaway single-user postgres cluster on a unix socket,
    running as the `postgres` system user (the server refuses root)."""
    import tempfile

    wrap = _server_user()
    base = tempfile.mkdtemp(prefix="getl_pg_")
    os.chmod(base, 0o755)
    data, sock = os.path.join(base, "data"), os.path.join(base, "sock")
    os.makedirs(sock)
    if wrap:
        shutil.chown(base, user="postgres")
        shutil.chown(sock, user="postgres")
    subprocess.run(
        wrap + ["initdb", "-D", data, "-U", "postgres", "-A", "trust"],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        wrap
        + [
            "pg_ctl", "-D", data, "-w", "-l", os.path.join(base, "log"),
            "-o", f"-c listen_addresses='' -k {sock}",
            "start",
        ],
        check=True,
        capture_output=True,
    )
    try:
        yield sock
    finally:
        subprocess.run(
            wrap + ["pg_ctl", "-D", data, "-m", "immediate", "stop"],
            check=False,
            capture_output=True,
        )
        shutil.rmtree(base, ignore_errors=True)


def _psql(sock: str, sql: str) -> str:
    """Run SQL through psql with ON_ERROR_STOP so a parse error FAILS
    the test instead of printing to stderr."""
    out = subprocess.run(
        [
            "psql", "-h", sock, "-U", "postgres", "-d", "postgres",
            "-v", "ON_ERROR_STOP=1", "-At", "-c", sql,
        ],
        check=True,
        capture_output=True,
        text=True,
    )
    return out.stdout.strip()


def _execute_values_expand(statement: str, page) -> str:
    """psycopg2.extras.execute_values's client-side expansion of the
    single ``VALUES %s`` slot: per-row literal tuples joined by
    commas. Literal adaptation mirrors psycopg2's for the types used
    (int passthrough, text quoted with '' doubling, None -> NULL)."""

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, (int, float)):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    rows = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in page)
    assert statement.count("%s") == 1
    return statement.replace("%s", rows)


def test_postgres_upsert_statement_runs_on_live_postgres(pg):
    """The exact generated string must parse AND resolve conflicts on
    real PostgreSQL: wave 1 inserts, wave 2 hits the PK and updates
    only the update columns via EXCLUDED."""
    _psql(pg, "DROP TABLE IF EXISTS target")
    _psql(pg, "CREATE TABLE target (k INTEGER PRIMARY KEY, v TEXT, n INTEGER)")
    stmt = postgres_upsert_statement(
        "target", ["k", "v", "n"], conflict_columns=["k"]
    )
    wave1 = [(1, "a", 10), (2, "b", 20), (3, "it's", 30)]
    wave2 = [(2, "B2", 22), (3, None, 33), (4, "d", 40)]
    _psql(pg, _execute_values_expand(stmt, wave1))
    _psql(pg, _execute_values_expand(stmt, wave2))
    got = _psql(pg, "SELECT k, coalesce(v, '<null>'), n FROM target ORDER BY k")
    assert got.splitlines() == [
        "1|a|10",
        "2|B2|22",
        "3|<null>|33",
        "4|d|40",
    ]


def test_postgres_upsert_explicit_update_columns_live(pg):
    """update_columns narrows the SET list: columns outside it must
    keep their wave-1 values after a conflicting wave 2 — EXCLUDED
    semantics verified by the real engine, not a lookalike."""
    _psql(pg, "DROP TABLE IF EXISTS narrow")
    _psql(pg, "CREATE TABLE narrow (k INTEGER PRIMARY KEY, v TEXT, n INTEGER)")
    stmt = postgres_upsert_statement(
        "narrow", ["k", "v", "n"], conflict_columns=["k"], update_columns=["n"]
    )
    _psql(pg, _execute_values_expand(stmt, [(1, "keep", 1)]))
    _psql(pg, _execute_values_expand(stmt, [(1, "clobber?", 99)]))
    assert _psql(pg, "SELECT k, v, n FROM narrow") == "1|keep|99"


def test_postgres_upsert_composite_conflict_live(pg):
    """Composite conflict targets: the (a, b) pair is the identity,
    the measure column updates."""
    _psql(pg, "DROP TABLE IF EXISTS comp")
    _psql(
        pg,
        "CREATE TABLE comp (a INTEGER, b TEXT, m INTEGER, PRIMARY KEY (a, b))",
    )
    stmt = postgres_upsert_statement(
        "comp", ["a", "b", "m"], conflict_columns=["a", "b"]
    )
    _psql(pg, _execute_values_expand(stmt, [(1, "x", 1), (1, "y", 2)]))
    _psql(pg, _execute_values_expand(stmt, [(1, "x", 10), (2, "x", 3)]))
    got = _psql(pg, "SELECT a, b, m FROM comp ORDER BY a, b")
    assert got.splitlines() == ["1|x|10", "1|y|2", "2|x|3"]

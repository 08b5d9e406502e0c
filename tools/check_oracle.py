"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir and compares
row-count, column names, and an order-insensitive value hash against
the DuckDB ``oracle_sql()`` result. Usage::

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")


def normalize(value):
    import datetime
    import math

    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(round(value, 9))
    if isinstance(value, datetime.datetime):
        return value.isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(normalize(v) for v in value) + "]"
    return str(value)


# DuckDB result-column types the driver's hash is known to normalize the
# same way this replica does.  Everything else (HUGEINT from an uncast
# SUM, DECIMAL from an unrounded money aggregate, ...) hash-matches
# locally through str() but diverges in the driver — fail LOUDLY here.
# Scalars below are the entry-file determinism contract
# (__spark_entry__.py:18-21) plus the pass-through parquet types
# (INTEGER/FLOAT columns exist in the testdata tables).
_SAFE_SCALARS = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN",
}


def _type_ok(type_str: str) -> bool:
    t = type_str.strip().upper()
    # Arrays are NOT driver-safe even over safe scalars: the driver's
    # pandas canonicalizer sort_values() raises "unhashable type: 'list'"
    # on any list-typed result column (round-13 embedding_kmeans_assign
    # gate failure). Declared queries must return scalar columns only.
    return t in _SAFE_SCALARS


def assert_safe_types(name, columns, types):
    bad = [
        f"{c}:{t}" for c, t in zip(columns, types) if not _type_ok(str(t))
    ]
    if bad:
        raise TypeError(
            f"oracle '{name}' returns driver-unsafe column type(s) "
            f"{bad}; CAST them (entry-file rule: integer sums to BIGINT, "
            f"money aggregates to ROUNDed DOUBLE)"
        )


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "|".join(normalize(row[i]) for i in order) for row in rows
    )
    digest = hashlib.sha256()
    for line in lines:
        digest.update(line.encode())
        digest.update(b"\n")
    return digest.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from getl_spark import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only:
        # explicitly named queries resolve from the demoted pool too —
        # a name in neither registry is a loud error, not a silent
        # (vacuously green) no-op
        demoted = entry_mod.demoted_queries()
        demoted_oracles = entry_mod.demoted_oracle_sql()
        for name in only:
            if name in queries:
                continue
            if name in demoted:
                queries[name] = demoted[name]
                if name in demoted_oracles:
                    oracles[name] = demoted_oracles[name]
            else:
                print(f"UNKNOWN query {name!r}: not in queries() or "
                      "demoted_queries()")
                return 2
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in df.collect()]
            spark_cols = df.columns
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) [{elapsed:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            assert_safe_types(name, duck_cols, rel.types)
            duck_rows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {exc}")
            failures.append(name)
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
        if not problems:
            h_spark = value_hash(spark_rows, spark_cols)
            h_duck = value_hash(duck_rows, duck_cols)
            if h_spark != h_duck:
                problems.append(f"hash {h_spark} vs {h_duck}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{elapsed:.1f}s]")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(spark_rows)} rows [{elapsed:.1f}s]")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

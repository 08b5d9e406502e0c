"""Type-sweep every oracle (driver 50 + demoted pool) for driver-safe
result column types — the check that would have caught the round-6
``stats_profile`` HUGEINT red before the driver did.  DuckDB-only (no
Spark session), so it runs in seconds::

    python tools/sweep_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from check_oracle import assert_safe_types  # noqa: E402

sys.path.insert(0, "tools")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    pools = {"driver": entry_mod.oracle_sql()}
    if hasattr(entry_mod, "demoted_oracle_sql"):
        pools["demoted"] = entry_mod.demoted_oracle_sql()

    bad = []
    n = 0
    for pool, oracles in pools.items():
        for name, sql in oracles.items():
            n += 1
            try:
                rel = con.sql(sql)
                assert_safe_types(name, list(rel.columns), rel.types)
            except TypeError as exc:
                print(f"UNSAFE  [{pool}] {exc}")
                bad.append(name)
            except Exception as exc:
                # Some demoted oracles need temp tables the pytest harness
                # sets up; a binder error here is not a type violation.
                msg = str(exc).splitlines()[0]
                print(f"skip    [{pool}] {name}: {msg[:100]}")
    print(f"\nchecked {n} oracles; {len(bad)} unsafe: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.path.insert(0, "tools")
    raise SystemExit(main())

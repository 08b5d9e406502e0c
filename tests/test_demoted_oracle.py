"""Oracle checks for queries demoted out of the driver's 50-row budget.

These are full value-hash comparisons against DuckDB at sf0.001 — the
same gate the driver applies to registered queries — so demotion does
not mean loss of verification, only that the check runs here instead of
in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from tools.check_oracle import assert_safe_types, value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entry.demoted_queries()))
def test_demoted_query_matches_oracle(spark, duck, name):
    fn = entry.demoted_queries()[name]
    df = fn(spark, SF_DIR)
    # record the pre-action plan string for test_plan_lint so the lint
    # does not have to BUILD the query (and pay its eager driver-side
    # work) a second time — see tests/_plan_cache.py
    from tests._plan_cache import PLANS

    PLANS[name] = df._jdf.queryExecution().executedPlan().toString()
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns

    rel = duck.sql(entry.demoted_oracle_sql()[name])
    duck_cols = list(rel.columns)
    # fail locally on any result type the driver's hash may normalize
    # differently (HUGEINT/DECIMAL/BLOB...) — the round-6 stats_profile
    # red was exactly this class slipping past a str()-based compare
    assert_safe_types(name, duck_cols, rel.types)
    duck_rows = rel.fetchall()

    assert len(spark_rows) == len(duck_rows)
    assert sorted(spark_cols) == sorted(duck_cols)
    assert value_hash(spark_rows, spark_cols) == value_hash(duck_rows, duck_cols)

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from getl_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    import os as _os

    session = get_spark(
        "getl-tests",
        master=_os.environ.get("GETL_TEST_MASTER", "local[4]"),
        shuffle_partitions=int(_os.environ.get("GETL_TEST_SHUFFLE", "4")),
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/getl_test_warehouse",
            "spark.sql.adaptive.enabled": _os.environ.get(
                "GETL_TEST_AQE", "true"
            ),
            # plan strings captured for tests/_plan_cache.py must not
            # truncate field lists or the plan-lint regexes go blind
            "spark.sql.debug.maxToStringFields": "2000",
        },
    )
    yield session


@pytest.fixture()
def princess_df(spark):
    """Primary transform fixture (mirrors reference tests/getl/data/samples.py)."""
    return spark.createDataFrame(
        [
            ("Cinderella", 16, False, ("thorns", "2020-10-14")),
            ("Snow white", 17, True, ("apple", "2020-10-14")),
            ("Belle", 18, False, ("roses", "2020-10-14")),
            ("Jasmine", 19, True, ("jafar", "2020-10-14")),
        ],
        "name STRING, age BIGINT, happy BOOLEAN, "
        "items STRUCT<weakness: STRING, created: STRING>",
    )


@pytest.fixture()
def nullable_df(spark):
    return spark.createDataFrame(
        [("Cinderella", 16), ("Snow white", 17), ("Belle", None), ("Jasmine", None)],
        "name STRING, age BIGINT",
    )


@pytest.fixture()
def travel_df(spark):
    return spark.createDataFrame(
        [
            ("London", "Brussels", 500),
            ("London", "Brussels", 490),
            ("Brussels", "Stockholm", 1000),
            ("Brussels", "Stockholm", 1000),
            ("Stockholm", "Brussels", 1100),
            ("London", "Stockholm", 1300),
        ],
        "`from` STRING, `to` STRING, cost BIGINT",
    )


def pytest_report_header(config):
    """Keep the Delta gate VISIBLE in every test run: three tests in
    test_delta_only.py skip when delta-spark is absent, and a silent
    skip can hide that the native Delta paths (CDF, time travel, real
    OPTIMIZE ZORDER) never execute in this environment."""
    from getl_spark.common.tables import HAS_DELTA

    if HAS_DELTA:
        return "delta gate: delta-spark INSTALLED — native Delta paths active"
    return (
        "delta gate: delta-spark NOT installed — parquet fallback carries "
        "write::batch_delta / registries; tests/test_delta_only.py will skip "
        "(CDF, time travel, OPTIMIZE ZORDER run only on a real cluster)"
    )

"""JDBC source/sink executed against embedded Apache Derby.

pyspark ships derby*.jar on the classpath (it backs the Hive
metastore), so ``jdbc:derby:<dir>;create=true`` gives a real in-process
database: these tests execute the same ``write::batch_jdbc`` /
``load::jdbc`` code paths a production Postgres/MySQL deployment uses
(reference ``getl/blocks/load/entrypoint.py:265-301`` and
``getl/blocks/write/entrypoint.py:21-62``), including Query pushdown
(the SQL runs inside Derby, not Spark) and filter pushdown into the
JDBC scan.
"""

import pytest

from getl_spark import lift

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_available(spark):
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("Derby driver not on Spark classpath")
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _roundtrip_definition(url, num_partitions=2):
    return f"""
LiftJob:
  In:
    Type: custom::sql
    Properties: {{Statement: SELECT * FROM jdbc_input}}
  W:
    Type: write::batch_jdbc
    Input: In
    Properties:
      Mode: overwrite
      Driver: {DRIVER}
      ConnUrl: {url}
      Table: people
      User: app
      Password: app
      NumPartitions: {num_partitions}
  R:
    Type: load::jdbc
    Properties:
      Driver: {DRIVER}
      ConnUrl: {url}
      Table: people
      User: app
      Password: app
"""


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(i, f"name-{i}", float(i) * 1.5) for i in range(20)],
        "id BIGINT, name STRING, score DOUBLE",
    ).repartition(4)
    df.createOrReplaceTempView("jdbc_input")
    log = lift(spark, _roundtrip_definition(derby_url))
    got = sorted((r.id, r.name, r.score) for r in log.get("R").collect())
    assert got == [(i, f"name-{i}", float(i) * 1.5) for i in range(20)]


def test_jdbc_query_pushdown_runs_in_database(spark, derby_url):
    """The Query property ships SQL into Derby — the aggregation below
    happens database-side, Spark only sees the 1-row result."""
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id BIGINT, grp BIGINT"
    )
    df.createOrReplaceTempView("jdbc_input")
    definition = f"""
LiftJob:
  In:
    Type: custom::sql
    Properties: {{Statement: SELECT * FROM jdbc_input}}
  W:
    Type: write::batch_jdbc
    Input: In
    Properties:
      Mode: overwrite
      Driver: {DRIVER}
      ConnUrl: {derby_url}
      Table: nums
      User: app
      Password: app
  Agg:
    Type: load::jdbc
    Properties:
      Driver: {DRIVER}
      ConnUrl: {derby_url}
      # Spark's JDBC writer creates case-preserving quoted columns, so
      # the database-side SQL quotes them too
      Query: SELECT "grp", COUNT(*) AS "cnt" FROM nums GROUP BY "grp"
      User: app
      Password: app
"""
    log = lift(spark, definition)
    agg = log.get("Agg")
    assert sorted((r.grp, r.cnt) for r in agg.collect()) == [
        (0, 10),
        (1, 10),
        (2, 10),
    ]
    # the scan itself is the pushed query: no Spark-side aggregate node
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan


def test_jdbc_filter_pushdown_into_scan(spark, derby_url):
    df = spark.createDataFrame([(i,) for i in range(50)], "id BIGINT")
    df.createOrReplaceTempView("jdbc_input")
    log = lift(spark, _roundtrip_definition(derby_url, num_partitions=1).replace(
        "Table: people", "Table: ids"
    ))
    filtered = log.get("R").where("id < 5")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan.lower()
    assert filtered.count() == 5

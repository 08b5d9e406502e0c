"""Delta-spark-only behavior: these tests run where delta-spark is
installed (production profile) and skip in the parquet-fallback
container, making the Delta contract explicit and executable.

The gate is VERIFIED unresolvable in this container, not assumed: no
delta-spark wheel is installed and no compatible jar exists — the only
delta jars on disk (reference testing-jars, delta-core_2.12 2.1.0 /
1.2.1) target Spark 3.3 on Scala 2.12 and fail to classload on this
Spark 4.x / Scala 2.13 runtime (probed:
``java.util.ServiceConfigurationError: ...DeltaDataSource`` via
``NoClassDefFoundError: scala/Serializable``). On a real cluster with
delta-spark installed these tests execute and the parquet fallback
paths in ``common/tables.py`` go dormant."""

import pytest

from getl_spark.common.tables import HAS_DELTA

pytestmark = pytest.mark.skipif(
    not HAS_DELTA, reason="delta-spark not installed; parquet fallback active"
)


def test_delta_time_travel_diff(spark, tmp_path):
    """delta_diff must use versionAsOf time travel, not snapshots."""
    from getl_spark import lift

    src, reg = str(tmp_path / "src"), str(tmp_path / "reg")
    spark.createDataFrame([(1, "A")], "id BIGINT, name STRING").write.format(
        "delta"
    ).save(src)
    definition = f"""
FileRegistry:
  Reg:
    Type: fileregistry::delta_diff
    Properties:
      BasePath: {reg}
      UpdateAfter: Loaded
      DefaultStartDate: '2020-01-01 00:00:00'
      JoinOnFields: [id]
LiftJob:
  Loaded:
    Type: load::batch_delta
    Properties: {{Path: {src}, FileRegistry: Reg}}
"""
    log = lift(spark, definition)
    assert [r.id for r in log.get("Loaded").collect()] == [1]
    spark.createDataFrame([(1, "A"), (2, "B")], "id BIGINT, name STRING").write.format(
        "delta"
    ).mode("overwrite").save(src)
    log = lift(spark, definition)
    assert sorted(r.id for r in log.get("Loaded").collect()) == [2]


def test_change_data_feed_read(spark, tmp_path):
    from getl_spark import lift

    path = str(tmp_path / "cdf")
    spark.sql(
        f"CREATE TABLE delta.`{path}` (id BIGINT, v STRING) USING DELTA "
        "TBLPROPERTIES (delta.enableChangeDataFeed = true)"
    )
    spark.createDataFrame([(1, "a")], "id BIGINT, v STRING").write.format(
        "delta"
    ).mode("append").save(path)
    log = lift(
        spark,
        f"""
LiftJob:
  Changes:
    Type: load::batch_delta
    Properties:
      Path: {path}
      ReadChangeFeed: true
      StartingTimestamp: '2020-01-01 00:00:00'
""",
    )
    df = log.get("Changes")
    assert "_change_type" in df.columns


def test_delta_merge_is_acid(spark, tmp_path):
    from getl_spark.common.tables import ManagedTable

    path = str(tmp_path / "t")
    table = ManagedTable(spark, path, fmt="delta")
    base = spark.createDataFrame([(1, "a")], "id BIGINT, v STRING")
    table.write(base, "overwrite")
    updates = spark.createDataFrame([(1, "a2"), (2, "b")], "id BIGINT, v STRING")
    table.upsert_all(updates, "source.id = updates.id")
    result = {r.id: r.v for r in table.read().collect()}
    assert result == {1: "a2", 2: "b"}

"""schema.coerce — the generalized schema-drift guard (int width,
decimal→double, string/epoch→timestamp) and its CoerceTypes load-block
wiring."""

from __future__ import annotations

import datetime

import pytest
import yaml

from getl_spark import lift
from getl_spark.functions.schema import coerce

UTC = datetime.timezone.utc


def test_coerce_numeric_widths_and_decimal(spark):
    df = spark.createDataFrame(
        [(1, 2, "3.5")], "a INT, b BIGINT, c STRING"
    ).selectExpr("a", "b", "CAST(c AS DECIMAL(10,2)) AS c")
    out = coerce(df, {"a": "bigint", "b": "int", "c": "double"})
    assert dict(out.dtypes) == {"a": "bigint", "b": "int", "c": "double"}
    assert out.first() == (1, 2, 3.5)


def test_coerce_noop_when_types_already_match(spark):
    df = spark.createDataFrame([(1, "x")], "a BIGINT, s STRING")
    out = coerce(df, {"a": "bigint", "s": "string"})
    # same plan — no projection inserted for matching types
    assert out is df


def test_coerce_epoch_and_string_to_timestamp(spark):
    instant = datetime.datetime(2024, 1, 1, 2, 50, 4, tzinfo=UTC)
    s = int(instant.timestamp())
    df = spark.createDataFrame(
        [(s, s * 1_000_000, "2024-01-01 02:50:04")],
        "sec BIGINT, us BIGINT, txt STRING",
    )
    out = coerce(df, {"sec": "timestamp", "us": "timestamp", "txt": "timestamp"})
    assert all(t == "timestamp" for t in dict(out.dtypes).values())
    r = out.selectExpr(
        "unix_micros(sec) AS a", "unix_micros(us) AS b", "unix_micros(txt) AS c"
    ).first()
    assert r.a == r.b == s * 1_000_000
    assert r.c is not None


def test_coerce_string_to_timestamp_ntz(spark):
    df = spark.createDataFrame([("2024-03-15 06:30:00",)], "d STRING")
    out = coerce(df, {"d": "timestamp_ntz"})
    assert dict(out.dtypes)["d"] == "timestamp_ntz"
    assert out.first().d == datetime.datetime(2024, 3, 15, 6, 30)


def test_coerce_timestamp_to_date_and_back(spark):
    df = spark.sql(
        "SELECT TIMESTAMP '2024-06-01 12:34:56' AS ts, DATE '2024-06-01' AS d"
    )
    out = coerce(df, {"ts": "date", "d": "timestamp"})
    assert dict(out.dtypes) == {"ts": "date", "d": "timestamp"}
    r = out.first()
    assert r.ts == datetime.date(2024, 6, 1)
    assert r.d == datetime.datetime(2024, 6, 1, 0, 0)


def test_coerce_on_missing_modes(spark):
    df = spark.createDataFrame([(1,)], "a BIGINT")
    assert coerce(df, {"nope": "double"}).columns == ["a"]  # ignore
    out = coerce(df, {"nope": "double"}, on_missing="null")
    assert dict(out.dtypes)["nope"] == "double"
    assert out.first().nope is None
    with pytest.raises(ValueError, match="missing"):
        coerce(df, {"nope": "double"}, on_missing="error")
    with pytest.raises(ValueError, match="on_missing"):
        coerce(df, {"a": "double"}, on_missing="bogus")


def test_coerce_rejects_uncoercible_timestamp_source(spark):
    df = spark.createDataFrame([([1, 2],)], "arr ARRAY<BIGINT>")
    with pytest.raises(ValueError, match="cannot coerce"):
        coerce(df, {"arr": "timestamp"})


def test_load_block_coerce_types_normalizes_drifted_parquet(spark, tmp_path):
    """A delivery whose layout drifted (int32 ids, decimal money,
    string dates) loads back to the declared types through the
    CoerceTypes property on the load block."""
    drifted = spark.sql(
        """SELECT CAST(7 AS INT) AS k,
                  CAST(12.34 AS DECIMAL(10,2)) AS price,
                  '2024-03-15 00:00:00' AS d"""
    )
    drifted.write.parquet(f"{tmp_path}/t")
    blocks = {
        "T": {
            "Type": "load::batch_parquet",
            "Properties": {
                "Path": f"{tmp_path}/t",
                "CoerceTypes": {
                    "k": "bigint",
                    "price": "double",
                    "d": "timestamp",
                },
            },
        }
    }
    out = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False)).get("T")
    assert dict(out.dtypes) == {"k": "bigint", "price": "double", "d": "timestamp"}
    r = out.first()
    assert r.k == 7 and r.price == 12.34
    assert r.d == datetime.datetime(2024, 3, 15, 0, 0)


def test_entry_declared_types_are_noop_against_current_testdata(spark):
    """DECLARED_TYPES must equal the live testdata types exactly —
    the guard only activates on drift, never against today's layout
    (a hash-bearing behavior change would silently shift oracles)."""
    import __spark_entry__ as entry

    for table, declared in entry.DECLARED_TYPES.items():
        actual = dict(
            spark.read.parquet(f"/root/testdata/sf0.001/{table}.parquet").dtypes
        )
        for col, typ in declared.items():
            assert actual.get(col) == typ, (table, col, actual.get(col), typ)


def test_coerce_types_on_stream_load(spark, tmp_path):
    """CoerceTypes applies to streaming loads too (resolve is shared):
    a drifted stream delivery is normalized before any downstream
    block sees it."""
    import json

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        json.dumps({"k": 7, "price": "12.5", "d": "2024-03-15 00:00:00"})
    )
    blocks = {
        "S": {
            "Type": "load::stream_json",
            "Properties": {
                "Path": str(src),
                "JsonSchema": {
                    "type": "struct",
                    "fields": [
                        {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
                        {"name": "price", "type": "string", "nullable": True, "metadata": {}},
                        {"name": "d", "type": "string", "nullable": True, "metadata": {}},
                    ],
                },
                "CoerceTypes": {"k": "bigint", "price": "double", "d": "timestamp"},
            },
        },
        "W": {
            "Type": "write::stream_delta",
            "Input": "S",
            "Properties": {"Path": str(tmp_path / "out")},
        },
    }
    lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    out = spark.read.parquet(str(tmp_path / "out"))
    assert dict(out.dtypes) == {"k": "bigint", "price": "double", "d": "timestamp"}
    r = out.first()
    assert r.k == 7 and r.price == 12.5
    assert r.d == datetime.datetime(2024, 3, 15, 0, 0)


def test_schema_diff(spark):
    """Added/removed/type_changed/nullability rows; nested struct
    dotted paths; array/map recursion; identical schemas empty."""
    from pyspark.sql import types as T

    from getl_spark.functions import schema as S

    left = spark.createDataFrame(
        [],
        T.StructType([
            T.StructField("a", T.IntegerType(), True),
            T.StructField("gone", T.StringType(), True),
            T.StructField("props", T.StructType([
                T.StructField("os", T.StringType(), True),
                T.StructField("v", T.IntegerType(), True),
            ]), True),
            T.StructField("tags", T.ArrayType(T.StringType()), True),
            T.StructField("nn", T.LongType(), False),
        ]),
    )
    right = spark.createDataFrame(
        [],
        T.StructType([
            T.StructField("a", T.LongType(), True),          # widened
            T.StructField("fresh", T.DoubleType(), True),    # added
            T.StructField("props", T.StructType([
                T.StructField("os", T.StringType(), True),
                T.StructField("v", T.StringType(), True),    # nested change
            ]), True),
            T.StructField("tags", T.ArrayType(T.LongType()), True),  # elem change
            T.StructField("nn", T.LongType(), True),         # nullability
        ]),
    )
    rows = {r.column: r for r in S.diff(left, right).collect()}
    assert rows["a"].change == "type_changed" and rows["a"].left_type == "int"
    assert rows["gone"].change == "removed"
    assert rows["fresh"].change == "added" and rows["fresh"].right_type == "double"
    assert rows["props.v"].change == "type_changed"
    assert "props.os" not in rows
    assert rows["tags[]"].change == "type_changed"
    assert rows["nn"].change == "nullability"

    # identical schemas -> empty report
    assert S.diff(left, left).collect() == []

    # map value type change
    ml = spark.createDataFrame(
        [], T.StructType([T.StructField(
            "m", T.MapType(T.StringType(), T.IntegerType()), True)]))
    mr = spark.createDataFrame(
        [], T.StructType([T.StructField(
            "m", T.MapType(T.StringType(), T.DoubleType()), True)]))
    rows = {r.column: r for r in S.diff(ml, mr).collect()}
    assert rows["m{}"].change == "type_changed"

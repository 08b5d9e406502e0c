"""add_column.date.ensure_timestamp — schema-drift normalization for
timestamp-ish columns (native timestamp vs epoch int in any unit)."""

from __future__ import annotations

import datetime

import pytest

from getl_spark.functions.add_column import date as date_fns

UTC = datetime.timezone.utc
INSTANT = datetime.datetime(2024, 1, 1, 2, 50, 4, 729045, tzinfo=UTC)
MICROS = int(INSTANT.timestamp() * 1_000_000)


def _collect_ts(df):
    return [r["ts2"] for r in df.select("ts2").collect()]


@pytest.mark.parametrize(
    "unit,value",
    [
        ("s", MICROS // 1_000_000),
        ("ms", MICROS // 1_000),
        ("us", MICROS),
        ("ns", MICROS * 1_000),
    ],
)
def test_explicit_units(spark, unit, value):
    df = spark.createDataFrame([(value,)], ["ts"])
    out = date_fns.ensure_timestamp(df, "ts", "ts2", unit=unit)
    [got] = _collect_ts(out)
    expected = INSTANT.replace(microsecond=0 if unit in ("s", "ms") else 729045)
    if unit == "ms":
        expected = INSTANT.replace(microsecond=729000)
    assert got.replace(tzinfo=UTC) == expected


def test_auto_infers_each_band(spark):
    rows = [
        (MICROS // 1_000_000,),
        (MICROS // 1_000,),
        (MICROS,),
        (MICROS * 1_000,),
    ]
    df = spark.createDataFrame(rows, ["ts"])
    got = _collect_ts(date_fns.ensure_timestamp(df, "ts", "ts2", unit="auto"))
    secs = {g.replace(tzinfo=UTC).replace(microsecond=0) for g in got}
    assert secs == {INSTANT.replace(microsecond=0)}


def test_timestamp_passthrough(spark):
    df = spark.createDataFrame([(INSTANT.replace(tzinfo=None),)], ["ts"])
    out = date_fns.ensure_timestamp(df, "ts", "ts2")
    assert dict(out.dtypes)["ts2"] == "timestamp"
    [got] = _collect_ts(out)
    assert got.replace(tzinfo=UTC) == INSTANT


def test_in_place_overwrite_and_errors(spark):
    df = spark.createDataFrame([(MICROS,)], ["ts"])
    out = date_fns.ensure_timestamp(df, "ts")  # to_column defaults to from
    assert dict(out.dtypes)["ts"] == "timestamp"
    with pytest.raises(ValueError, match="no column"):
        date_fns.ensure_timestamp(df, "missing")
    with pytest.raises(ValueError, match="unknown unit"):
        date_fns.ensure_timestamp(df, "ts", unit="weeks")
    sdf = spark.createDataFrame([("not-a-ts",)], ["ts"])
    with pytest.raises(ValueError, match="expected"):
        date_fns.ensure_timestamp(sdf, "ts")


def test_yaml_callable_on_events(spark):
    """Drives the real drift case: events.ts normalizes to TIMESTAMP
    whatever layout the parquet was generated with."""
    import yaml

    from getl_spark import lift

    blocks = {
        "Ev": {
            "Type": "load::batch_parquet",
            "Properties": {"Path": "/root/testdata/sf0.001/events.parquet"},
        },
        "Result": {
            "Type": "transform::generic",
            "Input": "Ev",
            "Properties": {
                "Functions": [
                    {
                        "add_column.date.ensure_timestamp": {
                            "from_column": "ts",
                            "to_column": "ts_norm",
                        }
                    }
                ]
            },
        },
    }
    out = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False)).get(
        "Result"
    )
    assert dict(out.dtypes)["ts_norm"] == "timestamp"
    assert out.where("ts_norm IS NULL").count() == 0


def test_ns_negative_epoch_floors_to_micros(spark):
    """Pre-1970 nanosecond epochs must FLOOR to micros (-1501 ns is
    inside the microsecond that started at -2 µs), not truncate toward
    zero (-1 µs)."""
    df = spark.createDataFrame(
        [(-1501,), (-1000,), (-999,), (1501,)], "ts BIGINT"
    )
    out = date_fns.ensure_timestamp(df, "ts", "t", unit="ns").selectExpr(
        "ts", "unix_micros(t) AS us"
    )
    got = {r.ts: r.us for r in out.collect()}
    assert got == {-1501: -2, -1000: -1, -999: -1, 1501: 1}

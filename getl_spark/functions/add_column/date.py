"""Date-derivation transform functions (``add_column.date.*``).

Parity with ``getl/blocks/transform/add_column/date.py:6-61``. The
year/month/dayofmonth outputs are cast to STRING — the reference's
partition-column convention — and ``unixtime_to_utcz`` keeps the
reference's quirky ``yyyy-MM-dd'T'HH:mm:sssZ`` SimpleDateFormat pattern
(seconds zero-padded to 3, no separate minutes-seconds separator),
which requires ``spark.sql.legacy.timeParserPolicy=LEGACY`` — pinned in
``getl_spark.session.get_spark``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DateType, StringType


def unixtime_to_utcz(dataframe: DataFrame, from_column: str, to_column: str) -> DataFrame:
    return dataframe.withColumn(
        to_column, F.from_unixtime(from_column, "yyyy-MM-dd'T'HH:mm:sssZ")
    )


def year(dataframe: DataFrame, from_column: str, to_column: str) -> DataFrame:
    return dataframe.withColumn(
        to_column, F.year(F.col(from_column)).cast(StringType())
    )


def month(dataframe: DataFrame, from_column: str, to_column: str) -> DataFrame:
    return dataframe.withColumn(
        to_column, F.month(F.col(from_column)).cast(StringType())
    )


def dayofmonth(dataframe: DataFrame, from_column: str, to_column: str) -> DataFrame:
    return dataframe.withColumn(
        to_column, F.dayofmonth(F.col(from_column)).cast(StringType())
    )


def date(dataframe: DataFrame, from_column: str, to_column: str) -> DataFrame:
    return dataframe.withColumn(to_column, F.col(from_column).cast(DateType()))


def ensure_timestamp(
    dataframe: DataFrame,
    from_column: str,
    to_column: str | None = None,
    unit: str = "auto",
) -> DataFrame:
    """Normalize a timestamp-ish column to TIMESTAMP — the schema-drift
    guard for sources whose time column arrives either as a native
    (parquet-annotated) timestamp or as a raw epoch integer, and whose
    layout can change between deliveries (this repo's ``events.ts``
    switched from int64 nanos to TIMESTAMP(MICROS) between testdata
    generations; real feeds do the same).

    * timestamp / timestamp_ntz / date input: plain cast — ``unit`` is
      ignored.
    * integer input: interpreted per ``unit`` (``s``/``ms``/``us``/
      ``ns``). ``unit='auto'`` infers the unit per row from magnitude
      with fixed documented bands (|v| < 1e11 → s, < 1e14 → ms,
      < 1e17 → us, else ns) — unambiguous for any instant between 1973
      and 5138, a per-row CASE with no extra data pass. Feeds outside
      that window (pre-1973 epochs) must pass ``unit`` explicitly.

    Fractional-second precision is preserved to the microsecond (Spark
    TIMESTAMP resolution); ``ns`` floors to micros.
    """
    to_column = to_column or from_column
    dtype = dict(dataframe.dtypes).get(from_column)
    if dtype is None:
        raise ValueError(f"ensure_timestamp: no column '{from_column}'")
    col = F.col(from_column)
    if dtype.startswith("timestamp") or dtype == "date":
        return dataframe.withColumn(to_column, col.cast("timestamp"))
    if dtype not in ("bigint", "int", "long", "integer", "smallint", "tinyint"):
        raise ValueError(
            f"ensure_timestamp: column '{from_column}' is {dtype}; expected "
            "a timestamp or integer epoch column"
        )
    return dataframe.withColumn(
        to_column, F.timestamp_micros(epoch_micros_expr(from_column, unit))
    )


def epoch_micros_expr(from_column: str, unit: str = "auto"):
    """Column expression converting an integer epoch column to
    microseconds — the unit-band decision table behind
    ``ensure_timestamp``, shared with ``schema.coerce``."""
    v = F.col(from_column).cast("bigint")
    # integer arithmetic (not /): float division of int64 nanos loses
    # precision past 2^53. Plain `div` truncates toward zero, which
    # would round NEGATIVE (pre-1970) nanos up by 1µs — subtracting
    # pmod (always non-negative) first makes it exact floor division.
    _v = f"CAST(`{from_column}` AS BIGINT)"
    ns_to_us = F.expr(f"({_v} - pmod({_v}, 1000)) div 1000")

    if unit == "auto":
        a = F.abs(v)
        micros = (
            F.when(a < F.lit(100_000_000_000), v * F.lit(1_000_000))
            .when(a < F.lit(100_000_000_000_000), v * F.lit(1_000))
            .when(a < F.lit(100_000_000_000_000_000), v)
            .otherwise(ns_to_us)
        )
    elif unit == "s":
        micros = v * F.lit(1_000_000)
    elif unit == "ms":
        micros = v * F.lit(1_000)
    elif unit == "us":
        micros = v
    elif unit == "ns":
        micros = ns_to_us
    else:
        raise ValueError(f"ensure_timestamp: unknown unit '{unit}'")
    return micros.cast("bigint")

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

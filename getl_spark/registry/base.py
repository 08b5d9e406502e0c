"""File-registry base: incremental-ingest bookkeeping.

A file registry is a small control table (Delta when available,
parquet fallback) recording which files/rows have been processed. It
is the engine's metadata-driven incremental scan planner (reference
``getl/fileregistry/``): loaders ask it for unprocessed inputs *before*
building the Spark plan — pruning at the file-list level, beneath what
Catalyst can see — and after the block named in ``UpdateAfter``
succeeds, the executor calls ``update()`` to commit the high-water
mark. At-least-once processing, effectively-once marking.
"""

from __future__ import annotations

import datetime as dt
from abc import ABC, abstractmethod

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType, TimestampType

from getl_spark.common.tables import ManagedTable


def utcnow() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


class FileRegistry(ABC):
    @abstractmethod
    def load(self, path: str, suffix: str = ""):
        """Return unprocessed inputs (file list, or DataFrame of rows)."""

    @abstractmethod
    def update(self) -> None:
        """Commit the high-water mark after a successful lift."""


class ControlTableRegistry(FileRegistry, ABC):
    """Shared machinery for registries backed by a file_path control table."""

    schema = StructType(
        [
            StructField("file_path", StringType(), True),
            StructField("date_lifted", TimestampType(), True),
        ]
    )

    def __init__(self, bconf) -> None:
        self.spark = bconf.spark
        self.registry_path = bconf.get("BasePath")
        self.update_after = bconf.get("UpdateAfter", None)
        self.table = ManagedTable(self.spark, self.registry_path)
        if bconf.exists("HiveDatabaseName"):
            from getl_spark.common.tables import HiveTable

            HiveTable(
                self.spark, bconf.get("HiveDatabaseName"), bconf.get("HiveTableName")
            ).create(self.registry_path, self.db_schema())

    @classmethod
    def db_schema(cls) -> str:
        return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in cls.schema)

    def update(self) -> None:
        """Stamp date_lifted=now() on every not-yet-lifted row (reference
        ``getl/fileregistry/fileregistry_utils.py:14-32``)."""
        if self.table.exists():
            self.table.update(
                F.col("date_lifted").isNull(),
                {"date_lifted": F.lit(utcnow()).cast("timestamp")},
            )

    def _register_new_files(self, rows: list) -> None:
        """Insert-only merge of newly discovered files."""
        if not rows:
            return
        updates = self.spark.createDataFrame(rows, self.schema)
        self.table.insert_all(updates, "source.file_path = updates.file_path")

    def _unlifted_paths(self) -> list:
        df = self.table.read()
        if df is None:
            return []
        data = df.where(F.col("date_lifted").isNull()).select("file_path").collect()
        return sorted(row.file_path for row in data)

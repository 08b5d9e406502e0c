"""getl_spark — a PySpark-native declarative ETL/analytics engine.

A from-scratch rebuild of the capabilities of husqvarnagroup/GETL
(reference at /root/reference, studied for semantics only): YAML "lift
definitions" describing ordered pipelines of named blocks — sources,
transform chains, custom Python/SQL, sinks — plus Delta-backed file
registries for incremental effectively-once ingestion, re-expressed
idiomatically on the Spark DataFrame API so that Catalyst/Tungsten and
AQE do all planning and physical execution.

Public API (parity with reference ``getl/lift.py:12-25`` and
``getl/common/utils.py:25-117``):

    from getl_spark import lift
    log = lift(spark, yaml_text_or_path, {"Param": value})
    df = log.get("BlockName")
"""

from getl_spark.common.path import StoragePath
from getl_spark.common.utils import (
    copy_and_cleanup,
    copy_keys,
    delete_files,
    json_to_spark_schema,
)
from getl_spark.lift import lift
from getl_spark.plans.context import BlockConfig, BlockLog, LiftJobLog
from getl_spark.session import get_spark

__all__ = [
    "lift",
    "get_spark",
    "BlockConfig",
    "BlockLog",
    "LiftJobLog",
    "StoragePath",
    "json_to_spark_schema",
    "delete_files",
    "copy_keys",
    "copy_and_cleanup",
]
__version__ = "0.1.0"

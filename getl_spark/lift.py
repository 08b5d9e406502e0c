"""Public entry point: ``lift(spark, lift_def, parameters)``.

Parity with ``getl/lift.py:12-25``. Returns the ``LiftJobLog`` history;
callers retrieve any block's (lazy) DataFrame with
``log.get("BlockName")`` and trigger their own actions.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import SparkSession

from getl_spark.plans.context import LiftJobLog
from getl_spark.plans.definition import resolve_definition
from getl_spark.plans.executor import Executor


def lift(
    spark: SparkSession,
    lift_def: str,
    parameters: Mapping[str, Any] | None = None,
) -> LiftJobLog:
    definition = resolve_definition(lift_def, parameters)
    if "LiftJob" not in definition:
        raise ValueError("A lift definition needs a LiftJob section")
    executor = Executor(spark)
    if "FileRegistry" in definition:
        executor.init_file_registries(definition["FileRegistry"])
    return executor.execute(definition["LiftJob"])

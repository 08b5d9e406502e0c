"""Block executor: runs a resolved lift definition section by section.

Parity with ``getl/manager.py:20-118``. Grammar per section::

    SectionName:
      Type: module::function     # e.g. load::batch_parquet
      Input: OtherSection        # or [A, B] for join/union blocks
      Properties: {...}

The module half of ``Type`` resolves through ``BLOCK_MODULES`` below;
the function half is looked up on that entrypoint module and invoked
through its ``resolve`` wrapper. Multi-output blocks (custom python
returning a dict) register results under dotted ``Section.Sub`` names,
validated against the block's declared ``Output`` list. After a block
completes, any file registry whose ``UpdateAfter`` names the block
commits its high-water mark — this ordering is what gives at-least-once
processing with effectively-once marking. ``NoDataToProcess`` from an
incremental source short-circuits the whole job cleanly.
"""

from __future__ import annotations

import logging
from importlib import import_module
from typing import Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession

from getl_spark.common.errors import NoDataToProcess
from getl_spark.plans.context import (
    BlockConfig,
    FileRegistryLog,
    LiftJobLog,
)

LOGGER = logging.getLogger(__name__)

SECRET_KEYS = ("password", "secret", "token", "credential")


def redact(params) -> object:
    """Deep-copy params with secret-named values masked — block
    parameters are logged, and connection blocks carry passwords
    (reference redacts in its job log; asserted in its integration
    tests)."""
    if isinstance(params, dict):
        # str(key): YAML 1.1 keys like `On:` arrive as booleans
        return {
            key: "***"
            if any(s in str(key).lower() for s in SECRET_KEYS)
            else redact(value)
            for key, value in params.items()
        }
    if isinstance(params, list):
        return [redact(value) for value in params]
    return params


BLOCK_MODULES = {
    "load": "getl_spark.sources.entrypoint",
    "transform": "getl_spark.operators.entrypoint",
    "write": "getl_spark.sinks.entrypoint",
    "custom": "getl_spark.custom.entrypoint",
    "fileregistry": "getl_spark.registry.entrypoint",
}


class Executor:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.history = LiftJobLog()
        self.file_registry = FileRegistryLog()

    def init_file_registries(self, registry_sections: dict) -> None:
        for bconf, result in self._run_blocks(registry_sections):
            self.file_registry.add(bconf, result)

    def execute(self, lift_job: dict) -> LiftJobLog:
        try:
            for bconf, result in self._run_blocks(lift_job):
                self._log_result(bconf, result)
                # Commit every registry keyed on this block — a pipeline
                # may have several (e.g. two sources merged by one
                # write), and missing one would reprocess its files on
                # every run.
                for registry in self.file_registry.find_all(
                    prop=("UpdateAfter", bconf.section_name)
                ):
                    registry.update()
        except NoDataToProcess:
            LOGGER.info("No new data to process; exiting lift job cleanly.")
        return self.history

    # ------------------------------------------------------------------ guts
    def _run_blocks(self, sections: dict) -> Iterator[Tuple[BlockConfig, object]]:
        for section_name, params in sections.items():
            LOGGER.info("Process block %s with params %s", section_name, redact(params))
            if "Type" not in params:
                raise ValueError(f"Block '{section_name}' is missing a Type")
            module_name, _, function_name = params["Type"].partition("::")
            if module_name not in BLOCK_MODULES:
                raise ValueError(
                    f"Unknown block family '{module_name}' in '{section_name}'; "
                    f"expected one of {sorted(BLOCK_MODULES)}"
                )
            entrypoint = import_module(BLOCK_MODULES[module_name])
            try:
                func = getattr(entrypoint, function_name)
            except AttributeError:
                raise ValueError(
                    f"Block family '{module_name}' has no operator "
                    f"'{function_name}' (section '{section_name}')"
                )
            bconf = BlockConfig(
                section_name,
                self.spark,
                params.get("Input"),
                params.get("Properties", {}),
                self.history,
                self.file_registry,
            )
            yield bconf, entrypoint.resolve(func, bconf)

    def _log_result(self, bconf: BlockConfig, result) -> None:
        if isinstance(result, dict) and bconf.exists("Output"):
            declared = bconf.get("Output")
            for sub_name, df in result.items():
                if sub_name not in declared:
                    raise TypeError(
                        f"Block {bconf.section_name} declared outputs {declared} "
                        f"but produced '{sub_name}'"
                    )
                sub_conf = bconf.copy()
                sub_conf.section_name = f"{bconf.section_name}.{sub_name}"
                self.history.add(sub_conf, df)
        elif isinstance(result, DataFrame):
            self.history.add(bconf, result)
        else:
            raise TypeError(
                f'Block "{bconf.section_name}" must output a DataFrame '
                f"(or a dict of DataFrames with Output declared); got {type(result)}"
            )

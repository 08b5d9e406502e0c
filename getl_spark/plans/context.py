"""Execution context: per-block config and the named-DataFrame log.

The engine's "IR" between blocks is simply a name → lazy DataFrame
environment (reference ``getl/block.py:9-37``). Because DataFrames stay
lazy across blocks, Catalyst optimizes the *whole pipeline* as one plan
— a load→where→select→write chain collapses into a single parquet scan
with pushed filters and pruned columns. Every block result is also
registered as a temp view so SQL blocks can reference prior blocks
relationally.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Union

from pyspark.sql import DataFrame, SparkSession

_MISSING = object()


class BlockLog:
    """Ordered name → {result, bconf} log of executed blocks."""

    def __init__(self) -> None:
        self.log: dict = {}

    def add(self, bconf: "BlockConfig", result: Any) -> None:
        self.log[bconf.section_name] = {"result": result, "bconf": bconf}
        if isinstance(result, DataFrame):
            # view names can't contain dots; multi-output Section.Sub
            # becomes Section_Sub
            view = re.sub(r"[^A-Za-z0-9_]", "_", bconf.section_name)
            result.createOrReplaceTempView(view)

    def get(self, section_name: str) -> Any:
        if section_name not in self.log:
            raise KeyError(
                f"Block '{section_name}' not found; available: {list(self.log)}"
            )
        return self.log[section_name]["result"]

    def find(self, prop: Optional[tuple] = None) -> Any:
        """Find the first block whose config has property key == value."""
        if not prop:
            return None
        key, value = prop
        for entry in self.log.values():
            if entry["bconf"].get(key, None) == value:
                return entry["result"]
        return None

    def __contains__(self, section_name: str) -> bool:
        return section_name in self.log


class FileRegistryLog(BlockLog):
    pass


class LiftJobLog(BlockLog):
    pass


class BlockConfig:
    """Everything a block needs: name, session, input refs, properties,
    the history of prior results, and the registry log."""

    def __init__(
        self,
        section_name: str,
        spark: SparkSession,
        block_input: Union[None, str, List[str]],
        props: dict,
        history: Optional[BlockLog] = None,
        file_registry: Optional[BlockLog] = None,
    ) -> None:
        self.section_name = section_name
        self.spark = spark
        self.input = block_input
        self.props = props or {}
        self.history = history if history is not None else BlockLog()
        self.file_registry = (
            file_registry if file_registry is not None else FileRegistryLog()
        )

    def _search(self, dotted: str) -> Any:
        node = self.props
        for part in dotted.split("."):
            node = node[part]
        return node

    def exists(self, dotted: str) -> bool:
        try:
            self._search(dotted)
            return True
        except (KeyError, TypeError):
            return False

    def get(self, dotted: str, default: Any = _MISSING) -> Any:
        try:
            return self._search(dotted)
        except (KeyError, TypeError):
            if default is not _MISSING:
                return default
            raise KeyError(f'Could not find "{dotted}" in properties.')

    def input_df(self) -> DataFrame:
        """The single input DataFrame (most blocks)."""
        if not isinstance(self.input, str):
            raise ValueError(
                f"Block '{self.section_name}' needs a single Input section name"
            )
        return self.history.get(self.input)

    def copy(self) -> "BlockConfig":
        return BlockConfig(
            self.section_name,
            self.spark,
            self.input,
            self.props,
            self.history,
            self.file_registry,
        )

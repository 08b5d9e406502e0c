"""Execution context: per-block config and the named-DataFrame log.

The engine's "IR" between blocks is simply a name → lazy DataFrame
environment (the same contract as the reference's ``getl/block.py:9-37``
``BlockLog``/``BlockConfig``, re-expressed here with dataclass entries).
Because DataFrames stay lazy across blocks, Catalyst optimizes the
*whole pipeline* as one plan — a load→where→select→write chain collapses
into a single parquet scan with pushed filters and pruned columns.
Every block result is also registered as a temp view so SQL blocks can
reference prior blocks relationally.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Iterator, List, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession

_MISSING = object()

_VIEW_SAFE = re.compile(r"[^A-Za-z0-9_]")


@dataclass
class LogEntry:
    """One executed block: its produced value plus the config it ran with."""

    result: Any
    config: "BlockConfig"


@dataclass
class BlockLog:
    """Ordered name → :class:`LogEntry` log of executed blocks.

    Public contract (kept stable for parity with the reference API):
    ``add``, ``get(name)``, ``find((key, value))``, ``in``.
    ``find_all`` is an extension — a pipeline may legitimately have
    several registries keyed on the same ``UpdateAfter`` block, and all
    of them must commit.
    """

    _entries: dict = field(default_factory=dict)

    def add(self, bconf: "BlockConfig", result: Any) -> None:
        self._entries[bconf.section_name] = LogEntry(result, bconf)
        if isinstance(result, DataFrame):
            # Temp-view names can't contain dots; multi-output
            # Section.Sub becomes Section_Sub.
            result.createOrReplaceTempView(
                _VIEW_SAFE.sub("_", bconf.section_name)
            )

    def get(self, section_name: str) -> Any:
        entry = self._entries.get(section_name)
        if entry is None:
            raise KeyError(
                f"Block '{section_name}' not found; "
                f"available: {list(self._entries)}"
            )
        return entry.result

    def find(self, prop: Optional[tuple] = None) -> Any:
        """First block result whose config has property key == value."""
        for result in self.find_all(prop):
            return result
        return None

    def find_all(self, prop: Optional[tuple] = None) -> List[Any]:
        """Every block result whose config has property key == value."""
        if not prop:
            return []
        key, value = prop
        return [
            entry.result
            for entry in self._entries.values()
            if entry.config.get(key, None) == value
        ]

    def items(self) -> Iterator[Tuple[str, Any]]:
        """(name, result) pairs in execution order."""
        return ((name, e.result) for name, e in self._entries.items())

    def __contains__(self, section_name: str) -> bool:
        return section_name in self._entries

    def __len__(self) -> int:
        return len(self._entries)


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

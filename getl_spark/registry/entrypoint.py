"""Entry point for ``fileregistry::*`` blocks
(reference ``getl/fileregistry/entrypoint.py``).

``s3_full_scan`` / ``s3_date_prefix_scan`` keep their reference names
for YAML compatibility but work on any storage the listing layer
understands (local paths in tests, ``s3://`` in production);
``full_scan`` / ``date_prefix_scan`` are the scheme-neutral aliases.
"""

from __future__ import annotations

from typing import Callable

from getl_spark.plans.context import BlockConfig
from getl_spark.registry.base import FileRegistry
from getl_spark.registry.date_prefix_scan import DatePrefixScan
from getl_spark.registry.delta_diff import DeltaDiff
from getl_spark.registry.full_scan import FullScan


def resolve(func: Callable, bconf: BlockConfig) -> FileRegistry:
    return func(bconf)


def s3_full_scan(bconf: BlockConfig) -> FileRegistry:
    """Properties: ``BasePath`` (registry table location),
    ``UpdateAfter``, optional ``HiveDatabaseName``/``HiveTableName``."""
    return FullScan(bconf)


def full_scan(bconf: BlockConfig) -> FileRegistry:
    return FullScan(bconf)


def s3_date_prefix_scan(bconf: BlockConfig) -> FileRegistry:
    """Properties: ``BasePath``, ``UpdateAfter``, ``DefaultStartDate``,
    ``PartitionFormat`` (strftime), optional Hive registration."""
    return DatePrefixScan(bconf)


def date_prefix_scan(bconf: BlockConfig) -> FileRegistry:
    return DatePrefixScan(bconf)


def delta_diff(bconf: BlockConfig) -> FileRegistry:
    """Properties: ``BasePath``, ``UpdateAfter``, ``DefaultStartDate``,
    ``JoinOnFields``."""
    return DeltaDiff(bconf)

"""Event-time windowing operators (extension beyond the reference).

The reference's streaming surface is trigger-once JSON→Delta with no
event-time semantics (SURVEY.md §2g). These operators add the Spark
Structured Streaming windowing model as first-class blocks — and they
run identically on *batch* DataFrames (``F.window`` /
``F.session_window`` are batch-compatible), which is how the DuckDB
oracle verifies them. On a streaming input, add ``Watermark`` to bound
state: Spark then drops state for windows older than
``max(event_time) - watermark`` — the knob that keeps a 100 TB/day
stream's state finite.

Used as transform functions (``event_time.tumbling`` …) or through the
``transform::time_window`` / ``transform::session_window`` blocks.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def _maybe_watermark(df: DataFrame, time_col: str, watermark: Optional[str]) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(time_col, watermark)
    return df


def _aggs(aggregations: List[dict]) -> List:
    out = []
    for spec in aggregations:
        agg = spec["agg"]
        alias = spec.get("alias", f"{agg}_{spec.get('col', 'all')}")
        if agg == "count":
            expr = F.count(F.lit(1))
        elif agg == "expr":
            expr = F.expr(spec["expr"])
        else:
            expr = getattr(F, agg)(spec["col"])
        out.append(expr.alias(alias))
    return out


def tumbling(
    df: DataFrame,
    time_col: str,
    duration: str,
    aggregations: List[dict],
    group_by: Optional[List[str]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Fixed, non-overlapping event-time windows."""
    df = _maybe_watermark(df, time_col, watermark)
    window = F.window(F.col(time_col), duration)
    grouped = df.groupBy(window, *(group_by or []))
    return grouped.agg(*_aggs(aggregations)).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(group_by or []),
        *[spec.get("alias", f"{spec['agg']}_{spec.get('col', 'all')}") for spec in aggregations],
    )


def sliding(
    df: DataFrame,
    time_col: str,
    duration: str,
    slide: str,
    aggregations: List[dict],
    group_by: Optional[List[str]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Overlapping windows of ``duration`` advancing every ``slide``."""
    df = _maybe_watermark(df, time_col, watermark)
    window = F.window(F.col(time_col), duration, slide)
    grouped = df.groupBy(window, *(group_by or []))
    return grouped.agg(*_aggs(aggregations)).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(group_by or []),
        *[spec.get("alias", f"{spec['agg']}_{spec.get('col', 'all')}") for spec in aggregations],
    )


def session(
    df: DataFrame,
    time_col: str,
    gap: str,
    aggregations: List[dict],
    group_by: Optional[List[str]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Dynamic-length sessions: a session extends while consecutive
    events arrive within ``gap``. ``window_start`` is the first event's
    time; Spark's session end is last event + gap."""
    df = _maybe_watermark(df, time_col, watermark)
    window = F.session_window(F.col(time_col), gap)
    grouped = df.groupBy(window, *(group_by or []))
    return grouped.agg(*_aggs(aggregations)).select(
        F.col("session_window.start").alias("window_start"),
        *(group_by or []),
        *[spec.get("alias", f"{spec['agg']}_{spec.get('col', 'all')}") for spec in aggregations],
    )


def dedup(
    df: DataFrame,
    keys: List[str],
    time_col: Optional[str] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Streaming/batch ingest deduplication on key columns.

    On a stream with ``time_col`` + ``watermark``,
    ``dropDuplicatesWithinWatermark`` keeps per-key state only for the
    watermark horizon — the state stays finite on an unbounded stream,
    the property plain ``dropDuplicates`` lacks (its state grows with
    every distinct key ever seen). A duplicate arriving within the
    watermark of its first occurrence is dropped; later re-occurrences
    (beyond state eviction) can re-emit — the standard at-least-once
    ingest-dedup contract. On a batch DataFrame the same call is an
    exact ``dropDuplicates`` (deterministic for the oracle).
    """
    if df.isStreaming and time_col and watermark:
        return df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)

"""Batch sessionization and rolling time-window aggregates.

``transform::session_window`` covers the STREAMING session shape
(state + watermark); these are the batch-side equivalents over an
already-landed event table — one keyed shuffle plus window passes, no
state store. YAML-callable inside ``transform::generic`` as
``sessions.sessionize`` / ``sessions.rolling``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_ALLOWED_AGGS = ("sum", "avg", "min", "max", "count")


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session index to each event: a new session
    starts whenever the gap to the key's previous event exceeds
    ``gap_seconds`` (the classic inactivity-gap definition — identical
    semantics to streaming ``session_window``, computed in batch).
    Adds ``session_col`` (1-based bigint per key).

    One hash shuffle on the keys, then two window passes (lag + running
    sum) over the same partitioning — Catalyst reuses the sort. Result
    is deterministic even with tied timestamps: equal timestamps have
    gap 0 and always share a session, and the running-sum value at a
    row doesn't depend on how the sort broke the tie.
    """
    if gap_seconds <= 0:
        raise ValueError("sessionize: gap_seconds must be > 0")
    # microsecond precision: unix_timestamp() truncates to whole
    # seconds, which silently merges sessions split by a gap that
    # crosses a second boundary by less than 1 s. The window orders by
    # the SAME expression the gap uses — ordering by the raw column
    # would sort string timestamps lexicographically and hand lag() a
    # non-chronological neighbor
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*key_cols).orderBy(ts_us)
    prev = F.lag(ts_us).over(w)
    new_session = (
        prev.isNull() | ((ts_us - prev) > F.lit(int(gap_seconds) * 1_000_000))
    ).cast("bigint")
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def rolling(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    partition_cols: Optional[List[str]] = None,
    aggs: Sequence[str] = ("sum",),
) -> DataFrame:
    """Rolling time-range aggregates: for every event, aggregate
    ``value_col`` over the trailing ``window_seconds`` (inclusive of
    the current row) within its partition — "volume in the last hour
    per user" as columns ``roll_<agg>``. A RANGE window frame on the
    epoch seconds, so irregular event spacing is handled exactly (no
    bucketing artifacts); the cost is one keyed shuffle + one sorted
    window pass regardless of how many aggs are requested.
    """
    if window_seconds <= 0:
        raise ValueError("rolling: window_seconds must be > 0")
    bad = [a for a in aggs if a not in _ALLOWED_AGGS]
    if bad:
        raise ValueError(f"rolling: unknown aggs {bad}; allowed {_ALLOWED_AGGS}")
    w = (
        Window.partitionBy(*(partition_cols or []))
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-int(window_seconds) * 1_000_000, 0)
    )
    out = df
    for agg in aggs:
        expr = getattr(F, agg)(F.col(value_col)).over(w)
        if agg == "avg":
            expr = F.round(expr, 6)
        out = out.withColumn(f"roll_{agg}", expr)
    return out

"""Scalable as-of (most-recent-match) join.

Time-series enrichment — "for each event, the latest reading at or
before it" — is a range join neither ANSI SQL nor Spark has natively.
The naive formulation (inequality join + row_number) explodes to
|left| × |right-rows-before| intermediate pairs; at 100 TB that is the
difference between a job and an outage.

This implements the standard linear-scan formulation instead: union
both sides tagged, one shuffle on the join keys, one window pass per
partition carrying the last-seen right payload forward. Cost is
O((|L|+|R|) log) for the sort — no pair explosion, no skew beyond what
the key distribution already has, AQE-compatible.

The right payload travels as a single struct column so
``last(ignorenulls=True)`` skips *left* rows but never a right row
whose individual value happens to be NULL.

YAML-callable as ``asof.join`` inside ``transform::generic``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window, functions as F

_MATCHED = "__asof_ts"


def join(
    left: DataFrame,
    right: DataFrame,
    on: Optional[Union[str, Sequence[str]]] = None,
    left_ts: str = "",
    right_ts: Optional[str] = None,
    right_cols: Optional[List[str]] = None,
    direction: str = "backward",
    tolerance: Optional[Column] = None,
    suffix: str = "_right",
    join_on: Optional[Union[str, Sequence[str]]] = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same key(s)
    (``direction='backward'``; ``'forward'`` takes the smallest
    ``right_ts`` >= ``left_ts``; ``'nearest'`` takes whichever of the
    two is closer in time, ties to backward). Unmatched left rows keep
    NULLs — left-outer semantics, like pandas ``merge_asof`` / DuckDB
    ``ASOF LEFT JOIN``.

    ``tolerance``: optional Column/literal; backward matches further
    than ``left_ts - tolerance`` (forward: beyond ``left_ts +
    tolerance``; nearest: either bound) are nulled out. Same unit as
    the ts columns.

    ``'nearest'`` stays one shuffle: both directional scans share the
    key exchange (two in-partition sorts over it), and the per-row
    choice is a column expression on the two candidates.

    The matched right timestamp is always returned as ``right_ts +
    suffix``; right value columns keep their names unless they collide
    with a left column, in which case ``suffix`` is appended.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest'"
        )
    # join_on is the YAML-safe alias: a bare `on:` key parses as
    # boolean True under YAML 1.1
    on = on if on is not None else join_on
    if not on or not left_ts:
        raise ValueError("asof.join requires on/join_on and left_ts")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != rts]

    # native type, no cast: a double would silently lose precision on
    # int64 epoch-nanos (> 2^53)
    payload = F.struct(
        F.col(rts).alias(_MATCHED),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("__t"),
        payload.alias("__rv"),
    )
    rv_type = r.schema["__rv"].dataType

    left_cols = left.columns
    l = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(rv_type).alias("__rv"),
        F.lit(1).alias("__is_left"),
    )
    r = r.select(
        *[
            F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.col("__t"),
        F.col("__rv"),
        F.lit(0).alias("__is_left"),
    )
    unioned = l.unionByName(r)

    # Right rows sort before left rows at equal __t, making the match
    # inclusive; 'forward' just scans time in reverse. Both windows
    # share the key partitioning, so 'nearest' costs one shuffle with
    # two in-partition sorts, never a second exchange.
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def within(m, side):
        # native arithmetic: numeric ts take a numeric tolerance,
        # timestamp ts take an INTERVAL literal
        if tolerance is None:
            return m
        if side == "backward":
            ok = m[_MATCHED] >= F.col("__t") - tolerance
        else:
            ok = m[_MATCHED] <= F.col("__t") + tolerance
        return F.when(ok, m).otherwise(F.lit(None).cast(rv_type))

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        matched = unioned.withColumn(
            "__m", F.last("__rv", ignorenulls=True).over(w)
        ).where(F.col("__is_left") == 1)
        matched = matched.withColumn("__m", within(F.col("__m"), direction))
    else:  # nearest: closer of the two candidates, ties to backward
        matched = (
            unioned.withColumn("__mb", F.last("__rv", ignorenulls=True).over(w_back))
            .withColumn("__mf", F.last("__rv", ignorenulls=True).over(w_fwd))
            .where(F.col("__is_left") == 1)
        )
        mb = within(F.col("__mb"), "backward")
        mf = within(F.col("__mf"), "forward")
        closer_fwd = (F.col("__t") - mb[_MATCHED]) > (mf[_MATCHED] - F.col("__t"))
        matched = matched.withColumn(
            "__m",
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(closer_fwd, mf)
            .otherwise(mb),
        ).drop("__mb", "__mf")

    out_cols = [F.col(c) for c in left_cols]
    out_cols.append(F.col("__m")[_MATCHED].alias(rts + suffix))
    for c in right_cols:
        name = c + suffix if c in left_cols else c
        out_cols.append(F.col("__m")[c].alias(name))
    return matched.select(*out_cols)

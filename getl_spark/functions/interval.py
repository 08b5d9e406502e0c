"""Bucketized interval (range) join.

"Which interval(s) contain this point" — sessionization, event-in-
maintenance-window tagging, IP-range lookups. Naive SQL is an
inequality join: Spark plans it as BroadcastNestedLoopJoin (or worse, a
cartesian product) whose cost is |points| × |intervals| — the classic
range-join blow-up at scale.

The scale path here is binning (the same strategy as Databricks' range
join optimization, public docs): intervals explode to the fixed-width
buckets they cover, points map to exactly one bucket, and the join
becomes an *equi-join* on (keys…, bucket) followed by an exact
containment filter. Each (point, interval) pair meets in precisely one
bucket — the point's — so no dedup is needed. Cost:
|intervals| × avg-interval-width/bucket_width explosion on the small
side, hash join on the rest; pick ``bucket_width`` near the median
interval length.

YAML-callable as ``interval.join`` (two-input ``transform::generic``)
or through any custom block.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F

_CLOSED = {"both", "left", "right", "neither"}


def join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: Union[int, float],
    on: Optional[Union[str, Sequence[str]]] = None,
    closed: str = "both",
    suffix: str = "_iv",
    join_on: Optional[Union[str, Sequence[str]]] = None,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it
    (``closed`` picks boundary inclusivity), optionally also matching
    key columns ``on``. Numeric point/start/end columns (cast
    timestamps to epoch first — keeps bucket arithmetic exact).

    Output: all point columns, then interval columns (``suffix`` added
    on name collisions).
    """
    if closed not in _CLOSED:
        raise ValueError(f"closed must be one of {sorted(_CLOSED)}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    # YAML-safe alias (bare `on:` parses as boolean True in YAML 1.1)
    on = on if on is not None else join_on
    keys = [on] if isinstance(on, str) else list(on or [])

    bw = F.lit(bucket_width)
    pt = points.withColumn("__bucket", F.floor(F.col(point_col) / bw))
    # malformed start>end intervals can never match, but Spark's
    # sequence() would silently emit a DESCENDING bucket range for them
    # — drop them before the explode
    intervals = intervals.where(F.col(start_col) <= F.col(end_col))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bw), F.floor(F.col(end_col) / bw)
            )
        ),
    )

    lo = (
        F.col(f"__iv.{start_col}") <= F.col(f"__pt.{point_col}")
        if closed in ("both", "left")
        else F.col(f"__iv.{start_col}") < F.col(f"__pt.{point_col}")
    )
    hi = (
        F.col(f"__pt.{point_col}") <= F.col(f"__iv.{end_col}")
        if closed in ("both", "right")
        else F.col(f"__pt.{point_col}") < F.col(f"__iv.{end_col}")
    )
    cond = F.col("__pt.__bucket") == F.col("__iv.__bucket")
    for k in keys:
        cond = cond & (F.col(f"__pt.{k}") == F.col(f"__iv.{k}"))

    joined = pt.alias("__pt").join(iv.alias("__iv"), cond & lo & hi, "inner")

    point_cols = [c for c in points.columns]
    out = [F.col(f"__pt.{c}").alias(c) for c in point_cols]
    for c in intervals.columns:
        if c in keys:
            continue
        name = c + suffix if c in point_cols else c
        out.append(F.col(f"__iv.{c}").alias(name))
    return joined.select(*out)

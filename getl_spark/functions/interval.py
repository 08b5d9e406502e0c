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


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: Union[int, float],
    right_start: Optional[str] = None,
    right_end: Optional[str] = None,
    on: Optional[Union[str, Sequence[str]]] = None,
    closed: str = "both",
    suffix: str = "_right",
    join_on: Optional[Union[str, Sequence[str]]] = None,
) -> DataFrame:
    """Interval × interval overlap join — every (left, right) pair
    whose ranges intersect (log spans × maintenance windows, genomic
    ranges, session × incident correlation). ``closed='both'`` counts
    touching endpoints as overlap; ``'neither'`` requires
    positive-measure overlap. Right-side columns default to the same
    names as the left's.

    Same binning strategy as ``join``, with the overlap twist: both
    sides explode to covered buckets, so an overlapping pair would
    meet in EVERY shared bucket — each pair is therefore emitted only
    in its canonical bucket (the bucket of the later start), which
    keeps exactly one copy with no distinct pass. Cost: width/bucket
    explosion on both sides, then a hash equi-join — never a
    BroadcastNestedLoopJoin.
    """
    if closed not in ("both", "neither"):
        raise ValueError("overlap_join: closed must be 'both' or 'neither'")
    if bucket_width <= 0:
        raise ValueError("overlap_join: bucket_width must be positive")
    on = on if on is not None else join_on
    keys = [on] if isinstance(on, str) else list(on or [])
    rs = right_start or start_col
    re_ = right_end or end_col

    bw = F.lit(bucket_width)

    def exploded(df, s, e):
        return df.where(F.col(s) <= F.col(e)).withColumn(
            "__bucket",
            F.explode(
                F.sequence(F.floor(F.col(s) / bw), F.floor(F.col(e) / bw))
            ),
        )

    l = exploded(left, start_col, end_col).alias("__l")
    r = exploded(right, rs, re_).alias("__r")

    cond = F.col("__l.__bucket") == F.col("__r.__bucket")
    for k in keys:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    # canonical bucket: the later interval start's bucket — the first
    # bucket the pair shares, so the pair survives exactly once
    canonical = F.col("__l.__bucket") == F.greatest(
        F.floor(F.col(f"__l.{start_col}") / bw),
        F.floor(F.col(f"__r.{rs}") / bw),
    )
    if closed == "both":
        overlap = (F.col(f"__l.{start_col}") <= F.col(f"__r.{re_}")) & (
            F.col(f"__r.{rs}") <= F.col(f"__l.{end_col}")
        )
    else:
        overlap = (F.col(f"__l.{start_col}") < F.col(f"__r.{re_}")) & (
            F.col(f"__r.{rs}") < F.col(f"__l.{end_col}")
        )

    joined = l.join(r, cond & canonical & overlap, "inner")
    left_cols = list(left.columns)
    out = [F.col(f"__l.{c}").alias(c) for c in left_cols]
    for c in right.columns:
        if c in keys:
            continue
        name = c + suffix if c in left_cols else c
        out.append(F.col(f"__r.{c}").alias(name))
    return joined.select(*out)

"""Dataset profiling — the pre-flight scan before a big pipeline run.

YAML-callable as ``stats.<name>`` inside ``transform::generic``.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def profile(df: DataFrame, columns: Optional[List[str]] = None) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_null, n_distinct)``.

    Catching a null-riddled or constant column here costs one scan;
    catching it after a three-hour join cascade costs the cascade.

    Shape: columns are stacked into (name, value-as-string) rows — one
    ``explode``, row growth × n_columns — then one partial-aggregated
    shuffle on the column name (k distinct keys, so the reduce side is
    k rows regardless of input size). Exact distinct counts; for
    quick-look profiling of very wide/huge tables use
    ``sketch.distinct_sketch`` per column instead (mergeable, no
    row-multiplication).
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile: columns not in DataFrame: {missing}")
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return stacked.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null"),
        F.count_distinct("value").alias("n_distinct"),
    )

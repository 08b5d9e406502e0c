"""Skew-mitigation join: salting for heavy-hitter keys.

AQE's skew-join handles most runtime skew (enabled in the session
factory), but salting is the deterministic plan-level tool when one
side has keys so hot that even split partitions overwhelm a task: the
big side scatters each key across ``salt`` sub-keys, the small side is
replicated ``salt`` times, and the join runs on ``keys + salt`` with
near-uniform partitions. Cost: small side inflated ×salt — use for
dimension-sized right sides only.

YAML-callable inside ``transform::generic`` as ``skew.salted_join``
(multi-input block).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__getl_salt"


def salted_join(
    left_df: DataFrame,
    right_df: DataFrame,
    cols: List[str],
    join_type: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join on ``cols`` with the left side salted.

    Result-equivalent to ``left_df.join(right_df, cols, join_type)``
    for inner/left joins (asserted in tests).
    """
    salted_left = left_df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*left_df.columns), F.lit(salt)).cast("int")
    )
    replicated_right = right_df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_left.join(
        replicated_right, cols + [SALT_COL], join_type
    ).drop(SALT_COL)


def top_keys(
    df: DataFrame,
    cols: List[str],
    k: int = 20,
) -> DataFrame:
    """Heavy-hitter diagnosis BEFORE a big join/agg: the ``k`` most
    frequent key tuples with count, share of all rows, and a suggested
    salt factor — ``ceil(count / median key count)`` capped at 64, i.e.
    enough sub-keys to flatten the hitter down to a TYPICAL key's load.
    One partial-aggregated shuffle + a 1-row stats broadcast + a
    TakeOrdered top-k (no global window, no single-partition stage);
    run it on a sample for quick looks at very large inputs.

    Returns ``(keys..., n, share, suggested_salt)`` ordered by n desc.
    """
    if k < 1:
        raise ValueError("top_keys: k must be >= 1")
    counts = df.groupBy(*cols).agg(F.count("*").alias("n"))
    stats = counts.agg(
        F.sum("n").alias("__t"),
        F.percentile_approx("n", 0.5).alias("__med"),
    )
    top = counts.orderBy(
        F.col("n").desc(), *[F.col(c).asc_nulls_last() for c in cols]
    ).limit(k)
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            *cols,
            "n",
            F.round(F.col("n") / F.col("__t"), 6).alias("share"),
            F.least(
                F.greatest(
                    F.ceil(F.col("n") / F.greatest(F.col("__med"), F.lit(1))).cast(
                        "int"
                    ),
                    F.lit(1),
                ),
                F.lit(64),
            ).alias("suggested_salt"),
        )
        .orderBy(F.col("n").desc(), *cols)
    )

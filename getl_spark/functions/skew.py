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

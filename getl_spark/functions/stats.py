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


def correlations(
    df: DataFrame,
    columns: List[str],
    method: str = "pearson",
) -> DataFrame:
    """Pairwise correlation matrix over numeric columns, computed in
    ONE aggregate pass: ``(col_a, col_b, corr)`` for every unordered
    pair, ``col_a < col_b``. The standard pre-training feature sanity
    check (finding redundant or leaking signals) without k² scans —
    ``F.corr`` aggregates are all map-side partial, so the reduce side
    is a single row regardless of input size.
    """
    if method != "pearson":
        raise ValueError("correlations: only pearson is implemented")
    if len(columns) < 2:
        raise ValueError("correlations: need at least two columns")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"correlations: columns not in DataFrame: {missing}")
    pairs = [
        (a, b) for i, a in enumerate(columns) for b in columns[i + 1 :]
    ]
    row = df.agg(
        *[F.corr(a, b).alias(f"__c{i}") for i, (a, b) in enumerate(pairs)]
    )
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.round(F.col(f"__c{i}"), 6).alias("corr"),
                    )
                    for i, (a, b) in enumerate(pairs)
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.col_a", "p.col_b", "p.corr")


def histogram(
    df: DataFrame,
    column: str,
    bins: int = 10,
) -> DataFrame:
    """Equi-width histogram of a numeric column:
    ``(bucket, lo, hi, n)`` for ``bins`` buckets spanning [min, max]
    (max-valued rows land in the last bucket; NULLs excluded). One
    aggregate for the bounds (1-row broadcast) + one keyed count —
    profiling cost is two scans of one column regardless of table
    width.
    """
    if bins < 1:
        raise ValueError("histogram: bins must be >= 1")
    bounds = df.agg(
        F.min(F.col(column).cast("double")).alias("__lo"),
        F.max(F.col(column).cast("double")).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bucket = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(column).cast("double") - F.col("__lo")) / width).cast(
                "int"
            ),
            F.lit(bins - 1),
        )
    )
    return (
        df.where(F.col(column).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            bucket.alias("bucket"),
            (F.col("__lo") + bucket * width).alias("lo"),
            (F.col("__lo") + (bucket + 1) * width).alias("hi"),
        )
        .groupBy("bucket", "lo", "hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            F.round("lo", 6).alias("lo"),
            F.round("hi", 6).alias("hi"),
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("bucket")
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: List[str],
    compare_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Keyed reconciliation of two table versions — the migration /
    backfill validation primitive: for every key in either side,
    ``status`` ∈ ``added`` (right only), ``removed`` (left only),
    ``changed`` (both, some compared column differs), ``unchanged``.

    ``compare_cols`` defaults to the non-key columns present in BOTH
    schemas. Comparison is null-safe (NULL == NULL). One full outer
    equi-join on the keys — sort-merge at scale, broadcast when one
    side is small; aggregate the result for a summary, or filter
    ``status != 'unchanged'`` for the discrepancy list.

    YAML-callable inside ``transform::generic`` with
    ``Input: [Left, Right]`` as ``stats.table_diff``.
    """
    if not keys:
        raise ValueError("table_diff: need at least one key column")
    if compare_cols is None:
        compare_cols = [
            c for c in left.columns if c not in keys and c in right.columns
        ]
    lhs = left.select(
        *[F.col(k).alias(f"__lk_{k}") for k in keys],
        *[F.col(c).alias(f"__l_{c}") for c in compare_cols],
    )
    rhs = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
    )
    cond = None
    for k in keys:
        eq = F.col(f"__lk_{k}").eqNullSafe(F.col(f"__rk_{k}"))
        cond = eq if cond is None else cond & eq
    in_left = F.col(f"__lk_{keys[0]}").isNotNull()
    in_right = F.col(f"__rk_{keys[0]}").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
    status = (
        F.when(~in_right, F.lit("removed"))
        .when(~in_left, F.lit("added"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        lhs.join(rhs, cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(f"__lk_{k}"), F.col(f"__rk_{k}")).alias(k)
                for k in keys
            ],
            status.alias("status"),
        )
    )

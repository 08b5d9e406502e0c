"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark ≥3.5 as ``hll_sketch_agg`` / ``hll_union_agg``).

The 100 TB pattern: computing ``COUNT(DISTINCT x)`` over the whole lake
per report is a full shuffle of every distinct value. Instead, sketch
each partition/day/source ONCE into a few-KB binary, store the
sketches, and answer any later rollup ("distinct users last 90 days",
"unique docs per source overall") by *merging sketches* — no rescan, no
re-shuffle of raw data, ~2% standard error at the default lgK=12.

All JVM aggregate expressions (DataSketches is codegen'd); sketches are
plain ``binary`` columns, so they persist through any sink and merge
across jobs, clusters, and days.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from getl_spark.common.scale import local_df

DEFAULT_LGK = 12  # 2^12 buckets ≈ 2% relative standard error


def distinct_sketch(
    df: DataFrame,
    value_col: str,
    group_by: Optional[Sequence[str]] = None,
    sketch_col: str = "hll_sketch",
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per group (or one row total):
    the build step, run close to the data (per partition/day/source)."""
    keys = list(group_by or [])
    agg = F.hll_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col)
    return df.groupBy(*keys).agg(agg) if keys else df.agg(agg)


def merge_sketches(
    df: DataFrame,
    sketch_col: str = "hll_sketch",
    group_by: Optional[Sequence[str]] = None,
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Merge stored sketches (optionally re-grouped to a coarser key)
    and emit the cardinality estimate — the rollup step, touching only
    sketch bytes, never the raw data."""
    keys = list(group_by or [])
    merged = F.hll_union_agg(sketch_col, F.lit(True)).alias(sketch_col)
    out = df.groupBy(*keys).agg(merged) if keys else df.agg(merged)
    return out.withColumn(estimate_col, F.hll_sketch_estimate(sketch_col))


def distinct_estimate(
    df: DataFrame,
    value_col: str,
    group_by: Optional[Sequence[str]] = None,
    estimate_col: str = "distinct_estimate",
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Build + estimate in one pass (when no sketch needs storing)."""
    sk = distinct_sketch(df, value_col, group_by, lgk=lgk)
    return sk.withColumn(estimate_col, F.hll_sketch_estimate("hll_sketch")).drop(
        "hll_sketch"
    )


# ---------------------------------------------------- quantile sketches
_KLL_DTYPES = ("double", "float", "bigint")


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_by: Optional[Sequence[str]] = None,
    sketch_col: str = "kll_sketch",
    dtype: str = "double",
) -> DataFrame:
    """One KLL quantile sketch of ``value_col`` per group — the
    mergeable alternative to exact percentiles (which need a full sort
    of every value): build per partition/day, answer any
    quantile/rank later from the sketch bytes."""
    if dtype not in _KLL_DTYPES:
        raise ValueError(f"dtype must be one of {_KLL_DTYPES}")
    agg = getattr(F, f"kll_sketch_agg_{dtype}")(
        F.col(value_col).cast(dtype)
    ).alias(sketch_col)
    keys = list(group_by or [])
    return df.groupBy(*keys).agg(agg) if keys else df.agg(agg)


def merge_quantile_sketches(
    df: DataFrame,
    quantiles: Sequence[float],
    sketch_col: str = "kll_sketch",
    group_by: Optional[Sequence[str]] = None,
    dtype: str = "double",
) -> DataFrame:
    """Merge stored KLL sketches (optionally to a coarser grouping) and
    emit ``q_<quantile>`` columns."""
    if dtype not in _KLL_DTYPES:
        raise ValueError(f"dtype must be one of {_KLL_DTYPES}")
    keys = list(group_by or [])
    merged = getattr(F, f"kll_merge_agg_{dtype}")(sketch_col).alias(sketch_col)
    out = df.groupBy(*keys).agg(merged) if keys else df.agg(merged)
    get_q = getattr(F, f"kll_sketch_get_quantile_{dtype}")
    for q in quantiles:
        name = f"q_{str(q).replace('.', '_')}"
        out = out.withColumn(name, get_q(F.col(sketch_col), F.lit(float(q))))
    return out.drop(sketch_col)


# ----------------------------------------------------- theta set algebra
def theta_sketch(
    df: DataFrame,
    value_col: str,
    group_by: Optional[Sequence[str]] = None,
    sketch_col: str = "theta_sketch",
) -> DataFrame:
    """Theta sketch per group: like HLL but supporting set *algebra* —
    union, intersection, and difference cardinalities across stored
    sketches ("unique users in source A ∩ B" without joining raw
    data)."""
    keys = list(group_by or [])
    agg = F.theta_sketch_agg(value_col).alias(sketch_col)
    return df.groupBy(*keys).agg(agg) if keys else df.agg(agg)


def theta_estimate(
    left: DataFrame,
    right: DataFrame,
    op: str = "intersection",
    sketch_col: str = "theta_sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Cardinality of ``left <op> right`` from two single-row sketch
    frames (``op``: union | intersection | difference)."""
    ops = {
        "union": F.theta_union,
        "intersection": F.theta_intersection,
        "difference": F.theta_difference,
    }
    if op not in ops:
        raise ValueError(f"op must be one of {sorted(ops)}")
    combined = left.select(F.col(sketch_col).alias("__a")).crossJoin(
        right.select(F.col(sketch_col).alias("__b"))
    )
    return combined.select(
        F.theta_sketch_estimate(ops[op]("__a", "__b")).alias(estimate_col)
    )


# ------------------------------------------------ group MinHash / Jaccard
def group_minhash(
    df: "DataFrame",
    group_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
) -> "DataFrame":
    """One MinHash signature per GROUP (source, snapshot, shard) over
    the union of its documents' word-``n``-gram shingles:
    ``(group, sig: array<bigint>)``. Mergeable like the other sketches
    — min is associative, so per-partition partial aggregation applies
    and signatures for two corpus snapshots can be compared without
    re-reading either. One shuffle keyed by group.
    """
    from getl_spark.functions.dedup import _shingles

    sh = _shingles(
        df.select(F.col(group_col).alias("id"), F.col(text_col).alias("__t")),
        "id",
        "__t",
        n,
    ).select("id", F.xxhash64("shingle").alias("base"))
    hashed = sh.select(
        "id",
        F.array(
            *[F.xxhash64(F.lit(i), F.col("base")) for i in range(num_hashes)]
        ).alias("hashes"),
    )
    mins = [F.min(F.col("hashes")[i]).alias(f"h{i}") for i in range(num_hashes)]
    return (
        hashed.groupBy("id")
        .agg(*mins)
        .select(
            F.col("id").alias(group_col),
            F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"),
        )
    )


def jaccard_matrix(
    df: "DataFrame",
    group_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
) -> "DataFrame":
    """Estimated pairwise shingle-set Jaccard between every pair of
    groups: ``(group_a, group_b, jaccard_est)`` with group_a < group_b.
    The signature table is one row per group, so the pairwise step is a
    cross join of tiny frames — corpus cost is ONE scan + one keyed
    shuffle regardless of how many pairs get compared (vs an
    inverted-index join per pair). Estimator std ≈ √(j(1−j)/k); raise
    ``num_hashes`` for tighter estimates. The hash family makes this
    SQL-inexpressible — verified in pytest against exact Jaccard.
    """
    sigs = group_minhash(df, group_col, text_col, n, num_hashes)
    a = sigs.select(
        F.col(group_col).alias("group_a"), F.col("sig").alias("__sa")
    )
    b = sigs.select(
        F.col(group_col).alias("group_b"), F.col("sig").alias("__sb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "__sa", "__sb", lambda x, y: (x == y).cast("int")
                    ),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(float(num_hashes)),
                6,
            ).alias("jaccard_est"),
        )
    )


# ------------------------------------------------- count-min frequency
def freq_sketch(
    df: "DataFrame",
    value_col: str,
    group_cols=(),
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    sketch_col: str = "cms_sketch",
) -> "DataFrame":
    """Count-Min frequency sketch per group (Spark's built-in
    ``count_min_sketch`` aggregate): ``(group_cols..., sketch_col,
    n_rows)``. Approximate item counts with one-sided error — an
    estimate is ≥ the true count, and ≤ true + eps·N with probability
    ``confidence``. The heavy-hitter / frequency primitive when an
    exact groupBy on the VALUE would shuffle corpus-scale
    cardinality: the sketch is ~(2/eps)·depth·8 bytes regardless of
    how many distinct values stream through it, and sketches MERGE —
    sketch each day/shard once, fold increments together, query
    without rescanning (same lifecycle as the HLL/KLL/Theta
    families). Map-side partial aggregation carries the row volume;
    the reduce side moves one sketch per group.
    """
    if not 0 < eps < 1 or not 0 < confidence < 1:
        raise ValueError("freq_sketch: eps and confidence must be in (0, 1)")
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    agg = [
        F.expr(
            f"count_min_sketch(`{value_col}`, CAST({eps!r} AS DOUBLE), "
            f"CAST({confidence!r} AS DOUBLE), {int(seed)})"
        ).alias(sketch_col),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    return df.groupBy(*group_cols).agg(*agg) if group_cols else df.agg(*agg)


def freq_estimate(
    sketches: "DataFrame",
    items,
    group_cols=(),
    sketch_col: str = "cms_sketch",
    item_col: str = "item",
    estimate_col: str = "estimate",
    max_groups: int = 10_000,
) -> "DataFrame":
    """Query ``freq_sketch`` output for the given items: one row per
    (group, item) with the estimated count. Sketch rows for the same
    group (per-day increments) are MERGED before querying, so a
    grouped sketch table accumulated over time answers as one.

    The sketch table is dimension-sized by construction (one row per
    group/increment); it is collected to the driver under a hard
    ``max_groups`` bound (the ANN ``max_queries`` contract) and
    queried through the JVM CountMinSketch — per item, never per
    corpus row.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    items = list(items)
    if not items:
        raise ValueError("freq_estimate: items must be non-empty")
    # one homogeneous supported type only: a mixed or float item list
    # would either mis-declare the output schema or hit the wrong
    # JVM estimateCount overload via py4j dispatch — refuse loudly
    if all(isinstance(i, str) for i in items):
        item_type = "string"
    elif all(isinstance(i, int) and not isinstance(i, bool) for i in items):
        item_type = "bigint"
    else:
        raise TypeError(
            "freq_estimate: items must be all-str or all-int (bool/float/"
            f"mixed lists are not supported), got {sorted({type(i).__name__ for i in items})}"
        )
    rows = sketches.select(*group_cols, sketch_col).limit(max_groups + 1).collect()
    if len(rows) > max_groups:
        raise ValueError(
            f"freq_estimate: sketch table exceeds max_groups={max_groups}; "
            f"a sketch table should be dimension-sized — aggregate "
            f"increments with fewer groups or raise max_groups"
        )
    spark = sketches.sparkSession
    jvm = spark.sparkContext._jvm
    merged = {}
    for r in rows:
        key = tuple(r[c] for c in group_cols)
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytearray(r[sketch_col])
        )
        if key in merged:
            merged[key].mergeInPlace(sk)
        else:
            merged[key] = sk
    out = [
        key + (item, int(sk.estimateCount(item)))
        for key, sk in sorted(merged.items(), key=lambda kv: str(kv[0]))
        for item in items
    ]
    schema_groups = "".join(
        f"`{c}` {sketches.schema[c].dataType.simpleString()}, "
        for c in group_cols
    )
    return local_df(spark,
        out,
        f"{schema_groups}`{item_col}` {item_type}, `{estimate_col}` bigint",
    )

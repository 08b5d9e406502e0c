"""Scale helpers shared by compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize(df: DataFrame) -> DataFrame:
    """Repartition compute-heavy inputs up to cluster parallelism.

    A small parquet file arrives as one partition; per-row heavy work
    (shingling, hashing, pandas batches) would then run on one core.
    Partition count must match compute cost, not input bytes — a
    few-MB shuffle buys full-cluster parallelism. No-op when the input
    is already wide (the 100 TB case, where file count ≫ cores).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

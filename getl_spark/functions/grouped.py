"""Grouped custom aggregation via Arrow-batched ``applyInPandas``.

The escape hatch for per-group logic the built-in aggregates can't
express (model scoring per key, per-entity normalization, custom
sessionization). Each group arrives as one pandas DataFrame on an
executor — groups must fit in executor memory, so key cardinality and
skew are the scale knobs (salt heavy keys upstream if a single group
outgrows memory).

``zscore`` is the reference implementation of the pattern and is
oracle-checkable (mean/std are SQL-expressible).
"""

from __future__ import annotations

from typing import List

import pandas as pd

from pyspark.sql import DataFrame


def zscore(
    df: DataFrame,
    group_by: List[str],
    value_col: str,
    new_col: str = "zscore",
    ndigits: int = 4,
) -> DataFrame:
    """Per-group z-score of ``value_col`` (sample stddev), rounded for
    cross-engine determinism."""
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{out_fields}, {new_col} double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf[value_col].mean()
        std = pdf[value_col].std(ddof=1)
        if pd.isna(std) or std == 0:
            pdf[new_col] = None
        else:
            pdf[new_col] = ((pdf[value_col] - mean) / std).round(ndigits)
        return pdf

    return df.groupBy(*group_by).applyInPandas(normalize, out_schema)

"""The chainable transform operator library.

Capability parity with ``getl/blocks/transform/transform.py`` (432 LoC
of thin DataFrame wrappers), re-implemented fresh. Every operator takes
and returns a lazy DataFrame, so a chain of them stays one Catalyst
plan — filters written through the predicate DSL push down to the scan,
projections prune columns, and no operator forces execution.

Deliberately replicated reference quirks (see SURVEY.md §7 risk
register):

* ``filter_dataframe`` is ``df.subtract(df.where(p))`` — set
  difference, which also deduplicates, NOT ``where(NOT p)``
  (``transform.py:221-223``);
* ``drop_duplicates`` with a column subset keys on
  ``concat_ws("-", *cols)`` so *nested* columns work
  (``transform.py:256-261``) — separator collisions are observable;
* ``concat`` interleaves delimiter literals and null-propagates,
  unlike ``concat_ws`` (``transform.py:226-245``);
* ``select``'s ``add_new_column`` creates a ``void``-typed column via
  ``F.lit(None)`` unless ``default_value == "array()"``
  (``transform.py:388-395``).
"""

from __future__ import annotations

from typing import Any, List, Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from getl_spark.operators.predicate import predicate_to_sql


# ----------------------------------------------------------------- helpers
def _has_column(df: DataFrame, column: str) -> bool:
    try:
        df[column]
        return True
    except AnalysisException:
        return False


def _require_column(df: DataFrame, column: str) -> None:
    if not _has_column(df, column):
        raise ValueError(
            f"Column '{column}' is not present in the dataframes columns: "
            f"{df.columns}"
        )


# ------------------------------------------------------------- projection
def select(dataframe: DataFrame, cols: List[dict]) -> DataFrame:
    """Project/rename/cast in one pass; optionally add missing columns.

    Each entry: ``{col, alias?, cast?, add_new_column?, default_value?}``.
    Nested paths (``a.b``) are selectable; casting a nested path
    requires an alias (the cast would otherwise create a literal dotted
    column name).
    """
    out_names: List[str] = []
    for spec in cols:
        dataframe, name = _apply_column_spec(dataframe, **spec)
        out_names.append(name)
    return dataframe.select(*out_names)


def _apply_column_spec(
    dataframe: DataFrame,
    col: str,
    add_new_column: bool = False,
    alias: Optional[str] = None,
    cast: Optional[str] = None,
    default_value: Optional[str] = None,
):
    if not add_new_column:
        _require_column(dataframe, col)
    if not _has_column(dataframe, col):
        if default_value == "array()":
            dataframe = dataframe.withColumn(col, F.array().cast("array<string>"))
        else:
            dataframe = dataframe.withColumn(col, F.lit(None))
    if alias:
        dataframe = dataframe.withColumn(alias, F.col(col))
        col = alias
    if cast:
        if "." in col:
            raise ValueError(
                f"Can not cast nested column {col} please use the alias parameter also."
            )
        dataframe = cast_column(dataframe, col, cast)
    return dataframe, col


def rename_column(dataframe: DataFrame, col: str, new_name: str) -> DataFrame:
    _require_column(dataframe, col)
    return dataframe.withColumnRenamed(col, new_name)


def cast_column(dataframe: DataFrame, col: str, new_type: str) -> DataFrame:
    _require_column(dataframe, col)
    return dataframe.withColumn(col, F.col(col).cast(new_type))


def drop_columns(dataframe: DataFrame, cols: List[str]) -> DataFrame:
    """Extension: drop columns (reachable only via custom code in the
    reference)."""
    return dataframe.drop(*cols)


# -------------------------------------------------------------- filtering
def where(dataframe: DataFrame, predicate) -> DataFrame:
    """Keep rows satisfying a predicate-DSL expression."""
    try:
        return dataframe.where(predicate_to_sql(predicate))
    except AnalysisException as exc:
        raise ValueError(str(exc)) from exc


def filter_dataframe(dataframe: DataFrame, predicate) -> DataFrame:
    """REMOVE rows satisfying the predicate — set-difference semantics
    (deduplicates), matching the reference exactly."""
    return dataframe.subtract(where(dataframe, predicate))


# ------------------------------------------------------------ multi-input
def join(
    left_df: DataFrame,
    right_df: DataFrame,
    cols: List[str],
    join_type: str = "left",
) -> DataFrame:
    """Equi-join on shared column names. Catalyst/AQE picks the
    physical strategy (broadcast for small sides, sort-merge otherwise,
    runtime skew splitting with AQE on)."""
    return left_df.join(right_df, cols, join_type)


def union(left_df: DataFrame, right_df: DataFrame) -> DataFrame:
    """Positional union (schema mismatch → ValueError, as reference)."""
    try:
        return left_df.union(right_df)
    except AnalysisException as exc:
        raise ValueError(str(exc)) from exc


def union_by_name(
    left_df: DataFrame, right_df: DataFrame, allow_missing_columns: bool = False
) -> DataFrame:
    """Extension: name-based union (the reference uses this internally
    for XML batches, ``load/entrypoint.py:190``)."""
    return left_df.unionByName(right_df, allowMissingColumns=allow_missing_columns)


# ---------------------------------------------------------------- dedup
def drop_duplicates(
    dataframe: DataFrame, columns: Optional[List[str]] = None
) -> DataFrame:
    if columns:
        return (
            dataframe.select(F.concat_ws("-", *columns).alias("__getl_dedup_key"), "*")
            .dropDuplicates(["__getl_dedup_key"])
            .drop("__getl_dedup_key")
        )
    return dataframe.dropDuplicates()


# ------------------------------------------------------- scalar/col ops
def explode(dataframe: DataFrame, col: str, new_col: Optional[str] = None) -> DataFrame:
    return dataframe.withColumn(new_col or col, F.explode(col))


def substring(
    dataframe: DataFrame, col: str, new_col: str, pos: int, length: int
) -> DataFrame:
    """1-based substring, as SQL."""
    _require_column(dataframe, col)
    return dataframe.withColumn(new_col, F.substring(col, pos, length))


def split(dataframe: DataFrame, col: str, new_col: str, split_on: str) -> DataFrame:
    """Split on a regex pattern into an array column."""
    _require_column(dataframe, col)
    return dataframe.withColumn(new_col, F.split(F.col(col), split_on))


def get_item(dataframe: DataFrame, col: str, new_col: str, index: Any) -> DataFrame:
    """Array index (0-based) or map/struct key extraction."""
    _require_column(dataframe, col)
    return dataframe.withColumn(new_col, F.col(col).getItem(index))


def get_json_object(
    dataframe: DataFrame, col: str, new_col: str, path: str
) -> DataFrame:
    """JSONPath scalar extraction from a JSON-string column."""
    _require_column(dataframe, col)
    return dataframe.withColumn(new_col, F.get_json_object(F.col(col), "$." + path))


def repartition(
    dataframe: DataFrame,
    num_partitions: Optional[int] = None,
    columns: Optional[List[str]] = None,
) -> DataFrame:
    """Extension: explicit repartitioning — by count (round-robin), by
    columns (hash, pre-shuffling for a downstream co-partitioned op),
    or both. The YAML-level knob for partition-count-follows-compute."""
    if num_partitions and columns:
        return dataframe.repartition(num_partitions, *[F.col(c) for c in columns])
    if columns:
        return dataframe.repartition(*[F.col(c) for c in columns])
    if num_partitions:
        return dataframe.repartition(num_partitions)
    return dataframe


def coalesce_partitions(dataframe: DataFrame, num_partitions: int) -> DataFrame:
    """Extension: shuffle-free partition reduction (small-file control
    before writes)."""
    return dataframe.coalesce(num_partitions)


def hint(dataframe: DataFrame, name: str, columns: Optional[List[str]] = None) -> DataFrame:
    """Extension: Catalyst hint passthrough — ``broadcast``, ``merge``,
    ``shuffle_hash``, ``shuffle_replicate_nl``, ``rebalance`` — for
    overriding join strategy on a specific input."""
    if columns:
        return dataframe.hint(name, *columns)
    return dataframe.hint(name)


def concat(
    dataframe: DataFrame,
    from_columns: List[str],
    to_column: str,
    delimiter: str = "_",
) -> DataFrame:
    """Concatenate columns with a delimiter. NULL-propagating: any NULL
    input nulls the result (this is ``F.concat`` with interleaved
    delimiter literals, intentionally not ``concat_ws``)."""
    pieces: List = []
    for i, name in enumerate(from_columns):
        if i:
            pieces.append(F.lit(delimiter))
        pieces.append(F.col(name).cast(StringType()))
    return dataframe.withColumn(to_column, F.concat(*pieces))


def melt(
    dataframe: DataFrame,
    id_columns: List[str],
    value_columns: List[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long reshape (SQL UNPIVOT / pandas melt): one output row
    per (id row, value column). Spark's native ``unpivot`` — a zero-
    shuffle row generator, so at scale the cost is row expansion only.
    Value columns are cast to a common type by Spark; mixed
    incompatible types raise upfront rather than corrupting data."""
    for c in id_columns + value_columns:
        _require_column(dataframe, c)
    return dataframe.unpivot(
        [F.col(c) for c in id_columns],
        [F.col(c) for c in value_columns],
        var_name,
        value_name,
    )


def flatten(
    dataframe: DataFrame,
    separator: str = "_",
    max_depth: int = 10,
) -> DataFrame:
    """Recursively flatten every struct column into top-level columns
    named ``parent<sep>child`` — the JSON/XML-lake normalization step
    that turns nested ingest output into a relational frame (arrays are
    left intact; pair with ``explode`` to unroll them). Pure projection:
    zero shuffle, and column pruning still reaches the scan because
    each output column maps to one nested field reference.

    Name collisions after flattening (a struct field ``a.b`` next to a
    plain column ``a_b``) raise rather than silently shadowing.
    """
    from pyspark.sql.types import StructType

    cols: List = []
    names: set = set()

    def emit(flat_name: str, expr) -> None:
        if flat_name in names:
            raise ValueError(f"flatten: name collision on '{flat_name}'")
        names.add(flat_name)
        cols.append(expr.alias(flat_name))

    def walk(schema: "StructType", dotted_parts: List[str], flat_prefix: str, depth: int) -> None:
        for sub in schema.fields:
            dotted = dotted_parts + [sub.name]
            flat = flat_prefix + sub.name
            if isinstance(sub.dataType, StructType) and depth < max_depth:
                walk(sub.dataType, dotted, flat + separator, depth + 1)
            else:
                emit(flat, F.col(".".join(f"`{p}`" for p in dotted)))

    for f in dataframe.schema.fields:
        if isinstance(f.dataType, StructType):
            walk(f.dataType, [f.name], f"{f.name}{separator}", 1)
        else:
            emit(f.name, F.col(f"`{f.name}`"))
    return dataframe.select(*cols)

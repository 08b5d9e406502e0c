"""Schema-drift guards (``schema.coerce``).

Generalizes ``add_column.date.ensure_timestamp`` from one column family
to a whole declared type map: a source whose physical layout drifts
between deliveries (int32 → int64, decimal → double, epoch int or
string date → native timestamp — this repo's driver testdata switched
``events.ts`` from int64 nanos to TIMESTAMP(MICROS) between rounds,
and real feeds do the same) is normalized to the types downstream
queries were written against, at load time, in one projection.

Everything is a JVM-side ``cast``/``to_timestamp`` column expression —
no data pass beyond the scan that was already happening, no UDFs, and
Catalyst still prunes/pushes through the projection.

Every load block supports ``CoerceTypes: {col: type, ...}``
(applied in ``sources.entrypoint.resolve``), and the same map is
callable mid-pipeline as ``schema.coerce`` inside
``transform::generic``.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, functions as F

from getl_spark.common.scale import local_df

_INTISH = ("tinyint", "smallint", "int", "bigint", "long", "integer")


def coerce(
    df: DataFrame,
    types: Dict[str, str],
    on_missing: str = "ignore",
    ts_unit: str = "auto",
) -> DataFrame:
    """Cast each named column to its declared type if it arrived as
    something compatible-but-different; no-op for columns already
    right, untouched for columns not named.

    * target ``timestamp`` / ``timestamp_ntz``: full
      ``ensure_timestamp`` semantics — native timestamp/date casts,
      integer epochs interpreted per ``ts_unit`` (default ``auto``:
      magnitude bands, see ``add_column.date.ensure_timestamp``),
      strings parsed with ``to_timestamp`` — then cast to the exact
      declared flavor.
    * target ``date``: same, truncated to date.
    * numeric / string / boolean targets: plain ``cast`` (covers
      decimal↔double, int-width, string-encoded numbers).

    ``on_missing``: ``ignore`` (default) | ``error`` | ``null`` (add
    the column as a typed NULL so downstream projections resolve).
    """
    if on_missing not in ("ignore", "error", "null"):
        raise ValueError(f"schema.coerce: unknown on_missing '{on_missing}'")
    dtypes = dict(df.dtypes)
    for col, target in types.items():
        target = target.strip().lower()
        current = dtypes.get(col)
        if current is None:
            if on_missing == "error":
                raise ValueError(
                    f"schema.coerce: column '{col}' missing (have "
                    f"{sorted(dtypes)})"
                )
            if on_missing == "null":
                df = df.withColumn(col, F.lit(None).cast(target))
            continue
        if current == target:
            continue
        if target == "date" or target.startswith("timestamp"):
            # timestamp / timestamp_ntz / date targets share the
            # timestamp-ish normalization, then cast to the exact
            # declared flavor
            expr = _to_timestamp_expr(col, current, ts_unit)
            df = df.withColumn(col, expr.cast(target))
        else:
            df = df.withColumn(col, F.col(col).cast(target))
    return df


def _to_timestamp_expr(col: str, current: str, ts_unit: str):
    """Timestamp-ish normalization expression for one column — the
    ``ensure_timestamp`` decision table, as an expression builder so
    ``coerce`` can chain ``.cast("date")`` on top."""
    if current.startswith("timestamp") or current == "date":
        return F.col(col).cast("timestamp")
    if current in _INTISH:
        from getl_spark.functions.add_column.date import epoch_micros_expr

        return F.timestamp_micros(epoch_micros_expr(col, ts_unit))
    if current == "string":
        return F.to_timestamp(F.col(col))
    raise ValueError(
        f"schema.coerce: cannot coerce '{col}' ({current}) to a timestamp"
    )


def diff(left: DataFrame, right: DataFrame) -> DataFrame:
    """Schema drift report between two frames (yesterday's snapshot vs
    today's drop, source vs target, branch vs main): one row per
    column path that differs — ``(column, left_type, right_type,
    change)`` with ``change`` ∈ ``added`` (right only), ``removed``
    (left only), ``type_changed``, plus nullability-only changes as
    ``nullability``. Nested structs flatten to dotted paths
    (``props.device.os``) so a field buried three levels deep can't
    hide; arrays/maps recurse through their element/value types.
    Empty output = schemas agree.

    This is the pre-flight for every schema-drift incident the
    ``CoerceTypes`` guard then fixes: run it in CI against the prior
    registry snapshot and a source that silently went int32 → int64
    or dropped a field fails the pipeline REVIEW, not the 3 a.m. run.

    Pure metadata: compares the two driver-side schema trees; the
    returned single-partition DataFrame exists so the report can join
    pipelines, land in monitoring tables, and be oracle-checked like
    any other query. No scan, no shuffle, no data read at all.
    """
    from pyspark.sql import types as T

    def flatten(dtype, prefix, out):
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                path = f"{prefix}.{f.name}" if prefix else f.name
                flatten(f.dataType, path, out)
                # leaf entry records the field's own type string
                if not isinstance(
                    f.dataType, (T.StructType,)
                ):
                    out[path] = (f.dataType.simpleString(), f.nullable)
                else:
                    out.setdefault(path, ("struct", f.nullable))
        elif isinstance(dtype, T.ArrayType):
            out[f"{prefix}[]"] = (
                dtype.elementType.simpleString()
                if not isinstance(dtype.elementType, T.StructType)
                else "struct",
                dtype.containsNull,
            )
            flatten(dtype.elementType, f"{prefix}[]", out)
        elif isinstance(dtype, T.MapType):
            out[f"{prefix}{{}}"] = (
                dtype.valueType.simpleString()
                if not isinstance(dtype.valueType, T.StructType)
                else "struct",
                dtype.valueContainsNull,
            )
            flatten(dtype.valueType, f"{prefix}{{}}", out)

    l_map: dict = {}
    r_map: dict = {}
    flatten(left.schema, "", l_map)
    flatten(right.schema, "", r_map)
    rows = []
    for path in sorted(set(l_map) | set(r_map)):
        lt = l_map.get(path)
        rt = r_map.get(path)
        if lt is None:
            rows.append((path, None, rt[0], "added"))
        elif rt is None:
            rows.append((path, lt[0], None, "removed"))
        elif lt[0] != rt[0]:
            rows.append((path, lt[0], rt[0], "type_changed"))
        elif lt[1] != rt[1]:
            rows.append((path, lt[0], rt[0], "nullability"))
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("column", StringType(), False),
            StructField("left_type", StringType(), True),
            StructField("right_type", StringType(), True),
            StructField("change", StringType(), False),
        ]
    )
    return local_df(left.sparkSession, rows, schema)

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

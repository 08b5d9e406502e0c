"""Entrypoint for transform blocks.

``transform::generic`` (reference
``getl/blocks/transform/entrypoint.py:18-76``) folds an ordered list of
named functions over the input DataFrame. Function names resolve:

* bare name (``where``, ``select``…) → ``getl_spark.operators.transform``
* dotted path (``add_column.date.year``, ``dedup.minhash_lsh``,
  ``text.quality``…) → module ``getl_spark.functions.<path-head>``,
  attribute ``<tail>``.

Beyond the reference, this family adds first-class relational blocks
the reference only reaches through its SQL escape hatch:
``transform::aggregate``, ``transform::window``, ``transform::sort``,
``transform::limit``, ``transform::distinct``, ``transform::with_columns``.
All emit plain DataFrame plans — aggregations get map-side partial
aggregation and AQE coalescing from Catalyst automatically.
"""

from __future__ import annotations

from importlib import import_module
from typing import Callable, Tuple

from pyspark.sql import DataFrame, Window, functions as F

from getl_spark.common.scale import pin

from getl_spark.operators import transform as _transform_module
from getl_spark.plans.context import BlockConfig


def resolve(func: Callable, bconf: BlockConfig) -> DataFrame:
    return func(bconf)


# ------------------------------------------------------------------ generic
def generic(conf: BlockConfig) -> DataFrame:
    # multi-input blocks (Input: [left, right]) start from the join/
    # union function itself; single-input blocks fold over the input df
    dataframe = (
        conf.history.get(conf.input) if isinstance(conf.input, str) else None
    )
    for func_meta in conf.get("Functions"):
        name, params = _function_meta(func_meta)
        func = _lookup(name)
        two_input_block = isinstance(conf.input, list) and len(conf.input) == 2
        if name in ("join", "union", "union_by_name") or (
            two_input_block and dataframe is None and _takes_two_frames(func)
        ):
            # multi-input operators consume [left, right] from Input.
            # Gated on the block SHAPE (a 2-list Input feeding the
            # chain's first function): a two-frame op later in a chain,
            # or one fed its second frame via ${param} raw-object
            # injection under a single Input, keeps the normal
            # single-frame call
            dataframe = func(*_two_inputs(conf), **params)
        else:
            if dataframe is None:
                raise ValueError(
                    f"Block '{conf.section_name}' has a list Input; its first "
                    "function must be join/union/union_by_name"
                )
            dataframe = func(dataframe, **params)
    return dataframe


def _takes_two_frames(func: Callable) -> bool:
    """True when the function's first TWO positional parameters are
    both annotated ``DataFrame`` — the signature contract every
    two-table operator in ``getl_spark.functions`` follows
    (``stats.table_diff``, ``stats.group_psi``, ``dedup.fuzzy_join``,
    ``text.decontaminate``, …). Signature-driven so a new two-frame
    operator is YAML-callable with ``Input: [Left, Right]`` the day it
    is written, with no registration list to forget."""
    import inspect

    try:
        sig = inspect.signature(func)
    except (TypeError, ValueError):
        return False
    positional = [
        p
        for p in sig.parameters.values()
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    ]
    if len(positional) < 2:
        return False

    def is_frame(p):
        ann = p.annotation
        name = ann if isinstance(ann, str) else getattr(ann, "__name__", "")
        return name == "DataFrame"

    # the second frame must be REQUIRED: ops with an optional second
    # DataFrame (e.g. similarity.topk_bruteforce's queries=None) stay
    # single-input blocks and take the extra frame as a keyword
    return (
        is_frame(positional[0])
        and is_frame(positional[1])
        and positional[1].default is inspect.Parameter.empty
    )


def _two_inputs(conf: BlockConfig) -> Tuple[DataFrame, DataFrame]:
    if not isinstance(conf.input, list) or len(conf.input) != 2:
        raise ValueError(
            f"Block '{conf.section_name}' needs Input: [left, right]"
        )
    return conf.history.get(conf.input[0]), conf.history.get(conf.input[1])


def _function_meta(func_meta) -> Tuple[str, dict]:
    if isinstance(func_meta, str):
        return func_meta, {}
    if isinstance(func_meta, dict) and len(func_meta) == 1:
        name = next(iter(func_meta))
        return name, func_meta[name] or {}
    raise ValueError(f"Could not process function {func_meta!r}")


def _lookup(name: str) -> Callable:
    if "." not in name:
        try:
            return getattr(_transform_module, name)
        except AttributeError:
            raise ValueError(
                f"Unknown transform function '{name}'"
            ) from None
    module_path, func_name = name.rsplit(".", 1)
    module = import_module(f"getl_spark.functions.{module_path}")
    return getattr(module, func_name)


# --------------------------------------------------------------- extensions
def aggregate(conf: BlockConfig) -> DataFrame:
    """GroupBy + aggregate block.

    Properties::

        GroupBy: [col, ...]            # optional → global aggregate
        Grouping: rollup | cube        # optional multi-dim grouping
        Aggregations:
          - {col: x, agg: sum, alias: sum_x}
        Pivot: {col: status, values: [O, F]}   # optional
    """
    df = conf.input_df()
    group_cols = conf.get("GroupBy", [])
    aggs = []
    for spec in conf.get("Aggregations"):
        agg_name = spec["agg"]
        col = spec.get("col", "*")
        alias = spec.get("alias", f"{agg_name}_{col}")
        if agg_name == "count" and col == "*":
            expr = F.count(F.lit(1))
        elif agg_name == "count_distinct":
            expr = F.countDistinct(col)
        elif agg_name == "expr":
            expr = F.expr(spec["expr"])
        else:
            expr = getattr(F, agg_name)(col)
        aggs.append(expr.alias(alias))
    grouping = conf.get("Grouping", None)
    if grouping == "rollup":
        grouped = df.rollup(*group_cols)
    elif grouping == "cube":
        grouped = df.cube(*group_cols)
    elif group_cols:
        grouped = df.groupBy(*group_cols)
    else:
        grouped = df.groupBy()
    if conf.exists("Pivot"):
        grouped = grouped.pivot(
            conf.get("Pivot.col"), conf.get("Pivot.values", None)
        )
    return grouped.agg(*aggs)


def window(conf: BlockConfig) -> DataFrame:
    """Window-function block.

    Properties::

        PartitionBy: [col, ...]
        OrderBy: [col or {col, desc: true}, ...]
        Functions:
          - {func: row_number, alias: rn}
          - {func: lag, col: value, offset: 1, alias: prev}
          - {func: sum, col: value, alias: running,
             rows_between: [unbounded_preceding, current_row]}
    """
    df = conf.input_df()
    spec = Window.partitionBy(*conf.get("PartitionBy", []))
    order_cols = []
    for item in conf.get("OrderBy", []):
        if isinstance(item, dict):
            col = F.col(item["col"])
            order_cols.append(col.desc() if item.get("desc") else col.asc())
        else:
            order_cols.append(F.col(item))
    if order_cols:
        spec = spec.orderBy(*order_cols)
    bounds = {
        "unbounded_preceding": Window.unboundedPreceding,
        "unbounded_following": Window.unboundedFollowing,
        "current_row": Window.currentRow,
    }
    for fn in conf.get("Functions"):
        wspec = spec
        if "rows_between" in fn:
            lo, hi = fn["rows_between"]
            wspec = spec.rowsBetween(
                bounds.get(lo, lo) if not isinstance(lo, int) else lo,
                bounds.get(hi, hi) if not isinstance(hi, int) else hi,
            )
        name = fn["func"]
        if name in ("row_number", "rank", "dense_rank", "percent_rank", "cume_dist"):
            expr = getattr(F, name)()
        elif name in ("lag", "lead"):
            expr = getattr(F, name)(fn["col"], fn.get("offset", 1), fn.get("default"))
        elif name == "ntile":
            expr = F.ntile(fn["n"])
        else:
            expr = getattr(F, name)(fn["col"])
        df = df.withColumn(fn["alias"], expr.over(wspec))
    return df


def sort(conf: BlockConfig) -> DataFrame:
    """Global sort block: ``OrderBy: [col or {col, desc: true}]``,
    optional ``Limit``. A global sort is a range-partitioned shuffle;
    with ``Limit`` Spark rewrites it to TakeOrderedAndProject, which
    never materializes the full sorted relation."""
    df = conf.input_df()
    cols = []
    for item in conf.get("OrderBy"):
        if isinstance(item, dict):
            col = F.col(item["col"])
            cols.append(col.desc() if item.get("desc") else col.asc())
        else:
            cols.append(F.col(item))
    df = df.orderBy(*cols)
    if conf.exists("Limit"):
        df = df.limit(conf.get("Limit"))
    return df


def limit(conf: BlockConfig) -> DataFrame:
    return conf.input_df().limit(conf.get("Rows"))


def distinct(conf: BlockConfig) -> DataFrame:
    return conf.input_df().distinct()


def time_window(conf: BlockConfig) -> DataFrame:
    """Event-time tumbling/sliding window block (batch & streaming).

    Properties: ``TimeColumn``, ``WindowDuration``, ``SlideDuration``
    (optional → sliding), ``GroupBy`` (extra keys), ``Watermark``
    (streaming state bound), ``Aggregations`` (as transform::aggregate).
    """
    from getl_spark.streaming import windows as W

    df = conf.input_df()
    common = dict(
        time_col=conf.get("TimeColumn"),
        aggregations=conf.get("Aggregations"),
        group_by=conf.get("GroupBy", None),
        watermark=conf.get("Watermark", None),
    )
    if conf.exists("SlideDuration"):
        return W.sliding(
            df,
            duration=conf.get("WindowDuration"),
            slide=conf.get("SlideDuration"),
            **common,
        )
    return W.tumbling(df, duration=conf.get("WindowDuration"), **common)


def session_window(conf: BlockConfig) -> DataFrame:
    """Event-time session window block (batch & streaming).

    Properties: ``TimeColumn``, ``Gap``, ``GroupBy``, ``Watermark``,
    ``Aggregations``.
    """
    from getl_spark.streaming import windows as W

    return W.session(
        conf.input_df(),
        time_col=conf.get("TimeColumn"),
        gap=conf.get("Gap"),
        aggregations=conf.get("Aggregations"),
        group_by=conf.get("GroupBy", None),
        watermark=conf.get("Watermark", None),
    )


def asof_join(conf: BlockConfig) -> DataFrame:
    """As-of join block: ``Input: [left, right]``.

    Properties: ``JoinOn`` (key column or list — named to dodge the
    YAML 1.1 footgun where a bare ``On:`` key parses as boolean True;
    ``On`` still works from dict-built definitions), ``LeftTime``,
    ``RightTime`` (default = LeftTime), ``RightColumns`` (default = all
    non-key, non-time right columns), ``Direction`` (backward|forward),
    ``Tolerance`` (SQL expression, e.g. ``3600`` or
    ``INTERVAL 1 HOUR``), ``Suffix``.
    """
    from getl_spark.functions import asof as A

    left, right = _two_inputs(conf)
    tolerance = conf.get("Tolerance", None)
    return A.join(
        left,
        right,
        on=conf.get("JoinOn", None) or conf.get("On"),
        left_ts=conf.get("LeftTime"),
        right_ts=conf.get("RightTime", None),
        right_cols=conf.get("RightColumns", None),
        direction=conf.get("Direction", "backward"),
        tolerance=F.expr(str(tolerance)) if tolerance is not None else None,
        suffix=conf.get("Suffix", "_right"),
    )


def quota_filter(conf: BlockConfig) -> DataFrame:
    """Per-key contribution-budget block (batch & streaming).

    Properties: ``Key``, ``CountColumn``, ``Budget``, ``OrderColumn``.
    Streaming inputs carry the spent amount as per-key state across
    micro-batches (``applyInPandasWithState``); batch inputs run a
    cumulative-window filter.
    """
    from getl_spark.streaming.stateful import quota_filter as _qf

    return _qf(
        conf.input_df(),
        key_col=conf.get("Key"),
        count_col=conf.get("CountColumn"),
        budget=int(conf.get("Budget")),
        order_col=conf.get("OrderColumn"),
    )


def stream_sessionize(conf: BlockConfig) -> DataFrame:
    """Stateful streaming sessionization block (batch & streaming).

    Properties: ``Key``, ``TimeColumn``, ``GapSeconds``,
    ``ValueColumn`` (optional), ``IdleTimeoutSeconds`` (optional —
    event-time idle timeout: when the watermark passes a silent key's
    last event by this much, its open session closes+emits and its
    state is freed, keeping the store O(active keys)),
    ``FlushOnDrain`` (optional bool — availableNow drains close+emit
    EVERY open session at drain end and leave zero state: batch
    parity for per-drain cron sessionization).
    Streaming inputs emit CLOSED session summaries via per-key
    ``applyInPandasWithState`` (the trailing open session per key
    waits in state for closing evidence or the idle timeout); batch
    inputs emit every session through the JVM sessionize + aggregate
    path.
    """
    from getl_spark.streaming.stateful import sessionize_stream as _ss

    idle = conf.get("IdleTimeoutSeconds", None)
    return _ss(
        conf.input_df(),
        key_col=conf.get("Key"),
        ts_col=conf.get("TimeColumn"),
        gap_seconds=int(conf.get("GapSeconds")),
        value_col=conf.get("ValueColumn", None),
        idle_timeout_seconds=None if idle is None else int(idle),
        flush_on_drain=bool(conf.get("FlushOnDrain", False)),
    )


def stream_dedup(conf: BlockConfig) -> DataFrame:
    """Ingest dedup block (batch & streaming).

    Properties: ``Keys`` (subset columns), ``TimeColumn`` +
    ``Watermark`` (streaming: bounds the per-key state to the watermark
    horizon via ``dropDuplicatesWithinWatermark``). Batch inputs get an
    exact ``dropDuplicates``.
    """
    from getl_spark.streaming import windows as W

    return W.dedup(
        conf.input_df(),
        keys=conf.get("Keys"),
        time_col=conf.get("TimeColumn", None),
        watermark=conf.get("Watermark", None),
    )


def expect_rows(conf: BlockConfig) -> DataFrame:
    """Row-count guard: fail the lift when a block's output falls
    outside declared bounds — the empty-feed / exploded-join circuit
    breaker that row-level ``transform::validate`` expectations cannot
    express. Properties: ``Min`` (default 1 — "this feed must not be
    empty"), ``Max`` (optional — "this join must not explode").

    Cost: ONE count() action at this point in the pipeline. Use it at
    trust boundaries (after a load, after a risky join), not after
    every block.
    """
    df = conf.input_df()
    lo = int(conf.get("Min", 1))
    hi = conf.get("Max", None)
    n = df.count()
    if n < lo or (hi is not None and n > int(hi)):
        bound = f">= {lo}" if hi is None else f"in [{lo}, {hi}]"
        raise ValueError(
            f"expect_rows: block '{conf.section_name}' produced {n} rows, "
            f"expected {bound}"
        )
    return df


def expect_schema(conf: BlockConfig) -> DataFrame:
    """Schema gate: fail the lift when the input's schema differs from
    a DECLARED one — the blocking form of ``schema.diff``'s advisory
    report (diff tells CI what changed; this stops the 3 a.m. run
    before a silently-widened int or a dropped nested field flows
    into managed tables). Properties: ``Schema`` (Spark's portable
    JSON schema format, same as load blocks' ``JsonSchema``),
    ``AllowExtra`` (default false — when true, columns ADDED relative
    to the declaration pass; removals and type changes always fail),
    ``IgnoreNullability`` (default true — parquet round-trips flip
    nullability flags routinely; set false for strict contracts).

    Pure driver-side metadata comparison (no scan, no action); the
    error message carries the full drift row list so the fix is a
    read, not an investigation. Pair with load-block ``CoerceTypes``
    for drifts that should be healed instead of fatal.
    """
    from getl_spark.common.errors import ValidationError
    from getl_spark.common.utils import json_to_spark_schema
    from getl_spark.functions.schema import diff as schema_diff

    df = conf.input_df()
    declared = json_to_spark_schema(conf.get("Schema"))
    allow_extra = bool(conf.get("AllowExtra", False))
    ignore_null = bool(conf.get("IgnoreNullability", True))
    expected = df.sparkSession.createDataFrame([], declared)
    drift = schema_diff(expected, df).collect()
    problems = [
        r
        for r in drift
        if not (
            (allow_extra and r["change"] == "added")
            or (ignore_null and r["change"] == "nullability")
        )
    ]
    if problems:
        detail = "; ".join(
            f"{r['column']}: {r['change']}"
            f" ({r['left_type']} -> {r['right_type']})"
            for r in problems
        )
        raise ValidationError(
            f"expect_schema: block '{conf.section_name}' input drifted "
            f"from the declared schema: {detail}",
            counts={r["column"]: r["change"] for r in problems},
        )
    return df


def checkpoint(conf: BlockConfig) -> DataFrame:
    """Materialization barrier: truncate lineage with
    ``common.scale.pin`` (localCheckpoint locally, reliable checkpoint
    / replicated persist on a cluster) so downstream blocks plan
    against a computed
    stub instead of the full upstream graph. The tool for iterative /
    deeply-chained pipelines whose logical plans otherwise grow without
    bound (the engine's own dedup operators use the same pattern
    internally). Properties: ``Eager`` (default true — compute now;
    false registers a lazy checkpoint)."""
    return conf.input_df().transform(pin, eager=bool(conf.get("Eager", True)))


def with_columns(conf: BlockConfig) -> DataFrame:
    """Add computed columns from SQL expressions:
    ``Columns: [{name: x2, expr: "x * 2"}, ...]`` — stays fully inside
    whole-stage codegen."""
    df = conf.input_df()
    exprs = {c["name"]: F.expr(c["expr"]) for c in conf.get("Columns")}
    out = df.withColumns(exprs)
    keep = conf.get("Select", default=None)
    if keep:
        out = out.select(*keep)
    return out


def validate(conf: BlockConfig):
    """Data-quality expectations block (the Delta-Live-Tables
    expectations shape, engine-native).

    Properties::

        Expectations:
          - {name: qty_positive, expr: "l_quantity > 0", action: drop}
          - {name: key_not_null, expr: "l_orderkey IS NOT NULL", action: fail}
          - {name: price_sane, expr: "l_extendedprice < 1e7", action: tag}
          - {name: pk_unique, unique: [l_orderkey, l_linenumber], action: fail}
          - {name: fk_cust, foreign_key: {columns: [o_custkey], ref: Customers, ref_columns: [c_custkey]}, action: fail}
        Quarantine: true          # also emit the violating rows
        TagColumn: __violations   # array<string> column for tag/quarantine

    Row expectations (``expr``) follow SQL three-valued logic: a NULL
    predicate is a violation. SET expectations (``unique: [cols]``)
    make uniqueness first-class: EVERY row of a key that occurs more
    than once violates — including the "first" one, because when a
    primary key duplicates there is no principled survivor (keep-one
    semantics is ``drop_duplicates``, an explicit choice, not a
    validation). NULL key components compare null-safe, so an
    all-NULL key duplicating is caught too.

    * ``fail`` — ANY violating row aborts the lift with
      ``ValidationError`` carrying per-expectation counts. All fail
      expectations — expr and unique together — are counted in ONE
      aggregate job before anything downstream runs.
    * ``drop`` (default) — violating rows are removed from the valid
      output.
    * ``tag`` — rows are kept; the expectation's name is appended to
      ``TagColumn``.

    With ``Quarantine: true`` the block is multi-output (declare
    ``Output: [valid, violations]``): ``violations`` holds every row
    failing any drop/tag expectation, with ``TagColumn`` listing which.
    ``expr`` drops stay pure pushdown-friendly filters; each
    ``unique`` expectation adds one keyed count aggregate plus one
    keyed join of the (usually tiny) duplicated-key set back onto the
    scan — shuffle ∝ distinct keys, no window over raw rows.

    ``foreign_key`` expectations check referential integrity against
    ANY earlier block by its temp-view name (every block result
    registers one): a row violates when its key tuple has no match in
    the reference's distinct keys — one distinct reduction of the
    (dimension-sized, usually broadcastable) reference plus one keyed
    left join. NULL fk components never match and therefore violate —
    rows legitimately allowed to carry no reference should be filtered
    or modeled explicitly, not silently passed.
    """
    from getl_spark.common.errors import ValidationError

    df = conf.input_df()
    specs = list(conf.get("Expectations"))
    tag_col = conf.get("TagColumn", "__violations")
    quarantine = bool(conf.get("Quarantine", False))
    for s in specs:
        s.setdefault("action", "drop")
        if s["action"] not in ("fail", "drop", "tag"):
            raise ValueError(
                f"validate: expectation '{s.get('name')}' has unknown "
                f"action '{s['action']}' (fail|drop|tag)"
            )
        kinds = sum(k in s for k in ("expr", "unique", "foreign_key"))
        if kinds != 1:
            raise ValueError(
                f"validate: expectation '{s.get('name')}' must have "
                "exactly one of 'expr', 'unique', or 'foreign_key'"
            )

    uniques = [s for s in specs if "unique" in s]
    fks = [s for s in specs if "foreign_key" in s]
    marked = df
    for s in fks:
        fk = s["foreign_key"]
        cols = list(fk["columns"])
        ref_name = fk["ref"]
        ref_cols = list(fk.get("ref_columns", cols))
        if len(ref_cols) != len(cols):
            raise ValueError(
                f"validate: expectation '{s['name']}' columns and "
                "ref_columns must pair up"
            )
        flag = f"__viol_{s['name']}"
        # any earlier block is referenceable by its temp-view name; the
        # reference side reduces to its DISTINCT keys (dimension-sized)
        ref = (
            conf.spark.table(ref_name)
            .select(
                *[
                    F.col(rc).alias(f"__fk_{c}")
                    for c, rc in zip(cols, ref_cols)
                ]
            )
            .distinct()
            .withColumn(flag, F.lit(False))
        )
        cond = F.lit(True)
        for c in cols:
            # plain equality: a NULL fk component never matches, so
            # NULL keys violate — declare them nullable upstream or
            # filter first (an FK with NULLs is a modeling decision,
            # not a default)
            cond = cond & (marked[c] == ref[f"__fk_{c}"])
        marked = marked.join(ref, cond, "left").drop(
            *[f"__fk_{c}" for c in cols]
        )
    for s in uniques:
        cols = list(s["unique"])
        flag = f"__viol_{s['name']}"
        dup = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("__c"))
            .where(F.col("__c") > 1)
            .select(
                *[F.col(c).alias(f"__uk_{c}") for c in cols],
                F.lit(True).alias(flag),
            )
        )
        cond = F.lit(True)
        for c in cols:
            cond = cond & marked[c].eqNullSafe(dup[f"__uk_{c}"])
        marked = marked.join(dup, cond, "left").drop(
            *[f"__uk_{c}" for c in cols]
        )
    markers = [f"__viol_{s['name']}" for s in uniques + fks]

    def violates(s) -> "F.Column":
        if "unique" in s:
            return F.coalesce(F.col(f"__viol_{s['name']}"), F.lit(False))
        if "foreign_key" in s:
            # the ref join left the flag NULL on orphans, False on hits
            return F.col(f"__viol_{s['name']}").isNull()
        # NULL -> violation, per three-valued logic
        return ~F.coalesce(F.expr(s["expr"]), F.lit(False))

    fails = [s for s in specs if s["action"] == "fail"]
    if fails:
        counts_row = marked.agg(
            *[
                F.sum(F.when(violates(s), 1).otherwise(0)).alias(s["name"])
                for s in fails
            ]
        ).first()
        bad = {s["name"]: counts_row[s["name"]] for s in fails if counts_row[s["name"]]}
        if bad:
            raise ValidationError(
                f"validate: expectations failed in block "
                f"'{conf.section_name}': {bad}",
                counts=bad,
            )

    drops = [s for s in specs if s["action"] == "drop"]
    tags = [s for s in specs if s["action"] == "tag"]
    valid = marked
    for s in drops:
        if "unique" in s or "foreign_key" in s:
            valid = valid.where(~violates(s))
        else:
            # raw predicate, not coalesce(expr, false): WHERE already
            # excludes NULL results, and the bare comparison pushes down to
            # the parquet scan (PushedFilters) while a coalesce() wrapper
            # blocks pushdown entirely
            valid = valid.where(F.expr(s["expr"]))
    if tags:
        valid = valid.withColumn(
            tag_col,
            F.array_compact(
                F.array(*[F.when(violates(s), F.lit(s["name"])) for s in tags])
            ),
        )
    valid = valid.drop(*markers)
    if not quarantine:
        return valid
    flagged = drops + tags
    violations = (
        marked.withColumn(
            tag_col,
            F.array_compact(
                F.array(
                    *[F.when(violates(s), F.lit(s["name"])) for s in flagged]
                )
            ),
        )
        .where(F.size(F.col(tag_col)) > 0)
        .drop(*markers)
    )
    return {"valid": valid, "violations": violations}

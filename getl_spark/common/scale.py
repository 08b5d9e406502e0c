"""Scale helpers shared by compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def is_classic(df: DataFrame) -> bool:
    """True when ``df`` is a classic (JVM-backed) DataFrame with an
    ``.rdd`` / SparkContext surface; False under Spark Connect, whose
    proxies live in ``pyspark.sql.connect`` and raise on ``.rdd``."""
    return not type(df).__module__.startswith("pyspark.sql.connect")


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize an intermediate the plan reads more than once, with
    a DURABILITY LADDER instead of a bare ``localCheckpoint()``.

    Why a pin at all: several operators (the distributed prefix scan,
    LSH banding, connected components, stored-index reconciliation)
    branch their plan over a subtree whose re-evaluation is either
    expensive or — worse — not bit-stable across evaluations
    (``repartitionByRange`` samples its bounds per-execution, so two
    evaluations of the same subtree can assign different partition
    ids). Those call sites MUST observe one materialized copy.

    Why not always ``localCheckpoint()``: it truncates lineage and
    stores the blocks ONLY on the executors that computed them. On a
    single machine (``local[*]``) that is free and safe; on a real
    cluster, losing one (routinely preempted) executor makes the
    checkpointed partitions unrecoverable and fails the whole job —
    exactly the environment this engine targets.

    The ladder, most durable first:

    1. **Reliable ``checkpoint()``** when the session has a checkpoint
       directory configured (``get_spark(checkpoint_dir=...)`` or
       ``sc.setCheckpointDir``). Blocks go to the shared filesystem
       (HDFS/S3); any executor can re-read them after a loss. This is
       what a 1000-executor deployment should run.
    2. **``localCheckpoint()``** in local mode — executor loss and
       driver loss are the same event there, so replication buys
       nothing and the copy to a checkpoint dir would be pure cost.
    3. **Replicated ``localCheckpoint(storageLevel=MEMORY_AND_DISK_2)``**
       on a cluster WITHOUT a checkpoint dir: each block lives on two
       executors, so a single preemption cannot lose it (losing BOTH
       replicas fails the job, the price of skipping rung 1 — which is
       why deployments should set a checkpoint dir). An earlier
       revision used ``persist(MEMORY_AND_DISK_2)`` here to keep
       lineage as a double-loss fallback; that was doubly wrong at
       scale: persisted plans stay registered in the cache manager for
       the session lifetime unless every caller unpersists, and —
       worse — persist does NOT truncate the analyzed plan, so
       iterative algorithms (components, pagerank, k-core) nest each
       round's plan inside the next and the analyzer walks an
       exponentially-growing tree (observed: driver OOM analyzing
       round ~6 of connected components on a 30-edge input).
       Checkpoint-style truncation is not optional for pins.

    ``eager=False`` defers materialization to first use (callers that
    pin a frame which a later branch might skip entirely).

    Lifetime: reliable checkpoint files belong to the checkpoint dir
    (cleaned per Spark's own policy); localCheckpoint blocks — both
    rungs 2 and 3 — are freed by the ContextCleaner once the frame is
    dereferenced, so loops that rebind per round release superseded
    rounds automatically. Iterative callers should still call
    :func:`unpin` on superseded frames: it is the explicit release
    point (and frees eagerly if a future rung ever registers with the
    cache manager again).
    """
    if not is_classic(df):
        # Connect proxies expose localCheckpoint but no SparkContext
        # probe; reliable-checkpoint policy must be set server-side
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    if (sc.master or "").startswith("local"):
        return df.localCheckpoint(eager=eager)
    from pyspark import StorageLevel

    return df.localCheckpoint(
        eager=eager, storageLevel=StorageLevel.MEMORY_AND_DISK_2
    )


def unpin(df: DataFrame) -> None:
    """Release a frame previously returned by :func:`pin`, for callers
    that supersede pins in a loop.

    With the current ladder every rung truncates lineage checkpoint-
    style, so block lifetime is handled by Spark (checkpoint-dir
    policy / ContextCleaner on dereference) and ``unpersist`` finds no
    cache-manager entry — a harmless no-op. unpin exists as the
    explicit release point regardless: it documents where a pin's
    lifetime ends, and it frees eagerly if a rung that registers with
    the cache manager (persist-style) is ever reintroduced. Safe to
    call on never-pinned frames; non-blocking.

    Call it only after the successor pin has materialized (pin is
    eager by default).
    """
    if not is_classic(df):
        return
    try:
        df.unpersist()
    except Exception:  # pragma: no cover - defensive: never fail a loop
        pass


def parallelize(df: DataFrame) -> DataFrame:
    """Repartition compute-heavy inputs up to cluster parallelism.

    A small parquet file arrives as one partition; per-row heavy work
    (shingling, hashing, pandas batches) would then run on one core.
    Partition count must match compute cost, not input bytes — a
    few-MB shuffle buys full-cluster parallelism. No-op when the input
    is already wide (the 100 TB case, where file count ≫ cores).

    Under Spark Connect there is no partition-count probe (``df.rdd``
    does not exist) and no cheap DataFrame-API equivalent, so this is
    a documented no-op there — Connect callers with narrow inputs
    should pre-``repartition`` themselves.
    """
    if not is_classic(df):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def grouped_prefix_sum(
    df: DataFrame,
    keys,
    order_cols,
    value_col,
    new_col,
):
    """``grouped_prefix_scan`` with the running aggregate fixed to
    ``sum`` — see there for the contract. Kept as the named entry
    point because a running sum is what nearly every caller means."""
    return grouped_prefix_scan(df, keys, order_cols, value_col, new_col)


def grouped_prefix_scan(
    df: DataFrame,
    keys,
    order_cols,
    value_col,
    new_col,
    fn="sum",
    inclusive: bool = True,
):
    """Per-key running aggregate (``sum`` / ``min`` / ``max``) of
    ``value_col`` in ``order_cols`` order, WITHOUT collapsing
    parallelism to the number of keys.
    ``value_col``/``new_col`` may be parallel lists to scan several
    columns in ONE range exchange + offsets pass (e.g. the positive and
    negative counts of a PR curve); ``fn`` may then be a parallel list
    too (e.g. a running min of one column and max of another for a
    CUSUM), or a single name applied to all. ``inclusive=False``
    computes the EXCLUSIVE scan (aggregate over strictly-preceding
    rows; NULL — or, for sum, NULL-as-identity via the same
    coalesce — on each key's first row), which is what
    interval-merging ("does this row overlap anything before it?")
    needs.

    ``Window.partitionBy(keys)`` puts each key's entire history in one
    task — correct for high-cardinality keys (users, documents), a
    bottleneck when keys are FEW (sources in a mixture, a global
    cumsum with zero keys). This is the standard two-pass distributed
    prefix scan instead: range-partition on (keys..., order...) so
    partition boundaries respect each key's order, scan within each
    range slice, then fold in per-(key, slice) offsets — an offsets
    table of at most #slices × #keys rows, broadcast back. All three
    aggregates are associative, so results are boundary-invariant and
    the output equals the single-window formulation row for row.

    Tie contract: rows equal on (keys..., order...) may be split
    across slices, in which case they consume the prefix in slice
    order — one of the valid tie orders a plain window could also
    pick. Callers needing a deterministic row-level cumsum should
    include a unique tiebreak in ``order_cols``, exactly as they
    would with a window.
    """
    from pyspark.sql import Window, functions as F

    keys = [keys] if isinstance(keys, str) else list(keys)
    order_cols = (
        [order_cols] if isinstance(order_cols, str) else list(order_cols)
    )
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    new_cols = [new_col] if isinstance(new_col, str) else list(new_col)
    if len(value_cols) != len(new_cols):
        raise ValueError(
            "grouped_prefix_scan: value_col and new_col must pair up "
            f"({len(value_cols)} vs {len(new_cols)})"
        )
    fns = [fn] * len(value_cols) if isinstance(fn, str) else list(fn)
    if len(fns) != len(value_cols):
        raise ValueError(
            "grouped_prefix_scan: fn list must pair up with value_col "
            f"({len(fns)} vs {len(value_cols)})"
        )
    aggs = {"sum": F.sum, "min": F.min, "max": F.max}
    bad = [f for f in fns if f not in aggs]
    if bad:
        raise ValueError(f"grouped_prefix_scan: unsupported fn {bad}")
    parts = [F.col(c) for c in keys + order_cols]
    # pin() materializes the range exchange + pid tagging before the
    # plan branches into `local` and `offsets`. Both branches must
    # observe IDENTICAL partition-id assignments; without the pin they
    # are two separate evaluations of this subtree, and exchange reuse
    # is not guaranteed (column pruning can give the two exchanges
    # different child plans, and repartitionByRange samples its bounds
    # per-execution) — divergent pids would make the offset join
    # silently wrong. The materialization cost is one pass over data
    # the operator already shuffles; pin's durability ladder decides
    # localCheckpoint vs reliable checkpoint vs replicated persist.
    ranged = (
        df.repartitionByRange(*parts)
        .withColumn("__gps_pid", F.spark_partition_id())
        .transform(pin)
    )
    win_local = (
        Window.partitionBy("__gps_pid", *keys)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(
            Window.unboundedPreceding,
            Window.currentRow if inclusive else -1,
        )
    )
    local = ranged.select(
        "*",
        *[
            aggs[f](v).over(win_local).alias(f"__gps_local_{i}")
            for i, (v, f) in enumerate(zip(value_cols, fns))
        ],
    )
    # offset = the aggregate over all PRECEDING slices of the key
    # (NULL for a key's first slice)
    win_off = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__gps_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranged.groupBy("__gps_pid", *keys)
        .agg(
            *[
                aggs[f](v).alias(f"__gps_t_{i}")
                for i, (v, f) in enumerate(zip(value_cols, fns))
            ]
        )
        .select(
            "__gps_pid",
            *keys,
            *[
                aggs[f](f"__gps_t_{i}")
                .over(win_off)
                .alias(f"__gps_off_{i}")
                for i, f in enumerate(fns)
            ],
        )
    )
    # null-safe key equality: a NULL group key is a real group (the
    # window formulation treats it as one partition); a name-list join
    # would silently drop its rows here
    l = local.alias("__gps_l")
    o = offsets.alias("__gps_o")
    cond = F.col("__gps_l.__gps_pid") == F.col("__gps_o.__gps_pid")
    for k in keys:
        cond = cond & F.col(f"__gps_l.{k}").eqNullSafe(F.col(f"__gps_o.{k}"))
    joined = l.join(F.broadcast(o), cond).select(
        *[F.col(f"__gps_l.{c}") for c in local.columns],
        *[
            F.col(f"__gps_o.__gps_off_{i}")
            for i in range(len(value_cols))
        ],
    )
    def _combine(i: int, f: str):
        loc, off = F.col(f"__gps_local_{i}"), F.col(f"__gps_off_{i}")
        if f == "sum":
            # NULL folds as the identity on either side, but a row
            # with NOTHING aggregated (empty exclusive frame on the
            # first slice, or all-NULL values so far) stays NULL —
            # exactly the window formulation's sum-over-empty/null
            return F.when(
                loc.isNull() & off.isNull(), F.lit(None)
            ).otherwise(
                F.coalesce(loc, F.lit(0)) + F.coalesce(off, F.lit(0))
            )
        # least/greatest skip NULLs, folding the first slice correctly
        return F.least(loc, off) if f == "min" else F.greatest(loc, off)

    out = joined.select(
        "*",
        *[
            _combine(i, f).alias(nc)
            for i, (nc, f) in enumerate(zip(new_cols, fns))
        ],
    )
    return out.drop(
        "__gps_pid",
        *[f"__gps_local_{i}" for i in range(len(value_cols))],
        *[f"__gps_off_{i}" for i in range(len(value_cols))],
    )


def local_df(spark, rows, schema):
    """Small LOCAL DataFrame (meta tables, centroid/model frames,
    seed lists — tens to thousands of rows) built with ONE input
    partition instead of ``createDataFrame``'s default
    ``defaultParallelism`` slices.

    Why: classic ``spark.createDataFrame(list, schema)`` parallelizes
    the rows into ``defaultParallelism`` (e.g. 32) slices, each served
    by its own Python-worker partition. Any downstream single-task
    consumer — ``coalesce(1)`` before a meta write, a broadcast build,
    a ``first()`` — then pays the per-partition Python channel setup
    ~32× SERIALLY: measured 5-6 s steady-state for a 1-row
    ``meta.coalesce(1).write`` at local[32] vs 0.4 s through this
    helper (r13). One slice is the right shape for every local frame
    this engine builds (they are model/dimension-sized by contract);
    rows beyond ~10k get one extra slice per 10k so a large literal
    list still parallelizes.

    Falls back to plain ``createDataFrame`` under Spark Connect
    (no SparkContext there; Connect ships local data as a single
    Arrow relation already).
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        sc = spark.sparkContext
    except Exception:  # pragma: no cover - Spark Connect
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(
        sc.parallelize(rows, 1 + len(rows) // 10000), schema
    )


def run_concurrent(*thunks):
    """Run independent driver-side write/action thunks as overlapping
    Spark jobs (guide-§2.6 pattern: actions are only sequential because
    driver code calls them sequentially; a small pool lets the next
    job's tasks back-fill executors freed by the current job's tail).

    Used by the index build/merge operators whose table writes are
    mutually independent (meta / fingerprints / signatures / bands,
    centroids / vectors). Exceptions propagate — the first failing
    thunk's error is re-raised after all complete, so a failed write
    can never be silently skipped. Returns the thunks' results in
    order.
    """
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]

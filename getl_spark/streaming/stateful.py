"""Custom stateful streaming operators (``applyInPandasWithState``).

The one implemented here, ``quota_filter``, is a data-mixing primitive
for training pipelines: cap how much each key (source/domain/license
bucket) may contribute — rows pass through in ``order_col`` order until
the key's ``budget`` of ``count_col`` units (tokens, bytes, docs) is
spent; everything after is dropped. On a stream the spent amount is
**per-key state carried across micro-batches** (Arrow-batched, state is
one long per key, so state size is O(distinct keys), not O(rows)); on a
batch DataFrame the same semantics run as a cumulative-sum window — one
shuffle, no Python state at all.

Why applyInPandasWithState and not an aggregation: the operator emits
*rows* (append mode), filtered by a running per-key total that must
survive across triggers — exactly the shape Spark's built-in windowed
aggregations can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_CUM = "__getl_cum"


def quota_filter(
    df: DataFrame,
    key_col: str,
    count_col: str,
    budget: int,
    order_col: str,
) -> DataFrame:
    """Keep rows per key while the running sum of ``count_col`` (in
    ``order_col`` order) stays within ``budget``; a row that would cross
    the budget is dropped, as is everything after it for that key.

    Batch: cumulative window sum, fully JVM-side. Streaming: per-key
    long state via ``applyInPandasWithState``; within one micro-batch
    rows are processed in ``order_col`` order, across batches in
    arrival order (standard streaming quota semantics — a global order
    over an unbounded stream does not exist). ``count_col`` values must
    be nonnegative (a quota consumes; it cannot refund).
    """
    if not df.isStreaming:
        from getl_spark.common.scale import grouped_prefix_sum

        # a negative count would break prefix monotonicity and silently
        # change semantics — fail loudly. assert_true must live inside
        # the summed expression, or column pruning would elide it; it
        # yields NULL on success, so coalesce makes it a no-op +0.
        checked = F.col(count_col) + F.coalesce(
            F.assert_true(
                F.col(count_col) >= 0, F.lit("quota_filter: negative count")
            ).cast("long"),
            F.lit(0),
        )
        # distributed prefix sum, not a key-partitioned window: quota
        # keys (source/domain/license bucket) are typically FEW, and a
        # keyed window would collapse parallelism to their count
        summed = grouped_prefix_sum(
            df.withColumn("__q_checked", checked),
            [key_col],
            [order_col],
            "__q_checked",
            _CUM,
        )
        return (
            summed.where(F.col(_CUM) <= budget).drop(_CUM, "__q_checked")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = df.schema
    columns = df.columns

    def apply_quota(key, pdf_iter, state: GroupState):
        used = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            # counts are nonnegative, so the running total is monotone
            # and the kept set is exactly the prefix with cum <= budget
            # — vectorized, no per-row Python loop
            counts = pdf[count_col].astype("int64")
            if (counts < 0).any():
                raise ValueError("quota_filter: negative count")
            cum = counts.cumsum() + used
            kept = pdf[cum <= budget]
            if len(kept) < len(pdf):
                used = budget + 1  # poison: first-come-first-served
            elif len(kept):
                used = int(cum.iloc[len(kept) - 1])
            if len(kept):
                yield kept[columns]
        state.update((min(used, budget + 1),))

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            apply_quota,
            out_schema,
            "used long",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )

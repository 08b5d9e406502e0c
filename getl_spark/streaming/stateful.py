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


def sessionize_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    value_col: "str | None" = None,
) -> DataFrame:
    """Streaming sessionization emitting CLOSED session summaries —
    the stateful complement to ``streaming.windows.session`` (which
    aggregates inside Spark's session window) and batch
    ``sessions.sessionize`` (which labels rows): one output row per
    finished session ``(key, session_start, session_end, n_events,
    value_sum)``, where "finished" means a LATER event for the same
    key arrived more than ``gap_seconds`` after the session's last
    event. The trailing open session per key stays in state until
    evidence closes it — a stream cannot know a session ended without
    a later event, so each key's final session never emits until its
    next activity (run the batch op over the landed data for the
    tail; the two agree on every closed session).

    Batch inputs run the same semantics JVM-side (sessionize + one
    keyed aggregate) and emit EVERY session — a bounded input closes
    all of them.

    State per key is four longs/doubles (start, last, n, value sum) —
    O(distinct keys), not O(rows). Within a micro-batch events sort
    by time; across batches arrival order applies (an event older
    than the open session's last timestamp merges into it when inside
    the gap — the watermark-free contract; feed grossly out-of-order
    streams through a watermarked sort upstream if that matters).
    Within one batch the per-key work is vectorized pandas (diff >
    gap → cumsum group ids → one groupby), never a per-row loop.
    """
    if gap_seconds <= 0:
        raise ValueError(
            f"sessionize_stream: gap_seconds must be > 0, got {gap_seconds}"
        )
    if not df.isStreaming:
        from getl_spark.functions.sessions import sessionize

        labeled = sessionize(df, [key_col], ts_col, gap_seconds)
        val = (
            F.sum(F.coalesce(F.col(value_col).cast("double"), F.lit(0.0)))
            if value_col is not None
            else F.lit(0.0)
        )
        ts = F.col(ts_col).cast("timestamp")
        return (
            labeled.groupBy(F.col(key_col), F.col("session_id"))
            .agg(
                F.min(ts).alias("session_start"),
                F.max(ts).alias("session_end"),
                F.count("*").cast("bigint").alias("n_events"),
                val.alias("value_sum"),
            )
            .drop("session_id")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampType,
    )

    key_field = df.schema[key_col]
    out_schema = StructType(
        [
            StructField(key_col, key_field.dataType, True),
            StructField("session_start", TimestampType(), True),
            StructField("session_end", TimestampType(), True),
            StructField("n_events", LongType(), True),
            StructField("value_sum", DoubleType(), True),
        ]
    )
    gap_us = int(gap_seconds) * 1_000_000

    def close_sessions(key, pdf_iter, state: GroupState):
        import pandas as pd

        frames = [pdf for pdf in pdf_iter]
        ev = pd.concat(frames) if len(frames) > 1 else frames[0]
        ts = (
            pd.to_datetime(ev[ts_col])
            .astype("int64")
            .floordiv(1000)
            .sort_values()
            .reset_index(drop=True)
        )
        if value_col is not None:
            vals = (
                ev.assign(__us=pd.to_datetime(ev[ts_col]).astype("int64")
                          .floordiv(1000))
                .sort_values("__us")[value_col]
                .fillna(0.0)
                .astype("float64")
                .reset_index(drop=True)
            )
        else:
            vals = pd.Series([0.0] * len(ts))
        # vectorized session split within the batch
        breaks = (ts.diff() > gap_us).fillna(False)
        gid = breaks.cumsum()
        grouped = pd.DataFrame(
            {"g": gid, "t": ts, "v": vals}
        ).groupby("g", sort=True).agg(
            start=("t", "min"), last=("t", "max"),
            n=("t", "size"), vsum=("v", "sum"),
        )
        cur = None
        if state.exists:
            s_start, s_last, s_n, s_vsum = state.get
            cur = [s_start, s_last, int(s_n), float(s_vsum)]
        closed = []
        for _, row in grouped.iterrows():
            g_start, g_last = int(row["start"]), int(row["last"])
            g_n, g_vsum = int(row["n"]), float(row["vsum"])
            if cur is not None and g_start - cur[1] <= gap_us:
                cur = [
                    min(cur[0], g_start), max(cur[1], g_last),
                    cur[2] + g_n, cur[3] + g_vsum,
                ]
            else:
                if cur is not None:
                    closed.append(cur)
                cur = [g_start, g_last, g_n, g_vsum]
        state.update((cur[0], cur[1], cur[2], cur[3]))
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed),
                    "session_start": [
                        pd.Timestamp(c[0] * 1000) for c in closed
                    ],
                    "session_end": [
                        pd.Timestamp(c[1] * 1000) for c in closed
                    ],
                    "n_events": [c[2] for c in closed],
                    "value_sum": [c[3] for c in closed],
                }
            )

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            close_sessions,
            out_schema,
            "start long, last long, n long, vsum double",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )

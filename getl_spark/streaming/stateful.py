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

    State is deliberately PERMANENT (``NoTimeout``): a budget is a
    lifetime contract per key — expiring a spent key's one-long state
    would re-open its quota and re-admit rows. State size is one long
    per distinct key ever seen; if the key space itself churns
    unboundedly, cap it upstream (or bucket keys) — an idle timeout
    here would be a correctness bug, not an optimization.
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
    idle_timeout_seconds: "int | None" = None,
    flush_on_drain: bool = False,
) -> DataFrame:
    """Streaming sessionization emitting CLOSED session summaries —
    the stateful complement to ``streaming.windows.session`` (which
    aggregates inside Spark's session window) and batch
    ``sessions.sessionize`` (which labels rows): one output row per
    finished session ``(key, session_start, session_end, n_events,
    value_sum)``, where "finished" means a LATER event for the same
    key arrived more than ``gap_seconds`` after the session's last
    event — or, with ``idle_timeout_seconds`` set, the key received
    no data for that long of PROCESSING time.

    ``idle_timeout_seconds`` bounds state to O(ACTIVE keys): without
    it the trailing open session of every key ever seen stays in
    state forever (a one-visit user parks 4 scalars for the stream's
    lifetime — monotone state growth on a churning key space). With
    it, a key whose open session's last event falls more than the
    timeout behind the stream's WATERMARK has that session closed,
    EMITTED, and its state removed — which also delivers each key's
    final session to the sink instead of stranding it. The idle bound
    is EVENT time (``EventTimeTimeout`` + an automatic
    ``withWatermark(ts_col, idle_timeout_seconds)``), not wall-clock:
    deterministic and replayable, and — unlike a processing-time
    timeout — compatible with ``availableNow`` maintenance drains
    (Spark keeps scheduling micro-batches while ANY processing-time
    timeout is registered, so an availableNow drain would never
    terminate; the event-time form only reruns while the watermark
    advances). Two consequences to know: events later than the
    timeout behind the max seen ``ts_col`` are dropped by the
    watermark, and a key only times out when OTHER traffic advances
    the watermark past it (a fully silent stream evicts nothing —
    exactly the replay-safe contract). Choose it ≫ ``gap_seconds``
    (e.g. 10×): a timeout shorter than the gap can split a session
    that event-time rules would merge. Default ``None`` keeps the
    exact legacy contract (state never expires; tails never emit) —
    byte-identical drains.

    ``flush_on_drain=True`` gives an ``availableNow`` drain BATCH
    PARITY: every open session is closed, EMITTED, and its state
    removed when the drain ends — the cron use case ("sessionize
    today's files, leave nothing behind"), and it sidesteps the
    fully-silent-stream limitation of the idle timeout (which needs
    later traffic to advance the watermark past an idle key).
    Mechanism: every key's event-time timeout is set to
    ``watermark + 1 ms``, so the extra micro-batch Spark schedules
    after the last data batch (the watermark advanced, and
    ``EventTimeTimeout`` reruns while it does) times out every key
    that received no further data and flushes it. Two consequences:
    (1) this is a DRAIN mode — on a long-running trigger it would
    close a session after any single idle micro-batch, so the gap
    merge only applies within a drain, not across triggers; run the
    next drain on the next cron tick instead. (2) a multi-chunk drain
    (e.g. ``maxFilesPerTrigger``) closes idle keys at chunk
    boundaries — out-of-event-order data across chunks would be
    dropped by the watermark anyway, so feed drains in event-time
    order (the natural shape for dated file feeds). The watermark
    delay is ``idle_timeout_seconds`` when set (keeping its late-data
    tolerance), else 0 seconds. (3) the flush mechanism IS the
    watermark: a drain whose data does not ADVANCE it — every event
    at or before the prior drain's max timestamp — schedules no
    post-drain timeout batch, so such a (degenerate) drain cannot
    flush; its open sessions carry to the next drain that does move
    event time. Inherent to event-time timeouts, and harmless for the
    cron shape (each day's drain carries later timestamps).

    Rows with a NULL ``ts_col`` are DROPPED in both legs (a NULL
    timestamp cannot be ordered into any session; without the filter
    the streaming leg's epoch arithmetic would turn NaT into
    INT64_MIN and fabricate a garbage session start).

    Batch inputs run the same semantics JVM-side (sessionize + one
    keyed aggregate) and emit EVERY session — a bounded input closes
    all of them (``idle_timeout_seconds`` is a no-op there).

    State per key is four longs/doubles (start, last, n, value sum).
    Within a micro-batch events sort by time; across batches arrival
    order applies (an event older than the open session's last
    timestamp merges into it when inside the gap — the watermark-free
    contract; feed grossly out-of-order streams through a watermarked
    sort upstream if that matters). Within one batch the per-key work
    is vectorized pandas (diff > gap → cumsum group ids → one
    groupby), never a per-row loop.
    """
    if gap_seconds <= 0:
        raise ValueError(
            f"sessionize_stream: gap_seconds must be > 0, got {gap_seconds}"
        )
    if idle_timeout_seconds is not None and idle_timeout_seconds <= 0:
        raise ValueError(
            "sessionize_stream: idle_timeout_seconds must be > 0 "
            f"(or None to disable), got {idle_timeout_seconds}"
        )
    df = df.where(F.col(ts_col).isNotNull())
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
    timeout_ms = (
        None if idle_timeout_seconds is None
        else int(idle_timeout_seconds) * 1000
    )
    use_event_timeout = timeout_ms is not None or flush_on_drain
    if use_event_timeout:
        # EventTimeTimeout requires a watermark; its delay is the idle
        # bound (also the late-data cutoff — documented above), or 0
        # in pure flush mode (drain input is in event-time order)
        delay = 0 if idle_timeout_seconds is None else int(idle_timeout_seconds)
        df = df.withWatermark(ts_col, f"{delay} seconds")

    def close_sessions(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # idle key: close + EMIT the open session, free the state —
            # this is what keeps the store O(active keys)
            s_start, s_last, s_n, s_vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [pd.Timestamp(int(s_start) * 1000)],
                    "session_end": [pd.Timestamp(int(s_last) * 1000)],
                    "n_events": [int(s_n)],
                    "value_sum": [float(s_vsum)],
                }
            )
            return

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
        if flush_on_drain:
            # fire at the very next watermark advance: the post-drain
            # empty micro-batch flushes every key that got no more data
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        elif timeout_ms is not None:
            # fire when the watermark passes last-event + timeout; Spark
            # requires the timestamp to sit beyond the CURRENT watermark,
            # so a session already idle that long times out next batch
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(cur[1] // 1000 + timeout_ms, wm + 1)
            )
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
            GroupStateTimeout.EventTimeTimeout
            if use_event_timeout
            else GroupStateTimeout.NoTimeout,
        )
    )

"""Batch sessionization + rolling time aggregates (functions/sessions.py)."""

from __future__ import annotations

import datetime

import pytest
import yaml

from pyspark.sql import functions as F

from getl_spark import lift
from getl_spark.functions import sessions


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture()
def events(spark):
    rows = [
        # user 1: two sessions split by a 40-min gap
        (1, 1, _ts(0), 10.0),
        (2, 1, _ts(5), 20.0),
        (3, 1, _ts(45), 30.0),
        (4, 1, _ts(50), 40.0),
        # user 2: one session, tied timestamps
        (5, 2, _ts(0), 1.0),
        (6, 2, _ts(0), 2.0),
        (7, 2, _ts(10), 3.0),
    ]
    return spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )


def test_sessionize_gap_splits(events):
    out = {
        r.event_id: r.session_id
        for r in sessions.sessionize(
            events, ["user_id"], "ts", gap_seconds=1800
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1, 7: 1}
    with pytest.raises(ValueError, match="gap_seconds"):
        sessions.sessionize(events, ["user_id"], "ts", gap_seconds=0)


def test_sessionize_boundary_exact_gap_same_session(spark):
    """An event exactly gap_seconds after the previous one is the SAME
    session (strict > starts a new one) — the session_window contract."""
    rows = [
        (1, 1, _ts(0), 0.0),
        (2, 1, _ts(30), 0.0),
        (3, 1, datetime.datetime(2024, 1, 1, 1, 0, 1), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    out = {
        r.event_id: r.session_id
        for r in sessions.sessionize(df, ["user_id"], "ts", gap_seconds=1800).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2}  # 30:00 == gap stays; 30:01 gap breaks


def test_rolling_sum_trailing_hour(events):
    out = {
        r.event_id: (r.roll_sum, r.roll_count)
        for r in sessions.rolling(
            events,
            "ts",
            "value",
            window_seconds=600,
            partition_cols=["user_id"],
            aggs=["sum", "count"],
        ).collect()
    }
    # user1: 10-min trailing windows
    assert out[1] == (10.0, 1)
    assert out[2] == (30.0, 2)    # 0:00 within 10 min of 0:05
    assert out[3] == (30.0, 1)
    assert out[4] == (70.0, 2)
    # user2: tied timestamps both inside each other's frame
    assert out[5] == (3.0, 2)
    assert out[6] == (3.0, 2)
    assert out[7] == (6.0, 3)
    with pytest.raises(ValueError, match="unknown aggs"):
        sessions.rolling(events, "ts", "value", 60, aggs=["median"])
    with pytest.raises(ValueError, match="window_seconds"):
        sessions.rolling(events, "ts", "value", 0)


def test_sessions_yaml_path(spark, events, tmp_path):
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    blocks = {
        "L": {"Type": "load::batch_parquet", "Properties": {"Path": src}},
        "S": {
            "Type": "transform::generic",
            "Input": "L",
            "Properties": {
                "Functions": [
                    {
                        "sessions.sessionize": {
                            "key_cols": ["user_id"],
                            "ts_col": "ts",
                            "gap_seconds": 1800,
                        }
                    }
                ]
            },
        },
    }
    log = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    assert log.get("S").where("session_id = 2").count() == 2


def test_sessionize_string_timestamps_sort_chronologically(spark):
    """String timestamp columns in a non-lexicographic format must
    still sessionize in CHRONOLOGICAL order (the window orders by the
    parsed micros, not the raw string)."""
    rows = [
        (1, 1, "2024-6-12 10:00:00"),   # june, single-digit month
        (2, 1, "2024-10-01 09:00:00"),  # october — lexicographically BEFORE
        (3, 1, "2024-6-12 10:10:00"),
    ]
    df = spark.createDataFrame(rows, "event_id BIGINT, user_id BIGINT, ts STRING")
    out = {
        r.event_id: r.session_id
        for r in sessions.sessionize(df, ["user_id"], "ts", gap_seconds=1800).collect()
    }
    # chronological: (1,3) one session in June, (2) its own in October
    assert out == {1: 1, 3: 1, 2: 2}


def test_funnel_hand_computed_with_horizon(spark):
    """Hand-built event log: u1 converts fully, u2 stalls at click,
    u3's purchase precedes its click (order violated), u4's click is
    outside the horizon."""
    from getl_spark.functions import sessions

    rows = [
        # u1: view 0s -> click 10s -> purchase 20s
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:00:10", "click"),
        (1, "2024-01-01T00:00:20", "purchase"),
        # u2: view -> click, never purchases
        (2, "2024-01-01T00:00:00", "view"),
        (2, "2024-01-01T00:00:05", "click"),
        # u3: purchase BEFORE click -> stalls at view... then re-click ok but no purchase after
        (3, "2024-01-01T00:00:00", "view"),
        (3, "2024-01-01T00:00:05", "purchase"),
        (3, "2024-01-01T00:00:10", "click"),
        # u4: click lands beyond the 60s horizon
        (4, "2024-01-01T00:00:00", "view"),
        (4, "2024-01-01T00:02:00", "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, event_type string")
    out = {
        r.step: (r.users, r.pct_of_first, r.pct_of_prev)
        for r in sessions.funnel(
            df, ["view", "click", "purchase"], within_seconds=60
        ).collect()
    }
    assert out["view"] == (4, 1.0, None)
    assert out["click"] == (3, 0.75, 0.75)  # u4 outside horizon
    assert out["purchase"] == (1, 0.25, round(1 / 3, 6))


def test_funnel_equal_timestamps_and_order(spark):
    """An event of the next step at EXACTLY the previous step's time
    counts (>= semantics), matching the sequential-min SQL."""
    from getl_spark.functions import sessions

    df = spark.createDataFrame(
        [
            (1, "2024-01-01T00:00:00", "view"),
            (1, "2024-01-01T00:00:00", "click"),  # same instant
            (2, "2024-01-01T00:00:10", "click"),  # click only — no view
        ],
        "user_id long, ts string, event_type string",
    )
    out = {r.step: r.users for r in sessions.funnel(df, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}


def test_funnel_per_user_cap_bounds_hot_user(spark):
    """A planted bot user with thousands of step events: the
    row_number cap keeps only its first max_events_per_user events, so
    (a) a progression inside the cap still converts, (b) a progression
    that only exists beyond the cap is dropped for that user alone, and
    (c) every under-cap user is bit-identical with or without a cap."""
    from getl_spark.functions import sessions

    base = "2024-01-01T00:"
    rows = []
    # bot user 1: 2000 views, then the click arrives as event #2001
    for i in range(2000):
        rows.append((1, f"{base}{i // 60:02d}:{i % 60:02d}", "view"))
    rows.append((1, "2024-01-01T01:00:00", "click"))
    # normal user 2 converts inside anyone's cap
    rows += [(2, f"{base}00:00", "view"), (2, f"{base}00:05", "click")]
    df = spark.createDataFrame(rows, "user_id long, ts string, event_type string")

    uncapped = {
        r.step: r.users for r in sessions.funnel(df, ["view", "click"]).collect()
    }
    assert uncapped == {"view": 2, "click": 2}
    capped = {
        r.step: r.users
        for r in sessions.funnel(
            df, ["view", "click"], max_events_per_user=100
        ).collect()
    }
    # the bot's click lives beyond its first 100 events — only its
    # progression is lost; user 2 is untouched
    assert capped == {"view": 2, "click": 1}


def test_funnel_validation(spark):
    from getl_spark.functions import sessions

    df = spark.createDataFrame(
        [(1, "2024-01-01T00:00:00", "view")], "user_id long, ts string, event_type string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sessions.funnel(df, ["view"])
    with _pytest.raises(ValueError):
        sessions.funnel(df, ["view", "view"])
    with _pytest.raises(ValueError):
        sessions.funnel(df, ["view", "click"], max_events_per_user=0)


def test_retention_hand_computed_cohorts(spark):
    """Two weekly cohorts with known churn: cohort A (u1, u2) — u1
    active weeks 0,1,2; u2 weeks 0,2. Cohort B (u3) — weeks 0,1."""
    from getl_spark.functions import sessions

    rows = [
        (1, "2024-01-01T10:00:00"), (1, "2024-01-08T10:00:00"), (1, "2024-01-15T10:00:00"),
        (2, "2024-01-03T10:00:00"), (2, "2024-01-17T10:00:00"),
        (3, "2024-01-10T10:00:00"), (3, "2024-01-16T10:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string")
    got = {
        (str(r.cohort), r.period_offset): (r.users, r.pct)
        for r in sessions.retention(df, period="week").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-01-01", 2): (2, 1.0),
        ("2024-01-08", 0): (1, 1.0),
        ("2024-01-08", 1): (1, 1.0),
    }


def test_retention_max_periods_cap_and_validation(spark):
    from getl_spark.functions import sessions

    rows = [(1, "2024-01-01T00:00:00"), (1, "2024-06-01T00:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string")
    out = sessions.retention(df, period="week", max_periods=3).collect()
    assert {r.period_offset for r in out} == {0}  # June event beyond cap
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sessions.retention(df, period="fortnight")
    with _pytest.raises(ValueError):
        sessions.retention(df, max_periods=0)


def test_retention_monthly_offsets(spark):
    from getl_spark.functions import sessions

    rows = [
        (1, "2024-01-05T00:00:00"),
        (1, "2024-03-20T00:00:00"),  # offset 2 months
        (2, "2024-02-10T00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string")
    got = {
        (str(r.cohort), r.period_offset): r.users
        for r in sessions.retention(df, period="month").collect()
    }
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1, ("2024-02-01", 0): 1}


def test_funnel_no_qualifying_events_counts_zero(spark):
    from getl_spark.functions import sessions

    df = spark.createDataFrame(
        [(1, "2024-01-01T00:00:00", "other")], "user_id long, ts string, event_type string"
    )
    out = sessions.funnel(df, ["view", "click"]).collect()
    assert [r.users for r in out] == [0, 0]  # zero, never NULL


# ----------------------------------------------------------- transitions
def test_transitions_hand_computed_matrix(spark):
    """Two users, known sequences → exact pair counts and
    row-stochastic probabilities including entry/exit tokens."""
    from getl_spark.functions import sessions

    rows = [
        (1, 1, 10, "view"), (2, 1, 20, "cart"), (3, 1, 30, "view"),
        (4, 2, 10, "view"), (5, 2, 20, "buy"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts BIGINT, event_type STRING"
    )
    out = {
        (r.src, r.dst): (r.n, r.p)
        for r in sessions.transitions(
            ev, ["user_id"], "ts", tiebreak_cols=["event_id"]
        ).collect()
    }
    assert out == {
        ("__start__", "view"): (2, 1.0),
        ("view", "cart"): (1, 0.333333),
        ("view", "buy"): (1, 0.333333),
        ("view", "__end__"): (1, 0.333333),
        ("cart", "view"): (1, 1.0),
        ("buy", "__end__"): (1, 1.0),
    }


def test_transitions_no_endpoints_and_probability_rows_sum_to_one(spark):
    from getl_spark.functions import sessions

    rows = [
        (i, u, i, t)
        for i, (u, t) in enumerate(
            [(1, "a"), (1, "b"), (1, "a"), (1, "b"), (2, "a"), (2, "a")]
        )
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts BIGINT, event_type STRING"
    )
    out = sessions.transitions(
        ev, ["user_id"], "ts", tiebreak_cols=["event_id"],
        include_endpoints=False,
    ).collect()
    got = {(r.src, r.dst): r.n for r in out}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("a", "a"): 1}
    from collections import defaultdict

    sums = defaultdict(float)
    for r in out:
        sums[r.src] += r.p
    assert all(abs(s - 1.0) < 1e-6 for s in sums.values())


def test_transitions_tiebreak_determinism(spark):
    """Tied timestamps with an id tiebreak produce identical output
    across repeated runs."""
    from getl_spark.functions import sessions

    rows = [(i, 1, 100, f"e{i % 3}") for i in range(30)]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts BIGINT, event_type STRING"
    )
    runs = [
        sorted(
            (r.src, r.dst, r.n, r.p)
            for r in sessions.transitions(
                ev, ["user_id"], "ts", tiebreak_cols=["event_id"]
            ).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


# ------------------------------------------------------------ top paths
def test_top_paths_hand_computed(spark):
    from getl_spark.functions import sessions

    rows = [
        (1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "c"),
        (4, 2, 10, "a"), (5, 2, 20, "b"),
        (6, 3, 10, "a"), (7, 3, 20, "b"),
        (8, 4, 10, "z"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts BIGINT, event_type STRING"
    )
    got = [
        (r.path, r.users)
        for r in sessions.top_paths(
            ev, ["user_id"], "ts", tiebreak_cols=["event_id"]
        ).collect()
    ]
    assert got == [("a>b", 2), ("a>b>c", 1), ("z", 1)]


def test_top_paths_max_len_truncates_before_aggregation(spark):
    """A power user's journey is cut at max_len — and only the first
    max_len events matter, whatever came later."""
    from getl_spark.functions import sessions

    rows = [(i, 1, i, f"e{i}") for i in range(100)]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts BIGINT, event_type STRING"
    )
    got = sessions.top_paths(
        ev, ["user_id"], "ts", max_len=3, tiebreak_cols=["event_id"]
    ).collect()
    assert [(r.path, r.users) for r in got] == [("e0>e1>e2", 1)]


def test_top_paths_k_limits_with_total_order(spark):
    from getl_spark.functions import sessions

    rows = []
    eid = 0
    for u, path in enumerate(["a", "b", "c", "d"]):
        rows.append((eid, u, 0, path)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts BIGINT, event_type STRING"
    )
    got = [r.path for r in sessions.top_paths(
        ev, ["user_id"], "ts", k=2, tiebreak_cols=["event_id"]
    ).collect()]
    assert got == ["a", "b"]  # all tied at 1 user -> path asc tiebreak
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_len"):
        sessions.top_paths(ev, ["user_id"], "ts", max_len=0)
    with _pytest.raises(ValueError, match="k"):
        sessions.top_paths(ev, ["user_id"], "ts", k=0)


# --------------------------------------------------------- active_users
def test_active_users_matches_exact_distinct(spark):
    """Hand-built log over a week: DAU/3-day actives from merged HLL
    day-sketches equal exact trailing COUNT(DISTINCT) at this
    cardinality, day gaps included."""
    from getl_spark.functions import sessions

    rows = [
        (1, "2024-01-01"), (2, "2024-01-01"),
        (1, "2024-01-02"),
        (3, "2024-01-04"), (1, "2024-01-04"), (1, "2024-01-04"),
        (4, "2024-01-05"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        str(r.date): (r.active_1d, r.active_3d)
        for r in sessions.active_users(df, windows=(1, 3)).collect()
    }
    assert out == {
        "2024-01-01": (2, 2),
        "2024-01-02": (1, 2),          # users {1,2} over Dec 31..Jan 2
        "2024-01-04": (2, 2),          # {1,3} today; Jan 2-4 -> {1,3}
        "2024-01-05": (1, 3),          # {4}; Jan 3-5 -> {1,3,4}
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sessions.active_users(df, windows=())
    with _pytest.raises(ValueError):
        sessions.active_users(df, windows=(0,))


def test_active_users_events_table_vs_exact(spark):
    """Differential on the driver events table: every window estimate
    equals the exact trailing distinct count."""
    import __spark_entry__ as entry
    from getl_spark.functions import sessions

    sf = "/root/testdata/sf0.001"
    ts_expr, _ = entry._events_ts_exprs(sf)
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", F.expr(ts_expr).alias("ts")
    )
    got = {
        str(r.date): (r.active_1d, r.active_7d)
        for r in sessions.active_users(ev, windows=(1, 7)).collect()
    }
    days = [r.d for r in ev.select(F.to_date("ts").alias("d")).distinct().collect()]
    exact = {}
    for d in days:
        one = ev.where(F.to_date("ts") == F.lit(d)).select("user_id").distinct().count()
        seven = (
            ev.where(
                (F.to_date("ts") <= F.lit(d))
                & (F.to_date("ts") > F.date_sub(F.lit(d), 7))
            ).select("user_id").distinct().count()
        )
        exact[str(d)] = (one, seven)
    assert got == exact


def test_bot_score(spark):
    """Exact python differential on a metronomic bot, a bursty human,
    a same-second bulk loader, and a below-evidence key; flag logic;
    partition-count invariance."""
    import datetime as dt
    import math
    import random

    from getl_spark.functions import sessions

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # metronomic bot: exactly every 30 s
    for i in range(50):
        rows.append(("bot", t0 + dt.timedelta(seconds=30 * i)))
    # bursty human: random gaps 1 s .. 2 h
    rnd = random.Random(5)
    t = t0
    for _ in range(40):
        t += dt.timedelta(seconds=rnd.uniform(1, 7200))
        rows.append(("human", t))
    # bulk loader: 30 events in the same second, then one an hour on
    for i in range(30):
        rows.append(("bulk", t0 + dt.timedelta(microseconds=i * 1000)))
    rows.append(("bulk", t0 + dt.timedelta(hours=1)))
    # below min_events
    rows.extend([("sparse", t0), ("sparse", t0 + dt.timedelta(minutes=3))])

    df = spark.createDataFrame(rows, "user STRING, ts TIMESTAMP")
    out = {r.user: r for r in sessions.bot_score(df, "user", "ts").collect()}
    assert "sparse" not in out and len(out) == 3

    def ref(key):
        ts = sorted(
            int(t.timestamp() * 1_000_000)
            for k, t in rows
            if k == key
        )
        gaps = [(b - a) // 1_000_000 for a, b in zip(ts, ts[1:])]
        n = len(gaps)
        mean = sum(gaps) / n
        var = (n * sum(g * g for g in gaps) - sum(gaps) ** 2) / (n * (n - 1))
        cv = math.sqrt(var) / mean if mean > 0 else None
        modal = max(gaps.count(g) for g in set(gaps)) / n
        zero = sum(1 for g in gaps if g == 0) / n
        eph = len(ts) / ((ts[-1] - ts[0]) / 3.6e9)
        return mean, cv, modal, zero, eph

    for key in ("bot", "human", "bulk"):
        mean, cv, modal, zero, eph = ref(key)
        r = out[key]
        assert r.mean_gap_s == round(mean, 6)
        assert r.cv_gap == (round(cv, 6) if cv is not None else None)
        assert r.modal_gap_share == round(modal, 6)
        assert r.zero_gap_share == round(zero, 6)
        assert r.events_per_hour == pytest.approx(eph, abs=1e-5)

    assert out["bot"].bot_suspect and out["bot"].cv_gap == 0.0
    assert out["bulk"].bot_suspect and out["bulk"].zero_gap_share > 0.9
    assert not out["human"].bot_suspect

    # identical output at different parallelism (exact integer sums)
    out7 = {
        r.user: r
        for r in sessions.bot_score(df.repartition(7), "user", "ts").collect()
    }
    assert out7 == out

    with pytest.raises(ValueError, match="min_events"):
        sessions.bot_score(df, "user", "ts", min_events=1)


def test_resample_grid(spark):
    """Complete grid with explicit empty buckets; zero/null/ffill
    semantics; python differential; grouped independent spans;
    max_buckets probe; guards."""
    import datetime as dt

    from getl_spark.functions import sessions

    t0 = dt.datetime(2024, 5, 1)
    rows = [
        ("a", t0, 10.0),
        ("a", t0 + dt.timedelta(seconds=30), 20.0),   # same minute
        ("a", t0 + dt.timedelta(minutes=3), 6.0),     # gap: minutes 1,2 empty
        ("b", t0 + dt.timedelta(minutes=10), 5.0),
        ("b", t0 + dt.timedelta(minutes=11, seconds=59), 7.0),
    ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, v DOUBLE")

    out = sessions.resample(
        df, "ts", 60, {"v": "sum"}, group_by="k"
    ).orderBy("k", "bucket_start_s").collect()
    base = int(t0.timestamp())
    got_a = [(r.bucket_start_s - base, r.v_sum) for r in out if r.k == "a"]
    assert got_a == [(0, 30.0), (60, 0), (120, 0), (180, 6.0)]
    got_b = [(r.bucket_start_s, r.v_sum) for r in out if r.k == "b"]
    assert len(got_b) == 2 and got_b[0][1] == 5.0 and got_b[1][1] == 7.0

    # null fill: empty buckets are NULL not 0
    out = sessions.resample(
        df, "ts", 60, {"v": "avg"}, group_by="k", fill="null"
    ).orderBy("k", "bucket_start_s").collect()
    a = [r.v_avg for r in out if r.k == "a"]
    assert a == [15.0, None, None, 6.0]

    # ffill: the gap carries the last observation forward
    out = sessions.resample(
        df, "ts", 60, {"v": "avg"}, group_by="k", fill="ffill"
    ).orderBy("k", "bucket_start_s").collect()
    a = [r.v_avg for r in out if r.k == "a"]
    assert a == [15.0, 15.0, 15.0, 6.0]

    # count agg + ungrouped global grid
    out = sessions.resample(df, "ts", 3600, {"v": "count"}).collect()
    assert [(r.bucket_start_s, r.v_count) for r in out] == [(base, 5)]

    # probe: a 1-second grid over 10 minutes with max_buckets=100
    with pytest.raises(ValueError, match="max_buckets"):
        sessions.resample(df, "ts", 1, {"v": "sum"}, max_buckets=100)
    with pytest.raises(ValueError, match="unsupported agg"):
        sessions.resample(df, "ts", 60, {"v": "median"})
    with pytest.raises(ValueError, match="fill"):
        sessions.resample(df, "ts", 60, {"v": "sum"}, fill="bfill")
    with pytest.raises(ValueError, match="step_s"):
        sessions.resample(df, "ts", 0, {"v": "sum"})


# ------------------------------------------------------------- attribution


def _brute_attribution(rows, conversion, model, lookback=None,
                       half_life=7 * 86400.0):
    """Pure-python replay: rows = [(user, t_seconds, type)]."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, ch in rows:
        by_user[u].append((t, ch))
    credit = defaultdict(float)
    touches = defaultdict(int)
    convs = defaultdict(set)
    for u, evs in by_user.items():
        evs = sorted(evs)  # (t, ch)
        for ct, cch in [e for e in evs if e[1] == conversion]:
            elig = [
                (t, ch) for t, ch in evs
                if ch != conversion and t <= ct
                and (lookback is None or ct - t <= lookback)
            ]
            m = len(elig)
            if m == 0:
                continue
            if model == "time_decay":
                ws = [0.5 ** ((ct - t) / half_life) for t, _ in elig]
                tot = sum(ws)
            for i, (t, ch) in enumerate(elig):
                if model == "first_touch":
                    c = 1.0 if i == 0 else 0.0
                elif model == "last_touch":
                    c = 1.0 if i == m - 1 else 0.0
                elif model == "linear":
                    c = 1.0 / m
                elif model == "position":
                    if m == 1:
                        c = 1.0
                    elif m == 2:
                        c = 0.5
                    elif i in (0, m - 1):
                        c = 0.4
                    else:
                        c = 0.2 / (m - 2)
                else:
                    c = ws[i] / tot
                credit[ch] += c
                touches[ch] += 1
                convs[ch].add((u, ct))
    return {
        ch: (round(credit[ch], 6), touches[ch], len(convs[ch]))
        for ch in credit
    }


def _attr_df(spark, rows):
    import datetime

    data = [
        (u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=t), ch)
        for u, t, ch in rows
    ]
    return spark.createDataFrame(
        data, "user_id LONG, ts TIMESTAMP, event_type STRING"
    )


ATTR_ROWS = [
    # user 1: ad -> email -> ad -> buy ; later organic buy (no touches
    # in 100 s lookback for the second conversion when lookback small)
    (1, 0, "ad"), (1, 10, "email"), (1, 20, "ad"), (1, 30, "buy"),
    (1, 5000, "buy"),
    # user 2: single touch then buy
    (2, 0, "email"), (2, 50, "buy"),
    # user 3: touch AFTER the conversion — ineligible
    (3, 100, "buy"), (3, 200, "ad"),
    # user 4: simultaneous touch and conversion (counts, <=)
    (4, 77, "ad"), (4, 77, "buy"),
]


def test_attribution_models_match_brute(spark):
    from getl_spark.functions import sessions

    df = _attr_df(spark, ATTR_ROWS)
    for model in ("first_touch", "last_touch", "linear", "position",
                  "time_decay"):
        got = {
            r.channel: (r.credit, r.touches, r.conversions)
            for r in sessions.attribution(
                df, "buy", model=model, half_life_seconds=60.0
            ).collect()
        }
        want = _brute_attribution(
            ATTR_ROWS, "buy", model, half_life=60.0
        )
        for ch in set(got) | set(want):
            g, w = got[ch], want[ch]
            assert abs(g[0] - w[0]) < 1e-6, (model, ch, g, w)
            assert g[1:] == w[1:], (model, ch, g, w)


def test_attribution_lookback_and_position(spark):
    from getl_spark.functions import sessions

    df = _attr_df(spark, ATTR_ROWS)
    got = {
        r.channel: r.credit
        for r in sessions.attribution(
            df, "buy", model="position", lookback_seconds=100.0
        ).collect()
    }
    want = _brute_attribution(ATTR_ROWS, "buy", "position", lookback=100.0)
    assert got == {ch: v[0] for ch, v in want.items()}
    # direct check: user 1 first conversion has 3 touches -> 0.4/0.2/0.4
    # (ad gets 0.4+0.4, email 0.2); user 2: single touch email 1.0;
    # user 4: single ad 1.0. The 5000-s organic buy earns nothing.
    assert abs(got["ad"] - (0.8 + 1.0)) < 1e-6
    assert abs(got["email"] - (0.2 + 1.0)) < 1e-6


def test_attribution_total_credit_is_touched_conversions(spark):
    from getl_spark.functions import sessions

    df = _attr_df(spark, ATTR_ROWS)
    for model in ("linear", "position", "time_decay", "first_touch"):
        rows = sessions.attribution(
            df, "buy", model=model, half_life_seconds=60.0
        ).collect()
        total = sum(r.credit for r in rows)
        # 4 conversions with >=1 eligible touch (u1 both, u2, u4)
        assert abs(total - 4.0) < 1e-5, model


def test_attribution_guards(spark):
    from getl_spark.functions import sessions

    df = _attr_df(spark, ATTR_ROWS)
    with pytest.raises(ValueError, match="unknown model"):
        sessions.attribution(df, "buy", model="shapley")
    with pytest.raises(ValueError, match="touch type"):
        sessions.attribution(df, "buy", touch_types=["ad", "buy"])
    with pytest.raises(ValueError, match="max_events_per_user"):
        sessions.attribution(df, "buy", max_events_per_user=0)
    # touch_types restriction drops other channels entirely
    got = {
        r.channel
        for r in sessions.attribution(
            df, "buy", touch_types=["email"]
        ).collect()
    }
    assert got == {"email"}


def test_attribution_null_user_conversions_counted(spark):
    # a NULL user_id's conversion earns credit AND appears in the
    # conversions count — countDistinct over a struct key never drops
    # NULL-bearing tuples (bare-column countDistinct would)
    from getl_spark.functions import sessions

    rows = [(None, 0, "ad"), (None, 10, "buy"), (7, 0, "email"),
            (7, 5, "buy")]
    got = {
        r.channel: (r.credit, r.touches, r.conversions)
        for r in sessions.attribution(
            _attr_df(spark, rows), "buy", model="linear"
        ).collect()
    }
    assert got["ad"] == (1.0, 1, 1)
    assert got["email"] == (1.0, 1, 1)


def test_attribution_capped_users_column(spark):
    from getl_spark.functions import sessions

    df = _attr_df(spark, ATTR_ROWS)
    # user 1 has 5 events; everyone else has 2 — cap at 2 truncates
    # exactly one user, and the constant column says so on every row
    rows = sessions.attribution(
        df, "buy", model="linear", max_events_per_user=2,
        with_capped_users=True,
    ).collect()
    assert rows and all(r.capped_users == 1 for r in rows)
    # default: column absent, schema unchanged
    assert "capped_users" not in sessions.attribution(
        df, "buy", model="linear"
    ).columns
    # no truncation -> 0
    rows = sessions.attribution(
        df, "buy", model="linear", with_capped_users=True
    ).collect()
    assert rows and all(r.capped_users == 0 for r in rows)


def test_attribution_partition_invariant(spark):
    from getl_spark.functions import sessions

    df = _attr_df(spark, ATTR_ROWS)
    a = sorted(
        map(tuple, sessions.attribution(
            df.repartition(1), "buy", model="position"
        ).collect())
    )
    b = sorted(
        map(tuple, sessions.attribution(
            df.repartition(13), "buy", model="position"
        ).collect())
    )
    assert a == b


# ---------------------------------------------------- markov attribution


def _markov_ref(rows, conversion, removal_channels=None):
    """Pure-python removal-effect replay: rows = [(user, t, type)].
    Returns (base_p, {channel: removal_effect}, total_conversions)."""
    from collections import defaultdict

    import numpy as np

    by_user = defaultdict(list)
    for u, t, ch in rows:
        by_user[u].append((t, ch))
    trans = defaultdict(int)
    total_conv = 0
    for u, evs in by_user.items():
        evs = sorted(evs)
        prev = "__start__"
        for t, ch in evs:
            if ch == conversion:
                trans[(prev, "__conversion__")] += 1
                total_conv += 1
                prev = "__start__"
            else:
                trans[(prev, ch)] += 1
                prev = ch
        if prev != "__start__":
            trans[(prev, "__null__")] += 1
    channels = sorted(
        {s for s, d in trans if s != "__start__"}
        | {d for s, d in trans if d not in ("__conversion__", "__null__")}
    )

    def absorb(keep):
        states = ["__start__"] + [c for c in channels if c in keep]
        idx = {s: i for i, s in enumerate(states)}
        m = len(states)
        q = np.zeros((m, m))
        r = np.zeros(m)
        flow = defaultdict(int)
        for (s, d), n in trans.items():
            flow[s] += n
        for (s, d), n in trans.items():
            if s not in idx:
                continue
            if d == "__conversion__":
                r[idx[s]] += n / flow[s]
            elif d in idx:
                q[idx[s], idx[d]] += n / flow[s]
        x = np.linalg.solve(np.eye(m) - q, r)
        return float(x[0])

    base = absorb(set(channels))
    effects = {
        c: max(0.0, 1.0 - absorb(set(channels) - {c}) / base)
        for c in channels
    }
    return base, effects, total_conv


MARKOV_ROWS = [
    # u1: ad -> email -> buy, then a second journey ad -> (no conv)
    (1, 0, "ad"), (1, 10, "email"), (1, 20, "buy"), (1, 30, "ad"),
    # u2: email -> buy
    (2, 0, "email"), (2, 5, "buy"),
    # u3: ad -> ad is impossible here (dedup'd types differ); ad -> null
    (3, 0, "ad"),
    # u4: social -> ad -> buy
    (4, 0, "social"), (4, 1, "ad"), (4, 2, "buy"),
    # u5: social -> null
    (5, 0, "social"),
]


def test_markov_attribution_matches_reference(spark):
    from getl_spark.functions import sessions

    df = _attr_df(spark, MARKOV_ROWS)
    got = {
        r.channel: (r.removal_effect, r.credit, r.conversions)
        for r in sessions.markov_attribution(df, "buy").collect()
    }
    base, effects, total = _markov_ref(MARKOV_ROWS, "buy")
    assert set(got) == set(effects)
    tot_eff = sum(effects.values())
    for ch, e in effects.items():
        assert abs(got[ch][0] - e) < 1e-6, ch
        assert abs(got[ch][1] - e / tot_eff * total) < 1e-6, ch
        assert got[ch][2] == total
    # credits sum to the converted-journey count
    assert abs(sum(v[1] for v in got.values()) - total) < 1e-5


def test_markov_attribution_semantics(spark):
    from getl_spark.functions import sessions

    # a channel on EVERY converting path has removal effect 1
    rows = [
        (1, 0, "ad"), (1, 1, "buy"),
        (2, 0, "email"), (2, 1, "ad"), (2, 2, "buy"),
        (3, 0, "email"),
    ]
    got = {
        r.channel: r.removal_effect
        for r in sessions.markov_attribution(
            _attr_df(spark, rows), "buy"
        ).collect()
    }
    assert got["ad"] == 1.0
    assert got["email"] < 1.0
    # partition invariance
    df = _attr_df(spark, MARKOV_ROWS)
    a = sorted(map(tuple, sessions.markov_attribution(
        df.repartition(1), "buy").collect()))
    b = sorted(map(tuple, sessions.markov_attribution(
        df.repartition(11), "buy").collect()))
    assert a == b


def test_markov_attribution_guards(spark):
    from getl_spark.functions import sessions

    df = _attr_df(spark, MARKOV_ROWS)
    with pytest.raises(ValueError, match="max_channels"):
        sessions.markov_attribution(df, "buy", max_channels=1)
    with pytest.raises(ValueError, match="no converted"):
        sessions.markov_attribution(
            _attr_df(spark, [(1, 0, "ad"), (2, 0, "email")]), "buy"
        )
    with pytest.raises(ValueError, match="conversion type"):
        sessions.markov_attribution(df, "buy", touch_types=["ad", "buy"])
    with pytest.raises(ValueError, match="reserved"):
        sessions.markov_attribution(
            _attr_df(spark, [(1, 0, "__null__"), (1, 1, "buy")]), "buy"
        )


# ------------------------------------------------------------------- RFM


def test_rfm_scores_and_segments(spark):
    import datetime as dt

    from getl_spark.functions import sessions

    day = 86400
    rows = []
    # u1 champion: 20 recent events, high spend
    rows += [(1, 29 * day + i, 50.0) for i in range(20)]
    # u2 hibernating: 2 old events, tiny spend
    rows += [(2, 0, 1.0), (2, day, 1.0)]
    # u3 at_risk: 10 old events
    rows += [(3, i * day // 10, 5.0) for i in range(10)]
    # u4 recent: 1 very recent event
    rows += [(4, 30 * day, 10.0)]
    # u5..u8 middle mass so quintiles separate
    for u in range(5, 9):
        rows += [(u, (10 + u) * day + i, 3.0) for i in range(u)]
    data = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), v)
        for u, t, v in rows
    ]
    df = spark.createDataFrame(data, "user_id LONG, ts TIMESTAMP, value DOUBLE")
    out = {r.user_id: r for r in sessions.rfm(df).collect()}
    assert len(out) == 8
    # anchored at the corpus max ts: u4's recency is 0 days
    assert out[4].recency_days == 0.0
    assert out[1].frequency == 20 and out[1].monetary == 1000.0
    # scores are within 1..5 and monotone with the raw values
    for r in out.values():
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
    assert out[1].f_score == 5 and out[1].m_score == 5
    assert out[2].f_score == 1
    assert out[1].segment == "champions"
    assert out[2].segment == "hibernating"
    assert out[3].segment == "at_risk"
    assert out[4].segment == "recent"
    # explicit as_of shifts recency but not frequency/monetary
    shifted = {
        r.user_id: r
        for r in sessions.rfm(
            df, as_of="2024-02-15T00:00:00"
        ).collect()
    }
    assert shifted[4].recency_days > 0
    assert shifted[1].frequency == out[1].frequency
    # partition invariance
    again = {r.user_id: tuple(r) for r in sessions.rfm(df.repartition(9)).collect()}
    assert again == {r.user_id: tuple(r) for r in out.values()}
    with pytest.raises(ValueError, match="n_bins"):
        sessions.rfm(df, n_bins=1)


def test_stickiness_weekly_ratio(spark):
    """DAU/periodAU on a hand-computable fixture: 3 users, one week;
    u0 active every day, u1 two days, u2 one day."""
    import datetime

    from getl_spark.functions import sessions

    base = datetime.datetime(2024, 1, 1, 12)  # a Monday
    rows = []
    for d in range(5):
        rows.append((0, base + datetime.timedelta(days=d)))
    rows += [(1, base), (1, base + datetime.timedelta(days=1)),
             (2, base + datetime.timedelta(days=2)),
             (0, base)]  # duplicate (day,user) must not double-count
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    out = sessions.stickiness(df, period="week").collect()
    assert len(out) == 1
    r = out[0]
    assert str(r.period_start) == "2024-01-01"
    assert r.period_users == 3 and r.active_days == 5
    # day actives: 2,2,2,1,1 -> avg 1.6; stickiness 1.6/3
    assert abs(r.avg_dau - 1.6) < 1e-9
    assert abs(r.stickiness - 1.6 / 3) < 1e-6
    # NULL user/ts rows excluded
    with_null = df.union(
        spark.createDataFrame([(None, base), (9, None)], df.schema)
    )
    r2 = sessions.stickiness(with_null, period="week").collect()[0]
    assert r2.period_users == 3
    # month path: same fixture is one January period
    m = sessions.stickiness(df, period="month").collect()
    assert len(m) == 1 and str(m[0].period_start) == "2024-01-01"
    assert m[0].period_users == 3 and m[0].active_days == 5
    import pytest as _pytest

    with _pytest.raises(ValueError, match="period"):
        sessions.stickiness(df, period="quarter")


def test_stickiness_day_grain_series(spark):
    """grain='day' emits the per-day DAU series under the period
    rollup: one row per active day, dau and its share of the period
    audience, ordered by day — the dashboard curve without a rescan."""
    import datetime

    from getl_spark.functions import sessions

    base = datetime.datetime(2024, 1, 1, 12)  # a Monday
    rows = [(0, base + datetime.timedelta(days=d)) for d in range(5)]
    rows += [(1, base), (1, base + datetime.timedelta(days=1)),
             (2, base + datetime.timedelta(days=2)),
             (0, base)]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    out = sessions.stickiness(df, period="week", grain="day").collect()
    assert [str(r.day) for r in out] == [
        f"2024-01-0{d}" for d in range(1, 6)
    ]
    assert [r.dau for r in out] == [2, 2, 2, 1, 1]
    assert all(r.period_users == 3 for r in out)
    assert all(str(r.period_start) == "2024-01-01" for r in out)
    assert abs(out[0].day_share - 2 / 3) < 1e-6
    # the day series averages back to the rollup's avg_dau
    roll = sessions.stickiness(df, period="week").collect()[0]
    assert abs(sum(r.dau for r in out) / len(out) - roll.avg_dau) < 1e-9
    import pytest as _pytest

    with _pytest.raises(ValueError, match="grain"):
        sessions.stickiness(df, grain="hour")


def test_lness_histogram(spark):
    """Days-active histogram on the stickiness fixture: u0 five days,
    u1 two, u2 one — one row per depth, fractions sum to 1, duplicate
    (day,user) events don't double-count."""
    import datetime

    from getl_spark.functions import sessions

    base = datetime.datetime(2024, 1, 1, 12)  # a Monday
    rows = [(0, base + datetime.timedelta(days=d)) for d in range(5)]
    rows += [(1, base), (1, base + datetime.timedelta(days=1)),
             (2, base + datetime.timedelta(days=2)),
             (0, base)]  # duplicate (day,user)
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    out = sessions.lness(df, period="week").collect()
    got = {r.days_active: (r.n_users, r.frac_users) for r in out}
    assert got == {1: (1, round(1 / 3, 6)), 2: (1, round(1 / 3, 6)),
                   5: (1, round(1 / 3, 6))}
    assert all(str(r.period_start) == "2024-01-01" for r in out)
    assert abs(sum(r.frac_users for r in out) - 1.0) < 1e-5
    import pytest as _pytest

    with _pytest.raises(ValueError, match="period"):
        sessions.lness(df, period="day")

"""Batch sessionization + rolling time aggregates (functions/sessions.py)."""

from __future__ import annotations

import datetime

import pytest
import yaml

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

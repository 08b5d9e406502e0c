"""SCD2 history merge (write::batch_scd2 / ManagedTable.scd2_merge),
CDC-log compaction (dedup.latest_by_key), keyed table reconciliation
(stats.table_diff), and the binary-file source (load::batch_binary)."""

from __future__ import annotations

import datetime

import pytest
import yaml

from getl_spark import lift
from getl_spark.common.tables import ManagedTable
from getl_spark.functions import dedup, stats

T1 = datetime.datetime(2024, 1, 1)
T2 = datetime.datetime(2024, 2, 1)


# ------------------------------------------------------------------ scd2
def _wave(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, v STRING, ts TIMESTAMP")


def test_scd2_merge_two_waves_full_history(spark, tmp_path):
    path = str(tmp_path / "dim")
    table = ManagedTable(spark, path)
    table.scd2_merge(
        _wave(spark, [(1, "a", T1), (2, "b", T1), (3, "c", T1)]),
        keys=["k"],
        ts_col="ts",
    )
    got = {(r.k, r.v, r.valid_from, r.valid_to, r.is_current)
           for r in table.read().collect()}
    assert got == {
        (1, "a", T1, None, True),
        (2, "b", T1, None, True),
        (3, "c", T1, None, True),
    }
    # wave 2: k=1 changed, k=2 unchanged, k=4 new
    table.scd2_merge(
        _wave(spark, [(1, "a2", T2), (2, "b", T2), (4, "d", T2)]),
        keys=["k"],
        ts_col="ts",
    )
    got = {(r.k, r.v, r.valid_from, r.valid_to, r.is_current)
           for r in table.read().collect()}
    assert got == {
        (1, "a", T1, T2, False),   # closed at the change's effective time
        (1, "a2", T2, None, True),  # new current version
        (2, "b", T1, None, True),   # unchanged: untouched, keeps T1
        (3, "c", T1, None, True),   # absent from wave 2: untouched
        (4, "d", T2, None, True),   # new key
    }


def test_scd2_merge_in_batch_latest_version_wins(spark, tmp_path):
    """Two versions of a key inside ONE batch: only the latest-ts row
    opens; the earlier one is an intermediate state the batch itself
    superseded."""
    path = str(tmp_path / "dim")
    table = ManagedTable(spark, path)
    table.scd2_merge(
        _wave(spark, [(1, "old", T1), (1, "new", T2)]), keys=["k"], ts_col="ts"
    )
    got = [(r.k, r.v, r.valid_from, r.is_current) for r in table.read().collect()]
    assert got == [(1, "new", T2, True)]


def test_scd2_sink_block_yaml(spark, tmp_path):
    src = str(tmp_path / "src")
    _wave(spark, [(1, "a", T1)]).write.parquet(src)
    path = str(tmp_path / "dim")
    blocks = {
        "L": {"Type": "load::batch_parquet", "Properties": {"Path": src}},
        "W": {
            "Type": "write::batch_scd2",
            "Input": "L",
            "Properties": {"Path": path, "Keys": ["k"], "TsColumn": "ts"},
        },
    }
    lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    rows = ManagedTable(spark, path).read().collect()
    assert [(r.k, r.v, r.is_current) for r in rows] == [(1, "a", True)]


# --------------------------------------------------------- latest_by_key
def test_latest_by_key_compacts_changelog(spark):
    log = spark.createDataFrame(
        [(1, 1, "v1"), (1, 3, "v3"), (1, 2, "v2"), (2, 1, "x1")],
        "k BIGINT, seq BIGINT, v STRING",
    )
    got = {(r.k, r.v) for r in dedup.latest_by_key(log, ["k"], "seq").collect()}
    assert got == {(1, "v3"), (2, "x1")}
    got_min = {
        (r.k, r.v)
        for r in dedup.latest_by_key(log, ["k"], "seq", keep="min").collect()
    }
    assert got_min == {(1, "v1"), (2, "x1")}
    with pytest.raises(ValueError, match="max|min"):
        dedup.latest_by_key(log, ["k"], "seq", keep="newest")


def test_latest_by_key_tiebreak_deterministic(spark):
    log = spark.createDataFrame(
        [(1, 5, "b"), (1, 5, "a"), (1, 5, "c")], "k BIGINT, seq BIGINT, v STRING"
    )
    got = dedup.latest_by_key(log, ["k"], "seq", tiebreak_cols=["v"]).collect()
    assert [(r.k, r.v) for r in got] == [(1, "c")]  # max tiebreak on v


# ------------------------------------------------------------ table_diff
def test_table_diff_statuses(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k BIGINT, v STRING, n BIGINT",
    )
    right = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 50)],
        "k BIGINT, v STRING, n BIGINT",
    )
    got = {(r.k, r.status) for r in stats.table_diff(left, right, ["k"]).collect()}
    assert got == {
        (1, "unchanged"),
        (2, "changed"),
        (3, "removed"),
        (4, "unchanged"),  # NULL == NULL is null-safe
        (5, "added"),
    }


def test_table_diff_compare_subset_and_yaml(spark, tmp_path):
    left = spark.createDataFrame([(1, "a", 1)], "k BIGINT, v STRING, extra BIGINT")
    right = spark.createDataFrame([(1, "a", 2)], "k BIGINT, v STRING, extra BIGINT")
    # full compare: changed; restricted to v: unchanged
    assert stats.table_diff(left, right, ["k"]).collect()[0].status == "changed"
    assert (
        stats.table_diff(left, right, ["k"], compare_cols=["v"])
        .collect()[0]
        .status
        == "unchanged"
    )
    # multi-input YAML path
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)
    blocks = {
        "L": {"Type": "load::batch_parquet", "Properties": {"Path": lp}},
        "R": {"Type": "load::batch_parquet", "Properties": {"Path": rp}},
        "D": {
            "Type": "transform::generic",
            "Input": ["L", "R"],
            "Properties": {
                "Functions": [{"stats.table_diff": {"keys": ["k"]}}]
            },
        },
    }
    log = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    assert log.get("D").collect()[0].status == "changed"

    with pytest.raises(ValueError, match="key"):
        stats.table_diff(left, right, [])


# ---------------------------------------------------------- batch_binary
def test_batch_binary_reads_files_with_glob(spark, tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake-a")
    (d / "b.png").write_bytes(b"\x89PNG-fake-b")
    (d / "notes.txt").write_bytes(b"not media")
    blocks = {
        "L": {
            "Type": "load::batch_binary",
            "Properties": {"Path": str(d), "PathGlobFilter": "*.png"},
        },
    }
    log = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    df = log.get("L")
    assert {"path", "modificationTime", "length", "content"} <= set(df.columns)
    rows = sorted(df.collect(), key=lambda r: r.path)
    assert [r.path.rsplit("/", 1)[-1] for r in rows] == ["a.png", "b.png"]
    assert rows[0].content == b"\x89PNG-fake-a"
    assert rows[0].length == len(b"\x89PNG-fake-a")


def test_batch_binary_column_pruning_skips_content(spark, tmp_path):
    """A projection without `content` must not read file bytes — the
    binaryFile scan's ReadSchema should exclude the content column."""
    d = tmp_path / "media2"
    d.mkdir()
    (d / "x.bin").write_bytes(b"abc")
    blocks = {
        "L": {"Type": "load::batch_binary", "Properties": {"Path": str(d)}},
    }
    log = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    plan = (
        log.get("L")
        .select("path", "length")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "content" not in plan


def test_scd2_invariants_over_random_waves(spark, tmp_path):
    """SCD2 structural invariants after a random sequence of waves:
    exactly one current row per live key, version intervals are
    non-overlapping and chain (valid_to of one = valid_from of the
    next), history rows are closed, and the current row reflects the
    latest changed value."""
    import random

    rng = random.Random(42)
    path = str(tmp_path / "dim")
    table = ManagedTable(spark, path)
    latest = {}
    for wave_i in range(4):
        t = datetime.datetime(2024, 1 + wave_i, 1)
        rows = []
        for k in range(12):
            if rng.random() < 0.6:
                v = rng.choice(["a", "b", "c"])
                rows.append((k, v, t))
                if latest.get(k, (None,))[0] != v:
                    latest[k] = (v, t)
        if not rows:
            continue
        table.scd2_merge(_wave(spark, rows), keys=["k"], ts_col="ts")
    data = table.read().collect()
    by_key = {}
    for r in data:
        by_key.setdefault(r.k, []).append(r)
    for k, versions in by_key.items():
        currents = [r for r in versions if r.is_current]
        assert len(currents) == 1, f"key {k}: {len(currents)} current rows"
        assert currents[0].valid_to is None
        # current row reflects the last CHANGE (not merely last send)
        assert (currents[0].v, currents[0].valid_from) == latest[k]
        closed = sorted(
            (r for r in versions if not r.is_current), key=lambda r: r.valid_from
        )
        for r in closed:
            assert r.valid_to is not None and r.valid_from < r.valid_to
        # intervals chain: each closed row ends where the next begins
        chain = closed + currents
        for a, b in zip(chain, chain[1:]):
            assert a.valid_to == b.valid_from


def test_scd2_validates_inputs(spark, tmp_path):
    table = ManagedTable(spark, str(tmp_path / "d"))
    df = _wave(spark, [(1, "a", T1)])
    with pytest.raises(ValueError, match="ts_col"):
        table.scd2_merge(df, keys=["k"], ts_col="nope")
    with pytest.raises(ValueError, match="key columns"):
        table.scd2_merge(df, keys=["missing"], ts_col="ts")
    with pytest.raises(ValueError, match="reserved"):
        table.scd2_merge(
            df.withColumn("is_current", df.k > 0), keys=["k"], ts_col="ts"
        )


def test_substring_spans_structural_invariants(spark):
    """Spans are within token bounds, non-overlapping per doc, ordered,
    and each span is at least min_tokens long."""
    rows = []
    words = ["w%d" % i for i in range(30)]
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    for d in range(8):
        body = " ".join(words[d : d + 12])
        if d % 2 == 0:
            body = f"{body} {shared}"
        if d % 3 == 0:
            body = f"{shared} {body}"
        rows.append((d, body))
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    from getl_spark.functions import dedup as D

    L = 5
    spans = {}
    for r in D.substring_spans(df, min_tokens=L).collect():
        spans.setdefault(r.id, []).append((r.start, r.end))
    lengths = {r[0]: len(r[1].split()) for r in rows}
    for doc, ss in spans.items():
        ss.sort()
        for s, e in ss:
            assert 0 <= s < e <= lengths[doc]
            assert e - s >= L
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert e1 < s2  # merged islands never touch or overlap


def test_scd2_rerun_same_wave_is_noop(spark, tmp_path):
    """Retrying a wave (same data, same effective time) must change
    nothing — the at-least-once delivery contract for SCD2 ingest."""
    path = str(tmp_path / "dim")
    table = ManagedTable(spark, path)
    w1 = _wave(spark, [(1, "a", T1), (2, "b", T1)])
    w2 = _wave(spark, [(1, "a2", T2), (3, "c", T2)])
    table.scd2_merge(w1, keys=["k"], ts_col="ts")
    table.scd2_merge(w2, keys=["k"], ts_col="ts")
    before = sorted(tuple(r) for r in table.read().collect())
    table.scd2_merge(w2, keys=["k"], ts_col="ts")  # retry
    after = sorted(tuple(r) for r in table.read().collect())
    assert after == before


def test_table_diff_null_keys_classified_correctly(spark):
    """NULL keys are legal under the eqNullSafe join: a NULL-keyed row
    on both sides is matched (not 'removed'+'added'), and a NULL-keyed
    right-only row is 'added'."""
    left = spark.createDataFrame([(None, "a")], "k BIGINT, v STRING")
    right = spark.createDataFrame([(None, "a")], "k BIGINT, v STRING")
    assert [
        (r.k, r.status) for r in stats.table_diff(left, right, ["k"]).collect()
    ] == [(None, "unchanged")]
    right2 = spark.createDataFrame([(None, "b")], "k BIGINT, v STRING")
    assert stats.table_diff(left, right2, ["k"]).first().status == "changed"
    empty = spark.createDataFrame([], "k BIGINT, v STRING")
    assert stats.table_diff(empty, right2, ["k"]).first().status == "added"
    assert stats.table_diff(left, empty, ["k"]).first().status == "removed"


def test_scd2_null_key_rerun_no_duplicate_current(spark, tmp_path):
    """A NULL-keyed dimension row re-sent unchanged must stay a single
    current version (match detection is marker-based, not
    key-nullability-based)."""
    table = ManagedTable(spark, str(tmp_path / "dim"))
    w = _wave(spark, [(None, "a", T1), (1, "b", T1)])
    table.scd2_merge(w, keys=["k"], ts_col="ts")
    table.scd2_merge(
        _wave(spark, [(None, "a", T2), (1, "b", T2)]), keys=["k"], ts_col="ts"
    )
    rows = table.read().collect()
    assert len(rows) == 2 and all(r.is_current for r in rows)
    assert {r.k for r in rows} == {None, 1}


def test_dedup_by_component_quality_with_duplicate_corpus_rows(spark):
    """A corpus carrying several rows per id (exactly what a dedup
    pipeline sees) must not anti-join away the winning id."""
    from getl_spark.functions import graph

    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.9), (2, 0.1)], "doc_id BIGINT, quality DOUBLE"
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    kept = graph.dedup_by_component(df, pairs, quality_col="quality").collect()
    assert {r.doc_id for r in kept} == {1}
    assert len(kept) == 2  # both rows of the winning id survive

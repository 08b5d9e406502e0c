"""Streamed source→sink pair with availableNow incremental-batch
semantics (mirrors reference tests/getl/manager/test_manager.py
streaming scenario: N json files in → same rows out)."""

import json

from getl_spark import lift
from getl_spark.common.tables import ManagedTable


def test_stream_json_to_sink_counts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for i in range(10):
        with open(src / f"f{i}.json", "w") as fh:
            for g in ("Alfred", "Bobbette"):
                fh.write(json.dumps({"name": f"n{i}", "group": g}) + "\n")

    schema = {
        "type": "struct",
        "fields": [
            {"name": "name", "type": "string", "nullable": True, "metadata": {}},
            {"name": "group", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    import yaml

    definition = {
        "LiftJob": {
            "Read": {
                "Type": "load::stream_json",
                "Properties": {"Path": str(src), "JsonSchema": schema},
            },
            "Sink": {
                "Type": "write::stream_delta",
                "Input": "Read",
                "Properties": {"Path": str(tmp_path / "out"), "OutputMode": "append"},
            },
        }
    }
    lift(spark, yaml.safe_dump(definition, sort_keys=False))
    out = ManagedTable(spark, str(tmp_path / "out")).read()
    assert out.count() == 20

    # incremental: re-running with no new files adds nothing (checkpoint)
    lift(spark, yaml.safe_dump(definition, sort_keys=False))
    assert ManagedTable(spark, str(tmp_path / "out")).read().count() == 20

    # one more file → exactly two more rows
    with open(src / "f10.json", "w") as fh:
        fh.write(json.dumps({"name": "n10", "group": "Alfred"}) + "\n")
        fh.write(json.dumps({"name": "n10", "group": "Bobbette"}) + "\n")
    lift(spark, yaml.safe_dump(definition, sort_keys=False))
    assert ManagedTable(spark, str(tmp_path / "out")).read().count() == 22


def test_stream_requires_schema(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="SchemaPath"):
        lift(
            spark,
            f"""
LiftJob:
  Read:
    Type: load::stream_json
    Properties: {{Path: {tmp_path}}}
""",
        )


def test_time_window_on_real_stream(spark, tmp_path):
    """Windowed aggregation with watermark on a streaming source —
    the extension path the reference lacks entirely."""
    import yaml
    from getl_spark.streaming import windows as W

    src = tmp_path / "stream_in"
    src.mkdir()
    with open(src / "data.json", "w") as fh:
        fh.write('{"ts": "2024-01-01T00:05:00.000Z", "v": 1.0}\n')
        fh.write('{"ts": "2024-01-01T00:25:00.000Z", "v": 2.0}\n')
        fh.write('{"ts": "2024-01-01T01:05:00.000Z", "v": 3.0}\n')

    schema = "ts TIMESTAMP, v DOUBLE"
    stream = spark.readStream.schema(schema).json(str(src))
    assert stream.isStreaming
    windowed = W.tumbling(
        stream,
        time_col="ts",
        duration="1 hour",
        watermark="2 hours",
        aggregations=[{"agg": "count", "alias": "n"}, {"agg": "sum", "col": "v", "alias": "s"}],
    )
    query = (
        windowed.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = {
        r.window_start.isoformat(): (r.n, r.s)
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    assert rows == {
        "2024-01-01T00:00:00": (2, 3.0),
        "2024-01-01T01:00:00": (1, 3.0),
    }


def test_stream_dedup_within_watermark_on_real_stream(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps per-key state only for the
    watermark horizon — duplicates inside it are dropped; state stays
    finite on an unbounded stream."""
    src = tmp_path / "dedup_in"
    src.mkdir()
    with open(src / "data.json", "w") as fh:
        fh.write('{"ts": "2024-01-01T00:00:00.000Z", "k": "a", "v": 1}\n')
        fh.write('{"ts": "2024-01-01T00:01:00.000Z", "k": "a", "v": 2}\n')  # dup key
        fh.write('{"ts": "2024-01-01T00:02:00.000Z", "k": "b", "v": 3}\n')

    stream = spark.readStream.schema("ts TIMESTAMP, k STRING, v LONG").json(str(src))
    from getl_spark.streaming import windows as W

    deduped = W.dedup(stream, keys=["k"], time_col="ts", watermark="1 hour")
    query = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = spark.sql("SELECT k FROM dedup_test").collect()
    assert sorted(r.k for r in rows) == ["a", "b"]


def test_stream_dedup_block_batch_path(spark, tmp_path):
    """The transform::stream_dedup block on a batch input is an exact
    dropDuplicates over the keys."""
    from getl_spark import lift

    src = str(tmp_path / "batch_src")
    spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "id BIGINT, v STRING"
    ).write.parquet(src)
    log = lift(
        spark,
        f"""
LiftJob:
  L:
    Type: load::batch_parquet
    Properties: {{Path: {src}}}
  D:
    Type: transform::stream_dedup
    Input: L
    Properties:
      Keys: [id]
""",
    )
    assert sorted(r.id for r in log.get("D").collect()) == [1, 2]


def test_quota_filter_batch_cumulative(spark):
    """Batch path: per-key first-come-first-served budget via
    cumulative window sum."""
    from getl_spark.streaming.stateful import quota_filter

    df = spark.createDataFrame(
        [
            ("a", 1, 5), ("a", 2, 10), ("a", 3, 3),  # 5 ok, 15 crosses, stop
            ("b", 1, 8), ("b", 2, 1),                # 8 ok, 9 crosses
        ],
        "k STRING, seq BIGINT, n BIGINT",
    )
    out = {(r.k, r.seq) for r in quota_filter(df, "k", "n", 8, "seq").collect()}
    assert out == {("a", 1), ("b", 1)}


def test_quota_filter_state_carries_across_microbatches(spark, tmp_path):
    """Streaming path: the per-key spent amount persists across
    triggers — budget consumed in batch 1 limits batch 2."""
    import json as _json

    from getl_spark.streaming.stateful import quota_filter

    src = tmp_path / "quota_in"
    src.mkdir()
    # two files + maxFilesPerTrigger=1 → two micro-batches
    with open(src / "b1.json", "w") as fh:
        fh.write(_json.dumps({"k": "a", "seq": 1, "n": 6}) + "\n")
        fh.write(_json.dumps({"k": "b", "seq": 1, "n": 2}) + "\n")
    with open(src / "b2.json", "w") as fh:
        fh.write(_json.dumps({"k": "a", "seq": 2, "n": 5}) + "\n")  # 6+5 > 8: drop
        fh.write(_json.dumps({"k": "b", "seq": 2, "n": 5}) + "\n")  # 2+5 <= 8: keep

    stream = (
        spark.readStream.schema("k STRING, seq BIGINT, n BIGINT")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = quota_filter(stream, "k", "n", 8, "seq")
    query = (
        out.writeStream.format("memory")
        .queryName("quota_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = {(r.k, r.seq) for r in spark.sql("SELECT k, seq FROM quota_test").collect()}
    assert rows == {("a", 1), ("b", 1), ("b", 2)}


def test_quota_filter_yaml_block(spark, tmp_path):
    from getl_spark import lift

    src = str(tmp_path / "quota_src")
    spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 10), ("b", 1, 8)], "k STRING, seq BIGINT, n BIGINT"
    ).write.parquet(src)
    log = lift(
        spark,
        f"""
LiftJob:
  L:
    Type: load::batch_parquet
    Properties: {{Path: {src}}}
  Q:
    Type: transform::quota_filter
    Input: L
    Properties:
      Key: k
      CountColumn: n
      Budget: 8
      OrderColumn: seq
""",
    )
    assert {(r.k, r.seq) for r in log.get("Q").collect()} == {("a", 1), ("b", 1)}


def test_quota_filter_property_prefix_semantics(spark):
    """Property: for random nonnegative counts, kept rows per key are
    exactly the maximal order-prefix whose cumulative sum fits."""
    import random

    from getl_spark.streaming.stateful import quota_filter

    rng = random.Random(17)
    rows = [
        (str(rng.randrange(5)), i, rng.randrange(0, 7)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k STRING, seq BIGINT, n BIGINT")
    budget = 20
    got = {(r.k, r.seq) for r in quota_filter(df, "k", "n", budget, "seq").collect()}

    expect = set()
    per_key = {}
    for k, seq, n in sorted(rows, key=lambda r: (r[0], r[1])):
        used = per_key.get(k, 0)
        if used <= budget and used + n <= budget:
            expect.add((k, seq))
            per_key[k] = used + n
        else:
            per_key[k] = budget + 1  # poison
    assert got == expect


def test_quota_filter_rejects_negative_counts(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from getl_spark.streaming.stateful import quota_filter

    df = spark.createDataFrame([("a", 1, -5)], "k STRING, seq BIGINT, n BIGINT")
    with _pytest.raises(Exception, match="negative count|assert"):
        quota_filter(df, "k", "n", 10, "seq").collect()


def test_stream_upsert_merges_incrementally(spark, tmp_path):
    """write::stream_upsert maintains a keyed table across two stream
    drains: wave 2 updates matched keys and inserts new ones, and the
    checkpoint ensures wave-1 files aren't reprocessed."""
    import json as _json
    import yaml as _yaml

    from getl_spark import lift

    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "target")

    def run():
        blocks = {
            "S": {
                "Type": "load::stream_json",
                "Properties": {
                    "Path": str(src),
                    "JsonSchema": {
                        "type": "struct",
                        "fields": [
                            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                        ],
                    },
                },
            },
            "W": {
                "Type": "write::stream_upsert",
                "Input": "S",
                "Properties": {
                    "Path": target,
                    "MergeStatement": "source.k = updates.k",
                    "Keys": ["k"],
                    "Checkpoint": str(tmp_path / "ckpt"),
                },
            },
        }
        lift(spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))

    (src / "w1.json").write_text(
        "\n".join(_json.dumps({"k": k, "v": f"v{k}"}) for k in range(5))
    )
    run()
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {k: f"v{k}" for k in range(5)}

    (src / "w2.json").write_text(
        "\n".join(_json.dumps({"k": k, "v": f"new{k}"}) for k in [1, 3, 7])
    )
    run()
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {0: "v0", 1: "new1", 2: "v2", 3: "new3", 4: "v4", 7: "new7"}


def test_stream_upsert_orderby_keeps_latest_version(spark, tmp_path):
    """With Keys + OrderBy, a micro-batch carrying several versions of
    a key MERGEs the one with the max OrderBy value — deterministic
    latest-wins instead of dropDuplicates' arbitrary pick."""
    import json as _json
    import yaml as _yaml

    from getl_spark import lift

    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "target")
    # one file, three versions of k=1 (out of order) plus one k=2 row
    rows = [
        {"k": 1, "seq": 2, "v": "mid"},
        {"k": 1, "seq": 5, "v": "latest"},
        {"k": 2, "seq": 1, "v": "only"},
        {"k": 1, "seq": 1, "v": "oldest"},
    ]
    (src / "w1.json").write_text("\n".join(_json.dumps(r) for r in rows))
    blocks = {
        "S": {
            "Type": "load::stream_json",
            "Properties": {
                "Path": str(src),
                "JsonSchema": {
                    "type": "struct",
                    "fields": [
                        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                        {"name": "seq", "type": "long", "nullable": True, "metadata": {}},
                        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                    ],
                },
            },
        },
        "W": {
            "Type": "write::stream_upsert",
            "Input": "S",
            "Properties": {
                "Path": target,
                "MergeStatement": "source.k = updates.k",
                "Keys": ["k"],
                "OrderBy": "seq",
                "Checkpoint": str(tmp_path / "ckpt"),
            },
        },
    }
    lift(spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "latest", 2: "only"}


def test_streaming_rollup_continuous_aggregate(spark, tmp_path):
    """stream_json -> tumbling hourly agg -> stream_upsert(update):
    an incrementally maintained rollup. Wave 2 adds events to an
    already-rolled-up hour; the MERGE must update that window's counts
    rather than append a duplicate row."""
    import json as _json
    import yaml as _yaml

    from getl_spark import lift

    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "rollup")

    def run():
        blocks = {
            "S": {
                "Type": "load::stream_json",
                "Properties": {
                    "Path": str(src),
                    "JsonSchema": {
                        "type": "struct",
                        "fields": [
                            {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
                            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
                        ],
                    },
                },
            },
            "Hourly": {
                "Type": "transform::time_window",
                "Input": "S",
                "Properties": {
                    "TimeColumn": "ts",
                    "WindowDuration": "1 hour",
                    "Watermark": "2 hours",
                    "Aggregations": [
                        {"agg": "expr", "expr": "CAST(COUNT(*) AS BIGINT)", "alias": "n"},
                        {"agg": "expr", "expr": "ROUND(SUM(v), 3)", "alias": "sum_v"},
                    ],
                },
            },
            "W": {
                "Type": "write::stream_upsert",
                "Input": "Hourly",
                "Properties": {
                    "Path": target,
                    "MergeStatement": "source.window_start = updates.window_start",
                    "OutputMode": "update",
                    "Checkpoint": str(tmp_path / "ckpt"),
                },
            },
        }
        lift(spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))

    def write_wave(name, events):
        (src / name).write_text(
            "\n".join(_json.dumps({"ts": ts, "v": v}) for ts, v in events)
        )

    write_wave("w1.json", [
        ("2024-01-01 10:05:00", 1.0),
        ("2024-01-01 10:35:00", 2.0),
        ("2024-01-01 11:10:00", 4.0),
    ])
    run()
    got = {
        str(r.window_start): (r.n, r.sum_v)
        for r in spark.read.parquet(target).collect()
    }
    assert got["2024-01-01 10:00:00"] == (2, 3.0)
    assert got["2024-01-01 11:00:00"] == (1, 4.0)

    # wave 2: more rows in the 11:00 hour + a new 12:00 hour
    write_wave("w2.json", [
        ("2024-01-01 11:45:00", 8.0),
        ("2024-01-01 12:01:00", 16.0),
    ])
    run()
    got = {
        str(r.window_start): (r.n, r.sum_v)
        for r in spark.read.parquet(target).collect()
    }
    assert got["2024-01-01 10:00:00"] == (2, 3.0)
    assert got["2024-01-01 11:00:00"] == (2, 12.0)  # updated, not duplicated
    assert got["2024-01-01 12:00:00"] == (1, 16.0)
    assert len(got) == 3


def test_stream_upsert_default_checkpoint_outside_table(spark, tmp_path):
    """With no explicit Checkpoint, the default must live OUTSIDE the
    table directory: the parquet-fallback MERGE rewrites (rmtree) the
    table path, which would destroy a co-located checkpoint and break
    the incremental guarantee on the next drain."""
    import json as _json
    import yaml as _yaml

    from getl_spark import lift

    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "tbl")

    def run():
        blocks = {
            "S": {
                "Type": "load::stream_json",
                "Properties": {
                    "Path": str(src),
                    "JsonSchema": {
                        "type": "struct",
                        "fields": [
                            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                        ],
                    },
                },
            },
            "W": {
                "Type": "write::stream_upsert",
                "Input": "S",
                "Properties": {
                    "Path": target,
                    "MergeStatement": "source.k = updates.k",
                },
            },
        }
        lift(spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))

    (src / "w1.json").write_text(_json.dumps({"k": 1, "v": "a"}))
    run()
    assert (tmp_path / "tbl__checkpoint").exists()
    # second drain: wave-1 file must NOT be reprocessed (checkpoint
    # survived the table rewrite) and the merge still works
    (src / "w2.json").write_text(_json.dumps({"k": 1, "v": "b"}))
    run()
    rows = spark.read.parquet(target).collect()
    assert [(r.k, r.v) for r in rows] == [(1, "b")]


def test_stream_dedup_ingest_grows_index_across_drains(spark, tmp_path):
    """write::stream_dedup_ingest: wave 1 bootstraps the corpus
    (intra-batch exact dup collapsed), wave 2 is filtered against
    everything wave 1 ingested — exact dups AND near dups — and the
    survivors fold into the index so a wave-3 replay of them is
    empty."""
    import json as _json
    import yaml as _yaml

    from getl_spark import lift
    from getl_spark.functions import dedup

    src = tmp_path / "in"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "mh_index")

    # bootstrap an empty index (from-scratch feed)
    empty = spark.createDataFrame([], "doc_id long, text string")
    dedup.build_minhash_index(empty, index, n=3, num_hashes=64, bands=16)

    base = "the quick brown fox jumps over dog number {0} in the field " * 3

    def run():
        blocks = {
            "S": {
                "Type": "load::stream_json",
                "Properties": {
                    "Path": str(src),
                    "JsonSchema": {
                        "type": "struct",
                        "fields": [
                            {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
                            {"name": "text", "type": "string", "nullable": True, "metadata": {}},
                        ],
                    },
                },
            },
            "W": {
                "Type": "write::stream_dedup_ingest",
                "Input": "S",
                "Properties": {
                    "Path": corpus,
                    "IndexPath": index,
                    "NearThreshold": 0.7,
                    "Checkpoint": str(tmp_path / "ckpt"),
                },
            },
        }
        lift(spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))

    # wave 1: docs 0, 1, and an intra-batch exact dup of doc 0
    (src / "w1.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in [
                {"doc_id": 0, "text": base.format(0)},
                {"doc_id": 1, "text": base.format(1)},
                {"doc_id": 2, "text": base.format(0)},  # exact dup of 0
            ]
        )
    )
    run()
    ids = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert ids == [0, 1]

    # wave 2: new doc, exact dup of ingested 1, near dup of ingested 0
    (src / "w2.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in [
                {"doc_id": 10, "text": "a completely novel document about parquet footers"},
                {"doc_id": 11, "text": base.format(1)},  # exact dup of 1
                {"doc_id": 12, "text": base.format(0) + "extra tail"},  # near dup of 0
            ]
        )
    )
    run()
    ids = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert ids == [0, 1, 10]
    # index grew with the survivor: replaying doc 10's text is filtered
    (src / "w3.json").write_text(
        _json.dumps({"doc_id": 20, "text": "a completely novel document about parquet footers"})
    )
    run()
    ids = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert ids == [0, 1, 10]
    # fingerprint table tracks the corpus exactly
    assert spark.read.parquet(f"{index}/fingerprints").count() == 3


def test_stream_dedup_ingest_intra_batch_near_dups_collapse(spark, tmp_path):
    """Two near-duplicates CO-ARRIVING in one micro-batch meet each
    other (not just the index): only the min-id one is ingested."""
    import json as _json
    import yaml as _yaml

    from getl_spark import lift
    from getl_spark.functions import dedup

    src = tmp_path / "in"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "idx")
    dedup.build_minhash_index(
        spark.createDataFrame([], "doc_id long, text string"), index
    )
    base = "the quick brown fox jumps over the lazy dog near the river " * 3
    (src / "w1.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in [
                {"doc_id": 1, "text": base},
                {"doc_id": 2, "text": base + "with a small extra tail"},  # near dup of 1
                {"doc_id": 3, "text": "an unrelated doc about parquet row groups"},
            ]
        )
    )
    lift(
        spark,
        _yaml.safe_dump(
            {
                "LiftJob": {
                    "S": {
                        "Type": "load::stream_json",
                        "Properties": {
                            "Path": str(src),
                            "JsonSchema": {
                                "type": "struct",
                                "fields": [
                                    {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
                                    {"name": "text", "type": "string", "nullable": True, "metadata": {}},
                                ],
                            },
                        },
                    },
                    "W": {
                        "Type": "write::stream_dedup_ingest",
                        "Input": "S",
                        "Properties": {
                            "Path": corpus,
                            "IndexPath": index,
                            "NearThreshold": 0.5,
                            "Checkpoint": str(tmp_path / "ckpt"),
                        },
                    },
                }
            },
            sort_keys=False,
        ),
    )
    ids = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert ids == [1, 3]


def test_stream_dedup_ingest_replay_is_idempotent(spark, tmp_path):
    """A replayed batch (fresh checkpoint, same source files — the
    crash-recovery shape) re-filters against the already-committed
    fingerprints and does NOT duplicate corpus rows."""
    import json as _json
    import yaml as _yaml

    from getl_spark import lift
    from getl_spark.functions import dedup

    src = tmp_path / "in"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "idx")
    dedup.build_minhash_index(
        spark.createDataFrame([], "doc_id long, text string"), index
    )
    (src / "w1.json").write_text(
        "\n".join(
            _json.dumps({"doc_id": i, "text": f"wholly distinct document number {i}"})
            for i in range(4)
        )
    )

    def run(ckpt):
        lift(
            spark,
            _yaml.safe_dump(
                {
                    "LiftJob": {
                        "S": {
                            "Type": "load::stream_json",
                            "Properties": {
                                "Path": str(src),
                                "JsonSchema": {
                                    "type": "struct",
                                    "fields": [
                                        {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
                                        {"name": "text", "type": "string", "nullable": True, "metadata": {}},
                                    ],
                                },
                            },
                        },
                        "W": {
                            "Type": "write::stream_dedup_ingest",
                            "Input": "S",
                            "Properties": {
                                "Path": corpus,
                                "IndexPath": index,
                                "Checkpoint": str(tmp_path / ckpt),
                            },
                        },
                    }
                },
                sort_keys=False,
            ),
        )

    run("ckpt1")
    assert spark.read.parquet(corpus).count() == 4
    run("ckpt2")  # full replay of the same files
    assert spark.read.parquet(corpus).count() == 4
    assert spark.read.parquet(f"{index}/fingerprints").count() == 4


def test_stream_vector_ingest_two_wave_drain(spark, tmp_path):
    """write::stream_vector_ingest: wave 1 bootstraps (intra-batch
    near-dup collapsed to the min id), wave 2 is filtered against
    everything wave 1 ingested and its survivors fold into the index —
    so a wave-3 replay of wave 2 ingests nothing."""
    import json as _json
    import numpy as np
    import yaml as _yaml

    from getl_spark import lift
    from getl_spark.functions import similarity
    from getl_spark.functions import embedding as E

    rng = np.random.default_rng(47)
    centers = rng.normal(size=(4, 16)) * 3

    def vec(c, noise=0.3):
        v = centers[c] + rng.normal(size=16) * noise
        return [float(x) for x in v / np.linalg.norm(v)]

    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "vectors")
    index = str(tmp_path / "ivfpq_index")

    # bootstrap the index from an initial corpus around the 4 centers
    boot = E.l2_normalize(
        spark.createDataFrame(
            [(i, vec(i % 4)) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
    )
    # store_raw: the growing part of an ingest index is off-manifold
    # by definition, so exact verify needs the raw sidecar
    similarity.build_ivf_pq_index(boot, index, nlist=4, m=8, k=16, seed=9, store_raw=True)

    def run():
        blocks = {
            "S": {
                "Type": "load::stream_json",
                "Properties": {
                    "Path": str(src),
                    "JsonSchema": {
                        "type": "struct",
                        "fields": [
                            {"name": "vec_id", "type": "long", "nullable": True, "metadata": {}},
                            {
                                "name": "embedding",
                                "type": {"type": "array", "elementType": "double", "containsNull": True},
                                "nullable": True,
                                "metadata": {},
                            },
                        ],
                    },
                },
            },
            "W": {
                "Type": "write::stream_vector_ingest",
                "Input": "S",
                "Properties": {
                    "Path": out,
                    "IndexPath": index,
                    "Threshold": 0.9,
                    "NProbe": 4,
                    "WithinBatchNlist": 4,
                    "Checkpoint": str(tmp_path / "ckpt"),
                },
            },
        }
        lift(spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))

    boot_rows = {r.vec_id: list(r.embedding) for r in boot.collect()}
    # wave 1: an exact copy of indexed vec 0 (drop), an intra-batch
    # near-dup pair far from the corpus (min id of the pair survives),
    # and one genuinely new direction
    far = [0.0] * 8 + [1.0] + [0.0] * 7
    far2 = [x + (0.001 if i == 0 else 0.0) for i, x in enumerate(far)]
    new_dir = [0.0] * 15 + [1.0]
    (src / "w1.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in [
                {"vec_id": 1000, "embedding": boot_rows[0]},
                {"vec_id": 1001, "embedding": far},
                {"vec_id": 1002, "embedding": far2},
                {"vec_id": 1003, "embedding": new_dir},
            ]
        )
    )
    run()
    ingested = spark.read.parquet(out)
    assert sorted(r.vec_id for r in ingested.collect()) == [1001, 1003]

    # wave 2: a near-copy of wave-1 survivor 1001 (drop — the index
    # grew), plus one more new direction (survives)
    new_dir2 = [0.0] * 14 + [1.0, 0.0]
    (src / "w2.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in [
                {"vec_id": 2000, "embedding": far2},
                {"vec_id": 2001, "embedding": new_dir2},
            ]
        )
    )
    run()
    assert sorted(r.vec_id for r in spark.read.parquet(out).collect()) == [
        1001, 1003, 2001,
    ]

    # wave 3: replay wave 2's payload under new ids — all dropped
    (src / "w3.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in [
                {"vec_id": 3000, "embedding": far2},
                {"vec_id": 3001, "embedding": new_dir2},
            ]
        )
    )
    run()
    assert sorted(r.vec_id for r in spark.read.parquet(out).collect()) == [
        1001, 1003, 2001,
    ]


def test_stream_drift_monitor(spark, tmp_path):
    """write::stream_drift_monitor: wave 1 is in-distribution (psi
    small), wave 2 is shifted (psi large); bins are FROZEN on the
    reference so the shift cannot hide; psi replays exactly in
    python; out-of-range values clip into edge bins."""
    import json as _json
    import math
    import random

    import yaml as _yaml

    from getl_spark import lift
    from getl_spark.common.tables import ManagedTable

    rnd = random.Random(31)
    src = tmp_path / "in"
    src.mkdir()
    refp = str(tmp_path / "ref")
    report = str(tmp_path / "report")

    ref_vals = [round(rnd.uniform(0.0, 10.0), 3) for _ in range(2000)]
    spark.createDataFrame(
        [(v,) for v in ref_vals], "metric DOUBLE"
    ).write.parquet(refp)

    def run():
        blocks = {
            "S": {
                "Type": "load::stream_json",
                "Properties": {
                    "Path": str(src),
                    "JsonSchema": {
                        "type": "struct",
                        "fields": [
                            {"name": "metric", "type": "double",
                             "nullable": True, "metadata": {}},
                        ],
                    },
                },
            },
            "Mon": {
                "Type": "write::stream_drift_monitor",
                "Input": "S",
                "Properties": {
                    "Path": report,
                    "Reference": refp,
                    "Columns": ["metric"],
                },
            },
        }
        lift(spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))

    def write_wave(name, vals):
        with open(src / name, "w") as f:
            for v in vals:
                f.write(_json.dumps({"metric": v}) + "\n")

    w1 = [round(rnd.uniform(0.0, 10.0), 3) for _ in range(800)]
    write_wave("w1.json", w1)
    run()
    # wave 2: shifted AND partially out of the reference range
    w2 = [round(rnd.uniform(8.0, 15.0), 3) for _ in range(800)]
    write_wave("w2.json", w2)
    run()

    rows = ManagedTable(spark, report).read().orderBy("batch_id").collect()
    assert [r.batch_rows for r in rows] == [800, 800]
    assert rows[0].column == "metric" and rows[1].column == "metric"
    psi1, psi2 = rows[0].psi, rows[1].psi
    assert psi1 < 0.05 and psi2 > 1.0

    # exact python replay with frozen reference bins (edge-clipped)
    lo, hi = min(ref_vals), max(ref_vals)
    width = (hi - lo) / 10

    def shares(vals):
        c = [0] * 10
        for v in vals:
            c[min(max(int((v - lo) // width), 0), 9)] += 1
        return [x / len(vals) for x in c]

    rs = shares(ref_vals)
    for got, wave in ((psi1, w1), (psi2, w2)):
        bs = shares(wave)
        exp = sum(
            (q + 1e-6 - p - 1e-6) * math.log((q + 1e-6) / (p + 1e-6))
            for p, q in zip(rs, bs)
        )
        assert got == round(exp, 6)
    # the clip check: wave-2 mass beyond hi landed in bin 9
    assert shares(w2)[9] > 0.4

    # wave 3 carries NULLs: batch_rows is the TOTAL batch row count,
    # while the PSI denominator is the non-NULL count (documented
    # contract; the monitor pays ONE aggregate for both, no extra scan)
    w3 = [round(rnd.uniform(0.0, 10.0), 3) for _ in range(300)]
    write_wave("w3.json", w3 + [None] * 200)
    run()
    r3 = (
        ManagedTable(spark, report)
        .read()
        .where("batch_id = 2")
        .collect()[0]
    )
    assert r3.batch_rows == 500
    bs3 = shares(w3)  # non-NULL values only drive the shares
    exp3 = sum(
        (q + 1e-6 - p - 1e-6) * math.log((q + 1e-6) / (p + 1e-6))
        for p, q in zip(rs, bs3)
    )
    assert r3.psi == round(exp3, 6)


def test_stream_drift_monitor_categorical(spark, tmp_path):
    """ColumnsCategorical: the category set freezes on the REFERENCE's
    top-K (ties by value); an in-distribution wave scores ~0, a wave
    dominated by a language the reference never saw lands its mass in
    __other__ and spikes; psi replays exactly in python; numeric and
    categorical columns coexist in one monitor."""
    import json as _json
    import math

    import yaml as _yaml

    from getl_spark import lift
    from getl_spark.common.tables import ManagedTable

    src = tmp_path / "in"
    src.mkdir()
    refp = str(tmp_path / "ref")
    report = str(tmp_path / "report")

    ref_langs = ["en"] * 600 + ["de"] * 250 + ["fr"] * 100 + ["sv"] * 50
    spark.createDataFrame(
        [(l, float(i % 7)) for i, l in enumerate(ref_langs)],
        "lang STRING, m DOUBLE",
    ).write.parquet(refp)

    def run():
        blocks = {
            "S": {
                "Type": "load::stream_json",
                "Properties": {
                    "Path": str(src),
                    "JsonSchema": {
                        "type": "struct",
                        "fields": [
                            {"name": "lang", "type": "string",
                             "nullable": True, "metadata": {}},
                            {"name": "m", "type": "double",
                             "nullable": True, "metadata": {}},
                        ],
                    },
                },
            },
            "Mon": {
                "Type": "write::stream_drift_monitor",
                "Input": "S",
                "Properties": {
                    "Path": report,
                    "Reference": refp,
                    "Columns": ["m"],
                    "ColumnsCategorical": ["lang"],
                    "TopK": 3,  # sv falls into __other__ even in ref
                },
            },
        }
        lift(spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))

    def write_wave(name, langs):
        with open(src / name, "w") as f:
            for i, l in enumerate(langs):
                f.write(_json.dumps({"lang": l, "m": float(i % 7)}) + "\n")

    w1 = ["en"] * 300 + ["de"] * 125 + ["fr"] * 50 + ["sv"] * 25
    write_wave("w1.json", w1)
    run()
    w2 = ["zh"] * 400 + ["en"] * 100  # zh is NEW -> __other__
    write_wave("w2.json", w2)
    run()

    rows = {
        (r.batch_id, r.column): r
        for r in ManagedTable(spark, report).read().collect()
    }
    assert set(rows) == {
        (0, "m"), (0, "lang"), (1, "m"), (1, "lang"),
    }
    assert rows[(0, "lang")].batch_rows == 500
    assert rows[(1, "lang")].batch_rows == 500

    # exact python replay: kept = ref top-3 (en, de, fr), bucket 4 =
    # __other__
    def shares(langs, keep):
        ks = [langs.count(k) / len(langs) for k in keep]
        return ks + [1.0 - sum(ks)]

    keep = ["en", "de", "fr"]
    rs = shares(ref_langs, keep)
    for bid, wave in ((0, w1), (1, w2)):
        bs = shares(wave, keep)
        exp = sum(
            (q + 1e-6 - p - 1e-6) * math.log((q + 1e-6) / (p + 1e-6))
            for p, q in zip(rs, bs)
        )
        assert rows[(bid, "lang")].psi == round(exp, 6), bid
    assert rows[(0, "lang")].psi < 0.01 and rows[(1, "lang")].psi > 1.0
    # the numeric column is identically distributed in both waves
    assert rows[(0, "m")].psi < 0.01 and rows[(1, "m")].psi < 0.2


def test_stream_route_first_match_wins_and_else_lane(spark, tmp_path):
    import yaml

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"id": 1, "score": 0.9, "lang": "en"},   # -> gold (first match)
        {"id": 2, "score": 0.9, "lang": "de"},   # -> gold
        {"id": 3, "score": 0.5, "lang": "en"},   # -> english (gold misses)
        {"id": 4, "score": 0.5, "lang": "de"},   # -> else lane
        {"id": 5, "score": 0.95, "lang": "en"},  # -> gold ONLY (disjoint)
        # NULL conditions are NON-matches, never row loss: NULL score
        # makes `score >= 0.8` NULL — the row must fall through to the
        # next lane (7: lang matches) or to ElsePath (8: both NULL).
        {"id": 7, "score": None, "lang": "en"},  # -> english
        {"id": 8, "score": None, "lang": None},  # -> else lane
    ]
    with open(src / "w1.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "score", "type": "double", "nullable": True, "metadata": {}},
            {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    out = tmp_path / "out"
    definition = {
        "LiftJob": {
            "Read": {
                "Type": "load::stream_json",
                "Properties": {"Path": str(src), "JsonSchema": schema},
            },
            "Route": {
                "Type": "write::stream_route",
                "Input": "Read",
                "Properties": {
                    "Routes": [
                        {"Name": "gold", "Condition": "score >= 0.8",
                         "Path": str(out / "gold")},
                        {"Name": "english", "Condition": "lang = 'en'",
                         "Path": str(out / "english")},
                    ],
                    "ElsePath": str(out / "rest"),
                    "WithBatchId": True,
                    "Checkpoint": str(tmp_path / "ckpt"),
                },
            },
        }
    }
    lift(spark, yaml.safe_dump(definition, sort_keys=False))
    gold = {r.id for r in spark.read.parquet(str(out / "gold")).collect()}
    english = {r.id for r in spark.read.parquet(str(out / "english")).collect()}
    rest = {r.id for r in spark.read.parquet(str(out / "rest")).collect()}
    assert gold == {1, 2, 5}
    assert english == {3, 7}       # 1 and 5 already taken by gold
    assert rest == {4, 8}          # 8: every condition NULL -> else
    # lane-disjointness AND completeness: union of lanes + else == input
    assert gold | english | rest == {1, 2, 3, 4, 5, 7, 8}
    assert not (gold & english) and not (gold & rest) and not (english & rest)
    # _batch_id stamped on every lane
    assert {
        r._batch_id for r in spark.read.parquet(str(out / "gold")).collect()
    } == {0}

    # second drain with a new file appends to the same lanes
    with open(src / "w2.json", "w") as fh:
        fh.write(json.dumps({"id": 6, "score": 0.99, "lang": "fr"}) + "\n")
    lift(spark, yaml.safe_dump(definition, sort_keys=False))
    gold2 = {r.id for r in spark.read.parquet(str(out / "gold")).collect()}
    assert gold2 == {1, 2, 5, 6}


def test_stream_route_requires_route_fields(spark, tmp_path):
    import yaml

    import pytest as _pytest

    src = tmp_path / "in"
    src.mkdir()
    with open(src / "w1.json", "w") as fh:
        fh.write(json.dumps({"id": 1}) + "\n")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}
        ],
    }
    definition = {
        "LiftJob": {
            "Read": {
                "Type": "load::stream_json",
                "Properties": {"Path": str(src), "JsonSchema": schema},
            },
            "Route": {
                "Type": "write::stream_route",
                "Input": "Read",
                "Properties": {
                    "Routes": [{"Name": "x", "Path": str(tmp_path / "x")}],
                    "Checkpoint": str(tmp_path / "ckpt"),
                },
            },
        }
    }
    with _pytest.raises(Exception, match="missing 'Condition'"):
        lift(spark, yaml.safe_dump(definition, sort_keys=False))


def test_stream_sessionize_closes_on_evidence(spark, tmp_path):
    """Sessions emit when a LATER event beyond the gap closes them;
    each key's trailing open session stays in state; a cross-batch
    event inside the gap merges into the open session."""
    from getl_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "in"
    src.mkdir()

    def write_wave(name, rows):
        with open(src / name, "w") as fh:
            for user, ts, v in rows:
                fh.write(json.dumps({"user_id": user, "ts": ts, "value": v}) + "\n")

    # wave 1: u1 has one finished session (09:00-09:05) closed by an
    # 11:00 event WITHIN the wave; u2 has only an open session
    write_wave("w1.json", [
        (1, "2024-01-01T09:00:00", 1.0),
        (1, "2024-01-01T09:05:00", 2.0),
        (1, "2024-01-01T11:00:00", 4.0),
        (2, "2024-01-01T10:00:00", 8.0),
    ])
    schema = {
        "type": "struct",
        "fields": [
            {"name": "user_id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
            {"name": "value", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(
                "user_id LONG, ts TIMESTAMP, value DOUBLE"
            ).json(str(src))
        )
        closed = sessionize_stream(
            stream, "user_id", "ts", gap_seconds=1800, value_col="value"
        )
        (
            closed.writeStream.trigger(availableNow=True)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
            .awaitTermination()
        )
        return sorted(
            (r.user_id, str(r.session_start), str(r.session_end),
             r.n_events, r.value_sum)
            for r in spark.read.parquet(out).collect()
        )

    got = drain()
    assert got == [
        (1, "2024-01-01 09:00:00", "2024-01-01 09:05:00", 2, 3.0),
    ]

    # wave 2: an 11:20 event for u1 merges into the open 11:00 session
    # (within gap); a 15:00 event then closes the merged session.
    # u2 gets an event beyond the gap -> its wave-1 session closes.
    write_wave("w2.json", [
        (1, "2024-01-01T11:20:00", 10.0),
        (1, "2024-01-01T15:00:00", 0.5),
        (2, "2024-01-01T12:00:00", 16.0),
    ])
    got = drain()
    assert got == [
        (1, "2024-01-01 09:00:00", "2024-01-01 09:05:00", 2, 3.0),
        (1, "2024-01-01 11:00:00", "2024-01-01 11:20:00", 2, 14.0),
        (2, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1, 8.0),
    ]


def test_stream_sessionize_batch_path_and_block(spark, tmp_path):
    import datetime

    import yaml

    from getl_spark.streaming.stateful import sessionize_stream

    rows = [
        (1, datetime.datetime(2024, 1, 1, 9, 0), 1.0),
        (1, datetime.datetime(2024, 1, 1, 9, 10), 2.0),
        (1, datetime.datetime(2024, 1, 1, 12, 0), 4.0),
        (2, datetime.datetime(2024, 1, 1, 9, 0), 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE")
    # batch emits EVERY session (bounded input closes all)
    got = sorted(
        (r.user_id, r.n_events, r.value_sum)
        for r in sessionize_stream(
            df, "user_id", "ts", 1800, value_col="value"
        ).collect()
    )
    assert got == [(1, 1, 4.0), (1, 2, 3.0), (2, 1, 8.0)]
    # YAML block surface (batch input)
    src = str(tmp_path / "ev")
    df.write.parquet(src)
    definition = {
        "LiftJob": {
            "L": {"Type": "load::batch_parquet", "Properties": {"Path": src}},
            "S": {
                "Type": "transform::stream_sessionize",
                "Input": "L",
                "Properties": {
                    "Key": "user_id",
                    "TimeColumn": "ts",
                    "GapSeconds": 1800,
                    "ValueColumn": "value",
                },
            },
        }
    }
    log = lift(spark, yaml.safe_dump(definition, sort_keys=False))
    assert log.get("S").count() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gap_seconds"):
        sessionize_stream(df, "user_id", "ts", 0)


def test_stream_sessionize_idle_timeout_emits_and_frees_state(spark, tmp_path):
    """With idle_timeout_seconds, a key whose open session falls more
    than the timeout behind the watermark has that session closed,
    EMITTED, and its state removed — state stays O(active keys) and the
    tail session reaches the sink. Event-time timeouts: deterministic,
    no wall-clock sleeps, availableNow-drain compatible (a
    processing-time timeout would make the drain loop forever)."""
    from getl_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def write_wave(name, rows):
        with open(src / name, "w") as fh:
            for user, ts in rows:
                fh.write(json.dumps({"user_id": user, "ts": ts}) + "\n")

    def drain():
        stream = spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP"
        ).json(str(src))
        closed = sessionize_stream(
            stream, "user_id", "ts", gap_seconds=1800,
            idle_timeout_seconds=3600,
        )
        (
            closed.writeStream.trigger(availableNow=True)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
            .awaitTermination()
        )
        return sorted(
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in spark.read.parquet(out).collect()
        )

    # wave 1: u1 opens a session at 09:00; watermark trails max(ts) by
    # the 1h timeout (-> 08:00), so nothing can time out yet
    write_wave("w1.json", [(1, "2024-01-01T09:00:00")])
    assert drain() == []
    # wave 2: only u2 arrives, at 12:00 -> watermark 11:00 > u1's
    # 09:00 + 1h: u1's open session times out, emits, state freed
    write_wave("w2.json", [(2, "2024-01-01T12:00:00")])
    got = drain()
    assert got == [(1, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1)]
    # wave 3: u1 returns at 12:10 — its state was REMOVED, so this is a
    # fresh session (no merge with the already-emitted one); wave 4's
    # 15:00 event moves the watermark to 14:00 > 12:10 + 1h, so the
    # fresh session times out and emits
    write_wave("w3.json", [(1, "2024-01-01T12:10:00")])
    write_wave("w4.json", [(3, "2024-01-01T15:00:00")])
    got = drain()
    assert (1, "2024-01-01 12:10:00", "2024-01-01 12:10:00", 1) in got
    # exactly two u1 rows total: the timed-out 09:00 and 12:10 sessions
    assert [g for g in got if g[0] == 1] == [
        (1, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1),
        (1, "2024-01-01 12:10:00", "2024-01-01 12:10:00", 1),
    ]


def test_stream_sessionize_null_ts_dropped_both_legs(spark, tmp_path):
    """NULL timestamps are dropped in BOTH legs — without the filter the
    streaming leg's NaT -> INT64_MIN cast fabricates a garbage session."""
    import datetime

    from getl_spark.streaming.stateful import sessionize_stream

    rows = [
        (1, datetime.datetime(2024, 1, 1, 9, 0), 1.0),
        (1, None, 99.0),
        (1, datetime.datetime(2024, 1, 1, 9, 10), 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE")
    got = sessionize_stream(df, "user_id", "ts", 1800, value_col="value").collect()
    assert len(got) == 1
    assert got[0].n_events == 2 and got[0].value_sum == 3.0

    # streaming leg: same rows through a file stream
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "w1.json", "w") as fh:
        fh.write(json.dumps({"user_id": 1, "ts": "2024-01-01T09:00:00", "value": 1.0}) + "\n")
        fh.write(json.dumps({"user_id": 1, "ts": None, "value": 99.0}) + "\n")
        fh.write(json.dumps({"user_id": 1, "ts": "2024-01-01T09:10:00", "value": 2.0}) + "\n")
        # a later event closes the 09:00 session so it emits
        fh.write(json.dumps({"user_id": 1, "ts": "2024-01-01T12:00:00", "value": 0.0}) + "\n")
    stream = spark.readStream.schema(
        "user_id LONG, ts TIMESTAMP, value DOUBLE"
    ).json(str(src))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (
        sessionize_stream(stream, "user_id", "ts", 1800, value_col="value")
        .writeStream.trigger(availableNow=True)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", out)
        .start()
        .awaitTermination()
    )
    emitted = spark.read.parquet(out).collect()
    assert len(emitted) == 1
    r = emitted[0]
    assert str(r.session_start) == "2024-01-01 09:00:00"
    assert str(r.session_end) == "2024-01-01 09:10:00"
    assert r.n_events == 2 and r.value_sum == 3.0


def test_stream_sessionize_flush_on_drain(spark, tmp_path):
    """flush_on_drain gives an availableNow drain batch parity: every
    open session closes AND emits at drain end and state zeroes — a
    second drain sees the key as brand new (no merge with the already
    emitted tail), and the flush works with no idle_timeout and no
    later traffic (the fully-silent-stream case the idle timeout
    cannot evict)."""
    from getl_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def write_wave(name, rows):
        with open(src / name, "w") as fh:
            for user, ts in rows:
                fh.write(json.dumps({"user_id": user, "ts": ts}) + "\n")

    def drain():
        stream = spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP"
        ).json(str(src))
        closed = sessionize_stream(
            stream, "user_id", "ts", gap_seconds=1800, flush_on_drain=True
        )
        (
            closed.writeStream.trigger(availableNow=True)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
            .awaitTermination()
        )
        return sorted(
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in spark.read.parquet(out).collect()
        )

    # wave 1: two users, one of them with a mid-wave gap closure; the
    # drain must emit EVERY session including the open tails
    write_wave("w1.json", [
        (1, "2024-01-01T09:00:00"),
        (1, "2024-01-01T09:10:00"),
        (1, "2024-01-01T12:00:00"),   # > gap after 09:10 -> second session
        (2, "2024-01-01T11:59:00"),
    ])
    got = drain()
    assert got == [
        (1, "2024-01-01 09:00:00", "2024-01-01 09:10:00", 2),
        (1, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1),
        (2, "2024-01-01 11:59:00", "2024-01-01 11:59:00", 1),
    ]
    # wave 2: u1 returns WITHIN the gap of its wave-1 tail (12:20 is
    # 20 min after 12:00) — state was flushed, so this is a FRESH
    # session, not a merge; batch parity for the per-drain cron
    write_wave("w2.json", [(1, "2024-01-01T12:20:00")])
    got = drain()
    assert [g for g in got if g[0] == 1] == [
        (1, "2024-01-01 09:00:00", "2024-01-01 09:10:00", 2),
        (1, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1),
        (1, "2024-01-01 12:20:00", "2024-01-01 12:20:00", 1),
    ]


def test_stream_sessionize_idle_timeout_guard(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from getl_spark.streaming.stateful import sessionize_stream

    df = spark.createDataFrame([(1,)], "user_id LONG").withColumn(
        "ts", F.current_timestamp()
    )
    with _pytest.raises(ValueError, match="idle_timeout_seconds"):
        sessionize_stream(df, "user_id", "ts", 10, idle_timeout_seconds=0)

"""End-to-end block/executor tests through the public lift() API."""

import json
import os

import pytest

from getl_spark import lift
from getl_spark.common.errors import NoDataToProcess


@pytest.fixture()
def sample_dir(tmp_path, spark):
    df = spark.createDataFrame(
        [("Mark", 9, False), ("Tove", 10, True), ("Lisa", 11, False)],
        "name STRING, empid INT, happy BOOLEAN",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "parquet"))
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(
        str(tmp_path / "csv")
    )
    df.coalesce(1).write.mode("overwrite").json(str(tmp_path / "json"))
    return tmp_path


def test_load_transform_roundtrip(spark, sample_dir):
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  Happy:
    Type: transform::generic
    Input: Load
    Properties:
      Functions:
        - where: {{predicate: [happy, '==', true]}}
""",
    )
    assert log.get("Happy").collect()[0].name == "Tove"


def test_load_csv_with_options(spark, sample_dir):
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_csv
    Properties:
      Path: {sample_dir}/csv
      Options: {{header: true, inferSchema: true}}
""",
    )
    assert log.get("Load").count() == 3


def test_load_json_with_json_schema(spark, sample_dir):
    schema = {
        "type": "struct",
        "fields": [
            {"name": "name", "type": "string", "nullable": True, "metadata": {}},
            {"name": "empid", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
    import yaml

    definition = {
        "LiftJob": {
            "Load": {
                "Type": "load::batch_json",
                "Properties": {"Path": str(sample_dir / "json"), "JsonSchema": schema},
            }
        }
    }
    log = lift(spark, yaml.safe_dump(definition, sort_keys=False))
    df = log.get("Load")
    assert df.columns == ["name", "empid"] and df.count() == 3


def test_load_xml(spark, tmp_path):
    xml = "<people>" + "".join(
        f"<person><name>p{i}</name><age>{20 + i}</age></person>" for i in range(3)
    ) + "</people>"
    (tmp_path / "data.xml").write_text(xml)
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_xml
    Properties:
      Path: {tmp_path}/data.xml
      RowTag: person
""",
    )
    assert log.get("Load").count() == 3


def test_custom_sql_references_prior_blocks(spark, sample_dir):
    log = lift(
        spark,
        f"""
LiftJob:
  Emp:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  Agg:
    Type: custom::sql
    Properties:
      Statement: SELECT happy, count(*) AS n FROM Emp GROUP BY happy
""",
    )
    assert log.get("Agg").count() == 2


def test_python_codeblock_multi_output(spark, sample_dir):
    def splitter(params):
        df = params["dataframes"]["Load"]
        return {
            "happy": df.where("happy"),
            "sad": df.where("NOT happy"),
        }

    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  Split:
    Type: custom::python_codeblock
    Input: [Load]
    Properties:
      CustomFunction: ${{fn}}
      Output: [happy, sad]
""",
        {"fn": splitter},
    )
    assert log.get("Split.happy").count() == 1
    assert log.get("Split.sad").count() == 2


def test_python_codeblock_undeclared_output_raises(spark, sample_dir):
    def bad(params):
        return {"unexpected": params["dataframes"]["Load"]}

    with pytest.raises(TypeError, match="unexpected"):
        lift(
            spark,
            f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  Split:
    Type: custom::python_codeblock
    Input: [Load]
    Properties:
      CustomFunction: ${{fn}}
      Output: [declared]
""",
            {"fn": bad},
        )


def test_custom_code_path(spark, sample_dir, tmp_path):
    code = (
        "def resolve(params):\n"
        "    df = params['dataframes']['Load']\n"
        "    return df.limit(params['n'])\n"
    )
    (tmp_path / "code.py").write_text(code)
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  Custom:
    Type: custom::python_codeblock
    Input: [Load]
    Properties:
      CustomCodePath: {tmp_path}/code.py
      CustomProps: {{n: 2}}
""",
    )
    assert log.get("Custom").count() == 2


def test_aggregate_window_sort_blocks(spark, sample_dir):
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  Agg:
    Type: transform::aggregate
    Input: Load
    Properties:
      GroupBy: [happy]
      Aggregations:
        - {{col: empid, agg: max, alias: max_id}}
        - {{agg: count, alias: n}}
  Win:
    Type: transform::window
    Input: Load
    Properties:
      OrderBy: [empid]
      Functions:
        - {{func: row_number, alias: rn}}
  Sorted:
    Type: transform::sort
    Input: Load
    Properties:
      OrderBy: [{{col: empid, desc: true}}]
      Limit: 1
""",
    )
    assert log.get("Agg").count() == 2
    assert [r.rn for r in log.get("Win").collect()] == [1, 2, 3]
    assert log.get("Sorted").first().empid == 11


def test_unknown_function_raises(spark, sample_dir):
    with pytest.raises(ValueError, match="nonsense"):
        lift(
            spark,
            f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  T:
    Type: transform::generic
    Input: Load
    Properties:
      Functions: [{{nonsense: {{}}}}]
""",
        )


def test_xml_batching_unions_all_files(spark, tmp_path):
    """Many XML files read in bounded batches and unioned by name
    (reference 200-file batching, here BatchSize 2 over 5 files)."""
    xml_dir = tmp_path / "xmls"
    xml_dir.mkdir()
    files = []
    for i in range(5):
        p = xml_dir / f"f{i}.xml"
        p.write_text(f"<rows><r><id>{i}</id></r></rows>")
        files.append(str(p))
    import yaml

    definition = {
        "LiftJob": {
            "Load": {
                "Type": "load::batch_xml",
                "Properties": {"Path": "${files}", "RowTag": "r", "BatchSize": 2},
            }
        }
    }
    log = lift(spark, yaml.safe_dump(definition, sort_keys=False), {"files": files})
    assert sorted(r.id for r in log.get("Load").collect()) == [0, 1, 2, 3, 4]


def test_batch_delta_missing_table_yields_empty(spark, tmp_path):
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_delta
    Properties: {{Path: {tmp_path}/does_not_exist}}
""",
    )
    assert log.get("Load").count() == 0


def test_aggregate_block_pivot(spark, sample_dir):
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  Pivoted:
    Type: transform::aggregate
    Input: Load
    Properties:
      GroupBy: [happy]
      Pivot: {{col: name, values: [Mark, Tove, Lisa]}}
      Aggregations:
        - {{col: empid, agg: max, alias: id}}
""",
    )
    df = log.get("Pivoted")
    assert set(df.columns) == {"happy", "Mark", "Tove", "Lisa"}
    row = {r.happy: r for r in df.collect()}
    assert row[True].Tove == 10 and row[False].Mark == 9


def test_union_by_name_with_missing_columns(spark, sample_dir):
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  A:
    Type: transform::generic
    Input: Load
    Properties:
      Functions:
        - select: {{cols: [{{col: name}}, {{col: empid}}]}}
  B:
    Type: transform::generic
    Input: Load
    Properties:
      Functions:
        - select: {{cols: [{{col: empid}}, {{col: name}}]}}
  U:
    Type: transform::generic
    Input: [A, B]
    Properties:
      Functions: [union_by_name]
""",
    )
    assert log.get("U").count() == 6


def test_bucketed_write_joins_without_shuffle(spark, sample_dir, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with
    no Exchange — the co-located-join scale path."""
    for name in ("bt_left", "bt_right"):
        lift(
            spark,
            f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  W:
    Type: write::batch_parquet
    Input: Load
    Properties:
      Mode: overwrite
      Path: {tmp_path}/{name}
      Bucketing:
        Columns: [empid]
        NumBuckets: 4
        TableName: {name}
""",
        )
    # force sort-merge (tiny tables would broadcast) to observe the
    # bucketed, shuffle-free join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_left").join(spark.table("bt_right"), "empid")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # no shuffle
        assert "SortMergeJoin" in plan
        assert joined.count() == 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE bt_left")
        spark.sql("DROP TABLE bt_right")


def test_salted_join_equivalent_to_plain(spark):
    from getl_spark.functions.skew import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 1), ("miss", 2)],
        "k STRING, v INT",
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("extra", "E")], "k STRING, label STRING"
    )
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], "inner", salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left join keeps unmatched left rows exactly once
    plain_l = left.join(right, ["k"], "left")
    salted_l = salted_join(left, right, ["k"], "left", salt=8)
    assert sorted(map(tuple, salted_l.collect())) == sorted(map(tuple, plain_l.collect()))


def test_aggregate_block_rollup_and_cube(spark, sample_dir):
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  R:
    Type: transform::aggregate
    Input: Load
    Properties:
      GroupBy: [happy]
      Grouping: rollup
      Aggregations:
        - {{agg: count, alias: n}}
  C:
    Type: transform::aggregate
    Input: Load
    Properties:
      GroupBy: [happy, name]
      Grouping: cube
      Aggregations:
        - {{agg: count, alias: n}}
""",
    )
    assert log.get("R").count() == 3  # (true),(false),(grand total)
    # cube grouping sets over present combos: 3 (happy,name) + 2 (happy)
    # + 3 (name) + 1 (total)
    assert log.get("C").count() == 9


def test_limit_distinct_and_alias_blocks(spark, sample_dir):
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties:
      Path: {sample_dir}/parquet
      Alias: employees
  Dup:
    Type: transform::generic
    Input: [Load, Load]
    Properties:
      Functions: [union]
  Uniq:
    Type: transform::distinct
    Input: Dup
  Limited:
    Type: transform::limit
    Input: Uniq
    Properties: {{Rows: 2}}
""",
    )
    assert log.get("Dup").count() == 6
    assert log.get("Uniq").count() == 3
    assert log.get("Limited").count() == 2


def test_batch_text_line_and_wholetext_modes(spark, tmp_path):
    import yaml

    from getl_spark import lift

    (tmp_path / "a.txt").write_text("line one\nline two")
    (tmp_path / "b.txt").write_text("solo document body")

    def load(props):
        blocks = {
            "T": {
                "Type": "load::batch_text",
                "Properties": {"Path": str(tmp_path), **props},
            }
        }
        return lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False)).get("T")

    lines = load({})
    assert sorted(r.value for r in lines.collect()) == [
        "line one", "line two", "solo document body",
    ]

    docs = load({"WholeText": True, "PathColumn": "src"})
    got = {r.src.rsplit("/", 1)[-1]: r.value for r in docs.collect()}
    assert got == {"a.txt": "line one\nline two", "b.txt": "solo document body"}


def test_skew_top_keys_diagnosis(spark):
    from getl_spark.functions import skew

    rows = [("hot",)] * 1000 + [("warm",)] * 100 + [(f"k{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "key STRING")
    out = skew.top_keys(df, ["key"], k=5).collect()
    assert out[0].key == "hot" and out[0].n == 1000
    assert out[0].suggested_salt == 64  # 1000/median(1) capped
    assert out[1].key == "warm" and out[1].suggested_salt == 64
    assert all(r.suggested_salt == 1 for r in out[2:])
    assert abs(sum(r.share for r in out[:2]) - 1100 / 1150) < 1e-4
    # no single-partition window stage
    plan = skew.top_keys(df, ["key"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        skew.top_keys(df, ["key"], k=0)


def test_on_malformed_policies_json(spark, tmp_path):
    """OnMalformed: drop discards bad rows, fail aborts the lift, keep
    + CorruptColumn quarantines the raw bad line."""
    import yaml as _yaml

    from getl_spark import lift

    src = tmp_path / "mal"
    src.mkdir()
    (src / "data.json").write_text(
        '{"k": 1, "v": "good"}\n'
        "{broken json line\n"
        '{"k": 2, "v": "also good"}\n'
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }

    def run(props):
        blocks = {
            "L": {
                "Type": "load::batch_json",
                "Properties": {"Path": str(src), "JsonSchema": schema, **props},
            }
        }
        return lift(
            spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False)
        ).get("L")

    assert sorted(r.k for r in run({"OnMalformed": "drop"}).collect()) == [1, 2]

    import pytest as _pytest

    with _pytest.raises(Exception, match="MALFORMED|FAILFAST|Malformed"):
        run({"OnMalformed": "fail"}).collect()

    with _pytest.raises(ValueError, match="OnMalformed"):
        run({"OnMalformed": "explode"})

    quarantine_schema = dict(schema)
    quarantine_schema = {
        "type": "struct",
        "fields": schema["fields"]
        + [{"name": "_bad", "type": "string", "nullable": True, "metadata": {}}],
    }
    blocks_keep = run(
        {
            "OnMalformed": "keep",
            "CorruptColumn": "_bad",
            "JsonSchema": quarantine_schema,
        }
    )
    rows = blocks_keep.collect()
    bad = [r for r in rows if r._bad is not None]
    assert len(bad) == 1 and "broken" in bad[0]._bad
    assert sorted(r.k for r in rows if r._bad is None) == [1, 2]


def test_stream_json_max_files_per_trigger(spark, tmp_path):
    """MaxFilesPerTrigger=1 splits a 3-file backlog into 3 bounded
    micro-batches under availableNow instead of one giant batch."""
    import json as _json

    src = tmp_path / "rate"
    src.mkdir()
    for i in range(3):
        (src / f"f{i}.json").write_text(_json.dumps({"k": i}) + "\n")
    schema = {
        "type": "struct",
        "fields": [{"name": "k", "type": "long", "nullable": True, "metadata": {}}],
    }
    from getl_spark.plans.context import BlockConfig
    from getl_spark.sources.entrypoint import stream_json

    conf = BlockConfig(
        "L",
        spark,
        None,
        {"Path": str(src), "JsonSchema": schema, "MaxFilesPerTrigger": 1},
    )
    stream = stream_json(conf)
    batches = []
    (
        stream.writeStream.trigger(availableNow=True)
        .foreachBatch(lambda df, bid: batches.append((bid, df.count())))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
        .awaitTermination()
    )
    assert len(batches) == 3 and all(n == 1 for _, n in batches)


def test_flatten_nested_structs(spark):
    """transform flatten: nested structs become parent_child columns;
    arrays stay; collisions raise."""
    import yaml as _yaml

    from getl_spark import lift
    from getl_spark.operators.transform import flatten

    df = spark.sql(
        """SELECT 1 AS id,
                  named_struct('city', 'ume', 'geo',
                               named_struct('lat', 63.8, 'lon', 20.3)) AS addr,
                  array(1, 2) AS tags"""
    )
    flat = flatten(df)
    assert flat.columns == ["id", "addr_city", "addr_geo_lat", "addr_geo_lon", "tags"]
    row = flat.first()
    assert row.addr_city == "ume" and float(row.addr_geo_lat) == 63.8 and row.tags == [1, 2]

    # collision: struct a.b vs existing a_b column
    clash = spark.sql("SELECT named_struct('b', 1) AS a, 2 AS a_b")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collision"):
        flatten(clash)

    # YAML path through transform::generic
    df.createOrReplaceTempView("nested_src")
    log = lift(
        spark,
        """
LiftJob:
  L:
    Type: custom::sql
    Properties: {Statement: "SELECT * FROM nested_src"}
  Flat:
    Type: transform::generic
    Input: L
    Properties:
      Functions:
        - flatten: {}
""",
    )
    assert log.get("Flat").columns == flat.columns


def test_flatten_pushes_field_extraction_to_scan(spark, tmp_path):
    """Flattening then selecting ONE leaf must read only that nested
    field (schema pruning), not the whole struct."""
    path = str(tmp_path / "nested")
    spark.sql(
        """SELECT id, named_struct('a', id * 2, 'b', repeat('x', 100)) AS s
           FROM range(100)"""
    ).write.parquet(path)
    from getl_spark.operators.transform import flatten

    df = flatten(spark.read.parquet(path)).select("s_a")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan and "s_b" not in plan.split("ReadSchema")[1][:200]
    assert df.count() == 100


def test_stream_parquet_source(spark, tmp_path):
    """load::stream_parquet drains a parquet directory incrementally."""
    import yaml as _yaml

    from getl_spark import lift

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.range(50).selectExpr("id AS k").coalesce(1).write.parquet(src)
    blocks = {
        "S": {
            "Type": "load::stream_parquet",
            "Properties": {
                "Path": src,
                "JsonSchema": {
                    "type": "struct",
                    "fields": [
                        {"name": "k", "type": "long", "nullable": True, "metadata": {}}
                    ],
                },
            },
        },
        "W": {
            "Type": "write::stream_delta",
            "Input": "S",
            "Properties": {"Path": out, "OutputMode": "append"},
        },
    }
    lift(spark, _yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    assert spark.read.parquet(out).count() == 50


def test_checkpoint_block_truncates_lineage(spark, sample_dir):
    log = lift(
        spark,
        f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  Cut:
    Type: transform::checkpoint
    Input: Load
  After:
    Type: transform::generic
    Input: Cut
    Properties:
      Functions:
        - where: {{predicate: [empid, '>', 9]}}
""",
    )
    assert log.get("After").count() == 2
    # the checkpointed plan no longer contains the parquet scan — it
    # reads the materialized RDD stub
    plan = log.get("Cut")._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan and "ExistingRDD" in plan


def test_expect_rows_guard(spark, sample_dir):
    def run(props):
        return lift(
            spark,
            f"""
LiftJob:
  Load:
    Type: load::batch_parquet
    Properties: {{Path: {sample_dir}/parquet}}
  Guard:
    Type: transform::expect_rows
    Input: Load
    Properties: {props}
""",
        )

    assert run("{Min: 1, Max: 10}").get("Guard").count() == 3
    with pytest.raises(ValueError, match="expected >= 5"):
        run("{Min: 5}")
    with pytest.raises(ValueError, match="expected in \\[1, 2\\]"):
        run("{Min: 1, Max: 2}")

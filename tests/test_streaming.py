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

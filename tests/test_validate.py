"""transform::validate — data-quality expectations (fail / drop / tag)
with optional quarantine multi-output."""

from __future__ import annotations

import pytest
import yaml

from getl_spark import lift
from getl_spark.common.errors import ValidationError


@pytest.fixture()
def quality_df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "neg qty"),
            (3, None, "null qty"),
            (4, 99999.0, "huge qty"),
        ],
        "id BIGINT, qty DOUBLE, note STRING",
    )


def _run(spark, df, block_props, output="Result"):
    df.createOrReplaceTempView("validate_input")
    blocks = {
        "In": {
            "Type": "custom::sql",
            "Properties": {"Statement": "SELECT * FROM validate_input"},
        },
        "Result": {
            "Type": "transform::validate",
            "Input": "In",
            "Properties": block_props,
        },
    }
    return lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False)).get(
        output
    )


def test_drop_removes_violations_nulls_included(spark, quality_df):
    out = _run(
        spark,
        quality_df,
        {"Expectations": [{"name": "qty_pos", "expr": "qty > 0"}]},
    )
    # NULL predicate counts as a violation (three-valued logic)
    assert sorted(r.id for r in out.collect()) == [1, 4]


def test_fail_raises_with_counts(spark, quality_df):
    with pytest.raises(ValidationError) as exc:
        _run(
            spark,
            quality_df,
            {
                "Expectations": [
                    {"name": "qty_known", "expr": "qty IS NOT NULL", "action": "fail"},
                    {"name": "qty_pos", "expr": "qty > 0", "action": "fail"},
                ]
            },
        )
    assert exc.value.counts == {"qty_known": 1, "qty_pos": 2}


def test_fail_passes_clean_data_through(spark, quality_df):
    clean = quality_df.where("id = 1")
    out = _run(
        spark,
        clean,
        {"Expectations": [{"name": "qty_pos", "expr": "qty > 0", "action": "fail"}]},
    )
    assert out.count() == 1


def test_tag_keeps_rows_and_labels(spark, quality_df):
    out = _run(
        spark,
        quality_df,
        {
            "Expectations": [
                {"name": "qty_sane", "expr": "qty < 1000", "action": "tag"},
                {"name": "qty_known", "expr": "qty IS NOT NULL", "action": "tag"},
            ]
        },
    )
    tags = {r["id"]: list(r["__violations"]) for r in out.collect()}
    assert tags == {1: [], 2: [], 3: ["qty_sane", "qty_known"], 4: ["qty_sane"]}


def test_quarantine_multi_output(spark, quality_df):
    quality_df.createOrReplaceTempView("validate_input")
    blocks = {
        "In": {
            "Type": "custom::sql",
            "Properties": {"Statement": "SELECT * FROM validate_input"},
        },
        "V": {
            "Type": "transform::validate",
            "Input": "In",
            "Properties": {
                "Output": ["valid", "violations"],
                "Quarantine": True,
                "Expectations": [
                    {"name": "qty_pos", "expr": "qty > 0", "action": "drop"},
                    {"name": "qty_sane", "expr": "qty < 1000", "action": "tag"},
                ],
            },
        },
    }
    log = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    valid = log.get("V.valid")
    violations = log.get("V.violations")
    assert sorted(r.id for r in valid.collect()) == [1, 4]
    got = {r["id"]: sorted(r["__violations"]) for r in violations.collect()}
    # row 3's NULL qty violates BOTH (NULL predicate = violation)
    assert got == {2: ["qty_pos"], 3: ["qty_pos", "qty_sane"], 4: ["qty_sane"]}


def test_unknown_action_rejected(spark, quality_df):
    with pytest.raises(Exception, match="unknown"):
        _run(
            spark,
            quality_df,
            {"Expectations": [{"name": "x", "expr": "qty > 0", "action": "explode"}]},
        )


def test_validate_is_pure_filter_no_shuffle(spark, quality_df):
    """drop/tag paths must stay shuffle-free column expressions — the
    whole point of the block at 100 TB (only the fail gate aggregates)."""
    out = _run(
        spark,
        quality_df,
        {
            "Expectations": [
                {"name": "qty_pos", "expr": "qty > 0"},
                {"name": "qty_sane", "expr": "qty < 1000", "action": "tag"},
            ]
        },
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

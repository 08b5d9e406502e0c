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


def test_unique_expectation_fail(spark):
    """A duplicated primary key aborts the lift with the VIOLATING ROW
    count (all rows of the dup key); a clean key passes; null-safe key
    comparison catches duplicated all-NULL keys."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (2, "d"), (3, "e")],
        "k BIGINT, v STRING",
    )
    with pytest.raises(ValidationError) as err:
        _run(spark, df, {
            "Expectations": [
                {"name": "pk", "unique": ["k"], "action": "fail"},
            ],
        })
    assert err.value.counts == {"pk": 3}

    clean = spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING")
    out = _run(spark, clean, {
        "Expectations": [{"name": "pk", "unique": ["k"], "action": "fail"}],
    })
    assert out.count() == 2 and out.columns == ["k", "v"]

    nulls = spark.createDataFrame(
        [(None, "a"), (None, "b"), (7, "c")], "k BIGINT, v STRING"
    )
    with pytest.raises(ValidationError) as err:
        _run(spark, nulls, {
            "Expectations": [{"name": "pk", "unique": ["k"], "action": "fail"}],
        })
    assert err.value.counts == {"pk": 2}


def test_unique_expectation_drop_tag_quarantine(spark):
    """drop removes EVERY row of a duplicated key (no silent survivor);
    tag marks them; quarantine routes them with the expectation name;
    composite keys; expr+unique compose; spec shape guard."""
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 2, 30.0), (2, 1, -1.0)],
        "a BIGINT, b BIGINT, qty DOUBLE",
    )
    out = _run(spark, df, {
        "Expectations": [
            {"name": "pk", "unique": ["a", "b"], "action": "drop"},
            {"name": "pos", "expr": "qty > 0", "action": "drop"},
        ],
    })
    rows = {(r.a, r.b) for r in out.collect()}
    assert rows == {(1, 1)}  # dup (1,2) rows all dropped; (2,1) neg dropped

    df.createOrReplaceTempView("validate_input")
    blocks = {
        "In": {
            "Type": "custom::sql",
            "Properties": {"Statement": "SELECT * FROM validate_input"},
        },
        "Result": {
            "Type": "transform::validate",
            "Input": "In",
            "Properties": {
                "Output": ["valid", "violations"],
                "Expectations": [
                    {"name": "pk", "unique": ["a", "b"], "action": "tag"},
                ],
                "Quarantine": True,
                "TagColumn": "why",
            },
        },
    }
    log = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
    valid, viol = log.get("Result.valid"), log.get("Result.violations")
    assert valid.count() == 4  # tag keeps rows
    tagged = {(r.a, r.b): r.why for r in valid.collect()}
    assert tagged[(1, 2)] == ["pk"] and tagged[(1, 1)] == []
    v = viol.collect()
    assert {(r.a, r.b) for r in v} == {(1, 2)} and len(v) == 2
    assert all(r.why == ["pk"] for r in v)

    with pytest.raises(ValueError, match="exactly one"):
        _run(spark, df, {
            "Expectations": [
                {"name": "bad", "unique": ["a"], "expr": "a > 0"},
            ],
        })


def test_foreign_key_expectation(spark):
    """Orphan keys fail with counts / drop / quarantine; NULL fk
    violates by contract; duplicated reference keys don't duplicate
    rows; ref_columns mapping; composes with expr."""
    cust = spark.createDataFrame(
        [(1, "acme"), (2, "bolt"), (2, "bolt-dup")], "c_id BIGINT, name STRING"
    )
    orders = spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 6.0), (12, 9, 7.0), (13, None, 8.0)],
        "o_id BIGINT, cust BIGINT, amt DOUBLE",
    )

    def run(props, outputs=None):
        cust.createOrReplaceTempView("Customers")
        orders.createOrReplaceTempView("validate_input")
        blocks = {
            "In": {
                "Type": "custom::sql",
                "Properties": {"Statement": "SELECT * FROM validate_input"},
            },
            "Result": {
                "Type": "transform::validate",
                "Input": "In",
                "Properties": props,
            },
        }
        log = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False))
        if outputs:
            return {o: log.get(f"Result.{o}") for o in outputs}
        return log.get("Result")

    fk = {"columns": ["cust"], "ref": "Customers", "ref_columns": ["c_id"]}

    with pytest.raises(ValidationError) as err:
        run({"Expectations": [
            {"name": "fk", "foreign_key": fk, "action": "fail"},
        ]})
    assert err.value.counts == {"fk": 2}  # orphan 9 + NULL

    out = run({"Expectations": [
        {"name": "fk", "foreign_key": fk, "action": "drop"},
        {"name": "amt_pos", "expr": "amt > 0"},
    ]})
    rows = sorted(r.o_id for r in out.collect())
    assert rows == [10, 11]  # dup ref key didn't duplicate row 11
    assert out.columns == ["o_id", "cust", "amt"]

    outs = run({
        "Output": ["valid", "violations"],
        "Quarantine": True,
        "Expectations": [
            {"name": "fk", "foreign_key": fk, "action": "tag"},
        ],
    }, outputs=["valid", "violations"])
    viol = outs["violations"].collect()
    assert sorted(r.o_id for r in viol) == [12, 13]
    assert all(r["__violations"] == ["fk"] for r in viol)

    with pytest.raises(ValueError, match="pair up"):
        run({"Expectations": [
            {"name": "fk", "action": "drop",
             "foreign_key": {"columns": ["cust"], "ref": "Customers",
                             "ref_columns": ["c_id", "name"]}},
        ]})


def test_expect_schema_gate(spark):
    """Matching schema passes; type change / removal fail with the
    drift detail; AllowExtra admits additions only; nullability
    ignored by default, strict on demand."""
    declared = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "qty", "type": "double", "nullable": True, "metadata": {}},
        ],
    }

    def run(df, props):
        df.createOrReplaceTempView("validate_input")
        blocks = {
            "In": {
                "Type": "custom::sql",
                "Properties": {"Statement": "SELECT * FROM validate_input"},
            },
            "Result": {
                "Type": "transform::expect_schema",
                "Input": "In",
                "Properties": {"Schema": declared, **props},
            },
        }
        return lift(
            spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False)
        ).get("Result")

    good = spark.createDataFrame([(1, 2.0)], "id BIGINT, qty DOUBLE")
    assert run(good, {}).count() == 1

    # widened int -> fails with the drift named
    drifted = spark.createDataFrame([(1, 2.0)], "id INT, qty DOUBLE")
    with pytest.raises(ValidationError, match="type_changed"):
        run(drifted, {})

    # dropped column fails even with AllowExtra
    narrow = spark.createDataFrame([(1,)], "id BIGINT")
    with pytest.raises(ValidationError) as err:
        run(narrow, {"AllowExtra": True})
    assert err.value.counts == {"qty": "removed"}

    # extra column: fails by default, passes with AllowExtra
    wide = spark.createDataFrame([(1, 2.0, "x")], "id BIGINT, qty DOUBLE, s STRING")
    with pytest.raises(ValidationError, match="added"):
        run(wide, {})
    assert run(wide, {"AllowExtra": True}).count() == 1

    # nullability: ignored by default, strict on demand
    from pyspark.sql import types as T
    nn = spark.createDataFrame(
        [(1, 2.0)],
        T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("qty", T.DoubleType(), True),
        ]),
    )
    assert run(nn, {}).count() == 1
    with pytest.raises(ValidationError, match="nullability"):
        run(nn, {"IgnoreNullability": False})

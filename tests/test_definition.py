"""Lift-definition resolution: YAML ordering + ${var} substitution."""

import pytest

from getl_spark.plans.definition import resolve_definition


def test_order_preserved():
    definition = resolve_definition(
        "LiftJob:\n  B1: {Type: a::b}\n  A0: {Type: c::d}\n  Z9: {Type: e::f}\n", {}
    )
    assert list(definition["LiftJob"]) == ["B1", "A0", "Z9"]


def test_raw_object_substitution():
    fn = lambda x: x  # noqa: E731
    definition = resolve_definition(
        "LiftJob:\n  B:\n    Properties:\n      CustomFunction: ${func}\n",
        {"func": fn},
    )
    assert definition["LiftJob"]["B"]["Properties"]["CustomFunction"] is fn


def test_template_substitution():
    definition = resolve_definition(
        "LiftJob:\n  B:\n    Properties:\n      Path: s3://bucket/${env}/data\n",
        {"env": "prod"},
    )
    assert definition["LiftJob"]["B"]["Properties"]["Path"] == "s3://bucket/prod/data"


def test_missing_parameter_raises():
    with pytest.raises(KeyError, match="nope"):
        resolve_definition("LiftJob:\n  B:\n    Properties: {Path: '${nope}'}\n", {})


def test_non_string_values_pass_through():
    definition = resolve_definition(
        "LiftJob:\n  B:\n    Properties:\n      N: 42\n      Flag: true\n", {}
    )
    props = definition["LiftJob"]["B"]["Properties"]
    assert props["N"] == 42 and props["Flag"] is True


def test_bare_dollar_signs_pass_through():
    """SQL/JSONPath strings with bare $ must not crash substitution
    (string.Template would); only ${name} is a placeholder."""
    definition = resolve_definition(
        "LiftJob:\n  B:\n    Properties:\n"
        "      Statement: \"SELECT get_json_object(p, '$.k') FROM t WHERE x = '${env}'\"\n",
        {"env": "prod"},
    )
    stmt = definition["LiftJob"]["B"]["Properties"]["Statement"]
    assert stmt == "SELECT get_json_object(p, '$.k') FROM t WHERE x = 'prod'"

"""Predicate DSL compiler goldens (mirrors reference
tests/getl/transform/test_transform.py:122-149 in spirit)."""

import pytest

from getl_spark.operators.predicate import predicate_to_sql


@pytest.mark.parametrize(
    "predicate, expected",
    [
        (["age", ">", 18], "age > 18"),
        (["age", "<=", 18.5], "age <= 18.5"),
        (["name", "==", "Belle"], "name == 'Belle'"),
        (["name", "!=", "null"], "name is not null"),
        (["name", "==", "null"], "name is null"),
        # reference quirk: any operator other than == with 'null' → IS NOT NULL
        (["name", "=", "null"], "name is not null"),
        (["happy", "==", True], "happy == True"),
        (["name", "in", ["a", "b"]], "name in ('a', 'b')"),
        (["age", "in", [1, 2]], "age in (1, 2)"),
        # single-element lists always render quoted (reference quirk)
        (["name", "in", ["solo"]], "name in ('solo')"),
        (["family.father-status", "==", "ok"], "family.`father-status` == 'ok'"),
        (
            [["a", ">", 1], "and", ["b", "<", 2]],
            "(a > 1 and b < 2)",
        ),
        (
            [["a", ">", 1], "or", [["b", "<", 2], "and", ["c", "==", 3]]],
            "(a > 1 or (b < 2 and c == 3))",
        ),
        (["name", "==", "O'Hara"], "name == 'O''Hara'"),
        # in-list elements get the same quote escaping as scalars
        (["name", "in", ["O'Brien", "Smith"]], "name in ('O''Brien', 'Smith')"),
        (["name", "in", ["O'Brien"]], "name in ('O''Brien')"),
    ],
)
def test_golden_sql(predicate, expected):
    assert predicate_to_sql(predicate) == expected


def test_invalid_logical_operand():
    with pytest.raises(ValueError):
        predicate_to_sql([["a", ">", 1], "xor", ["b", "<", 2]])


def test_invalid_leaf_shape():
    with pytest.raises(ValueError):
        predicate_to_sql(["only-two", "items"])


def test_invalid_value_type():
    with pytest.raises(ValueError):
        predicate_to_sql(["col", "==", {"not": "allowed"}])

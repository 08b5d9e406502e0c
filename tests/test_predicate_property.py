"""Property-based predicate-compiler test: random nested predicate
trees must filter a Spark DataFrame exactly like a direct Python
evaluation of the same tree."""

import pytest
from hypothesis import given, settings, strategies as st

from getl_spark.operators.predicate import predicate_to_sql

ROWS = [
    {"a": 1, "b": "x", "c": 1.5},
    {"a": 2, "b": "y", "c": -0.5},
    {"a": 3, "b": "z", "c": 0.0},
    {"a": 4, "b": "x", "c": 2.5},
    {"a": 5, "b": "O'Brien", "c": 1.0},
    {"a": 6, "b": "it''s", "c": 1.0},
    {"a": None, "b": None, "c": None},
]

# quote-bearing values exercise the '' escaping in every list length
# (single-element lists go through a separate formatter branch)
B_VALUES = ["x", "y", "z", "w", "O'Brien", "it''s", "'", "a'b"]

leaf = st.one_of(
    st.tuples(st.just("a"), st.sampled_from(["<", "<=", ">", ">=", "==", "!="]),
              st.integers(min_value=0, max_value=5)),
    st.tuples(st.just("b"), st.just("in"),
              st.lists(st.sampled_from(B_VALUES), min_size=1, max_size=3, unique=True)),
    st.tuples(st.just("b"), st.sampled_from(["==", "!="]),
              st.sampled_from(B_VALUES[4:])),
    st.tuples(st.just("c"), st.sampled_from(["<", ">"]),
              st.floats(min_value=-1, max_value=3, allow_nan=False)),
    st.tuples(st.just("b"), st.just("=="), st.just("null")),
    st.tuples(st.just("b"), st.just("!="), st.just("null")),
).map(list)

predicates = st.recursive(
    leaf,
    lambda children: st.tuples(children, st.sampled_from(["and", "or"]), children).map(list),
    max_leaves=6,
)


def py_eval(pred, row):
    if len(pred) == 3 and isinstance(pred[0], list):
        left, op, right = py_eval(pred[0], row), pred[1], py_eval(pred[2], row)
        # SQL three-valued logic collapses to truthiness for row selection
        if op == "and":
            return bool(left) and bool(right)
        return bool(left) or bool(right)
    col, op, val = pred
    v = row[col]
    if val == "null":
        return v is None if op == "==" else v is not None
    if v is None:
        return False  # comparisons with NULL are not-true
    if op == "in":
        return v in val
    return {
        "<": v < val, "<=": v <= val, ">": v > val, ">=": v >= val,
        "==": v == val, "!=": v != val,
    }[op]


@pytest.fixture(scope="module")
def pred_df(spark):
    return spark.createDataFrame(
        [(r["a"], r["b"], r["c"]) for r in ROWS], "a INT, b STRING, c DOUBLE"
    ).cache()


@given(pred=predicates)
@settings(max_examples=25, deadline=None)
def test_compiled_predicate_matches_python_semantics(pred_df, pred):
    sql = predicate_to_sql(pred)
    spark_ids = {(r.a, r.b, r.c) for r in pred_df.where(sql).collect()}
    py_ids = {
        (row["a"], row["b"], row["c"]) for row in ROWS if py_eval(pred, row)
    }
    assert spark_ids == py_ids, f"predicate {pred!r} → {sql!r}"

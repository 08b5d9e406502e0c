"""Transform operator unit tests, including the reference quirks."""

import pytest

from pyspark.sql import functions as F

from getl_spark.operators import transform as t


# ------------------------------------------------------------------ select
def test_select_rename_cast(princess_df):
    out = t.select(
        princess_df,
        [
            {"col": "name", "alias": "who"},
            {"col": "age", "cast": "string"},
        ],
    )
    assert out.columns == ["who", "age"]
    assert dict(out.dtypes)["age"] == "string"


def test_select_nested_column(princess_df):
    out = t.select(princess_df, [{"col": "items.weakness", "alias": "weakness"}])
    assert [r.weakness for r in out.collect()] == ["thorns", "apple", "roses", "jafar"]


def test_select_missing_column_raises(princess_df):
    with pytest.raises(ValueError, match="not present"):
        t.select(princess_df, [{"col": "nope"}])


def test_select_add_new_column_null_and_array(princess_df):
    out = t.select(
        princess_df,
        [
            {"col": "name"},
            {"col": "missing", "add_new_column": True},
            {"col": "tags", "add_new_column": True, "default_value": "array()"},
        ],
    )
    assert dict(out.dtypes)["tags"] == "array<string>"
    row = out.first()
    assert row.missing is None and row.tags == []


def test_select_cast_nested_requires_alias(princess_df):
    with pytest.raises(ValueError, match="alias"):
        t.select(princess_df, [{"col": "items.weakness", "cast": "string"}])


# ------------------------------------------------------------------- where
def test_where_null_literal(nullable_df):
    assert t.where(nullable_df, ["age", "!=", "null"]).count() == 2
    assert t.where(nullable_df, ["age", "==", "null"]).count() == 2


def test_where_invalid_column_raises_value_error(princess_df):
    with pytest.raises(ValueError):
        t.where(princess_df, ["no_such_col", ">", 1]).collect()


def test_filter_dataframe_removes_and_dedups(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], "k STRING, v BIGINT"
    )
    out = t.filter_dataframe(df, ["k", "==", "b"])
    # subtract removes matching rows AND deduplicates the remainder
    assert out.collect() == [("a", 1)]


# ----------------------------------------------------------------- reshape
def test_explode_and_get_item(spark):
    df = spark.createDataFrame([("x", ["a", "b"])], "k STRING, vs ARRAY<STRING>")
    assert t.explode(df, "vs", "v").count() == 2
    assert t.get_item(df, "vs", "first", 0).first().first == "a"


def test_split_and_substring(princess_df):
    out = t.split(princess_df, "name", "parts", " ")
    assert out.first().parts == ["Cinderella"]
    out = t.substring(princess_df, "name", "prefix", 1, 4)
    assert out.first().prefix == "Cind"


def test_get_json_object(spark):
    df = spark.createDataFrame([('{"a": {"b": 7}}',)], "js STRING")
    assert t.get_json_object(df, "js", "b", "a.b").first().b == "7"


def test_rename_and_cast(princess_df):
    out = t.rename_column(princess_df, "age", "years")
    assert "years" in out.columns and "age" not in out.columns
    out = t.cast_column(princess_df, "age", "double")
    assert dict(out.dtypes)["age"] == "double"


def test_rename_missing_raises(princess_df):
    with pytest.raises(ValueError, match="not present"):
        t.rename_column(princess_df, "nope", "x")


# ------------------------------------------------------------------ concat
def test_concat_null_propagates(spark):
    df = spark.createDataFrame([("a", "b"), ("c", None)], "x STRING, y STRING")
    out = t.concat(df, ["x", "y"], "xy", delimiter="-")
    values = [r.xy for r in out.collect()]
    assert values == ["a-b", None]  # F.concat semantics, not concat_ws


def test_concat_casts_non_strings(princess_df):
    out = t.concat(princess_df, ["name", "age"], "na")
    assert out.first().na == "Cinderella_16"


# ----------------------------------------------------------- dedup / union
def test_drop_duplicates_all(travel_df):
    assert t.drop_duplicates(travel_df).count() == 5


def test_drop_duplicates_subset(travel_df):
    assert t.drop_duplicates(travel_df, ["from", "to"]).count() == 4


def test_drop_duplicates_nested(spark):
    df = spark.createDataFrame(
        [(("a", "b"), 1)] * 5, "payload STRUCT<`from`: STRING, `to`: STRING>, cost BIGINT"
    )
    assert t.drop_duplicates(df, ["payload.from", "payload.to"]).count() == 1


def test_union_positional(spark):
    a = spark.createDataFrame([(1, "x")], "i BIGINT, s STRING")
    b = spark.createDataFrame([(2, "y")], "i BIGINT, s STRING")
    assert t.union(a, b).count() == 2


def test_union_mismatch_raises_value_error(spark):
    a = spark.createDataFrame([(1,)], "i BIGINT")
    b = spark.createDataFrame([(1, 2)], "i BIGINT, j BIGINT")
    with pytest.raises(ValueError):
        t.union(a, b)


def test_join_types(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, l STRING")
    right = spark.createDataFrame([(1, "x")], "k BIGINT, r STRING")
    assert t.join(left, right, ["k"]).count() == 2  # default left
    assert t.join(left, right, ["k"], "inner").count() == 1
    assert t.join(left, right, ["k"], "anti").count() == 1


# ------------------------------------------------------ tuning surface
def test_repartition_and_coalesce(spark):
    df = spark.range(100)
    assert t.repartition(df, 8).rdd.getNumPartitions() == 8
    assert t.coalesce_partitions(t.repartition(df, 8), 2).rdd.getNumPartitions() == 2
    by_col = t.repartition(df.withColumn("k", df.id % 4), columns=["k"])
    assert by_col.count() == 100


def test_broadcast_hint_changes_join_strategy(spark):
    left = spark.range(10000).withColumnRenamed("id", "k")
    right = spark.range(10).withColumnRenamed("id", "k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = left.join(right, "k")._jdf.queryExecution().executedPlan().toString()
        hinted = (
            left.join(t.hint(right, "broadcast"), "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" not in plain
        assert "BroadcastHashJoin" in hinted
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_drop_columns(princess_df):
    out = t.drop_columns(princess_df, ["items", "happy"])
    assert out.columns == ["name", "age"]


def test_melt_wide_to_long(spark):
    from getl_spark.operators import transform as T

    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 30.0, 40.0)], "id BIGINT, a DOUBLE, b DOUBLE"
    )
    out = T.melt(df, ["id"], ["a", "b"])
    assert sorted(map(tuple, out.collect())) == [
        (1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0), (2, "b", 40.0),
    ]
    named = T.melt(df, ["id"], ["a"], var_name="metric", value_name="reading")
    assert named.columns == ["id", "metric", "reading"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not present"):
        T.melt(df, ["id"], ["nope"])

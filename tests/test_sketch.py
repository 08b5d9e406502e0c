"""HLL distinct-count sketches: build, store, merge, estimate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from getl_spark.functions import sketch


@pytest.fixture(scope="module")
def events(spark):
    # 4 sources × 1000 rows, user ids overlap across sources
    return spark.range(4000).select(
        (F.col("id") % 4).cast("string").alias("src"),
        (F.col("id") % 700).alias("user_id"),
    )


def test_estimate_close_to_exact(events):
    est = sketch.distinct_estimate(events, "user_id").collect()[0].distinct_estimate
    assert abs(est - 700) / 700 < 0.05


def test_grouped_sketch_then_coarser_merge(events, spark, tmp_path):
    """Build per-source sketches, persist them, merge to a global
    estimate without touching raw data — the incremental pattern."""
    per_src = sketch.distinct_sketch(events, "user_id", group_by=["src"])
    path = str(tmp_path / "sketches")
    per_src.write.parquet(path)  # sketches survive a sink roundtrip

    stored = spark.read.parquet(path)
    total = sketch.merge_sketches(stored).collect()[0].distinct_estimate
    assert abs(total - 700) / 700 < 0.05

    per_src_est = {
        r.src: r.distinct_estimate
        for r in sketch.merge_sketches(stored, group_by=["src"]).collect()
    }
    # each source sees 1000 rows over 700 users → every user appears
    for v in per_src_est.values():
        assert abs(v - 700) / 700 < 0.06 or v < 700  # <=700 with ~5% err


def test_merge_across_two_batches_equals_union(events, spark):
    """Sketch(A) ⊎ Sketch(B) ≈ distinct(A ∪ B): mergeability is the
    whole point — counting day-by-day then unioning never rescans."""
    a = events.where(F.col("user_id") % 2 == 0)
    b = events.where(F.col("user_id") % 2 == 1)
    sk_a = sketch.distinct_sketch(a, "user_id")
    sk_b = sketch.distinct_sketch(b, "user_id")
    est = sketch.merge_sketches(sk_a.unionByName(sk_b)).collect()[0].distinct_estimate
    assert abs(est - 700) / 700 < 0.05


def test_sketch_yaml_dotted_path(spark, tmp_path):
    from getl_spark import lift

    src = str(tmp_path / "s")
    spark.range(500).select((F.col("id") % 123).alias("u")).write.parquet(src)
    log = lift(
        spark,
        f"""
LiftJob:
  L:
    Type: load::batch_parquet
    Properties: {{Path: {src}}}
  E:
    Type: transform::generic
    Input: L
    Properties:
      Functions:
        - sketch.distinct_estimate: {{value_col: u}}
""",
    )
    est = log.get("E").collect()[0].distinct_estimate
    assert abs(est - 123) / 123 < 0.05


def test_quantile_sketch_build_merge(events, spark, tmp_path):
    """Per-source KLL sketches merge to global quantiles close to the
    exact percentiles, without ever sorting the full data."""
    per_src = sketch.quantile_sketch(
        events.withColumn("v", F.col("user_id").cast("double")), "v", group_by=["src"]
    )
    path = str(tmp_path / "kll")
    per_src.write.parquet(path)
    got = sketch.merge_quantile_sketches(
        spark.read.parquet(path), quantiles=[0.5, 0.9]
    ).collect()[0]
    # user_id uniform over [0, 700)
    assert abs(got.q_0_5 - 350) < 25
    assert abs(got.q_0_9 - 630) < 25


def test_theta_set_algebra(spark):
    a = sketch.theta_sketch(
        spark.range(0, 600).select(F.col("id").alias("u")), "u"
    )
    b = sketch.theta_sketch(
        spark.range(400, 1000).select(F.col("id").alias("u")), "u"
    )
    inter = sketch.theta_estimate(a, b, "intersection").collect()[0].distinct_estimate
    union = sketch.theta_estimate(a, b, "union").collect()[0].distinct_estimate
    diff = sketch.theta_estimate(a, b, "difference").collect()[0].distinct_estimate
    assert abs(inter - 200) / 200 < 0.05
    assert abs(union - 1000) / 1000 < 0.05
    assert abs(diff - 400) / 400 < 0.05
    import pytest as _pytest

    with _pytest.raises(ValueError, match="op must be"):
        sketch.theta_estimate(a, b, "xor")


def test_correlations_matches_duckdb(spark):
    import duckdb

    from getl_spark.functions import stats as S

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {
        (r.col_a, r.col_b): r.corr
        for r in S.correlations(
            df, ["l_quantity", "l_extendedprice", "l_discount"]
        ).collect()
    }
    duck = duckdb.sql("""
        SELECT round(corr(l_quantity, l_extendedprice), 6) AS qe,
               round(corr(l_quantity, l_discount), 6) AS qd,
               round(corr(l_extendedprice, l_discount), 6) AS ed
        FROM '/root/testdata/sf0.001/lineitem.parquet'
    """).fetchone()
    assert got[("l_quantity", "l_extendedprice")] == duck[0]
    assert got[("l_quantity", "l_discount")] == duck[1]
    assert got[("l_extendedprice", "l_discount")] == duck[2]


def test_correlations_single_pass(spark):
    from getl_spark.functions import stats as S

    df = spark.range(100).selectExpr("id AS a", "id * 2 AS b", "100 - id AS c")
    out = S.correlations(df, ["a", "b", "c"])
    assert {(r.col_a, r.col_b): r.corr for r in out.collect()} == {
        ("a", "b"): 1.0,
        ("a", "c"): -1.0,
        ("b", "c"): -1.0,
    }
    # one aggregate -> exactly one pair of exchanges, no per-pair scans
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_group_jaccard_matrix_tracks_exact(spark):
    """Group-level MinHash Jaccard estimates must track exact
    shingle-set Jaccard within the estimator's error (k=128 →
    std ≲ 0.045)."""
    import itertools

    base = [f"w{i}" for i in range(300)]
    groups = {
        "a": base,                           # reference
        "b": base[:150] + [f"x{i}" for i in range(150)],   # ~33% overlap
        "c": [f"y{i}" for i in range(300)],  # disjoint
    }
    rows = []
    for g, words in groups.items():
        text = " ".join(words)
        rows.append((g, text))
    df = spark.createDataFrame(rows, "src STRING, text STRING")

    from getl_spark.functions import sketch as SK

    est = {
        (r.group_a, r.group_b): r.jaccard_est
        for r in SK.jaccard_matrix(df, "src").collect()
    }

    def shingles(words):
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}

    for ga, gb in itertools.combinations(sorted(groups), 2):
        sa, sb = shingles(groups[ga]), shingles(groups[gb])
        exact = len(sa & sb) / len(sa | sb)
        assert abs(est[(ga, gb)] - exact) < 0.15, (ga, gb, est[(ga, gb)], exact)


def test_group_minhash_merge_property(spark):
    """Signatures of a group computed whole vs from unioned halves must
    be identical — min is associative, so sketches merge."""
    from pyspark.sql import functions as F

    from getl_spark.functions import sketch as SK

    words = [f"t{i}" for i in range(200)]
    half1 = " ".join(words[:120])
    half2 = " ".join(words[80:])
    whole_df = spark.createDataFrame(
        [("g", half1 + " " + half2)], "src STRING, text STRING"
    )
    split_df = spark.createDataFrame(
        [("g", half1), ("g", half2)], "src STRING, text STRING"
    )
    whole = SK.group_minhash(whole_df, "src", num_hashes=32).first().sig
    merged = SK.group_minhash(split_df, "src", num_hashes=32).first().sig
    # not byte-identical (the concatenation creates two extra boundary
    # shingles), but agreement must be near-total
    agree = sum(1 for x, y in zip(whole, merged) if x == y)
    assert agree >= 28


def test_histogram_buckets_and_edges(spark):
    from getl_spark.functions import stats as S

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [(None,)],
        "v DOUBLE",
    )
    rows = S.histogram(df, "v", bins=5).collect()
    assert [r.bucket for r in rows] == [0, 1, 2, 3, 4]
    # max value lands in the LAST bucket, nulls excluded
    assert sum(r.n for r in rows) == 11
    assert rows[-1].n == 3  # 8, 9, 10
    assert rows[0].lo == 0.0 and rows[-1].hi == 10.0

    # constant column: single bucket 0 with every row
    const = spark.createDataFrame([(5.0,), (5.0,)], "v DOUBLE")
    crows = S.histogram(const, "v", bins=4).collect()
    assert len(crows) == 1 and crows[0].bucket == 0 and crows[0].n == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bins"):
        S.histogram(df, "v", bins=0)


# --------------------------------------------------- count-min frequency
def test_freq_sketch_exact_on_small_and_merges(spark):
    """With sketch width >> distinct values the estimates are exact;
    per-shard sketches merged must answer like one whole-corpus
    sketch (the mergeable-bytes lifecycle)."""
    from getl_spark.functions import sketch

    rows = [(i % 3, f"w{i % 7}") for i in range(700)]
    df = spark.createDataFrame(rows, "shard int, word string")
    items = [f"w{i}" for i in range(7)]

    whole = sketch.freq_sketch(df, "word")
    est = {
        r.item: r.estimate
        for r in sketch.freq_estimate(whole, items).collect()
    }
    exact = {f"w{i}": sum(1 for _, w in rows if w == f"w{i}") for i in range(7)}
    assert est == exact

    # per-shard sketches, merged at query time, answer identically
    sharded = sketch.freq_sketch(df, "word", group_cols="shard")
    assert sharded.count() == 3
    # erase the group key -> all three sketches merge into one answer
    import pyspark.sql.functions as F

    merged = sketch.freq_estimate(
        sharded.withColumn("shard", F.lit(0)), items, group_cols="shard"
    )
    est2 = {r.item: r.estimate for r in merged.collect()}
    assert est2 == exact


def test_freq_estimate_grouped_and_bounds(spark):
    import pytest

    from getl_spark.functions import sketch

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x"), ("b", "y")], "g string, v string"
    )
    sk = sketch.freq_sketch(df, "v", group_cols="g")
    out = {
        (r.g, r.item): r.estimate
        for r in sketch.freq_estimate(sk, ["x", "y"], group_cols="g").collect()
    }
    assert out == {("a", "x"): 2, ("a", "y"): 0, ("b", "x"): 1, ("b", "y"): 1}
    with pytest.raises(ValueError, match="max_groups"):
        sketch.freq_estimate(sk, ["x"], group_cols="g", max_groups=1)
    with pytest.raises(ValueError, match="non-empty"):
        sketch.freq_estimate(sk, [], group_cols="g")
    with pytest.raises(ValueError, match="eps"):
        sketch.freq_sketch(df, "v", eps=0.0)
    # heterogeneous / unsupported item types refuse loudly instead of
    # mis-declaring the output schema or hitting the wrong py4j
    # estimateCount overload
    for bad in (["x", 1], [1.5], [True], [1, 2.0]):
        with pytest.raises(TypeError, match="all-str or all-int"):
            sketch.freq_estimate(sk, bad, group_cols="g")
    # an all-int item list against an int-sketched column works
    idf = spark.createDataFrame([(1,), (1,), (7,)], "v bigint")
    isk = sketch.freq_sketch(idf, "v")
    got = {
        r.item: r.estimate for r in sketch.freq_estimate(isk, [1, 7, 9]).collect()
    }
    assert got == {1: 2, 7: 1, 9: 0}

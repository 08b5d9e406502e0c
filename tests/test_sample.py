"""Deterministic sampling / mixing operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from getl_spark.functions import sample


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
    )


def test_hash_fraction_deterministic_and_unbiased(docs):
    a = sample.hash_fraction(docs, 0.3, ["doc_id"], seed=7)
    b = sample.hash_fraction(docs, 0.3, ["doc_id"], seed=7)
    ids_a = {r.doc_id for r in a.collect()}
    ids_b = {r.doc_id for r in b.collect()}
    assert ids_a == ids_b  # reproducible
    assert 0.25 < len(ids_a) / 2000 < 0.35  # close to requested rate
    # different seed → different (mostly) selection
    ids_c = {r.doc_id for r in sample.hash_fraction(docs, 0.3, ["doc_id"], seed=8).collect()}
    assert ids_c != ids_a


def test_hash_fraction_is_nested_by_rate(docs):
    """A 0.2 sample is a subset of the 0.5 sample at the same seed —
    hash thresholds nest, so growing a sample never reshuffles it."""
    small = {r.doc_id for r in sample.hash_fraction(docs, 0.2, ["doc_id"], seed=1).collect()}
    large = {r.doc_id for r in sample.hash_fraction(docs, 0.5, ["doc_id"], seed=1).collect()}
    assert small <= large


def test_hash_fraction_bounds():
    with pytest.raises(ValueError):
        sample.hash_fraction(None, 1.5, ["doc_id"])


def test_per_key_cap_exact_k_and_stable(docs):
    capped = sample.per_key_cap(docs, "src", 10, ["doc_id"], seed=3)
    counts = {r.src: r.n for r in capped.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 10, "1": 10, "2": 10, "3": 10}
    again = sample.per_key_cap(docs, "src", 10, ["doc_id"], seed=3)
    assert {tuple(r) for r in capped.collect()} == {tuple(r) for r in again.collect()}
    # keys with fewer than k rows keep everything
    tiny = docs.where(F.col("doc_id") < 3)
    assert sample.per_key_cap(tiny, "src", 10, ["doc_id"]).count() == 3


def test_weighted_mix_tags_and_rates(spark, docs):
    srcs = {
        "web": docs.where(F.col("src") == "0").select("doc_id"),
        "books": docs.where(F.col("src") == "1").select("doc_id"),
    }
    mixed = sample.weighted_mix(srcs, {"web": 0.1, "books": 1.0}, ["doc_id"], seed=5)
    by_src = {r.source_name: r.n for r in mixed.groupBy("source_name").agg(F.count("*").alias("n")).collect()}
    assert by_src["books"] == 500  # weight 1.0 keeps all
    assert 20 < by_src["web"] < 80  # ~10% of 500
    with pytest.raises(ValueError, match="no weight"):
        sample.weighted_mix(srcs, {"web": 0.1}, ["doc_id"])


def test_sampling_yaml_path(spark, tmp_path):
    """Dotted-path call through transform::generic."""
    from getl_spark import lift

    src = str(tmp_path / "s")
    spark.range(100).select(F.col("id").alias("doc_id")).write.parquet(src)
    log = lift(
        spark,
        f"""
LiftJob:
  L:
    Type: load::batch_parquet
    Properties: {{Path: {src}}}
  S:
    Type: transform::generic
    Input: L
    Properties:
      Functions:
        - sample.hash_fraction: {{fraction: 0.5, id_cols: [doc_id], seed: 2}}
""",
    )
    n = log.get("S").count()
    assert 30 < n < 70


# ------------------------------------------------------------ split
def test_split_disjoint_exhaustive_deterministic(spark):
    from getl_spark.functions import sample as S

    df = spark.range(10_000).selectExpr("id")
    out = S.split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, ["id"])
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("cnt")
    ).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 10_000  # exhaustive
    assert 0.75 < counts["train"] / 10_000 < 0.85
    # deterministic: same assignment on recompute and across partitioning
    again = S.split(df.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1}, ["id"])
    a = {r.id: r.split for r in out.collect()}
    b = {r.id: r.split for r in again.collect()}
    assert a == b


def test_split_remainder_dropped_and_validation(spark):
    import pytest as _pytest

    from getl_spark.functions import sample as S

    df = spark.range(1000)
    out = S.split(df, {"sub": 0.25}, ["id"])
    n = out.count()
    assert 200 < n < 300 and {r.split for r in out.collect()} == {"sub"}
    with _pytest.raises(ValueError, match="<= 1"):
        S.split(df, {"a": 0.9, "b": 0.2}, ["id"])
    with _pytest.raises(ValueError, match="at least one"):
        S.split(df, {}, ["id"])


def test_split_no_shuffle(spark):
    from getl_spark.functions import sample as S

    df = spark.range(100)
    plan = (
        S.split(df, {"train": 0.5, "val": 0.5}, ["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------------ stratified
def test_stratified_equals_per_stratum_hash_fraction(docs):
    """stratified is exactly hash_fraction applied per stratum — same
    hash, same seed, same interval — so the mix is verifiable against
    the simpler primitive."""
    mixed = sample.stratified(
        docs, "src", {"0": 0.3, "1": 1.0}, ["doc_id"], seed=5
    )
    expect = (
        sample.hash_fraction(docs.where("src = '0'"), 0.3, ["doc_id"], seed=5)
        .unionByName(
            sample.hash_fraction(docs.where("src = '1'"), 1.0, ["doc_id"], seed=5)
        )
    )
    got = {r.doc_id for r in mixed.collect()}
    assert got == {r.doc_id for r in expect.collect()}
    # unlisted strata drop out by default
    assert mixed.where("src NOT IN ('0', '1')").count() == 0


def test_stratified_default_fraction_and_validation(docs):
    kept_all = sample.stratified(
        docs, "src", {"0": 0.0}, ["doc_id"], default_fraction=1.0
    )
    # stratum 0 dropped entirely, every other stratum kept whole
    assert kept_all.where("src = '0'").count() == 0
    assert kept_all.count() == docs.where("src != '0'").count()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fraction"):
        sample.stratified(docs, "src", {"0": 1.5}, ["doc_id"])
    with _pytest.raises(ValueError, match="default_fraction"):
        sample.stratified(docs, "src", {}, ["doc_id"], default_fraction=-0.1)


def test_stratified_no_shuffle(docs):
    plan = (
        sample.stratified(docs, "src", {"0": 0.5}, ["doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_temperature_mix_alpha_one_is_identity(docs):
    out = sample.temperature_mix(docs, "src", 1.0, ["doc_id"], seed=3)
    assert out.count() == docs.count()


def test_temperature_mix_rebalances_toward_alpha_power(spark):
    # skewed strata: 2000 / 500 / 125 rows
    df = spark.range(0, 2625).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 2000, "big")
        .when(F.col("id") < 2500, "mid")
        .otherwise("small")
        .alias("src"),
    )
    out = sample.temperature_mix(df, "src", 0.5, ["doc_id"], seed=1)
    got = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    # targets: n_g^0.5 * 125^0.5 -> big 500, mid 250, small 125
    assert got["small"] == 125  # smallest stratum kept whole
    assert abs(got["mid"] - 250) < 40
    assert abs(got["big"] - 500) < 60
    # alpha=0 equalizes to ~125 each
    eq = sample.temperature_mix(df, "src", 0.0, ["doc_id"], seed=1)
    got0 = {r["src"]: r["count"] for r in eq.groupBy("src").count().collect()}
    assert got0["small"] == 125
    assert abs(got0["big"] - 125) < 40
    assert abs(got0["mid"] - 125) < 40


def test_temperature_mix_deterministic_subset_and_frac_col(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 800, "a").otherwise("b").alias("src"),
    )
    one = sample.temperature_mix(df, "src", 0.3, ["doc_id"], seed=5, frac_col="f")
    two = sample.temperature_mix(df, "src", 0.3, ["doc_id"], seed=5, frac_col="f")
    rows_one = sorted((r.doc_id, round(r.f, 9)) for r in one.collect())
    rows_two = sorted((r.doc_id, round(r.f, 9)) for r in two.collect())
    assert rows_one == rows_two
    # kept set is a subset of the input, fractions in (0, 1]
    assert all(0.0 < f <= 1.0 for _, f in rows_one)
    # smallest stratum's fraction is exactly scale (=1.0 default → kept whole)
    b_rows = [f for (i, f) in rows_one if i >= 800]
    assert all(f == 1.0 for f in b_rows) and len(b_rows) == 200


def test_temperature_mix_null_stratum_and_validation(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 300, "a").otherwise(None).alias("src"),
    )
    out = sample.temperature_mix(df, "src", 0.0, ["doc_id"], seed=2)
    got = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    # NULL stratum participates like any other (smallest → kept whole)
    assert got.get(None) == 100
    with pytest.raises(ValueError):
        sample.temperature_mix(df, "src", 1.5, ["doc_id"])
    with pytest.raises(ValueError):
        sample.temperature_mix(df, "src", 0.5, ["doc_id"], scale=0.0)


def test_temperature_mix_scale_halves_everything(spark):
    df = spark.range(0, 1200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "big").otherwise("small").alias("src"),
    )
    out = sample.temperature_mix(df, "src", 0.5, ["doc_id"], seed=4, scale=0.5)
    got = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    # small: 200 * 0.5 = 100; big: 200^0.5*1000^0.5*0.5 ≈ 224
    assert abs(got["small"] - 100) < 30
    assert abs(got["big"] - 224) < 50


# ----------------------------------------------------- token_budget_mix
def test_token_budget_mix_exact_boundary_and_default(spark):
    """Budgets are never overshot (cumulative INCLUDING the doc must
    fit), order_col gives a curated take order, zero budgets empty a
    source, and unlisted sources follow default_keep."""
    from getl_spark.functions import sample

    rows = [
        ("web", 1, "a b c"),        # 3 tokens
        ("web", 2, "d e f g"),      # 4 tokens
        ("web", 3, "h i"),          # 2 tokens
        ("forum", 4, "x y z"),
        ("books", 5, "p q r s t"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = sample.token_budget_mix(
        df, "source", {"web": 7, "forum": 0}, ["doc_id"], order_col="doc_id"
    )
    got = sorted(r.doc_id for r in out.collect())
    # web: docs 1 (cum 3) + 2 (cum 7) fit; doc 3 (cum 9) does not;
    # forum: budget 0 -> nothing; books: unlisted -> kept
    assert got == [1, 2, 5]
    # default_keep=False drops unlisted sources instead
    out2 = sample.token_budget_mix(
        df, "source", {"web": 7}, ["doc_id"], order_col="doc_id",
        default_keep=False,
    )
    assert sorted(r.doc_id for r in out2.collect()) == [1, 2]
    # a doc bigger than the whole budget never enters
    out3 = sample.token_budget_mix(
        df, "source", {"web": 2, "forum": 99, "books": 99}, ["doc_id"],
        order_col="doc_id",
    )
    assert sorted(r.doc_id for r in out3.collect()) == [4, 5]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample.token_budget_mix(df, "source", {"web": -1}, ["doc_id"])


def test_token_budget_mix_hash_order_deterministic(spark):
    """Default hash order is stable across runs and repartitioning,
    and the kept set is budget-consistent (re-running on the kept set
    keeps everything)."""
    from getl_spark.functions import sample

    rows = [("s", i, "w " * (i % 7 + 1)) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    a = sorted(r.doc_id for r in
               sample.token_budget_mix(df, "source", {"s": 120}, ["doc_id"]).collect())
    b = sorted(r.doc_id for r in
               sample.token_budget_mix(df.repartition(7), "source", {"s": 120},
                                       ["doc_id"]).collect())
    assert a == b and 0 < len(a) < 100
    kept = sample.token_budget_mix(df, "source", {"s": 120}, ["doc_id"])
    again = sorted(r.doc_id for r in
                   sample.token_budget_mix(kept, "source", {"s": 120},
                                           ["doc_id"]).collect())
    assert again == a


def test_grouped_prefix_sum_matches_window_and_keeps_null_groups(spark):
    """The distributed prefix sum must equal Window.partitionBy(key)
    row for row on a total order, including the NULL-key group (a
    name-list join would silently drop it)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from getl_spark.common.scale import grouped_prefix_sum

    rng = random.Random(17)
    rows = [
        (rng.choice(["a", "b", None]), i, rng.randrange(1, 9))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k string, i long, v long")
    got = {
        (r.k, r.i): r.cum
        for r in grouped_prefix_sum(df, ["k"], ["i"], "v", "cum").collect()
    }
    w = (
        Window.partitionBy("k").orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.k, r.i): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want
    assert len(got) == 500  # null-key rows survived


def test_grouped_prefix_sum_multi_column_one_pass(spark):
    """The list form cumsums several columns in ONE range exchange and
    must equal per-column windows row for row (validation included)."""
    import random

    import pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from getl_spark.common.scale import grouped_prefix_sum

    rng = random.Random(23)
    rows = [
        (rng.choice(["a", None]), i, rng.randrange(1, 9), rng.randrange(1, 5))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, i long, x long, y long")
    got = {
        (r.k, r.i): (r.cx, r.cy)
        for r in grouped_prefix_sum(
            df, ["k"], ["i"], ["x", "y"], ["cx", "cy"]
        ).collect()
    }
    w = (
        Window.partitionBy("k").orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.k, r.i): (r.cx, r.cy)
        for r in df.withColumn("cx", F.sum("x").over(w))
        .withColumn("cy", F.sum("y").over(w))
        .collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="pair up"):
        grouped_prefix_sum(df, ["k"], ["i"], ["x", "y"], ["cx"])


def test_token_budget_mix_null_source_follows_default(spark):
    from getl_spark.functions import sample

    df = spark.createDataFrame(
        [("web", 1, "a b"), (None, 2, "c d"), (None, 3, "e")],
        "source string, doc_id long, text string",
    )
    kept = sorted(
        r.doc_id
        for r in sample.token_budget_mix(
            df, "source", {"web": 100}, ["doc_id"]
        ).collect()
    )
    assert kept == [1, 2, 3]  # null source unlisted -> default keep
    dropped = sample.token_budget_mix(
        df, "source", {"web": 100}, ["doc_id"], default_keep=False
    )
    assert sorted(r.doc_id for r in dropped.collect()) == [1]


def test_deterministic_shuffle_is_md5_rank_permutation(spark):
    """Positions are a permutation of 1..N equal to the md5-key rank;
    identical across reruns, independent across seeds."""
    import hashlib

    from getl_spark.functions import sample

    df = spark.range(0, 200).selectExpr("id", "id % 5 as grp")
    out = {r["id"]: (r["shuffle_key"], r["shuffle_pos"])
           for r in sample.deterministic_shuffle(df, ["id"], seed=7).collect()}
    assert sorted(p for _, p in out.values()) == list(range(1, 201))
    keys = {i: hashlib.md5(f"7\x1f{i}".encode()).hexdigest() for i in range(200)}
    expect_pos = {
        i: r + 1
        for r, i in enumerate(sorted(keys, key=lambda i: (keys[i], i)))
    }
    for i in range(200):
        assert out[i] == (keys[i], expect_pos[i])
    again = {r["id"]: r["shuffle_pos"]
             for r in sample.deterministic_shuffle(df, ["id"], seed=7).collect()}
    assert again == {i: p for i, (_, p) in out.items()}
    other = {r["id"]: r["shuffle_pos"]
             for r in sample.deterministic_shuffle(df, ["id"], seed=8).collect()}
    assert other != again


def test_deterministic_shuffle_validates(spark):
    from getl_spark.functions import sample

    df = spark.range(3)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="id_cols"):
        sample.deterministic_shuffle(df, [])


def test_hard_negatives_skips_positives_and_renumbers(spark):
    from getl_spark.functions import sample

    results = spark.createDataFrame(
        [
            (0, "a", 1), (0, "b", 2), (0, "c", 3), (0, "d", 4),
            (1, "a", 1), (1, "b", 2),
        ],
        "query_id INT, doc_id STRING, rank INT",
    )
    positives = spark.createDataFrame(
        # duplicate judgment must not multiply rows
        [(0, "a"), (0, "a"), (0, "c"), (1, "z")],
        "query_id INT, doc_id STRING",
    )
    rows = sorted(
        tuple(r)
        for r in sample.hard_negatives(
            results, positives, n_per_query=2
        ).collect()
    )
    # query 0: a,c are positives -> negatives b (rank2->neg1), d (rank4->neg2)
    # query 1: no retrieved positives -> a, b keep order
    assert rows == [
        (0, "b", 2, 1), (0, "d", 4, 2),
        (1, "a", 1, 1), (1, "b", 2, 2),
    ]
    # n_per_query truncates
    one = sample.hard_negatives(results, positives, n_per_query=1)
    assert sorted(tuple(r) for r in one.collect()) == [
        (0, "b", 2, 1), (1, "a", 1, 1)
    ]
    import pytest

    with pytest.raises(ValueError, match="n_per_query"):
        sample.hard_negatives(results, positives, n_per_query=0)


def test_preference_pairs_margin_and_order(spark):
    from getl_spark.functions import sample

    df = spark.createDataFrame(
        [
            # prompt A: clear spread
            ("A", "r1", 0.9), ("A", "r2", 0.5), ("A", "r3", 0.1),
            # prompt B: spread below margin -> no pairs at margin 0.5
            ("B", "r1", 0.6), ("B", "r2", 0.4),
            # prompt C: single candidate -> nothing to pair
            ("C", "r1", 0.7),
            # prompt D: null-scored candidate excluded
            ("D", "r1", 0.8), ("D", "r2", None), ("D", "r3", 0.2),
        ],
        "prompt STRING, resp STRING, score DOUBLE",
    )
    rows = sorted(
        tuple(r)
        for r in sample.preference_pairs(
            df, "prompt", "resp", "score", min_margin=0.5,
            max_pairs_per_prompt=2,
        ).collect()
    )
    # A: only r3 clears the 0.5 margin (r2 trails by 0.4); B under
    # margin; C single; D pairs past its null candidate
    assert rows == [
        ("A", "r1", "r3", 0.9, 0.1, 0.8, 1),
        ("D", "r1", "r3", 0.8, 0.2, 0.6, 1),
    ]
    # margin 0: every non-best candidate pairs, worst first
    all_pairs = sorted(
        tuple(r)
        for r in sample.preference_pairs(
            df, "prompt", "resp", "score", max_pairs_per_prompt=10
        ).collect()
    )
    assert ("A", "r1", "r3", 0.9, 0.1, 0.8, 1) in all_pairs
    assert ("A", "r1", "r2", 0.9, 0.5, 0.4, 2) in all_pairs
    assert ("B", "r1", "r2", 0.6, 0.4, 0.2, 1) in all_pairs
    assert not any(r[0] == "C" for r in all_pairs)
    # determinism: tie on score breaks by response asc for chosen
    tie = spark.createDataFrame(
        [("T", "x", 1.0), ("T", "y", 1.0), ("T", "z", 0.0)],
        "prompt STRING, resp STRING, score DOUBLE",
    )
    got = sample.preference_pairs(tie, "prompt", "resp", "score",
                                  max_pairs_per_prompt=5).collect()
    assert all(r["chosen"] == "x" for r in got)
    import pytest

    with pytest.raises(ValueError, match="max_pairs"):
        sample.preference_pairs(df, "prompt", "resp", "score",
                                max_pairs_per_prompt=0)
    with pytest.raises(ValueError, match="min_margin"):
        sample.preference_pairs(df, "prompt", "resp", "score",
                                min_margin=-1)


def test_kfold_partition_properties(spark):
    """Folds partition the corpus (disjoint, exhaustive), sizes are
    near-equal, assignment is stable across partitioning, and fold
    boundaries NEST with split's intervals at the same seed."""
    from getl_spark.functions import sample

    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    out = sample.kfold(df, 5, ["doc_id"], seed=3)
    counts = {r["fold"]: r["n"] for r in out.groupBy("fold").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert sum(counts.values()) == 5000
    assert all(850 < n < 1150 for n in counts.values())
    again = {
        r["doc_id"]: r["fold"]
        for r in sample.kfold(df.repartition(17), 5, ["doc_id"], seed=3).collect()
    }
    first = {r["doc_id"]: r["fold"] for r in out.collect()}
    assert first == again
    # fold 0 at k=5 is exactly the first 20% hash interval = split 20%
    s = sample.split(df, {"sub": 0.2}, ["doc_id"], seed=3)
    assert {r["doc_id"] for r in s.collect()} == {
        d for d, f in first.items() if f == 0
    }
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        sample.kfold(df, 1, ["doc_id"])


def test_grouped_prefix_scan_boundary_invariance_randomized(spark):
    """The scan's contract is BOUNDARY INVARIANCE: for any input
    partitioning and any slice placement the result equals the plain
    window formulation. Randomized over partition counts, key
    cardinalities, value signs, and all three aggregates, inclusive
    and exclusive."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from getl_spark.common.scale import grouped_prefix_scan

    rng = random.Random(67)
    for trial in range(4):
        n = rng.choice([3, 40, 257])
        nkeys = rng.choice([1, 2, 5])
        parts = rng.choice([1, 7, 32])
        rows = [
            (
                rng.choice([f"k{j}" for j in range(nkeys)] + [None]),
                i,
                rng.randrange(-9, 9),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "k string, i long, v long").repartition(
            parts
        )
        for inclusive in (True, False):
            frame = (
                Window.partitionBy("k")
                .orderBy("i")
                .rowsBetween(
                    Window.unboundedPreceding,
                    Window.currentRow if inclusive else -1,
                )
            )
            want = {
                (r.k, r.i): (r.cs, r.cmin, r.cmax)
                for r in df.withColumn("cs", F.sum("v").over(frame))
                .withColumn("cmin", F.min("v").over(frame))
                .withColumn("cmax", F.max("v").over(frame))
                .collect()
            }
            got = {
                (r.k, r.i): (r.cs, r.cmin, r.cmax)
                for r in grouped_prefix_scan(
                    df,
                    ["k"],
                    ["i"],
                    ["v", "v", "v"],
                    ["cs", "cmin", "cmax"],
                    fn=["sum", "min", "max"],
                    inclusive=inclusive,
                ).collect()
            }
            assert got == want, (trial, n, nkeys, parts, inclusive)


def test_balanced_downsample_equalizes_classes(spark):
    """Every class capped at the min class size (or explicit cap),
    winners stable across reruns and equal to hash-order selection;
    NULL labels dropped; prefix-scan path (no per-label window)."""
    from getl_spark.functions import sample as S

    rows = (
        [(i, "big") for i in range(600)]
        + [(1000 + i, "mid") for i in range(300)]
        + [(2000 + i, "small") for i in range(100)]
        + [(9999, None)]
    )
    df = spark.createDataFrame(rows, "id LONG, label STRING")
    out = S.balanced_downsample(df, "label", ["id"], seed=3)
    counts = {r.label: r.n for r in out.groupBy("label").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")).collect()}
    assert counts == {"big": 100, "mid": 100, "small": 100}
    # deterministic: identical winner id-sets on rerun
    ids1 = sorted(r.id for r in out.collect())
    ids2 = sorted(r.id for r in S.balanced_downsample(df, "label", ["id"], seed=3).collect())
    assert ids1 == ids2
    # matches explicit hash-order selection per class
    from getl_spark.functions.sample import _unit_hash
    hashed = df.where("label IS NOT NULL").withColumn("h", _unit_hash(["id"], 3)).collect()
    for lbl in ("big", "mid", "small"):
        want = sorted((r.h, r.id) for r in hashed if r.label == lbl)[:100]
        got = sorted(r.id for r in out.where(f"label = '{lbl}'").collect())
        assert got == sorted(i for _, i in want)

    # explicit cap; smaller classes keep everything they have
    capped = S.balanced_downsample(df, "label", ["id"], seed=3, label_cap=200)
    got = {r.label: r.n for r in capped.groupBy("label").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")).collect()}
    assert got == {"big": 200, "mid": 200, "small": 100}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="label_cap"):
        S.balanced_downsample(df, "label", ["id"], label_cap=0)


def test_ess_report_kish(spark):
    """Kish ESS vs a python reference; equal weights -> deff=1;
    NULL exclusion; all-zero NULL gate; negative weight fails loud."""
    import random

    rnd = random.Random(41)
    rows = [(i, "a", rnd.uniform(0.1, 5.0)) for i in range(300)] + [
        (i, "b", float(i % 7 == 0)) for i in range(300, 500)
    ]
    df = spark.createDataFrame(rows, "id LONG, g STRING, w DOUBLE")
    out = {r.g: r for r in sample.ess_report(df, "w", ["g"]).collect()}

    wa = [w for _, g, w in rows if g == "a"]
    ess = sum(wa) ** 2 / sum(x * x for x in wa)
    assert out["a"].n == 300
    assert out["a"].sum_w == pytest.approx(sum(wa), abs=1e-5)
    assert out["a"].ess == pytest.approx(ess, abs=1e-4)
    assert out["a"].deff == pytest.approx(300 / ess, abs=1e-6)
    assert out["a"].max_w_share == pytest.approx(max(wa) / sum(wa), abs=1e-6)
    # group b: 0/1 weights -> ess == number of weight-1 rows
    ones = sum(1 for _, g, w in rows if g == "b" and w == 1.0)
    assert out["b"].ess == pytest.approx(float(ones))
    assert out["b"].ess_ratio == pytest.approx(ones / 200, abs=1e-6)

    # equal weights: ess == n, deff == 1 exactly; NULLs excluded
    eq = spark.createDataFrame(
        [(1, 2.5), (2, 2.5), (3, None), (4, 2.5)], "id LONG, w DOUBLE"
    )
    r = sample.ess_report(eq, "w").collect()[0]
    assert (r.n, r.ess, r.deff, r.ess_ratio) == (3, 3.0, 1.0, 1.0)

    # all-zero weights: NULL ess family, zero sum
    z = spark.createDataFrame([(1, 0.0), (2, 0.0)], "id LONG, w DOUBLE")
    r = sample.ess_report(z, "w").collect()[0]
    assert r.n == 2 and r.sum_w == 0.0
    assert r.ess is None and r.deff is None and r.max_w_share is None

    # negative weight fails loudly
    neg = spark.createDataFrame([(1, 1.0), (2, -0.5)], "id LONG, w DOUBLE")
    with pytest.raises(Exception, match="negative weight"):
        sample.ess_report(neg, "w").collect()


def test_split_leakage_audit(spark):
    """Cross-split pairs surface as leaks; orientation/dup collapse;
    unassigned ids bucket under NULL (one-sided keeps the known
    split); shares sum to 1."""
    pairs = spark.createDataFrame(
        [
            (1, 2),   # train-train (safe)
            (2, 1),   # reversed dup of the same pair
            (3, 4),   # train-test LEAK
            (4, 3),   # reversed dup of the leak
            (5, 6),   # test-test (safe)
            (7, 8),   # 8 unassigned
            (9, 10),  # both unassigned
        ],
        "id_a LONG, id_b LONG",
    )
    asg = spark.createDataFrame(
        [(1, "train"), (2, "train"), (3, "train"), (4, "test"),
         (5, "test"), (6, "test"), (7, "train")],
        "doc_id LONG, split STRING",
    )
    from getl_spark.functions import sample as S

    out = {
        (r.split_a, r.split_b): (r.n_pairs, r.share)
        for r in S.split_leakage(pairs, asg).collect()
    }
    assert out[("train", "train")] == (1, 0.2)
    assert out[("test", "train")] == (1, 0.2)   # the leak, ordered
    assert out[("test", "test")] == (1, 0.2)
    assert out[("train", None)] == (1, 0.2)     # one-sided unassigned
    assert out[(None, None)] == (1, 0.2)
    assert len(out) == 5
    assert sum(s for _, s in out.values()) == pytest.approx(1.0)


# ------------------------------------------------------------ kcenter
def test_kcenter_hand_derivable_line(spark):
    """1-D points where every greedy step is hand-checkable: seed is
    the smallest id, then farthest-min-distance with (dist desc, id
    asc) tie-break; dist_at_selection decreases and the last value
    bounds the coverage radius."""
    pos = [0, 1, 2, 4, 8, 16, 32, 64, 100, 101]
    df = spark.createDataFrame(
        [(i, [float(p)]) for i, p in enumerate(pos)],
        "vec_id long, embedding array<double>",
    )
    rows = sample.kcenter(df, k=5).orderBy("selection_order").collect()
    assert [(r.vec_id, r.dist_at_selection) for r in rows] == [
        (0, None), (9, 101.0), (7, 37.0), (6, 32.0), (5, 16.0),
    ]
    ds = [r.dist_at_selection for r in rows[1:]]
    assert ds == sorted(ds, reverse=True)


def test_kcenter_differential_python_replay(spark):
    """Random 3-D pool: the distributed selection equals an exact
    pure-python greedy replay, selected set is k distinct ids, and
    duplicate points stop the selection early (mind == 0)."""
    import math
    import random

    rnd = random.Random(3)
    pts = [
        (i, [rnd.uniform(-1, 1) for _ in range(3)]) for i in range(80)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    got = [
        (r.vec_id, r.dist_at_selection)
        for r in sample.kcenter(df, k=8).orderBy("selection_order").collect()
    ]

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    vec = dict(pts)
    chosen = [0]
    mind = {i: d(v, vec[0]) for i, v in pts}
    want = [(0, None)]
    for _ in range(7):
        nxt = max(mind.items(), key=lambda kv: (kv[1], -kv[0]))
        want.append((nxt[0], nxt[1]))
        chosen.append(nxt[0])
        for i, v in pts:
            mind[i] = min(mind[i], d(v, vec[nxt[0]]))
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gd), (wi, wd) in zip(got[1:], want[1:]):
        assert abs(gd - wd) < 1e-9

    # duplicates exhaust diversity: only distinct points get selected
    dup = spark.createDataFrame(
        [(0, [0.0]), (1, [0.0]), (2, [5.0]), (3, [5.0])],
        "vec_id long, embedding array<double>",
    )
    short = sample.kcenter(dup, k=4).collect()
    assert sorted(r.vec_id for r in short) == [0, 2]


def test_kcenter_partition_invariant(spark):
    """The docstring promises the same selection on any cluster at any
    parallelism: 1 vs 32 input partitions must select identical ids in
    identical order with identical distances."""
    import random

    rnd = random.Random(17)
    pts = [(i, [rnd.uniform(-5, 5) for _ in range(4)]) for i in range(120)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    runs = []
    for parts in (1, 32):
        rows = (
            sample.kcenter(df.repartition(parts), k=6)
            .orderBy("selection_order")
            .collect()
        )
        runs.append([(r.vec_id, r.dist_at_selection) for r in rows])
    assert runs[0] == runs[1]


def test_kcenter_cosine_and_guards(spark):
    """Cosine metric selects by angle not magnitude; zero-norm vector
    fails loud under cosine; k/max_k/empty guards."""
    import math

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [10.0, 0.1]),          # same direction as 0, big norm
            (2, [0.0, 1.0]),           # orthogonal
            (3, [-1.0, 0.0]),          # opposite
        ],
        "vec_id long, embedding array<double>",
    )
    rows = (
        sample.kcenter(df, k=3, metric="cosine")
        .orderBy("selection_order")
        .collect()
    )
    # seed 0; farthest by angle is the opposite vector, then orthogonal
    assert [r.vec_id for r in rows] == [0, 3, 2]
    assert abs(rows[1].dist_at_selection - 2.0) < 1e-9
    assert abs(rows[2].dist_at_selection - 1.0) < 1e-9

    with pytest.raises(Exception, match="zero-norm"):
        sample.kcenter(
            spark.createDataFrame(
                [(0, [0.0, 0.0]), (1, [1.0, 0.0])],
                "vec_id long, embedding array<double>",
            ),
            k=2,
            metric="cosine",
        )
    with pytest.raises(ValueError, match="max_k"):
        sample.kcenter(df, k=2000)
    with pytest.raises(ValueError, match="k must"):
        sample.kcenter(df, k=0)
    with pytest.raises(ValueError, match="no non-null"):
        sample.kcenter(df.where("vec_id < 0"), k=2)
    with pytest.raises(ValueError, match="unknown metric"):
        sample.kcenter(df, k=2, metric="manhattan")


# ----------------------------------------------------------------- DSIR


def _dsir_ref(raw_docs, tgt_docs, min_count=2, smoothing=0.5, agg="mean"):
    """Pure-python DSIR replay: docs = [(id, text)]."""
    import math
    import re
    from collections import Counter

    def words(text):
        t = re.sub(r"[ \n]+", " ", re.sub(r"[^a-z0-9 \n]", " ", text.lower()))
        return [w for w in t.strip().split(" ") if w]

    cr = Counter(w for _, t in raw_docs for w in words(t))
    vocab = {w for w, c in cr.items() if c >= min_count}
    ct = Counter(
        w for _, t in tgt_docs for w in words(t) if w in vocab
    )
    tr = sum(cr[w] for w in vocab)
    tt = sum(ct.values())
    v = len(vocab)
    s = smoothing

    def lw(w):
        a = math.log((ct[w] if w in vocab else 0) + s) - math.log(
            tt + s * (v + 1)
        )
        b = math.log((cr[w] if w in vocab else 0) + s) - math.log(
            tr + s * (v + 1)
        )
        return a - b

    out = {}
    for i, t in raw_docs:
        ws = words(t)
        if not ws:
            continue
        vals = [lw(w) for w in ws]
        out[i] = (
            len(vals),
            sum(vals) / len(vals) if agg == "mean" else sum(vals),
        )
    return out


RAW_DOCS = [
    (1, "the cat sat on the mat with the cat"),
    (2, "stock market prices rose as the market rallied"),
    (3, "the dog and the cat played on the mat"),
    (4, "market analysts expect prices to rise in the market"),
    (5, "a cat a mat a cat"),
    (6, "!!! ??? ..."),  # no words after normalization -> dropped
]
TGT_DOCS = [
    (101, "the cat sat quietly on the mat"),
    (102, "a cat and a dog share the mat"),
    (103, "the cat chased the dog around the mat"),
]


def _dsir_dfs(spark):
    raw = spark.createDataFrame(RAW_DOCS, "doc_id LONG, text STRING")
    tgt = spark.createDataFrame(TGT_DOCS, "doc_id LONG, text STRING")
    return raw, tgt


def test_dsir_weights_match_reference(spark):
    raw, tgt = _dsir_dfs(spark)
    for agg in ("mean", "sum"):
        got = {
            r.doc_id: (r.n_tokens, r.logw)
            for r in sample.dsir_weights(raw, tgt, agg=agg).collect()
        }
        want = _dsir_ref(RAW_DOCS, TGT_DOCS, agg=agg)
        assert set(got) == set(want)  # doc 6 dropped in both
        for i in want:
            assert got[i][0] == want[i][0], i
            assert abs(got[i][1] - want[i][1]) < 1e-9, i
    # cat/mat docs (target-like) outscore the market docs
    got = {
        r.doc_id: r.logw
        for r in sample.dsir_weights(raw, tgt).collect()
    }
    assert min(got[1], got[3], got[5]) > max(got[2], got[4])


def test_dsir_weights_partition_invariant(spark):
    raw, tgt = _dsir_dfs(spark)
    a = sorted(
        (r.doc_id, r.n_tokens, round(r.logw, 9))
        for r in sample.dsir_weights(raw.repartition(1), tgt).collect()
    )
    b = sorted(
        (r.doc_id, r.n_tokens, round(r.logw, 9))
        for r in sample.dsir_weights(raw.repartition(7), tgt.repartition(3)).collect()
    )
    assert a == b


def test_dsir_select_topk_and_gumbel(spark):
    raw, tgt = _dsir_dfs(spark)
    top = sample.dsir_select(raw, tgt, k=3).collect()
    assert [r.selection_rank for r in sorted(top, key=lambda r: r.selection_rank)] == [1, 2, 3]
    want = _dsir_ref(RAW_DOCS, TGT_DOCS)
    best3 = sorted(want, key=lambda i: (-want[i][1], i))[:3]
    assert sorted(r.doc_id for r in top) == sorted(best3)

    # gumbel: deterministic under the same seed, any partitioning
    g1 = sorted(
        (r.doc_id, r.selection_rank)
        for r in sample.dsir_select(
            raw.repartition(5), tgt, k=3, temperature=1.0, seed=7
        ).collect()
    )
    g2 = sorted(
        (r.doc_id, r.selection_rank)
        for r in sample.dsir_select(
            raw.repartition(2), tgt, k=3, temperature=1.0, seed=7
        ).collect()
    )
    assert g1 == g2 and len(g1) == 3

    with pytest.raises(ValueError, match="k must be"):
        sample.dsir_select(raw, tgt, k=0)
    with pytest.raises(ValueError, match="temperature"):
        sample.dsir_select(raw, tgt, k=2, temperature=-1.0)
    with pytest.raises(ValueError, match="min_count"):
        sample.dsir_weights(raw, tgt, min_count=0)
    with pytest.raises(ValueError, match="smoothing"):
        sample.dsir_weights(raw, tgt, smoothing=0.0)
    with pytest.raises(ValueError, match="agg"):
        sample.dsir_weights(raw, tgt, agg="median")


# ------------------------------------------------------- match target mix


def test_match_distribution_hits_target(spark):
    # skewed corpus: 600 web, 300 code, 100 books
    rows = (
        [(i, "web") for i in range(600)]
        + [(1000 + i, "code") for i in range(300)]
        + [(2000 + i, "books") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id LONG, src STRING")
    out = sample.match_distribution(
        df, "src", {"web": 0.5, "code": 0.3, "books": 0.2}, ["doc_id"]
    )
    got = {r.src: r.cnt for r in out.groupBy("src").agg(
        F.count("*").alias("cnt")).collect()}
    # bottleneck: books 100 / 0.2 -> T = 500 -> {web: 250, code: 150,
    # books: 100} — books keeps everything, exact counts elsewhere
    assert got == {"web": 250, "code": 150, "books": 100}
    # classes absent from the target are dropped
    df2 = df.union(spark.createDataFrame([(9000, "spam")], df.schema))
    out2 = sample.match_distribution(
        df2, "src", {"web": 0.5, "code": 0.5}, ["doc_id"]
    )
    assert out2.where("src = 'spam'").count() == 0
    assert out2.where("src = 'books'").count() == 0
    # determinism across partitionings
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in sample.match_distribution(
            df.repartition(17), "src",
            {"web": 0.5, "code": 0.3, "books": 0.2}, ["doc_id"],
        ).collect()
    )
    assert a == b
    # shares normalize (5/3/2 == 0.5/0.3/0.2)
    c = sorted(
        r.doc_id
        for r in sample.match_distribution(
            df, "src", {"web": 5, "code": 3, "books": 2}, ["doc_id"]
        ).collect()
    )
    assert a == c


def test_match_distribution_guards(spark):
    df = spark.createDataFrame([(1, "web")], "doc_id LONG, src STRING")
    with pytest.raises(ValueError, match="non-empty"):
        sample.match_distribution(df, "src", {}, ["doc_id"])
    with pytest.raises(ValueError, match="share"):
        sample.match_distribution(df, "src", {"web": 0.0}, ["doc_id"])
    with pytest.raises(ValueError, match="no rows"):
        sample.match_distribution(
            df, "src", {"web": 0.5, "books": 0.5}, ["doc_id"]
        )


def test_match_distribution_bottleneck_keeps_everything_exactly(spark):
    """The float-rounding trap: share 0.1 with 3 bottleneck rows makes
    int(0.1 * (3/0.1)) == 2 — the cap must be counts[k] exactly."""
    rows = [(i, "web") for i in range(90)] + [(100 + i, "rare") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id LONG, src STRING")
    out = sample.match_distribution(
        df, "src", {"web": 0.9, "rare": 0.1}, ["doc_id"]
    )
    got = {r[0]: r[1] for r in out.groupBy("src").count().collect()}
    assert got["rare"] == 3  # bottleneck class keeps everything
    assert got["web"] == 27  # 3/0.1 * 0.9

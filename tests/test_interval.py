"""Bucketized interval join vs naive inequality-join ground truth."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from getl_spark.functions import interval


def _naive(points, intervals, keys, closed):
    out = set()
    for pk, p, pid in points:
        for ik, s, e, iid in intervals:
            if keys and pk != ik:
                continue
            lo = s <= p if closed in ("both", "left") else s < p
            hi = p <= e if closed in ("both", "right") else p < e
            if lo and hi:
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
def test_interval_join_matches_naive(spark, closed):
    rng = random.Random(3)
    points = [(rng.randrange(3), rng.randrange(200), i) for i in range(150)]
    intervals = []
    for i in range(60):
        s = rng.randrange(200)
        intervals.append((rng.randrange(3), s, s + rng.randrange(0, 40), i))

    pdf = spark.createDataFrame(points, "k INT, p INT, pid INT")
    idf = spark.createDataFrame(intervals, "k INT, s INT, e INT, iid INT")
    got = {
        (r.pid, r.iid)
        for r in interval.join(
            pdf, idf, "p", "s", "e", bucket_width=16, on="k", closed=closed
        ).collect()
    }
    assert got == _naive(points, intervals, keys=True, closed=closed)


def test_interval_join_no_keys_and_wide_intervals(spark):
    # interval spanning many buckets still matches exactly once
    pdf = spark.createDataFrame([(5, 0), (99, 1), (100, 2)], "p INT, pid INT")
    idf = spark.createDataFrame([(0, 100, 0)], "s INT, e INT, iid INT")
    got = {
        (r.pid, r.iid)
        for r in interval.join(pdf, idf, "p", "s", "e", bucket_width=3).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0)}


def test_interval_join_column_collision_suffix(spark):
    pdf = spark.createDataFrame([(10, "pt")], "p INT, tag STRING")
    idf = spark.createDataFrame([(5, 15, "iv")], "s INT, e INT, tag STRING")
    row = interval.join(pdf, idf, "p", "s", "e", bucket_width=10).collect()[0]
    assert row.tag == "pt" and row.tag_iv == "iv"


def test_interval_join_validation(spark):
    pdf = spark.createDataFrame([(1,)], "p INT")
    with pytest.raises(ValueError, match="closed"):
        interval.join(pdf, pdf, "p", "p", "p", 1, closed="open")
    with pytest.raises(ValueError, match="bucket_width"):
        interval.join(pdf, pdf, "p", "p", "p", 0)


def test_interval_join_negative_values(spark):
    pdf = spark.createDataFrame([(-7, 0), (0, 1)], "p INT, pid INT")
    idf = spark.createDataFrame([(-10, -5, 0), (-1, 1, 1)], "s INT, e INT, iid INT")
    got = {
        (r.pid, r.iid)
        for r in interval.join(pdf, idf, "p", "s", "e", bucket_width=4).collect()
    }
    assert got == {(0, 0), (1, 1)}


def test_interval_join_yaml_two_input(spark, tmp_path):
    from getl_spark import lift

    p_path, i_path = str(tmp_path / "p"), str(tmp_path / "i")
    spark.createDataFrame([(10, 0), (50, 1)], "p INT, pid INT").write.parquet(p_path)
    spark.createDataFrame([(5, 15, 7)], "s INT, e INT, iid INT").write.parquet(i_path)
    log = lift(
        spark,
        f"""
LiftJob:
  P:
    Type: load::batch_parquet
    Properties: {{Path: {p_path}}}
  I:
    Type: load::batch_parquet
    Properties: {{Path: {i_path}}}
  J:
    Type: transform::generic
    Input: [P, I]
    Properties:
      Functions:
        - interval.join: {{point_col: p, start_col: s, end_col: e, bucket_width: 8}}
""",
    )
    got = {(r.pid, r.iid) for r in log.get("J").collect()}
    assert got == {(0, 7)}


def test_interval_join_plan_is_hash_join_not_nested_loop(spark):
    """The reason this operator exists: the plan must be an equi
    (hash/sort-merge) join on the bucket, never BroadcastNestedLoop or
    a cartesian product."""
    pdf = spark.range(1000).select(F.col("id").alias("p"), F.col("id").alias("pid"))
    idf = spark.range(100).select(
        (F.col("id") * 10).alias("s"), (F.col("id") * 10 + 5).alias("e"),
        F.col("id").alias("iid"),
    )
    plan = interval.join(pdf, idf, "p", "s", "e", bucket_width=8)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan


def test_interval_join_malformed_intervals_dropped(spark):
    pdf = spark.createDataFrame([(5, 0)], "p INT, pid INT")
    idf = spark.createDataFrame([(10, 2, 0), (4, 6, 1)], "s INT, e INT, iid INT")
    got = {
        (r.pid, r.iid)
        for r in interval.join(pdf, idf, "p", "s", "e", bucket_width=4).collect()
    }
    assert got == {(0, 1)}


# ----------------------------------------------------------- overlap_join
def test_overlap_join_matches_naive_inequality(spark):
    """Differential vs the naive O(n*m) inequality join on random
    intervals: identical pair sets, each pair exactly once."""
    import random

    rng = random.Random(5)
    lrows = [
        (i, s, s + rng.randrange(1, 40))
        for i, s in ((i, rng.randrange(0, 300)) for i in range(80))
    ]
    rrows = [
        (j, s, s + rng.randrange(1, 25))
        for j, s in ((j, rng.randrange(0, 300)) for j in range(60))
    ]
    left = spark.createDataFrame(lrows, "lid long, s long, e long")
    right = spark.createDataFrame(rrows, "rid long, s long, e long")
    got = [
        (r.lid, r.rid)
        for r in interval.overlap_join(
            left, right, "s", "e", bucket_width=16
        ).collect()
    ]
    naive = {
        (li, ri)
        for li, ls, le in lrows
        for ri, rs_, re_ in rrows
        if ls <= re_ and rs_ <= le
    }
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == naive

    # strict overlap drops touching endpoints
    strict = {
        (r.lid, r.rid)
        for r in interval.overlap_join(
            left, right, "s", "e", bucket_width=16, closed="neither"
        ).collect()
    }
    naive_strict = {
        (li, ri)
        for li, ls, le in lrows
        for ri, rs_, re_ in rrows
        if ls < re_ and rs_ < le
    }
    assert strict == naive_strict


def test_overlap_join_keys_suffix_and_validation(spark):
    import pytest

    left = spark.createDataFrame(
        [("a", 0, 10, "L0"), ("b", 0, 10, "L1")], "k string, s long, e long, tag string"
    )
    right = spark.createDataFrame(
        [("a", 5, 15, "R0"), ("b", 20, 30, "R1")], "k string, s long, e long, tag string"
    )
    out = interval.overlap_join(left, right, "s", "e", bucket_width=8, on="k").collect()
    # only key 'a' overlaps; collision columns get the suffix
    assert len(out) == 1
    r = out[0]
    assert r.k == "a" and r.tag == "L0" and r.tag_right == "R0"
    assert r.s_right == 5 and r.e_right == 15
    with pytest.raises(ValueError):
        interval.overlap_join(left, right, "s", "e", bucket_width=0)
    with pytest.raises(ValueError):
        interval.overlap_join(left, right, "s", "e", bucket_width=8, closed="left")


def test_overlap_join_plan_no_nested_loop(spark):
    left = spark.createDataFrame([(1, 0, 10)], "lid long, s long, e long")
    right = spark.createDataFrame([(2, 5, 15)], "rid long, s long, e long")
    plan = (
        interval.overlap_join(left, right, "s", "e", bucket_width=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_islands_and_min_gap(spark):
    """Island merging equals the sequential sweep: touch merges,
    min_gap bridges holes, NULL keys form a real group, numbering is
    1..k in time order."""
    from getl_spark.functions import interval

    rows = [
        ("a", 0.0, 10.0), ("a", 5.0, 12.0), ("a", 12.0, 15.0),
        ("a", 20.0, 25.0),
        ("b", 1.0, 2.0), ("b", 4.0, 5.0),
        (None, 0.0, 1.0), (None, 0.5, 2.0),
        ("a", None, 3.0),  # null endpoint excluded
    ]
    df = spark.createDataFrame(rows, "k STRING, s DOUBLE, e DOUBLE")
    m = sorted(
        (tuple(r) for r in interval.merge(df, "s", "e", group_by="k").collect()),
        key=lambda t: (t[0] or "", t[1]),
    )
    assert m == [
        (None, 1, 0.0, 2.0, 2),
        ("a", 1, 0.0, 15.0, 3), ("a", 2, 20.0, 25.0, 1),
        ("b", 1, 1.0, 2.0, 1), ("b", 2, 4.0, 5.0, 1),
    ]
    m2 = interval.merge(
        df.where("k = 'b'"), "s", "e", group_by="k", min_gap=2.0
    ).collect()
    assert len(m2) == 1 and (m2[0]["start"], m2[0]["end"]) == (1.0, 5.0)
    # end < start fails loudly
    bad = spark.createDataFrame([(2.0, 1.0)], "s DOUBLE, e DOUBLE")
    with pytest.raises(Exception, match="end must be >= start"):
        interval.merge(bad, "s", "e").collect()


def test_merge_matches_sequential_sweep_randomized(spark):
    import random

    from getl_spark.functions import interval

    rnd = random.Random(41)
    rows = []
    for k in ("x", "y"):
        for _ in range(300):
            s = rnd.uniform(0, 1000)
            rows.append((k, round(s, 2), round(s + rnd.uniform(0, 30), 2)))
    df = spark.createDataFrame(rows, "k STRING, s DOUBLE, e DOUBLE")

    def sweep(iv):
        out = []
        for s, e in sorted(iv):
            if out and s <= out[-1][1]:
                out[-1][1] = max(out[-1][1], e)
            else:
                out.append([s, e])
        return [(i + 1, s, e) for i, (s, e) in enumerate(out)]

    got = {}
    for r in interval.merge(df, "s", "e", group_by="k").collect():
        got.setdefault(r["k"], []).append((r["island"], r["start"], r["end"]))
    for k in ("x", "y"):
        want = sweep([(s, e) for kk, s, e in rows if kk == k])
        assert sorted(got[k]) == want


def test_coverage_summary(spark):
    from getl_spark.functions import interval

    rows = [
        ("a", 0.0, 10.0), ("a", 5.0, 12.0), ("a", 12.0, 15.0),
        ("a", 20.0, 25.0),
        ("b", 1.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "k STRING, s DOUBLE, e DOUBLE")
    c = {r["k"]: r for r in interval.coverage(df, "s", "e", group_by="k").collect()}
    a = c["a"]
    assert (a["n_intervals"], a["n_islands"]) == (4, 2)
    assert (a["covered"], a["span"], a["largest_gap"]) == (20.0, 25.0, 5.0)
    b = c["b"]
    assert (b["covered"], b["span"], b["largest_gap"]) == (1.0, 1.0, None)


def test_gaps_named_holes(spark):
    """gaps == complement of merge: internal holes, min_gap bridging,
    horizon edge gaps, multi-group isolation, random differential vs
    a python sweep."""
    from getl_spark.functions import interval

    rows = [
        ("a", 0.0, 10.0), ("a", 5.0, 12.0), ("a", 12.0, 15.0),
        ("a", 20.0, 25.0), ("a", 30.0, 31.0),
        ("b", 1.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "k STRING, s DOUBLE, e DOUBLE")
    got = sorted(
        (r.k, r.start, r.end, r.duration)
        for r in interval.gaps(df, "s", "e", group_by="k").collect()
    )
    assert got == [("a", 15.0, 20.0, 5.0), ("a", 25.0, 30.0, 5.0)]

    # min_gap=5 bridges both holes
    assert interval.gaps(df, "s", "e", group_by="k", min_gap=5.0).count() == 0

    # horizons add the leading and trailing stretches
    got = sorted(
        (r.k, r.start, r.end)
        for r in interval.gaps(
            df, "s", "e", group_by="k",
            horizon_start=-5.0, horizon_end=40.0,
        ).collect()
    )
    assert got == [
        ("a", -5.0, 0.0), ("a", 15.0, 20.0), ("a", 25.0, 30.0),
        ("a", 31.0, 40.0),
        ("b", -5.0, 1.0), ("b", 2.0, 40.0),
    ]
    # a horizon the data already reaches adds nothing
    assert (
        interval.gaps(
            df.where("k = 'a'"), "s", "e",
            horizon_start=0.0, horizon_end=31.0,
        ).count()
        == 2
    )

    # random differential vs python sweep
    import random

    rnd = random.Random(7)
    rows = [
        ("g", float(s), float(s + rnd.randint(1, 8)))
        for s in rnd.sample(range(200), 60)
    ]
    df = spark.createDataFrame(rows, "k STRING, s DOUBLE, e DOUBLE")

    def sweep(iv):
        iv = sorted(iv)
        out, cur_s, cur_e = [], iv[0][0], iv[0][1]
        for s, e in iv[1:]:
            if s > cur_e:
                out.append((cur_e, s))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        return out

    want = sweep([(s, e) for _, s, e in rows])
    got = sorted(
        (r.start, r.end) for r in interval.gaps(df, "s", "e").collect()
    )
    assert got == want

"""Connected-components clustering and as-of join."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, functions as F

from getl_spark.functions import asof, graph


def _brute_components(edges, nodes):
    """Driver-side union-find ground truth."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label by component min
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_components_basic_clusters(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        (r["doc_id"], r["component"])
        for r in graph.cluster_components(df).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)}


def test_components_long_chain_converges_fast(spark):
    # a 200-node path is the worst case for plain label propagation;
    # large-star/small-star must still finish within its iteration guard
    # (driver_threshold=0 forces the distributed loop)
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = graph.cluster_components(df, max_iter=12, driver_threshold=0).collect()
    assert len(out) == 201
    assert {r["component"] for r in out} == {0}


def test_components_driver_and_distributed_paths_agree(spark):
    rng = random.Random(13)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = {
        (r["doc_id"], r["component"])
        for r in graph.cluster_components(df).collect()
    }
    slow = {
        (r["doc_id"], r["component"])
        for r in graph.cluster_components(df, driver_threshold=0).collect()
    }
    assert fast == slow


def test_components_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(120))
    edges = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    truth = _brute_components(edges, nodes)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
    edges_df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["doc_id"]: r["component"]
        for r in graph.cluster_components(edges_df, nodes=nodes_df).collect()
    }
    assert got == truth


def test_components_empty_and_isolated(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(5,), (9,)], ["doc_id"])
    got = {
        (r["doc_id"], r["component"])
        for r in graph.cluster_components(edges, nodes=nodes).collect()
    }
    assert got == {(5, 5), (9, 9)}


def test_dedup_by_component_keeps_cluster_min(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(6)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 3), (3, 5), (1, 4)], ["id_a", "id_b"])
    kept = {r["doc_id"] for r in graph.dedup_by_component(df, pairs).collect()}
    assert kept == {0, 1, 2}


def test_dedup_by_component_quality_winner(spark):
    """quality_col keeps the BEST duplicate per cluster (max quality,
    id tiebreak) instead of the min id; nulls lose to any score."""
    df = spark.createDataFrame(
        [(0, 0.2), (1, 0.9), (3, 0.9), (4, None), (5, 0.5), (9, 0.1)],
        "doc_id BIGINT, quality DOUBLE",
    )
    # clusters: {0,1,3} and {4,5}; 9 unpaired
    pairs = spark.createDataFrame([(0, 1), (1, 3), (4, 5)], ["id_a", "id_b"])
    kept = {
        r.doc_id
        for r in graph.dedup_by_component(
            df, pairs, quality_col="quality"
        ).collect()
    }
    # cluster 1: 1 and 3 tie at 0.9 -> lower id 1 wins; cluster 2: null
    # loses to 0.5 -> 5 wins; 9 untouched
    assert kept == {1, 5, 9}


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 25, "l2"), (1, 5, "l0"), (2, 40, "l3")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 50, 9.0)], ["k", "ts", "val"]
    )
    out = {
        r["tag"]: (r["ts_right"], r["val"])
        for r in asof.join(left, right, on="k", left_ts="ts").collect()
    }
    # inclusive at equal ts, latest-at-or-before otherwise, NULL when none
    assert out == {
        "l0": (None, None),
        "l1": (10, 1.0),
        "l2": (20, 2.0),
        "l3": (None, None),
    }


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame([(1, 10), (1, 100)], ["k", "ts"])
    right = spark.createDataFrame([(1, 12, "a"), (1, 300, "b")], ["k", "ts", "v"])
    fwd = {
        r["ts"]: r["v"]
        for r in asof.join(left, right, on="k", left_ts="ts", direction="forward").collect()
    }
    assert fwd == {10: "a", 100: "b"}
    tol = {
        r["ts"]: r["v"]
        for r in asof.join(
            left, right, on="k", left_ts="ts", direction="forward", tolerance=F.lit(50)
        ).collect()
    }
    assert tol == {10: "a", 100: None}


def test_asof_null_right_value_still_matches(spark):
    # a right row whose VALUE is null must still win over an older row
    left = spark.createDataFrame([(1, 30)], ["k", "ts"])
    right = spark.createDataFrame(
        [Row(k=1, ts=10, v="old"), Row(k=1, ts=20, v=None)], ["k", "ts", "v"]
    )
    row = asof.join(left, right, on="k", left_ts="ts").collect()[0]
    assert row["ts_right"] == 20 and row["v"] is None


def test_asof_matches_pandas_merge_asof(spark):
    import pandas as pd

    rng = random.Random(11)
    lrows = [(rng.randrange(4), rng.randrange(1000)) for _ in range(300)]
    rrows = [
        (rng.randrange(4), rng.randrange(1000), rng.random()) for _ in range(200)
    ]
    left = spark.createDataFrame(lrows, ["k", "ts"]).withColumn(
        "rid", F.monotonically_increasing_id()
    )
    right = spark.createDataFrame(rrows, ["k", "ts", "val"])
    # pandas merge_asof needs unique right (k, ts); dedup to max val
    rpdf = (
        pd.DataFrame(rrows, columns=["k", "ts", "val"])
        .groupby(["k", "ts"], as_index=False)["val"]
        .max()
        .sort_values("ts")
    )
    rdf = spark.createDataFrame(rpdf)
    got = (
        asof.join(left, rdf, on="k", left_ts="ts")
        .orderBy("rid")
        .toPandas()
    )
    lpdf = got[["k", "ts", "rid"]].sort_values("ts")
    expect = pd.merge_asof(lpdf, rpdf, on="ts", by="k", direction="backward")
    expect = expect.sort_values("rid")
    assert list(got.sort_values("rid")["val"].fillna(-1).round(9)) == list(
        expect["val"].fillna(-1).round(9)
    )


def test_asof_join_yaml_block(spark, tmp_path):
    """transform::asof_join as a two-input lift block, with tolerance."""
    from getl_spark import lift

    left_p, right_p = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(
        [(1, 10), (1, 100), (2, 50)], "k BIGINT, ts BIGINT"
    ).write.parquet(left_p)
    spark.createDataFrame(
        [(1, 8, "a"), (1, 20, "b"), (2, 49, "c")], "k BIGINT, ts BIGINT, v STRING"
    ).write.parquet(right_p)

    log = lift(
        spark,
        f"""
LiftJob:
  L:
    Type: load::batch_parquet
    Properties: {{Path: {left_p}}}
  R:
    Type: load::batch_parquet
    Properties: {{Path: {right_p}}}
  A:
    Type: transform::asof_join
    Input: [L, R]
    Properties:
      JoinOn: k
      LeftTime: ts
      Tolerance: 10
""",
    )
    out = {(r.k, r.ts): r.v for r in log.get("A").collect()}
    # (1,100): nearest prior is ts=20, 80 away > tolerance 10 → null
    assert out == {(1, 10): "a", (1, 100): None, (2, 50): "c"}


def test_components_hub_skew(spark):
    """A 500-spoke star (one hub) is the worst-case skew key for the
    self-join family; large-star/small-star must converge in few rounds
    and label everything with the min."""
    edges = [(250, i) for i in range(500) if i != 250]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = graph.cluster_components(df, max_iter=6).collect()
    assert len(out) == 500
    assert {r["component"] for r in out} == {0}


def test_asof_join_as_generic_head_with_join_on(spark, tmp_path):
    """asof.join as the two-input head of transform::generic, using the
    YAML-safe join_on alias."""
    from getl_spark import lift

    lp, rp = str(tmp_path / "gl"), str(tmp_path / "gr")
    spark.createDataFrame([(1, 10)], "k BIGINT, ts BIGINT").write.parquet(lp)
    spark.createDataFrame([(1, 7, "m")], "k BIGINT, ts BIGINT, v STRING").write.parquet(rp)
    log = lift(
        spark,
        f"""
LiftJob:
  L:
    Type: load::batch_parquet
    Properties: {{Path: {lp}}}
  R:
    Type: load::batch_parquet
    Properties: {{Path: {rp}}}
  A:
    Type: transform::generic
    Input: [L, R]
    Properties:
      Functions:
        - asof.join: {{join_on: k, left_ts: ts}}
""",
    )
    row = log.get("A").collect()[0]
    assert row.v == "m" and row.ts_right == 7


def test_asof_plan_single_window_no_join(spark):
    """asof.join compiles to union + one window pass — no join operator
    at all, hence no range-explosion risk."""
    left = spark.range(100).select(F.col("id").alias("k"), F.col("id").alias("ts"))
    right = spark.range(50).select(F.col("id").alias("k"), F.col("id").alias("ts"), F.col("id").alias("v"))
    plan = asof.join(left, right, on="k", left_ts="ts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_components_string_ids(spark):
    """Node ids only need to be orderable — string doc ids cluster with
    lexicographic-min labels."""
    edges = [("docB", "docA"), ("docB", "docC"), ("x", "y")]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        (r["doc_id"], r["component"])
        for r in graph.cluster_components(df).collect()
    }
    assert got == {
        ("docA", "docA"), ("docB", "docA"), ("docC", "docA"),
        ("x", "x"), ("y", "x"),
    }


# ------------------------------------------------------------- pagerank
def _numpy_pagerank(edges, damping=0.85, n_iter=10):
    """Independent dense reference with the exact documented semantics:
    distinct edges, dangling mass redistributed uniformly."""
    import numpy as np

    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - damping) / n)
        dangling = sum(r[idx[x]] for x in nodes if x not in outdeg)
        nxt += damping * dangling / n
        for u, v in edges:
            nxt[idx[v]] += damping * r[idx[u]] / outdeg[u]
        r = nxt
    return {node: round(float(r[idx[node]]), 6) for node in nodes}


def test_pagerank_matches_dense_reference(spark):
    """Random directed graph with dangling nodes and parallel edges vs
    an independent numpy power iteration."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(40)) for _ in range(150)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in graph.pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert got == want


def test_pagerank_plan_has_no_cartesian_product(spark, monkeypatch):
    """The per-iteration dangling-mass join is an explicitly broadcast
    1-row aggregate: the physical plan across iterations must never
    degrade to CartesianProduct (a shuffle-both-sides product would be
    the scale killer at 10⁹ nodes). localCheckpoint is stubbed to
    identity so every iteration's join survives into one inspectable
    lineage."""
    import random

    rng = random.Random(3)
    edges = [(rng.randrange(20), rng.randrange(25)) for _ in range(60)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is an
    # abstract base in Spark 4; subclass methods would shadow a base patch)
    monkeypatch.setattr(
        type(df), "localCheckpoint", lambda self, *a, **k: self
    )
    plan = (
        graph.pagerank(df, n_iter=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row dangling join


def test_pagerank_mass_conserved_and_authority_ordering(spark):
    """Σrank = 1 (dangling mass recycled, not leaked) and a node every
    other node links to outranks the rest."""
    edges = [(i, 0) for i in range(1, 10)] + [(0, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = graph.pagerank(df).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-4
    ranks = {r["node"]: r["rank"] for r in rows}
    # 0 collects 9 in-links; 1 receives 0's ENTIRE out-flow — those two
    # dominate, and every other node sits at the shared teleport floor
    floor = ranks[2]
    assert sorted(ranks.values())[-2:] == sorted([ranks[0], ranks[1]])
    assert all(ranks[i] == floor for i in range(2, 10))
    assert ranks[0] > floor and ranks[1] > floor


def test_pagerank_isolated_nodes_get_teleport_floor(spark):
    """Nodes passed via `nodes` with no edges at all still score: they
    hold teleport + dangling share (they ARE dangling)."""
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    nodes = spark.createDataFrame([(1,), (2,), (99,)], ["node"])
    ranks = {
        r["node"]: r["rank"]
        for r in graph.pagerank(edges, nodes=nodes).collect()
    }
    assert set(ranks) == {1, 2, 99}
    assert ranks[99] > 0
    # 1 and 99 have identical in-flows (teleport + dangling share only),
    # so they tie; 2 additionally receives all of 1's out-flow
    assert ranks[2] > ranks[1] == ranks[99]


def test_pagerank_oracle_sql_matches_spark(spark):
    """The unrolled-CTE oracle generator replicates the DataFrame
    implementation value-for-value in DuckDB."""
    import duckdb

    edges = [(f"n{i}", f"n{(i * 3 + 1) % 7}") for i in range(7)] + [
        ("n0", "hub"), ("n3", "hub"), ("n5", "hub"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r["node"], r["rank"]) for r in graph.pagerank(df, n_iter=5).collect()}
    values = ", ".join(f"('{u}', '{v}')" for u, v in edges)
    sql = graph.pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", n_iter=5
    )
    want = set(duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_pagerank_validates_params(spark):
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="damping"):
        graph.pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        graph.pagerank(df, n_iter=0)


def test_pagerank_null_nodes_are_ignored(spark):
    """A NULL in the optional nodes frame must not inflate N or emit a
    null-keyed rank row (edge-side nulls are already dropped)."""
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    nodes = spark.createDataFrame([(1,), (2,), (None,)], "node BIGINT")
    rows = graph.pagerank(edges, nodes=nodes).collect()
    assert {r["node"] for r in rows} == {1, 2}
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-4


def test_pagerank_weighted_matches_dense_reference(spark):
    """Weighted edges: rank flows proportional to weight/out-weight;
    duplicates sum; non-positive weights are dropped. Checked against
    an independent numpy reference."""
    import numpy as np

    edges = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
        (0, 1, 1.0),          # duplicate → weight sums to 4.0
        (3, 0, 0.0), (3, 1, -2.0),  # dropped → 3 is dangling
        (3, 2, 5.0),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, weight_col="w").collect()
    }
    # independent reference with the same semantics
    agg = {}
    for u, v, w in edges:
        if w > 0:
            agg[(u, v)] = agg.get((u, v), 0.0) + w
    nodes = sorted({u for u, _ in agg} | {v for _, v in agg})
    idx = {nd: i for i, nd in enumerate(nodes)}
    n = len(nodes)
    outw = {}
    for (u, _), w in agg.items():
        outw[u] = outw.get(u, 0.0) + w
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        nxt = np.full(n, 0.15 / n)
        dangling = sum(r[idx[x]] for x in nodes if x not in outw)
        nxt += 0.85 * dangling / n
        for (u, v), w in agg.items():
            nxt[idx[v]] += 0.85 * r[idx[u]] * w / outw[u]
        r = nxt
    want = {nd: round(float(r[idx[nd]]), 6) for nd in nodes}
    assert got == want


def test_pagerank_weighted_oracle_sql_matches_spark(spark):
    import duckdb

    edges = [("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 3.0), ("c", "a", 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        (r["node"], r["rank"])
        for r in graph.pagerank(df, weight_col="w", n_iter=5).collect()
    }
    values = ", ".join(f"('{u}', '{v}', {w})" for u, v, w in edges)
    sql = graph.pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst, w)",
        n_iter=5,
        weighted=True,
    )
    want = set(duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_pagerank_unweighted_equals_weight_one(spark):
    """weight_col with all-1.0 weights must reproduce the unweighted
    result exactly (on a duplicate-free edge list — duplicates
    deliberately collapse when unweighted but SUM when weighted)."""
    import random

    rng = random.Random(3)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    df = spark.createDataFrame(edges, ["src", "dst"])
    dfw = df.select("src", "dst", F.lit(1.0).alias("w"))
    a = sorted(map(tuple, graph.pagerank(df).collect()))
    b = sorted(map(tuple, graph.pagerank(dfw, weight_col="w").collect()))
    assert a == b


def test_asof_nearest_hand_cases(spark):
    """nearest: closer-before, closer-after, exact tie (backward
    wins), tolerance nulls both sides, unmatched key stays NULL."""
    left = spark.createDataFrame(
        [(1, 100), (1, 210), (1, 150), (2, 50)], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 200, "b")], ["k", "ts", "val"]
    )
    out = {
        (r.k, r.ts): (r.ts_right, r.val)
        for r in asof.join(
            left, right, on="k", left_ts="ts", direction="nearest"
        ).collect()
    }
    assert out[(1, 100)] == (90, "a")    # 10 back beats 100 fwd
    assert out[(1, 210)] == (200, "b")   # 10 fwd beats 120 back
    assert out[(1, 150)] == (200, "b")   # 50 fwd beats 60 back
    assert out[(2, 50)] == (None, None)  # no right rows for key 2

    # exact tie: right at 100 and 200, left at 150 -> backward wins
    right2 = spark.createDataFrame(
        [(1, 100, "lo"), (1, 200, "hi")], ["k", "ts", "val"]
    )
    tie = {
        r.ts: r.val
        for r in asof.join(
            spark.createDataFrame([(1, 150)], ["k", "ts"]),
            right2, on="k", left_ts="ts", direction="nearest",
        ).collect()
    }
    assert tie[150] == "lo"

    # tolerance: |delta| must fit on the chosen side
    tol = {
        (r.k, r.ts): r.val
        for r in asof.join(
            left, right, on="k", left_ts="ts", direction="nearest",
            tolerance=F.lit(15),
        ).collect()
    }
    assert tol[(1, 100)] == "a"     # 10 within 15
    assert tol[(1, 210)] == "b"     # 10 within 15
    assert tol[(1, 150)] is None    # 50 and 60 both outside 15


def test_asof_nearest_matches_pandas(spark):
    """Differential vs pandas merge_asof(direction='nearest') on
    tie-free random data (tie preference is implementation-defined in
    pandas; ours is documented backward)."""
    import pandas as pd

    rng = random.Random(29)
    # odd left ts, even right ts -> |delta| ties impossible
    lrows = [(rng.randrange(3), rng.randrange(500) * 2 + 1) for _ in range(200)]
    rset = {(rng.randrange(3), rng.randrange(500) * 2) for _ in range(150)}
    rrows = [(k, t, rng.random()) for k, t in rset]
    left = spark.createDataFrame(lrows, ["k", "ts"]).withColumn(
        "rid", F.monotonically_increasing_id()
    )
    rpdf = pd.DataFrame(rrows, columns=["k", "ts", "val"]).sort_values("ts")
    rdf = spark.createDataFrame(rpdf)
    got = (
        asof.join(left, rdf, on="k", left_ts="ts", direction="nearest")
        .orderBy("rid")
        .toPandas()
    )
    lpdf = got[["k", "ts", "rid"]].sort_values("ts")
    expect = pd.merge_asof(
        lpdf, rpdf, on="ts", by="k", direction="nearest"
    ).sort_values("rid")
    assert list(got.sort_values("rid")["val"].fillna(-1).round(9)) == list(
        expect["val"].fillna(-1).round(9)
    )


def test_asof_nearest_single_shuffle(spark):
    """Both directional scans must share one key exchange."""
    left = spark.createDataFrame([(1, 100)], ["k", "ts"])
    right = spark.createDataFrame([(1, 90, "a")], ["k", "ts", "val"])
    plan = (
        asof.join(left, right, on="k", left_ts="ts", direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re as _re

    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(exchanges) <= 2  # union-side partitioning only, never per-window


def test_degree_stats_hub_detection(spark):
    """Degree histogram collapses duplicate/reversed edges and
    self-loops; a boilerplate hub shows as the max-degree row."""
    from getl_spark.functions import graph

    edges = spark.createDataFrame(
        [
            # chain 1-2-3 (degrees 1,2,1)
            (1, 2), (2, 3), (3, 2),      # reversed dup collapses
            (2, 2),                       # self-loop ignored
            # hub 100 connected to 5 leaves (degree 5; leaves degree 1)
            *[(100, 200 + i) for i in range(5)],
            *[(200 + i, 100) for i in range(3)],  # reversed dups
        ],
        "id_a INT, id_b INT",
    )
    got = {r["degree"]: r["n_nodes"] for r in graph.degree_stats(edges).collect()}
    # degrees: node2=2, nodes 1,3 =1, hub=5, 5 leaves=1 -> {1:7, 2:1, 5:1}
    assert got == {1: 7, 2: 1, 5: 1}


def test_k_core_peeling(spark):
    """Hand-built graph with known cores: 6-clique (+1 pendant), star,
    chain, pentagon. k=2 keeps clique+pentagon, k=3 only the clique,
    k=6 nothing; pendant peels and the clique's core degrees exclude
    it; distributed loop == driver peel; long-chain max_iter loud-fail
    on the distributed path; self-loops/duplicates normalized."""
    from getl_spark.functions import graph

    clique = [(a, b) for a in range(1, 7) for b in range(a + 1, 7)]
    pendant = [(1, 7)]
    star = [(10, i) for i in range(11, 16)]
    chain = [(20, 21), (21, 22), (22, 23)]
    pentagon = [(30, 31), (31, 32), (32, 33), (33, 34), (34, 30)]
    junk = [(1, 1), (2, 1), (1, 2)]  # self-loop + dup + reversed dup
    edges = clique + pendant + star + chain + pentagon + junk
    df = spark.createDataFrame(edges, "id_a LONG, id_b LONG")

    got2 = {r.node: r.core_degree for r in graph.k_core(df, 2).collect()}
    expect2 = {n: 5 for n in range(1, 7)} | {n: 2 for n in range(30, 35)}
    assert got2 == expect2  # pendant/star/chain gone; clique deg excludes 7

    got3 = {r.node: r.core_degree for r in graph.k_core(df, 3).collect()}
    assert got3 == {n: 5 for n in range(1, 7)}

    assert graph.k_core(df, 6).collect() == []

    # distributed loop (driver_threshold=0) must agree exactly
    for kk in (2, 3, 6):
        d = {r.node: r.core_degree
             for r in graph.k_core(df, kk, driver_threshold=0).collect()}
        e = {r.node: r.core_degree
             for r in graph.k_core(df, kk).collect()}
        assert d == e

    # adversarial slow peel fails LOUD on the distributed path
    long_chain = [(i, i + 1) for i in range(60)]
    cdf = spark.createDataFrame(long_chain, "id_a LONG, id_b LONG")
    with pytest.raises(RuntimeError, match="max_iter"):
        graph.k_core(cdf, 2, driver_threshold=0, max_iter=3)
    # ...while the driver peel handles it instantly (empty 2-core)
    assert graph.k_core(cdf, 2).collect() == []

    with pytest.raises(ValueError, match="k must"):
        graph.k_core(df, 0)


# ---------------------------------------------------------------- triangles


def _brute_triangles(edges):
    """Driver-side ground truth: adjacency sets, count per node."""
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for n, nbrs in adj.items():
        lst = sorted(nbrs)
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                if lst[j] in adj[lst[i]]:
                    tri[n] += 1
    return adj, tri


def test_triangle_count_hand_case(spark):
    # triangle 1-2-3 + pendant 3-4 + disjoint edge 10-11
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11), (11, 10), (5, 5)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    rows = {r["node"]: r for r in graph.triangle_count(df).collect()}
    assert rows[1]["triangles"] == 1 and rows[1]["degree"] == 2
    assert rows[2]["triangles"] == 1
    assert rows[3]["triangles"] == 1 and rows[3]["degree"] == 3
    assert rows[4]["triangles"] == 0 and rows[4]["degree"] == 1
    # coefficient: node 3 has 3 neighbors, 1 of 3 possible pairs linked
    assert abs(rows[3]["clustering_coeff"] - 1 / 3) < 1e-9
    assert rows[1]["clustering_coeff"] == 1.0
    # degree-1 nodes: undefined, NULL not 0
    assert rows[4]["clustering_coeff"] is None
    assert rows[10]["triangles"] == 0
    # self-loop node never appears
    assert 5 not in rows


def test_triangle_count_random_vs_brute(spark):
    rng = random.Random(7)
    edges = [(rng.randint(1, 30), rng.randint(1, 30)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["triangles"] for r in graph.triangle_count(df).collect()}
    adj, want = _brute_triangles(edges)
    assert got == want


def test_triangle_count_clique(spark):
    # K5: every node in C(4,2)=6 triangles, coefficient exactly 1
    edges = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    for r in graph.triangle_count(df).collect():
        assert r["degree"] == 4
        assert r["triangles"] == 6
        assert r["clustering_coeff"] == 1.0


# ---------------------------------------------------------- label propagation


def _brute_lpa(edges, max_iter):
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(max_iter):
        nxt = {}
        for n in adj:
            counts: dict = {}
            for m in adj[n]:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    return labels


def test_label_propagation_two_cliques_bridge(spark):
    # two 4-cliques joined by one bridge edge: communities = cliques
    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = c1 + c2 + [(4, 10)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: r["label"]
        for r in graph.label_propagation(df, max_iter=4).collect()
    }
    assert {got[n] for n in (1, 2, 3)} == {1}
    assert {got[n] for n in (11, 12, 13)} == {10}
    # bridge nodes may adopt either side but must pick ONE clique label
    assert got[4] in (1, 10) and got[10] in (1, 10)


def test_label_propagation_matches_brute(spark):
    rng = random.Random(11)
    edges = list(
        {(rng.randint(1, 25), rng.randint(1, 25)) for _ in range(80)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    for k in (1, 3):
        got = {
            r["node"]: r["label"]
            for r in graph.label_propagation(df, max_iter=k).collect()
        }
        assert got == _brute_lpa(edges, k)


def test_label_propagation_rejects_bad_iter(spark):
    df = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    with pytest.raises(ValueError, match="max_iter"):
        graph.label_propagation(df, max_iter=0)


# ------------------------------------------------------------- adamic-adar


def _brute_aa(edges, cand=None):
    import math

    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    nodes = sorted(adj)
    pairs = (
        sorted({(min(a, b), max(a, b)) for a, b in cand if a != b})
        if cand is not None
        else [
            (a, b)
            for i, a in enumerate(nodes)
            for b in nodes[i + 1:]
        ]
    )
    for a, b in pairs:
        common = adj.get(a, set()) & adj.get(b, set())
        if not common:
            continue
        score = sum(
            1.0 / math.log(len(adj[w])) for w in common if len(adj[w]) >= 2
        )
        out[(a, b)] = (len(common), round(score, 6))
    return out


def test_adamic_adar_full_matches_brute(spark):
    rng = random.Random(13)
    edges = list({(rng.randint(1, 20), rng.randint(1, 20)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        (r.node_a, r.node_b): (r.common_neighbors, r.aa_score)
        for r in graph.adamic_adar(df).collect()
    }
    want = _brute_aa(edges)
    assert got == want


def test_adamic_adar_pairs_mode(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5)]
    cand = [(1, 4), (5, 1), (2, 2), (7, 8)]  # incl self + absent nodes
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    pdf = spark.createDataFrame(cand, ["id_a", "id_b"])
    got = {
        (r.node_a, r.node_b): (r.common_neighbors, r.aa_score)
        for r in graph.adamic_adar(df, pairs=pdf).collect()
    }
    want = _brute_aa(edges, cand)
    assert got == want
    # hub discount: a common neighbor with higher degree certifies less
    import math

    assert got[(1, 4)][1] == round(1.0 / math.log(3), 6)  # via node 3 (deg 3)


def test_adamic_adar_hub_guard(spark):
    hub = [(0, i) for i in range(1, 30)]
    df = spark.createDataFrame(hub, ["id_a", "id_b"])
    with pytest.raises(ValueError, match="max_degree"):
        graph.adamic_adar(df, max_degree=10)
    # pairs mode is exempt from the degree probe (bounded by candidates)
    pdf = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    r = graph.adamic_adar(df, pairs=pdf, max_degree=10).collect()
    assert len(r) == 1 and r[0].common_neighbors == 1


def test_round10_graph_ops_partition_invariant(spark):
    """triangle_count / label_propagation / adamic_adar must return
    identical values whatever the input partitioning — the
    distributed-determinism contract every oracle-checked op carries."""
    rng = random.Random(29)
    edges = list({(rng.randint(1, 30), rng.randint(1, 30)) for _ in range(90)})
    edges = [(a, b) for a, b in edges if a != b]
    one = spark.createDataFrame(edges, ["id_a", "id_b"]).repartition(1)
    many = spark.createDataFrame(edges, ["id_a", "id_b"]).repartition(13)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(graph.triangle_count(one)) == rows(graph.triangle_count(many))
    assert rows(graph.label_propagation(one, max_iter=3)) == rows(
        graph.label_propagation(many, max_iter=3)
    )
    assert rows(graph.adamic_adar(one)) == rows(graph.adamic_adar(many))


# ----------------------------------------------------------------- HITS


def _hits_ref(edges, n_iter):
    """Pure-python L1-normalized HITS replay."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    hub = {n: 1.0 for n in nodes}
    auth = {}
    for _ in range(n_iter):
        auth = {n: 0.0 for n in nodes}
        for u, v in edges:
            auth[v] += hub[u]
        s = sum(auth.values())
        auth = {n: x / s for n, x in auth.items()}
        hub = {n: 0.0 for n in nodes}
        for u, v in edges:
            hub[u] += auth[v]
        s = sum(hub.values())
        hub = {n: x / s for n, x in hub.items()}
    return hub, auth


def test_hits_matches_reference_and_roles(spark):
    from getl_spark.functions import graph

    # 'dir' is a pure hub (links to everything), 'star' a pure
    # authority (linked from everywhere), plus a small cycle
    edges = [
        ("dir", "star"), ("dir", "a"), ("dir", "b"), ("dir", "c"),
        ("a", "star"), ("b", "star"), ("c", "star"),
        ("a", "b"), ("b", "a"),
    ]
    df = spark.createDataFrame(edges + edges[:3], "src STRING, dst STRING")
    got = {
        r.node: (r.hub, r.auth)
        for r in graph.hits(df, n_iter=10).collect()
    }
    hub, auth = _hits_ref(edges, 10)
    for n in hub:
        assert abs(got[n][0] - hub[n]) < 1e-6, n
        assert abs(got[n][1] - auth[n]) < 1e-6, n
    # role separation: the directory is the best hub, the star the
    # best authority; each is weak in the opposite role
    assert got["dir"][0] == max(v[0] for v in got.values())
    assert got["star"][1] == max(v[1] for v in got.values())
    assert got["star"][0] == 0.0  # no out-edges -> hub 0
    assert got["dir"][1] == 0.0   # no in-edges -> auth 0
    # L1 normalization: each score vector sums to 1
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-5
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-5
    # partition invariance
    again = {
        r.node: (r.hub, r.auth)
        for r in graph.hits(df.repartition(7), n_iter=10).collect()
    }
    assert again == got


def test_hits_oracle_sql_replays(spark):
    import duckdb

    from getl_spark.functions import graph

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    got = sorted(
        (r.node, r.hub, r.auth) for r in graph.hits(df, n_iter=5).collect()
    )
    con = duckdb.connect()
    vals = ", ".join(f"('{u}', '{v}')" for u, v in edges)
    sql = graph.hits_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS e(src, dst)", n_iter=5
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert [(n, round(h, 6), round(a, 6)) for n, h, a in got] == [
        (n, round(h, 6), round(a, 6)) for n, h, a in want
    ]


def test_hits_guards_and_edge_cases(spark):
    import pytest as _pytest

    from getl_spark.functions import graph

    df = spark.createDataFrame([("a", "b")], "src STRING, dst STRING")
    with _pytest.raises(ValueError, match="n_iter"):
        graph.hits(df, n_iter=0)
    # no edges (after null filtering): all-zero scores over `nodes`
    empty = spark.createDataFrame([], "src STRING, dst STRING")
    nodes = spark.createDataFrame([("x",), ("y",)], "node STRING")
    rows = graph.hits(empty, nodes=nodes).collect()
    assert sorted((r.node, r.hub, r.auth) for r in rows) == [
        ("x", 0.0, 0.0), ("y", 0.0, 0.0)
    ]
    with _pytest.raises(ValueError, match="tol"):
        graph.hits(df, tol=0.0)


def test_hits_tol_early_exit(spark):
    """A star graph reaches its fixpoint after iteration 1, so with tol
    set the loop stops at iteration 2 (the first delta probe) instead
    of burning all n_iter edge-sized shuffle rounds — and the early
    exit returns the same scores as the full run."""
    from getl_spark.functions import graph

    edges = [("c", f"l{i}") for i in range(5)]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    full = sorted(
        (r.node, r.hub, r.auth) for r in graph.hits(df, n_iter=10).collect()
    )
    early = sorted(
        (r.node, r.hub, r.auth)
        for r in graph.hits(df, n_iter=10, tol=1e-12).collect()
    )
    assert graph.hits.last_iterations == 2
    assert early == full
    # a cycle that hasn't converged keeps iterating to the cap
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src STRING, dst STRING",
    )
    graph.hits(cyc, n_iter=3, tol=1e-15).collect()
    assert graph.hits.last_iterations == 3


# --------------------------------------------------------- co-occurrence


def _cooc_ref(rows, min_count=2, cap=1000):
    """Pure-python replay: rows = [(group, item)]."""
    import math
    from collections import defaultdict

    groups = defaultdict(set)
    for g, i in rows:
        groups[g].add(i)
    kept = {g: s for g, s in groups.items() if len(s) <= cap}
    n = len(kept)
    ni = defaultdict(int)
    pair = defaultdict(int)
    for s in kept.values():
        for i in s:
            ni[i] += 1
        items = sorted(s)
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                pair[(items[x], items[y])] += 1
    out = {}
    for (a, b), nab in pair.items():
        if nab < min_count:
            continue
        pmi = math.log(nab * n / (ni[a] * ni[b]))
        npmi = 1.0 if nab == n else pmi / -math.log(nab / n)
        out[(a, b)] = (nab, ni[a], ni[b], pmi, npmi)
    return out


def test_cooccurrence_matches_reference(spark):
    from getl_spark.functions import graph

    rows = [
        # bread+butter in 3 of 5 baskets (strong pair), milk frequent
        # but independent, (1, 'bread') duplicated -> presence-based
        (1, "bread"), (1, "bread"), (1, "butter"), (1, "milk"),
        (2, "bread"), (2, "butter"),
        (3, "bread"), (3, "butter"), (3, "eggs"),
        (4, "milk"), (4, "eggs"),
        (5, "milk"), (5, "bread"),
    ]
    df = spark.createDataFrame(rows, "basket LONG, item STRING")
    got = {
        (r.item_a, r.item_b): (r.n_pairs, r.n_a, r.n_b, r.pmi, r.npmi)
        for r in graph.cooccurrence(df, "basket", "item").collect()
    }
    want = _cooc_ref(rows)
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g[:3] == w[:3], k
        assert abs(g[3] - w[3]) < 1e-6 and abs(g[4] - w[4]) < 1e-6, k
    # bread+butter co-occur more than popularity predicts
    assert got[("bread", "butter")][3] > 0
    # an always-together pair pins npmi to exactly 1
    dual = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b")], "g LONG, item STRING"
    )
    d = graph.cooccurrence(dual, "g", "item").collect()[0]
    assert d.npmi == 1.0 and d.n_pairs == 2


def test_cooccurrence_oversize_and_guards(spark):
    from getl_spark.functions import graph

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    # group 9 touches 5 items -> excluded entirely under cap 4
    rows += [(9, f"i{k}") for k in range(5)] + [(9, "a"), (9, "b")]
    df = spark.createDataFrame(rows, "g LONG, item STRING")
    got = {
        (r.item_a, r.item_b): r.n_pairs
        for r in graph.cooccurrence(df, "g", "item",
                                    max_group_size=4).collect()
    }
    assert got == {("a", "b"): 2}  # bot group contributed nothing
    # partition invariance
    a = sorted(map(tuple, graph.cooccurrence(
        df.repartition(1), "g", "item", max_group_size=4).collect()))
    b = sorted(map(tuple, graph.cooccurrence(
        df.repartition(8), "g", "item", max_group_size=4).collect()))
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_count"):
        graph.cooccurrence(df, "g", "item", min_count=0)
    with _pytest.raises(ValueError, match="max_group_size"):
        graph.cooccurrence(df, "g", "item", max_group_size=1)


# ------------------------------------------------------------ BFS distances


def test_bfs_distances_min_hops(spark):
    """Hand-built graph: distances are MINIMUM hop counts, unreached
    nodes absent, a seed missing from the edge list reports 0."""
    from getl_spark.functions import graph

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("a", "c"),              # shortcut: d is 2 hops via a->c->d
        ("x", "y"),              # disconnected from the seed
    ]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    got = {
        r.node: r.dist
        for r in graph.bfs_distances(df, ["a", "ghost"], max_hops=5).collect()
    }
    assert got == {"a": 0, "ghost": 0, "b": 1, "c": 1, "d": 2}
    # max_hops truncates the frontier
    got2 = {
        r.node: r.dist
        for r in graph.bfs_distances(df, ["a"], max_hops=1).collect()
    }
    assert got2 == {"a": 0, "b": 1, "c": 1}
    # undirected: reverse edges walk too
    got3 = {
        r.node: r.dist
        for r in graph.bfs_distances(
            df, ["d"], max_hops=3, directed=False
        ).collect()
    }
    assert got3 == {"d": 0, "c": 1, "a": 2, "b": 2}
    # DataFrame seed form + multi-seed min
    seeds = spark.createDataFrame([("a",), ("y",)], "node STRING")
    got4 = {
        r.node: r.dist
        for r in graph.bfs_distances(df, seeds, max_hops=5).collect()
    }
    assert got4["y"] == 0 and got4["d"] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_hops"):
        graph.bfs_distances(df, ["a"], max_hops=0)
    with _pytest.raises(ValueError, match="seeds"):
        graph.bfs_distances(df, [], max_hops=2)


def test_bfs_distances_matches_recursive_oracle(spark):
    """Engine BFS vs a pure-python Dijkstra-on-unit-weights replay over
    a mod graph with cycles."""
    from getl_spark.functions import graph

    edges = [(f"n{i}", f"n{(i * 3 + 1) % 17}") for i in range(17)]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    got = {
        r.node: r.dist
        for r in graph.bfs_distances(df, ["n0"], max_hops=6).collect()
    }
    from collections import deque

    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    want, q = {"n0": 0}, deque(["n0"])
    while q:
        u = q.popleft()
        if want[u] >= 6:
            continue
        for v in adj.get(u, []):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want


# ------------------------------------------- personalized pagerank
def _numpy_ppr(edges, seeds, damping=0.85, n_iter=10):
    """Independent dense reference with the exact documented semantics:
    distinct edges, teleport 1/|seeds| on seeds, dangling mass
    teleports back to the seeds."""
    import numpy as np

    edges = sorted(set(edges))
    seeds = sorted(set(seeds))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges} | set(seeds))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    t = np.zeros(n)
    for s in seeds:
        t[idx[s]] = 1.0 / len(seeds)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = t.copy()
    for _ in range(n_iter):
        dangling = sum(r[idx[x]] for x in nodes if x not in outdeg)
        nxt = (1.0 - damping) * t + damping * dangling * t
        for u, v in edges:
            nxt[idx[v]] += damping * r[idx[u]] / outdeg[u]
        r = nxt
    return {node: round(float(r[idx[node]]), 6) for node in nodes}


def test_personalized_pagerank_matches_dense_reference(spark):
    """Random directed graph with dangling nodes, parallel edges, and
    an off-graph seed vs an independent numpy power iteration."""
    import random

    rng = random.Random(11)
    edges = [(rng.randrange(25), rng.randrange(35)) for _ in range(120)]
    seeds = [0, 3, 99]  # 99 is off-graph: still holds teleport mass
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["ppr"]
        for r in graph.personalized_pagerank(df, seeds).collect()
    }
    want = _numpy_ppr(edges, seeds)
    assert got == want


def test_personalized_pagerank_properties(spark):
    """Mass conservation, seed concentration, zero off-component mass,
    and the duckdb replica of the oracle generator."""
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),      # seed component
        ("x", "y"), ("y", "x"),                  # disconnected island
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = graph.personalized_pagerank(df, ["a"], n_iter=12).collect()
    got = {r["node"]: r["ppr"] for r in rows}
    # sum of ranks stays 1 (teleport + dangling both land on seeds)
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # nodes unreachable from the seeds hold exactly zero mass
    assert got["x"] == 0.0 and got["y"] == 0.0
    # the seed outranks its downstream neighbours
    assert got["a"] > got["b"] > 0 and got["c"] > 0
    # oracle generator replicates the engine bit-for-bit at round 6
    import duckdb

    sql = graph.personalized_pagerank_oracle_sql(
        "SELECT * FROM (VALUES ('a','b'),('b','c'),('c','a'),"
        "('x','y'),('y','x')) AS e(src, dst)",
        "SELECT 'a' AS node",
        n_iter=12,
    )
    want = {n: p for n, p in duckdb.connect().execute(sql).fetchall()}
    assert got == want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="seeds"):
        graph.personalized_pagerank(df, [])
    with _pytest.raises(ValueError, match="damping"):
        graph.personalized_pagerank(df, ["a"], damping=1.0)


def test_personalized_pagerank_weighted(spark):
    """weight_col: duplicate edges sum, non-positive drop, and rank
    flows proportional to weight — b gets 3x c's share from a."""
    edges = [
        ("a", "b", 2.0), ("a", "b", 1.0), ("a", "c", 1.0),
        ("a", "z", -5.0),  # dropped
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r["node"]: r["ppr"]
        for r in graph.personalized_pagerank(
            df, ["a"], weight_col="w", n_iter=4
        ).collect()
    }
    assert "z" not in got
    assert abs(got["b"] / got["c"] - 3.0) < 1e-3

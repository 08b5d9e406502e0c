"""Z-order layout keys (functions/layout.py) and the optimize()
fallback clustering that uses them."""

from __future__ import annotations

import datetime
import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from getl_spark.functions import layout


def _python_morton(xs, bits, ndims, dim):
    """Reference interleave: bit b of x goes to position b*ndims+dim."""
    out = []
    for x in xs:
        key = 0
        for b in range(bits):
            key |= ((x >> b) & 1) << (b * ndims + dim)
        out.append(key)
    return out


def test_zorder_key_matches_reference_interleave(spark):
    # values already spanning [0, 15] with bits=4 -> buckets == values
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["zorder_key"]
        for r in layout.zorder_key(df, ["a", "b"], bits=4).collect()
    }
    for a, b in rows:
        expected = _python_morton([a], 4, 2, 0)[0] | _python_morton([b], 4, 2, 1)[0]
        assert got[(a, b)] == expected, (a, b)


def test_zorder_key_scales_minmax(spark):
    # min/max normalization: [100, 300] with bits=1 -> low half 0, high half 1
    df = spark.createDataFrame([(100,), (199,), (201,), (300,)], ["v"])
    got = [r["zorder_key"] for r in layout.zorder_key(df, ["v"], bits=1).orderBy("v").collect()]
    assert got == [0, 0, 1, 1]


def test_zorder_key_temporal_and_null(spark):
    rows = [
        (datetime.datetime(2024, 1, 1),),
        (datetime.datetime(2024, 6, 1),),
        (None,),
    ]
    df = spark.createDataFrame(rows, ["ts"])
    out = layout.zorder_key(df, ["ts"], bits=4).collect()
    by_ts = {r["ts"]: r["zorder_key"] for r in out}
    assert by_ts[None] == 0  # nulls cluster first
    assert by_ts[datetime.datetime(2024, 1, 1)] < by_ts[datetime.datetime(2024, 6, 1)]


def test_zorder_key_nulls_first_on_negative_range(spark):
    """On a column whose min is negative, literal 0 sits mid-range —
    nulls must still land in bucket 0 (with the minimum), not scatter
    into the middle of the keyspace."""
    df = spark.createDataFrame(
        [(-100,), (0,), (100,), (None,)], "v BIGINT"
    )
    by_v = {
        r["v"]: r["zorder_key"]
        for r in layout.zorder_key(df, ["v"], bits=4).collect()
    }
    assert by_v[None] == by_v[-100] == 0  # nulls cluster with the min
    assert by_v[None] < by_v[0] < by_v[100]


def test_zorder_key_errors(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "s"])
    with pytest.raises(ValueError, match="63"):
        layout.zorder_key(df, ["a"], bits=64)
    with pytest.raises(ValueError, match="no column"):
        layout.zorder_key(df, ["missing"])
    with pytest.raises(ValueError, match="numeric"):
        layout.zorder_key(df, ["s"])
    with pytest.raises(ValueError, match="at least one"):
        layout.zorder_key(df, [])


def _file_bounding_fraction(path, col, lo, hi):
    """Mean per-file min/max span of `col` as a fraction of [lo, hi]."""
    fracs = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        cmin, cmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    cmin = s.min if cmin is None else min(cmin, s.min)
                    cmax = s.max if cmax is None else max(cmax, s.max)
        if cmin is not None:
            fracs.append((cmax - cmin) / (hi - lo))
    assert fracs, f"no parquet stats found under {path}"
    return sum(fracs) / len(fracs)


def test_cluster_by_zorder_tightens_all_dimensions(spark, tmp_path):
    """The point of z-order: after clustering, per-file min/max spans
    are small on BOTH columns; a lexicographic sort leaves the second
    column's span at ~full range in every file."""
    n = 64
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, ["a", "b"]).repartition(8)

    zpath = str(tmp_path / "z")
    layout.cluster_by_zorder(df, ["a", "b"], num_files=16, bits=6).write.parquet(zpath)
    lpath = str(tmp_path / "lex")
    df.repartitionByRange(16, "a", "b").sortWithinPartitions("a", "b").write.parquet(lpath)

    z_a = _file_bounding_fraction(zpath, "a", 0, n - 1)
    z_b = _file_bounding_fraction(zpath, "b", 0, n - 1)
    lex_b = _file_bounding_fraction(lpath, "b", 0, n - 1)
    # z-order: both dims tight; lexicographic: second dim spans ~everything
    assert z_a < 0.5 and z_b < 0.5, (z_a, z_b)
    assert lex_b > 0.9
    assert z_b < lex_b / 2


def test_optimize_fallback_uses_zorder(spark, tmp_path):
    from getl_spark.common.tables import ManagedTable

    n = 32
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, ["a", "b"]).repartition(8)
    path = str(tmp_path / "tbl")
    table = ManagedTable(spark, path)
    table.write(df, mode="overwrite")
    # tiny target -> several output files, so per-file stat tightness
    # is measurable (the default ~1 GiB target would compact to 1 file)
    table.optimize(zorder_by=["a", "b"], target_file_bytes=2048)
    out = spark.read.parquet(path)
    assert out.count() == n * n
    assert sorted(map(tuple, out.collect())) == sorted(rows)
    frac_b = _file_bounding_fraction(path, "b", 0, n - 1)
    assert frac_b < 0.9  # clustered on the second dim too


# -------------------------------------------------------- write_bucketed
def test_write_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables co-bucketed on the join key plan a sort-merge join
    with ZERO Exchange on either side — the pay-the-shuffle-once
    layout contract — and each table writes exactly one file per
    bucket (the task/bucket alignment, not tasks x buckets)."""
    import glob

    import pytest
    from pyspark.sql import functions as F

    from getl_spark.functions import layout

    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("b")
    )
    layout.write_bucketed(
        left, "t_bucket_l", 4, ["k"], sort_cols=["k"],
        path=str(tmp_path / "l"),
    )
    layout.write_bucketed(
        right, "t_bucket_r", 4, ["k"], sort_cols=["k"],
        path=str(tmp_path / "r"),
    )
    assert len(glob.glob(str(tmp_path / "l" / "*.parquet"))) == 4
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_bucket_l").alias("l").join(
            spark.table("t_bucket_r").alias("r"), "k"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should skip the shuffle"
        assert j.count() == 500
        got = sorted(map(tuple, j.select("k", "a", "b").collect()))
        want = sorted((k, k % 7, k % 3) for k in range(500))
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    with pytest.raises(ValueError, match="buckets"):
        layout.write_bucketed(left, "t_bad", 0, ["k"])
    with pytest.raises(ValueError, match="bucket_cols"):
        layout.write_bucketed(left, "t_bad", 4, [])


# ------------------------------------------------------------ hilbert
def _ref_xy2d(order: int, x: int, y: int) -> int:
    """Classic public-domain Hilbert xy2d reference."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_on_full_grid(spark):
    from getl_spark.functions import layout as L

    bits = 5
    n = 1 << bits
    df = spark.range(n * n).selectExpr(
        f"CAST(id % {n} AS INT) AS x", f"CAST(id DIV {n} AS INT) AS y"
    )
    out = L.hilbert_key(df, ["x", "y"], bits=bits).collect()
    # min/max scaling over the full [0, n-1] grid is the identity
    for r in out:
        assert r.hilbert_key == _ref_xy2d(n, r.x, r.y), (r.x, r.y)
    keys = {r.hilbert_key for r in out}
    assert keys == set(range(n * n))  # bijective on the grid


def test_hilbert_adjacency_beats_zorder(spark):
    """Consecutive Hilbert cells are always spatial neighbours; the Z
    curve jumps. Check both the adjacency invariant and that hilbert's
    average per-file bounding-box area is no worse than zorder's."""
    from getl_spark.functions import layout as L

    bits = 4
    n = 1 << bits
    df = spark.range(n * n).selectExpr(
        f"CAST(id % {n} AS INT) AS x", f"CAST(id DIV {n} AS INT) AS y"
    )
    rows = sorted(
        L.hilbert_key(df, ["x", "y"], bits=bits).collect(),
        key=lambda r: r.hilbert_key,
    )
    for a, b in zip(rows, rows[1:]):
        assert abs(a.x - b.x) + abs(a.y - b.y) == 1  # unit steps only

    def avg_box(key_rows, chunk=16):
        tot = 0.0
        chunks = [key_rows[i : i + chunk] for i in range(0, len(key_rows), chunk)]
        for c in chunks:
            xs = [r.x for r in c]
            ys = [r.y for r in c]
            tot += (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        return tot / len(chunks)

    zrows = sorted(
        L.zorder_key(df, ["x", "y"], bits=bits).collect(),
        key=lambda r: r.zorder_key,
    )
    assert avg_box(rows) <= avg_box(zrows)


def test_hilbert_validation_and_null_scaling(spark):
    import pytest as _pytest

    from getl_spark.functions import layout as L

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (None, 30.0)], "a DOUBLE, b DOUBLE"
    )
    with _pytest.raises(ValueError, match="exactly 2"):
        L.hilbert_key(df, ["a"])
    with _pytest.raises(ValueError, match="bits"):
        L.hilbert_key(df, ["a", "b"], bits=40)
    out = L.hilbert_key(df, ["a", "b"], bits=4).collect()
    assert all(r.hilbert_key is not None for r in out)
    null_row = [r for r in out if r.a is None][0]
    # NULL lands in bucket 0 on that axis: its key equals the key of
    # the (min_a, same-b) corner cell
    assert null_row.hilbert_key == _ref_xy2d(16, 0, 15)


def test_cluster_by_hilbert_roundtrip(spark, tmp_path):
    from getl_spark.functions import layout as L

    df = spark.range(4096).selectExpr(
        "CAST(id % 64 AS INT) AS x", "CAST(id DIV 64 AS INT) AS y"
    )
    out = L.cluster_by_hilbert(df, ["x", "y"], num_files=8, bits=6)
    assert out.columns == ["x", "y"]
    assert out.count() == 4096


def test_file_profile_matches_parquet_metadata(spark, tmp_path):
    """Per-file counts agree with DuckDB's parquet footer metadata on
    a deliberately fragmented table, and the skew report rolls them
    up exactly."""
    import duckdb

    from getl_spark.functions import layout as L

    path = str(tmp_path / "frag")
    # 5 uneven files: repartitionByRange on a skewed key
    spark.range(1000).selectExpr(
        "id", "CAST(pow(id % 10, 2) AS INT) AS k"
    ).repartitionByRange(5, "k").write.parquet(path)

    prof = {r.file: r.n_rows for r in L.file_profile(spark.read.parquet(path)).collect()}
    meta = {
        fn.rsplit("/", 1)[-1]: n
        for fn, n in duckdb.sql(
            f"SELECT file_name, num_rows FROM parquet_file_metadata('{path}/*.parquet')"
        ).fetchall()
    }
    assert prof == meta and sum(prof.values()) == 1000

    r = L.file_skew_report(spark.read.parquet(path)).collect()[0]
    assert r.n_files == len(meta) and r.total_rows == 1000
    assert r.min_rows == min(meta.values()) and r.max_rows == max(meta.values())
    assert r.skew_ratio == round(max(meta.values()) / (1000 / len(meta)), 6)


def test_compaction_plan(spark):
    """Greedy prefix binning vs a python reference; big files left
    alone (NULL group); groups total within one file of target;
    determinism across partitioning; corrupt sizes fail loud."""
    import getl_spark.functions.layout as L

    files = [(f"f{i:03d}", (i * 37) % 90 + 5) for i in range(60)]
    big = [("g_big1", 500), ("g_big2", 812)]
    df = spark.createDataFrame(files + big, "file STRING, n_rows LONG")

    out = L.compaction_plan(df, target=200).collect()
    got = {r.file: r.compaction_group for r in out}
    assert got["g_big1"] is None and got["g_big2"] is None

    # python reference: name order, exclusive prefix // target
    ref, cum = {}, 0
    for name, sz in sorted(files):
        ref[name] = cum // 200
        cum += sz
    assert {f: g for f, g in got.items() if g is not None} == ref

    # every group's total lands in [target - max_small, target + max_small)
    from collections import defaultdict
    tot = defaultdict(int)
    for name, sz in files:
        tot[ref[name]] += sz
    max_small = max(sz for _, sz in files)
    for g, t in tot.items():
        if g != max(tot):  # last group may be a remainder
            assert 200 - max_small <= t < 200 + max_small

    # same plan at different parallelism
    out7 = L.compaction_plan(df.repartition(7), target=200).collect()
    assert {r.file: r.compaction_group for r in out7} == got

    # grouped: independent binning per partition key
    two = [("a", f, s) for f, s in files] + [("b", f, s) for f, s in files]
    gdf = spark.createDataFrame(two, "pt STRING, file STRING, n_rows LONG")
    gout = L.compaction_plan(gdf, target=200, group_by="pt").collect()
    for r in gout:
        assert r.compaction_group == ref[r.file]

    # leave_if_at_least overrides target as the leave-alone bar
    out2 = L.compaction_plan(df, target=200, leave_if_at_least=1000).collect()
    assert all(r.compaction_group is not None for r in out2)

    # corrupt listing fails loud
    bad = spark.createDataFrame(
        [("x", 5), ("y", None)], "file STRING, n_rows LONG"
    )
    with pytest.raises(Exception, match="corrupt"):
        L.compaction_plan(bad, target=10).collect()
    with pytest.raises(ValueError, match="target"):
        L.compaction_plan(df, target=0)

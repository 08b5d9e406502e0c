"""Property-based tests for sample.split (disjoint/exhaustive/stable
under any fraction layout) and schema.coerce (round-trips arbitrary
epoch instants through any declared unit)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from getl_spark.functions import sample as S

# small example counts: every example runs Spark jobs
_SETTINGS = dict(max_examples=8, deadline=None)

fraction_maps = st.lists(
    st.tuples(
        st.sampled_from(["train", "val", "test", "holdout"]),
        st.floats(min_value=0.05, max_value=0.6, allow_nan=False),
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda kv: kv[0],
).filter(lambda kvs: sum(v for _, v in kvs) <= 1.0)


@settings(**_SETTINGS)
@given(fracs=fraction_maps, seed=st.integers(min_value=0, max_value=2**31))
def test_split_partition_properties(spark, fracs, seed):
    fractions = dict(fracs)
    df = spark.range(500).selectExpr("id")
    out = S.split(df, fractions, ["id"], seed=seed).collect()
    # every surviving row carries exactly one declared tag
    assert all(r.split in fractions for r in out)
    # deterministic under recomputation and repartitioning
    again = S.split(
        df.repartition(7), fractions, ["id"], seed=seed
    ).collect()
    assert {r.id: r.split for r in out} == {r.id: r.split for r in again}
    # exhaustive iff fractions sum to ~1
    if abs(sum(fractions.values()) - 1.0) < 1e-9:
        assert len(out) == 500
    else:
        assert len(out) <= 500


# auto unit-banding is documented unambiguous for instants 1973-5138;
# outside that the caller must pass an explicit unit — so the property
# quantifies over exactly the documented window
epoch_micros = st.integers(
    min_value=110_000_000_000_000,  # mid-1973
    max_value=4_000_000_000_000_000,  # ~2096
)


@settings(**_SETTINGS)
@given(micros=st.lists(epoch_micros, min_size=1, max_size=5, unique=True))
def test_coerce_epoch_units_agree(spark, micros):
    """The same instant written as s/ms/us epoch ints must coerce to
    identical timestamps under explicit units (seconds truncate to
    second precision, ms to millisecond)."""
    from getl_spark.functions.schema import coerce

    rows = [(m // 1_000_000, m // 1_000, m) for m in micros]
    df = spark.createDataFrame(rows, "s BIGINT, ms BIGINT, us BIGINT")
    out = coerce(
        df, {"s": "timestamp", "ms": "timestamp", "us": "timestamp"}, ts_unit="auto"
    )
    # compare in micros; s/ms carry less precision, so truncate us down
    got = out.selectExpr(
        "unix_micros(s) AS s", "unix_micros(ms) AS ms", "unix_micros(us) AS us"
    ).collect()
    for r in got:
        assert r.s % 1_000_000 == 0 and r.ms % 1_000 == 0
        assert r.ms - r.s < 1_000_000 and r.us - r.ms < 1_000


# temperature_mix nesting: for a FIXED seed the kept set is a pure
# threshold test u < f_g, and f_g is monotone in both alpha (exponent
# alpha-1 rises toward 0) and scale — so raising either can only ADD
# rows, never swap them. The property is exact, not statistical.
@settings(**_SETTINGS)
@given(
    alphas=st.tuples(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    ),
    seed=st.integers(min_value=0, max_value=2**31),
    sizes=st.lists(st.integers(min_value=5, max_value=120), min_size=2, max_size=4),
)
def test_temperature_mix_nests_in_alpha_and_scale(spark, alphas, seed, sizes):
    from pyspark.sql import functions as F

    lo, hi = sorted(alphas)
    bounds = [0] + [sum(sizes[: i + 1]) for i in range(len(sizes))]
    expr = None
    for g, (a, b) in enumerate(zip(bounds, bounds[1:])):
        cond = (F.col("id") >= a) & (F.col("id") < b)
        expr = F.when(cond, f"s{g}") if expr is None else expr.when(cond, f"s{g}")
    df = spark.range(bounds[-1]).select(F.col("id"), expr.alias("src"))

    def kept(alpha, scale=1.0):
        out = S.temperature_mix(df, "src", alpha, ["id"], seed=seed, scale=scale)
        return {r.id for r in out.collect()}

    low, high = kept(lo), kept(hi)
    assert low <= high  # alpha nesting
    assert kept(hi, scale=0.5) <= high  # scale nesting
    # alpha=1, scale=1 keeps everything
    assert len(kept(1.0)) == bounds[-1]

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

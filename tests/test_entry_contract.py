"""Driver-contract guards.

The correctness driver evaluates only the first 50 ``queries()``
entries in dict order (CORRECTNESS_r01 and _r02 each contain exactly
the first 50). These tests make that budget impossible to silently
overflow again: adding a 51st query fails CI here, not by a query
falling off the checked prefix at round time.
"""

from __future__ import annotations

import __spark_entry__ as entry

NO_ORACLE = {"dedup_minhash_lsh", "dedup_simhash", "similarity_topk_lsh"}


def test_query_count_within_driver_budget():
    qs = entry._raw_queries()
    assert len(qs) <= entry.DRIVER_CHECK_BUDGET, (
        f"{len(qs)} queries declared but the driver checks only the first "
        f"{entry.DRIVER_CHECK_BUDGET} — consolidate or demote "
        f"(see demoted_queries()) before adding more"
    )


def test_every_oracle_bearing_query_inside_checked_prefix():
    names = list(entry._raw_queries())
    oracles = entry.oracle_sql()
    checked = set(names[: entry.DRIVER_CHECK_BUDGET])
    missing = [n for n in oracles if n not in checked]
    assert not missing, f"oracle-bearing queries outside checked prefix: {missing}"


def test_oracle_keys_subset_of_queries_and_no_oracle_documented():
    names = set(entry._raw_queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= names
    # every registered query either has an oracle or is a documented sketch
    assert names - oracles == NO_ORACLE


def test_no_oracle_sketches_registered_last():
    """Sketches sit at the tail so every oracle-bearing query keeps a
    full value-hash row even if the budget ever shrinks."""
    names = list(entry._raw_queries())
    tail = set(names[-len(NO_ORACLE):])
    assert tail == NO_ORACLE


def test_demoted_registry_consistent():
    demoted = entry.demoted_queries()
    demoted_oracles = entry.demoted_oracle_sql()
    assert set(demoted) == set(demoted_oracles)
    # demoted names must not overlap registered names
    assert not set(demoted) & set(entry._raw_queries())


def test_events_ts_exprs_adaptive(spark, tmp_path):
    """events.ts arrives as either int64/TIMESTAMP(NANOS) (bigint nanos
    under nanosAsLong) or TIMESTAMP(MICROS) (TIMESTAMP_NTZ). Both
    layouts must resolve to the same instant and the same micros."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1_704_079_804_729_045, 1_704_363_359_645_136]

    nanos_dir = tmp_path / "nanos"
    micros_dir = tmp_path / "micros"
    nanos_dir.mkdir()
    micros_dir.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([m * 1000 for m in micros], pa.int64())}),
        nanos_dir / "events.parquet",
    )
    pq.write_table(
        pa.table({"ts": pa.array(micros, pa.timestamp("us"))}),
        micros_dir / "events.parquet",
    )

    entry._ensure_conf(spark)
    results = []
    for d in (nanos_dir, micros_dir):
        ts_expr, us_expr = entry._events_ts_exprs(str(d))
        df = spark.read.parquet(str(d / "events.parquet")).selectExpr(
            f"unix_micros({ts_expr}) AS ts_us", f"{us_expr} AS us"
        )
        results.append(sorted(map(tuple, df.collect())))
    expected = sorted((m, m) for m in micros)
    assert results[0] == expected
    assert results[1] == expected

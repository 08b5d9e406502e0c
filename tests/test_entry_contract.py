"""Driver-contract guards.

The correctness driver evaluates only the first 50 ``queries()``
entries in dict order (CORRECTNESS_r01 and _r02 each contain exactly
the first 50). These tests make that budget impossible to silently
overflow again: adding a 51st query fails CI here, not by a query
falling off the checked prefix at round time.
"""

from __future__ import annotations

import __spark_entry__ as entry

# The rows-only real-corpus sketch variants: outside the driver budget
# (their hash families are SQL-inexpressible on a real corpus), verified
# through deterministic twins inside the checked 50, benched at sf0.1;
# text_bpe_corpus is the BPE throughput leg, value-verified via the
# golden-pinned text_bpe_token_count oracle.
ROWS_ONLY = {
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_lsh",
    "text_bpe_corpus",
    "corpus_curation_full",
    "similarity_recall_ivf",
    "similarity_recall_hamming",
    "dedup_cdc_corpus",
    # stored-index bench split: build vs per-increment query medians
    # (value semantics carried by dedup_stored_index /
    # dedup_cdc_stored_index's oracles in the checked/demoted sets)
    "dedup_stored_index_build",
    "dedup_stored_index_query",
    "dedup_cdc_stored_index_build",
    "dedup_cdc_stored_index_query",
    # the weak-labeling loop's IVF scale path: partial-probe retrieval
    # is approximate by design; the vote arithmetic is value-verified
    # by similarity_knn_label's oracle
    "similarity_knn_label_ivf",
    # merge-only bench split: the consolidation-cron cost against
    # ALREADY-persisted per-period indexes (value semantics carried by
    # the dedup_merge_minhash_index / similarity_merge_ivf_index
    # composite oracles + the merge ≡ build-from-union pytests)
    "dedup_merge_minhash_index_merge_only",
    "similarity_merge_ivf_index_merge_only",
}


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


def test_every_checked_query_has_an_oracle():
    """Since round 8 the checked 50 is fully oracle-bearing: the sketch
    families are driver-checked through their deterministic twins, and
    the rows-only real-corpus variants live in rows_only_queries()."""
    names = set(entry._raw_queries())
    oracles = set(entry.oracle_sql())
    assert names == oracles


def test_rows_only_surface_disjoint_and_resolvable():
    rows_only = entry.rows_only_queries()
    assert set(rows_only) == ROWS_ONLY
    assert not set(rows_only) & set(entry._raw_queries())
    assert not set(rows_only) & set(entry.demoted_queries())
    # bench.py resolves these through all_queries()
    assert ROWS_ONLY <= set(entry.all_queries())


def test_demoted_registry_consistent():
    demoted = entry.demoted_queries()
    demoted_oracles = entry.demoted_oracle_sql()
    assert set(demoted) == set(demoted_oracles)
    # demoted names must not overlap registered names
    assert not set(demoted) & set(entry._raw_queries())


def test_rotation_invariants_hold_for_every_round():
    """The demoted-pool rotation must keep every driver contract intact
    for ANY round number: exactly 50 checked entries, every
    oracle-bearing entry inside the checked prefix, sketches last,
    no checked/demoted overlap — and the full pool must pass through
    the driver within one cycle."""
    pool = set(entry._base_demoted())
    covered = set()
    # one full rotation cycle (+1 slack round) regardless of pool size
    cycle_rounds = -(-len(pool) // entry.ROTATION_SLOTS) + 1
    for rnd in range(1, cycle_rounds + 1):
        qs = entry._raw_queries(rnd)
        oracles = entry.oracle_sql(rnd)
        demoted = entry.demoted_queries(rnd)
        demoted_oracles = entry.demoted_oracle_sql(rnd)
        assert len(qs) == entry.DRIVER_CHECK_BUDGET
        assert set(oracles) == set(qs)
        assert not set(demoted) & set(qs)
        assert set(demoted) == set(demoted_oracles)
        # checked + demoted together cover the whole surface, always
        assert set(qs) | set(demoted) == set(entry._base_queries()) | pool
        covered |= set(entry._rotation_promoted(rnd))
    cycle = -(-len(pool) // entry.ROTATION_SLOTS) + 1
    assert covered == pool, f"pool not fully driver-audited in {cycle} rounds"


def test_rotation_round_number_matches_driver_artifacts():
    """_round_number derives from CORRECTNESS_r*.json files next to the
    entry module — with r01..r04 present this must be round 5."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(entry.__file__))
    files = glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    expected = (
        max(
            int(re.search(r"CORRECTNESS_r(\d+)\.json$", f).group(1)) for f in files
        )
        + 1
        if files
        else 1
    )
    assert entry._round_number() == expected


def test_round_number_env_override_and_cache(monkeypatch):
    """GETL_SPARK_ROUND pins the rotation explicitly (fresh clones, CI);
    the per-process cache keeps the checked set stable even if an
    artifact lands mid-run."""
    cached = entry._round_number()
    # cache wins over a later env change — the set cannot shift mid-run
    monkeypatch.setenv("GETL_SPARK_ROUND", str(cached + 7))
    assert entry._round_number() == cached
    # with the cache cleared, the env override takes effect
    monkeypatch.setattr(entry, "_ROUND_CACHE", [])
    assert entry._round_number() == cached + 7
    # garbage values fall back to artifact inference
    monkeypatch.setattr(entry, "_ROUND_CACHE", [])
    monkeypatch.setenv("GETL_SPARK_ROUND", "zero")
    assert entry._round_number() == cached
    # restore the original cached value for the rest of the suite
    monkeypatch.setattr(entry, "_ROUND_CACHE", [cached])


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

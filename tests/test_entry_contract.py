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

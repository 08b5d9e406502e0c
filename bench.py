"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is forced with a count()/collect() action; the session is
warmed with one tiny action first so JVM/codegen startup isn't billed
to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "sql_window_top_order",
    "tumbling_window_hourly",
    "session_window_10min",
    "where_predicate_dsl",
    "join_block",
    "drop_duplicates_all",
    "explode_split_wordcount",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_bruteforce",
    "text_quality",
    "text_fingerprint",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry_mod
    from getl_spark import get_spark

    spark = get_spark("getl-bench")
    spark.range(1000).count()  # warm the JVM

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = queries[name]
        # best of 2: first run pays one-time codegen/JIT for the
        # query's operators; the min is the steady-state number and
        # halves machine-load noise
        best, rows = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            rows = df.count()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
        total += timings[name]
        print(f"# {name}: {rows} rows in {best:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "runs_per_query": 2,
                "agg": "min",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

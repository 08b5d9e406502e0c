"""Profile one or more queries in isolation: time N runs with the
noop sink (guide §1.4 — computes every column, no sink cost, no
count() column pruning), and optionally dump the formatted plan.

Usage::

    python tools/profile_query.py [--sf SF_DIR] [--runs N] [--plan DIR]
        [--action noop|count] query [query ...]

Prints per-run wall times and min/median per query. With ``--plan DIR``
writes ``DIR/<query>.txt`` containing ``explain("formatted")`` output.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None)
    ap.add_argument("--action", choices=["noop", "count"], default="count")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from getl_spark import get_spark

    spark = get_spark("getl-profile")
    spark.range(1000).count()  # warm the JVM
    queries = entry_mod.all_queries()

    for name in args.queries:
        fn = queries[name]
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
                rows = -1
            else:
                rows = df.count()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: rows={rows} min={min(times):.3f} "
            f"med={statistics.median(times):.3f} runs={times}"
        )
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())


if __name__ == "__main__":
    main()

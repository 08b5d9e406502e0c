"""Run an example lift definition: python examples/run_example.py <yaml> -p k=v ..."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("definition")
    parser.add_argument("-p", "--param", action="append", default=[])
    args = parser.parse_args()
    parameters = dict(p.split("=", 1) for p in args.param)

    from getl_spark import get_spark, lift

    spark = get_spark("getl-example")
    log = lift(spark, args.definition, parameters)
    for name, df in log.items():
        print(f"== {name}: {df.count()} rows ==")
        df.show(5, truncate=False)


if __name__ == "__main__":
    main()

"""Exact oracle equivalence check for specific queries at all three
scale factors — the restructure-proof harness for the optimization
round.

Usage: python scripts/r10_check_queries.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark()
    reg = all_queries()
    from tests.harness import compare, duck_connection
    n_fail = 0
    for sf_dir in SF_DIRS:
        duck = duck_connection(sf_dir)
        for name in names:
            q = reg[name]
            t0 = time.perf_counter()
            try:
                df = q.fn(spark, sf_dir)
                if q.oracle is None:
                    df.collect()
                    problems = []
                else:
                    problems = compare(
                        df, duck.execute(q.oracle).fetchdf(), name)
            except Exception as exc:  # noqa: BLE001
                problems = [f"{type(exc).__name__}: {exc}"]
            dt = time.perf_counter() - t0
            if problems:
                n_fail += 1
                print(f"FAIL {sf_dir} {name}: "
                      + "; ".join(p[:500] for p in problems), flush=True)
            else:
                print(f"ok   {sf_dir} {name} ({dt:.2f}s)", flush=True)
            spark.catalog.clearCache()
    print("ALL GREEN" if not n_fail else f"{n_fail} FAILURES")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

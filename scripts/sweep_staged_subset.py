"""Sweep a subset of STAGED queries against their DuckDB oracles.

Usage: python scripts/sweep_staged_subset.py <name-prefix-or-csv> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.staged import STAGED
from tests.harness import compare, duck_connection


def main() -> None:
    sel = sys.argv[1].split(",") if len(sys.argv) > 1 else []
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = [n for n in sorted(STAGED)
             if not sel or any(n.startswith(s) or s == n for s in sel)]
    spark = get_spark()
    duck = duck_connection(sf_dir)
    n_fail = 0
    for name in names:
        q = STAGED[name]
        t0 = time.perf_counter()
        try:
            problems = compare(q.fn(spark, sf_dir),
                               duck.execute(q.oracle).fetchdf(), name)
        except Exception as exc:  # noqa: BLE001
            problems = [f"{type(exc).__name__}: {exc}"]
        dt = time.perf_counter() - t0
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(
                p[:500] for p in problems), flush=True)
        else:
            print(f"OK   {name} ({dt:.1f}s)", flush=True)
        spark.catalog.clearCache()
    print(f"{len(names) - n_fail}/{len(names)} green at {sf_dir}")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()

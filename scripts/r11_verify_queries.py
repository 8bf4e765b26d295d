"""Targeted oracle verification: compare named registry queries
against their DuckDB oracles at all three test scale factors.

Usage: python scripts/r11_verify_queries.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("r11-verify")
    from tests.harness import compare, duck_connection
    reg = all_queries()
    n_fail = 0
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        duck = duck_connection(sf_dir)
        for name in names:
            q = reg[name]
            try:
                problems = compare(
                    q.fn(spark, sf_dir),
                    duck.execute(q.oracle).fetchdf(), name)
            except Exception as exc:  # noqa: BLE001
                problems = [f"{type(exc).__name__}: {exc}"]
            if problems:
                n_fail += 1
                print(f"MISMATCH sf{sf} {name}: " + "; ".join(problems),
                      flush=True)
            else:
                print(f"ok sf{sf} {name}", flush=True)
            spark.catalog.clearCache()
        duck.close()
    print(f"done, {n_fail} failures", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

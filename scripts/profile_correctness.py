"""Profile the driver-shaped correctness pass: run every registry query
at sf0.01 on one session and print per-query wall time, slowest first.

Usage: python scripts/profile_correctness.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    qs = all_queries()
    t_all = time.perf_counter()
    times: dict[str, float] = {}
    for name, q in qs.items():
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            n = len(df.collect())
            err = None
        except Exception as exc:  # noqa: BLE001
            n, err = -1, f"{type(exc).__name__}: {exc}"
        times[name] = time.perf_counter() - t0
        if err:
            print(f"ERROR {name}: {err}", flush=True)
    total = time.perf_counter() - t_all
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    for name, t in ranked:
        print(f"{t:8.3f}s  {name}")
    print(json.dumps({"total_sec": round(total, 2), "n": len(times)}))


if __name__ == "__main__":
    main()

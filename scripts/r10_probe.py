"""Warm best-of-N probe for named registry queries (one session,
bench methodology: clearCache + pairs-cache clear around every run,
count() action).

Usage: [BENCH_RUNS=5] python scripts/r10_probe.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from de_project_airflow_etl_spark.operators.dedup import clear_pairs_cache
from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "5"))
    spark = get_spark("r10_probe")
    reg = all_queries()
    out = {}
    for name in names:
        q = reg[name]
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            clear_pairs_cache()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        spark.catalog.clearCache()
        clear_pairs_cache()
        print(f"{out[name]:8.3f}s  {name}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""VERDICT r10 item 8: calm-box warm best-of-N probes for the two
queries the r9->r10 reconstruction flagged as >10% regressed
(kcore_dup_graph 0.80x, resource_allocation_link_pred 0.88x) — both
untouched in r10, adjudicated host noise. Convert that adjudication
into measured fact.

Usage: python scripts/r11_probe_regressions.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from de_project_airflow_etl_spark.operators.dedup import clear_pairs_cache
from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark

R9 = {"kcore_dup_graph": 1.98, "resource_allocation_link_pred": 1.24}
R10 = {"kcore_dup_graph": 2.47, "resource_allocation_link_pred": 1.40}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-probe-regressions")
    reg = all_queries()
    for name in R9:
        fn = reg[name].fn
        best = float("inf")
        for r in range(rounds):
            spark.catalog.clearCache(); clear_pairs_cache()
            spark.sparkContext.setJobDescription(f"probe:{name}:r{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(f"  {name} round {r}: {dt:.3f}s", flush=True)
        print(f"{name}: warm best {best:.3f}s (r9 driver {R9[name]}s, "
              f"r10 driver {R10[name]}s)", flush=True)


if __name__ == "__main__":
    main()

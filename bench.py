#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall time of the headline set (lower is better).
Each query is fully materialized via a count over its result (collect
would bottleneck on driver transfer for wide results; count forces the
same computation).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark

# The headline set: one representative per operator family, weighted
# toward the scale-critical paths (agg, fact-fact join, window, dedup
# join, knn). Keys are registry names.
HEADLINE = (
    "pricing_summary",            # multi-agg scan
    "daily_events",               # flagship count-distinct
    "join_multiway_region_revenue",  # 5-way join
    "join_segment_revenue",       # broadcast join + agg
    "window_top3_orders_per_customer",  # ranked window
    "window_running_revenue",     # running frame
    "rollup_quantity",            # multi-dim agg
    "dedup_minhash_lsh",          # shingle/LSH dedup
    "text_token_stats",           # text map-heavy
    "knn_brute_force",            # vector top-k
    "ann_lsh_search",             # bucketed ANN
    "streaming_windowed_counts",  # availableNow stream
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    registry = all_queries()

    # warm the JVM + file listings with one tiny action
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()

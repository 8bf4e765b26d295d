"""Stage profile of market_basket_rules (guide §1.4): noop-sink
timings of each cumulative piece, warm best-of-3.

Usage: python scripts/r11_profile_basket.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.mining import RULE_MIN_SUPPORT
from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-profile-basket")
    q = all_queries()["market_basket_rules"].fn

    def sets():
        li = load(spark, sf_dir, "lineitem").select("l_orderkey",
                                                    "l_partkey")
        part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
        return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
                  .groupBy("l_orderkey")
                  .agg(F.sort_array(F.collect_set("p_brand")).alias("bs")))

    def pair():
        return (sets().select(F.explode(F.expr(
                    "flatten(transform(bs, x -> "
                    "transform(filter(bs, y -> y <> x), "
                    "y -> struct(x AS antecedent, y AS consequent))))"))
                    .alias("p"))
                .select("p.antecedent", "p.consequent")
                .groupBy("antecedent", "consequent")
                .agg(F.count(F.lit(1)).alias("support"))
                .filter(F.col("support") >= RULE_MIN_SUPPORT))

    probes = {
        "sets_build": sets,
        "pair_agg": pair,
        "full_query": lambda: q(spark, sf_dir),
    }
    for name, fn in probes.items():
        best = float("inf")
        for r in range(3):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"basket:{name}:r{r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: best {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()

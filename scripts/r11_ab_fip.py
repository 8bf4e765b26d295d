"""Interleaved warm A/B: frequent_item_pairs string-brand baskets
(r10 shape, inlined below) vs dense-int brand codes + bounded
join-back (r11, the market_basket_rules transform). Also dumps the
before/after formatted plans for plans/r11/.

Usage: python scripts/r11_ab_fip.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.analytics import PAIR_MIN_SUPPORT
from de_project_airflow_etl_spark.queries.analytics import (
    frequent_item_pairs as new_fip,
)
from de_project_airflow_etl_spark.queries.analytics import (
    ordered_pair_structs,
)
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load


def old_fip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (li.join(pt, li.l_partkey == pt.p_partkey)
                 .groupBy("l_orderkey")
                 .agg(F.expr("sort_array(collect_set(p_brand))")
                       .alias("bs")))
    pairs = baskets.select(F.explode(F.expr(
        ordered_pair_structs("bs", "brand_a", "brand_b"))).alias("p"))
    return (pairs.select("p.brand_a", "p.brand_b")
            .groupBy("brand_a", "brand_b")
            .agg(F.count("*").alias("support"))
            .filter(F.col("support") >= PAIR_MIN_SUPPORT))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-ab-fip")

    for eq_sf in ("/root/testdata/sf0.01", sf_dir):
        a = sorted(map(tuple, old_fip(spark, eq_sf).collect()))
        b = sorted(map(tuple, new_fip(spark, eq_sf).collect()))
        assert a == b, f"outputs differ at {eq_sf}"
        print(f"rows_equal {eq_sf}: True ({len(a)} rows)", flush=True)

    from de_project_airflow_etl_spark.plans.inspect import formatted_plan
    os.makedirs("plans/r11", exist_ok=True)
    with open("plans/r11/frequent_item_pairs_before.txt", "w") as f:
        f.write(formatted_plan(old_fip(spark, sf_dir)))
    with open("plans/r11/frequent_item_pairs_after.txt", "w") as f:
        f.write(formatted_plan(new_fip(spark, sf_dir)))

    best = {"old": float("inf"), "new": float("inf")}
    for r in range(rounds):
        for label, fn in (("old", old_fip), ("new", new_fip)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:fip:{label}:r{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[label] = min(best[label], dt)
            print(f"  r{r} {label}: {dt:.3f}s", flush=True)
    o, n = best["old"], best["new"]
    print(f"best-of-{rounds}: old {o:.3f}s new {n:.3f}s "
          f"({(o - n) / o * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()

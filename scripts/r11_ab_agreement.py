"""Interleaved warm A/B for dedup_method_agreement: the r10 shape
(per-key groupBy counts + three data-sized join-backs; 4 documents
scans) vs a window rewrite (count(*) OVER (PARTITION BY k_i) — the
partition keys GROW with data, so the window is legal under the
repo's fixed-cardinality hazard rule): 1 scan + 3 window exchanges
instead of 4 scans + 3 aggregate exchanges + 3 sort-merge join passes
of the full stream.

Usage: python scripts/r11_ab_agreement.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.surfaces_r7 import (
    _BAG_KEY_SPARK, _CASEFOLD_KEY_SPARK, _EXACT_KEY_SPARK,
)
from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load

REG = all_queries()
old_fn = REG["dedup_method_agreement"].fn


def new_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_EXACT_KEY_SPARK).alias("k1"),
        F.expr(_CASEFOLD_KEY_SPARK).alias("k2"),
        F.expr(_BAG_KEY_SPARK).alias("k3"))
    flagged = d
    for i in (1, 2, 3):
        flagged = flagged.withColumn(
            f"c{i}", F.count(F.lit(1)).over(Window.partitionBy(f"k{i}")))
    flags = flagged.select(
        "doc_id",
        F.expr("CASE WHEN c1 > 1 THEN 1 ELSE 0 END").alias("f_exact"),
        F.expr("CASE WHEN c2 > 1 THEN 1 ELSE 0 END").alias("f_casefold"),
        F.expr("CASE WHEN c3 > 1 THEN 1 ELSE 0 END").alias("f_bag"))
    return (flags.groupBy("f_exact", "f_casefold", "f_bag")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.min("doc_id").alias("min_doc"),
                      F.max("doc_id").alias("max_doc")))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-ab-agreement")

    for eq_sf in ("/root/testdata/sf0.01", sf_dir):
        a = sorted(map(tuple, old_fn(spark, eq_sf).collect()))
        b = sorted(map(tuple, new_fn(spark, eq_sf).collect()))
        assert a == b, f"outputs differ at {eq_sf}: {a} vs {b}"
        print(f"rows_equal {eq_sf}: True ({len(a)} rows)", flush=True)

    best = {"old": float("inf"), "new": float("inf")}
    for r in range(rounds):
        for label, fn in (("old", old_fn), ("new", new_fn)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:agree:{label}:r{r}")
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

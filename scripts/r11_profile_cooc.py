"""Stage profile of word_cooccurrence_lift (guide §1.4): time each
piece with a noop sink, warm best-of-3, labeled jobs.

Usage: python scripts/r11_profile_cooc.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.analytics import COOC_WINDOW
from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-profile-cooc")
    q = all_queries()["word_cooccurrence_lift"].fn

    def docs():
        return (load(spark, sf_dir, "documents")
                .select(F.split("text", " ").alias("t"))
                .filter(F.expr("size(t) >= 2")))

    def pairs_df():
        return docs().select(F.explode(F.expr(f"""
            flatten(transform(sequence(1, size(t) - 1), i ->
              transform(slice(t, i + 1, {COOC_WINDOW}), y ->
                struct(CASE WHEN element_at(t, i) <= y
                            THEN element_at(t, i) ELSE y END AS w1,
                       CASE WHEN element_at(t, i) <= y
                            THEN y ELSE element_at(t, i) END AS w2))))
            """)).alias("p")).select("p.w1", "p.w2")

    probes = {
        "explode_only": lambda: pairs_df(),
        "pc_groupby": lambda: pairs_df().groupBy("w1", "w2").agg(
            F.count("*").cast("long").alias("pair_count")),
        "uc_groupby": lambda: (load(spark, sf_dir, "documents")
                               .select(F.explode(F.split("text", " "))
                                       .alias("w"))
                               .groupBy("w").agg(F.count("*").alias("c"))),
        "full_query": lambda: q(spark, sf_dir),
    }
    for name, fn in probes.items():
        best = float("inf")
        for r in range(3):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"cooc:{name}:r{r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: best {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()

"""Interleaved warm A/B of word_cooccurrence_lift pair-generation
variants (all EXACT — same struct(w1, w2) rows):

  cur   — double CASE WHEN + slice()            (HEAD)
  ifsl  — single IF per pair + slice()
  ifseq — single IF per pair + index sequence (no slice allocation)

Times the pc groupBy (explode + partial agg) with a noop sink, then
the variants' full-query form; asserts identical grouped counts once.

Usage: python scripts/r11_ab_cooc.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from de_project_airflow_etl_spark.queries.analytics import COOC_WINDOW
from de_project_airflow_etl_spark.session import get_spark
from de_project_airflow_etl_spark.tables import load

EXPRS = {
    "cur": f"""
        flatten(transform(sequence(1, size(t) - 1), i ->
          transform(slice(t, i + 1, {COOC_WINDOW}), y ->
            struct(CASE WHEN element_at(t, i) <= y
                        THEN element_at(t, i) ELSE y END AS w1,
                   CASE WHEN element_at(t, i) <= y
                        THEN y ELSE element_at(t, i) END AS w2))))
        """,
    "ifsl": f"""
        flatten(transform(sequence(1, size(t) - 1), i ->
          transform(slice(t, i + 1, {COOC_WINDOW}), y ->
            IF(element_at(t, i) <= y,
               struct(element_at(t, i) AS w1, y AS w2),
               struct(y AS w1, element_at(t, i) AS w2)))))
        """,
    "ifseq": f"""
        flatten(transform(sequence(1, size(t) - 1), i ->
          transform(sequence(i + 1, least(i + {COOC_WINDOW}, size(t))), j ->
            IF(element_at(t, i) <= element_at(t, j),
               struct(element_at(t, i) AS w1, element_at(t, j) AS w2),
               struct(element_at(t, j) AS w1,
                      element_at(t, i) AS w2)))))
        """,
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-ab-cooc")

    def pc(expr):
        docs = (load(spark, sf_dir, "documents")
                .select(F.split("text", " ").alias("t"))
                .filter(F.expr("size(t) >= 2")))
        return (docs.select(F.explode(F.expr(expr)).alias("p"))
                    .select("p.w1", "p.w2")
                    .groupBy("w1", "w2")
                    .agg(F.count("*").cast("long").alias("pair_count")))

    # exactness: grouped counts identical across variants
    base = None
    for name, expr in EXPRS.items():
        rows = sorted(map(tuple, pc(expr).collect()))
        if base is None:
            base = rows
        else:
            assert rows == base, f"{name} differs!"
        print(f"{name}: rows_equal=True n={len(rows)}", flush=True)

    best = {k: float("inf") for k in EXPRS}
    for r in range(rounds):
        for name, expr in EXPRS.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"cooc:{name}:r{r}")
            t0 = time.perf_counter()
            pc(expr).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"  round {r} {name}: {dt:.3f}s", flush=True)
    print({k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
